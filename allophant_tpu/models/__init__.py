"""Model layer: wav2vec2-style encoder, from-scratch transformer, hierarchical head."""

"""Device-side ops: masking, CTC loss/decoding, batched edit distance, Pallas kernels."""

"""Data layer: audio IO, corpora, batching, preprocessing."""

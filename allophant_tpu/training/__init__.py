"""Training & inference runtime: estimator, checkpointing, optimization."""

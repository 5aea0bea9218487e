"""Training & inference runtime: estimator, checkpointing, optimization, loops."""

from allophant_tpu.training.checkpoint import Checkpoint, EpochPosition, load_checkpoint
from allophant_tpu.training.estimator import (
    DEFAULT_SERVING_PRECISION,
    PRECISION_PRESETS,
    Estimator,
    resolve_precision,
)
from allophant_tpu.training.run import (
    DatasetManager,
    EarlyStopping,
    EpochStatistics,
    TrainingRun,
    TrainingStatus,
)

__all__ = [
    "Checkpoint",
    "DEFAULT_SERVING_PRECISION",
    "PRECISION_PRESETS",
    "resolve_precision",
    "DatasetManager",
    "EarlyStopping",
    "EpochPosition",
    "EpochStatistics",
    "Estimator",
    "TrainingRun",
    "TrainingStatus",
    "load_checkpoint",
]

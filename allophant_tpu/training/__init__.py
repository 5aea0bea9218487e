"""Training & inference runtime: estimator, checkpointing, optimization, loops."""

from allophant_tpu.training.checkpoint import Checkpoint, EpochPosition, load_checkpoint
from allophant_tpu.training.estimator import Estimator
from allophant_tpu.training.run import (
    DatasetManager,
    EarlyStopping,
    EpochStatistics,
    TrainingRun,
    TrainingStatus,
)

__all__ = [
    "Checkpoint",
    "DatasetManager",
    "EarlyStopping",
    "EpochPosition",
    "EpochStatistics",
    "Estimator",
    "TrainingRun",
    "TrainingStatus",
    "load_checkpoint",
]

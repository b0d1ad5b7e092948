"""Runtime: checkpointing, evaluation harness, run-dir management."""

from .checkpoint import CheckpointManager, save_checkpoint, load_checkpoint
from .evaluate import evaluate

__all__ = ["CheckpointManager", "save_checkpoint", "load_checkpoint",
           "evaluate"]

"""Shared surrogate-training harness (replaces the reference's seven
copy-pasted training loops, OpenPyStruct_FNN_MultiCase.py:480-594 et al.)."""

from openpystruct_tpu.train.harness import (
    FitResult,
    TrainState,
    fit,
    evaluate_r2,
    predict,
)
from openpystruct_tpu.train.checkpoint import save_checkpoint, load_checkpoint

__all__ = [
    "FitResult",
    "TrainState",
    "fit",
    "evaluate_r2",
    "predict",
    "save_checkpoint",
    "load_checkpoint",
]

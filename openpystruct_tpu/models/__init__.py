"""Flax surrogate model families (the reference's L4 layer)."""

from openpystruct_tpu.models.losses import trainable_l1l2_loss
from openpystruct_tpu.models.fnn import FNNWithResidual

__all__ = [
    "trainable_l1l2_loss",
    "FNNWithResidual",
]

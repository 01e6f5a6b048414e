"""Differentiable structural optimizers (the reference's L1 layer)."""

from openpystruct_tpu.opt.loss import structural_loss, LossComponents
from openpystruct_tpu.opt.beam_opt import BeamOptResult, optimize_beam

__all__ = [
    "structural_loss",
    "LossComponents",
    "BeamOptResult",
    "optimize_beam",
]

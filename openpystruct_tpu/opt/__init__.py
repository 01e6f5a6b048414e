"""Differentiable structural optimizers (the reference's L1 layer)."""

from openpystruct_tpu.opt.loss import structural_loss, LossComponents
from openpystruct_tpu.opt.beam_opt import (
    BeamOptResult,
    optimize_beam,
    optimize_beam_batched,
    optimize_beam_compact,
)
from openpystruct_tpu.opt.frame_opt import (
    FrameOptResult,
    frame_loss,
    optimize_frame,
    optimize_frame_batched,
)

__all__ = [
    "structural_loss",
    "LossComponents",
    "BeamOptResult",
    "optimize_beam",
    "optimize_beam_batched",
    "optimize_beam_compact",
    "FrameOptResult",
    "frame_loss",
    "optimize_frame",
    "optimize_frame_batched",
]

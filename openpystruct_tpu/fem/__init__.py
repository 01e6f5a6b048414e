"""Differentiable finite elements on TPU.

Replaces the external OpenSeesPy C++ engine used by the reference
(OpenPyStruct_BeamOpt.py:91-126).  Key differences by design:

- fully batched: every function is vmappable over scenarios, so the
  reference's ~500 Python<->C++ crossings per optimizer epoch
  (OpenPyStruct_BeamOpt.py:199-237) become one fused XLA program;
- differentiable: the linear solve carries an implicit-adjoint
  ``custom_vjp``, so d(u, M, V)/dI is exact when wanted — the reference only
  ever uses a semi-gradient (OpenPyStruct_BeamOpt.py:150-151);
- chain meshes assemble into an explicit block-tridiagonal stiffness
  (what OpenSees' BandSPD + RCM numberer rediscovers at runtime,
  OpenPyStruct_BeamOpt.py:122-123) and solve with an O(N) block-Thomas
  factorization.
"""

from openpystruct_tpu.fem.elements import (
    beam_element_stiffness,
    udl_equivalent_loads,
    element_end_forces,
)
from openpystruct_tpu.fem.solve import (
    block_tridiag_solve,
    block_tridiag_matvec,
    block_tridiag_min_pivot,
    block_tridiag_residual_compensated,
)
from openpystruct_tpu.fem.frame import (
    FrameStructure,
    FrameSolution,
    build_frame,
    solve_frame,
)
from openpystruct_tpu.fem.frame_banded import (
    frame_min_pivot,
    solve_frame_banded,
    solve_frame_checked,
)
from openpystruct_tpu.fem.beam import (
    BeamScenario,
    BeamSolution,
    assemble_beam_system,
    beam_min_pivot,
    solve_beam,
)
from openpystruct_tpu.fem.accuracy import (
    auto_refine,
    solve_beam_checked,
)

__all__ = [
    "beam_element_stiffness",
    "udl_equivalent_loads",
    "element_end_forces",
    "block_tridiag_solve",
    "block_tridiag_matvec",
    "block_tridiag_min_pivot",
    "block_tridiag_residual_compensated",
    "FrameStructure",
    "FrameSolution",
    "build_frame",
    "solve_frame",
    "frame_min_pivot",
    "solve_frame_banded",
    "solve_frame_checked",
    "BeamScenario",
    "BeamSolution",
    "assemble_beam_system",
    "beam_min_pivot",
    "solve_beam",
    "auto_refine",
    "solve_beam_checked",
]

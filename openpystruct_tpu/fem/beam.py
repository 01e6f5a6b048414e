"""Batched differentiable beam model.

Replaces the reference's ``setup_model`` + ``ops.analyze`` +
``eleResponse``/``nodeDisp`` path (OpenPyStruct_BeamOpt.py:91-144): nodes on
a line, a pin at node 0 (``fix(1,1,1,0)``), rollers as y-constraints at
arbitrary nodes (``fix(n,0,1,0)``), ``elasticBeamColumn`` elements with
per-element moments of inertia, nodal point loads, and a uniform UDL on
every element — solved as one batched block-tridiagonal system on-chip.

Scenario encoding is fixed-shape and masked so that everything vmaps:
rollers are a boolean mask over nodes and point loads a dense per-node force
vector (zero where no load).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from openpystruct_tpu.fem.elements import (
    beam_element_stiffness,
    element_end_forces,
    udl_equivalent_loads,
)
from openpystruct_tpu.fem.solve import (
    block_tridiag_min_pivot,
    block_tridiag_solve,
)


@struct.dataclass
class BeamScenario:
    """One load/support configuration (fixed shapes; vmappable).

    node_x: (n,) node positions along the beam (m).
    roller_mask: (n,) bool — True where a roller constrains uy
      (reference OpenPyStruct_BeamOpt.py:102-104; node 0 is always pinned).
    point_loads: (n,) nodal transverse forces Fy (N); 0 where no load
      (reference OpenPyStruct_BeamOpt.py:114-115).
    udl: scalar uniform transverse load on all elements (N/m)
      (reference OpenPyStruct_BeamOpt.py:117-119).
    roller_order/force_order: optional (n,) int32 — the node's DRAW
      POSITION among the selected rollers/forces (0-based; >= n where
      unselected).  The reference stores roller/force locations in random
      draw order — sequential random.choice for random-bridge rollers and
      random.sample for forces in both modes
      (OpenPyStruct_BeamOpt_training_MultiCore.py:137-162) — and the JSON
      writers honor these when present.  None means ascending node order.
    """

    node_x: jax.Array
    roller_mask: jax.Array
    point_loads: jax.Array
    udl: jax.Array
    roller_order: Optional[jax.Array] = None
    force_order: Optional[jax.Array] = None

    @property
    def num_nodes(self) -> int:
        return self.node_x.shape[-1]


@struct.dataclass
class BeamSolution:
    """FE solution fields (names follow the reference's dataset schema,
    OpenPyStruct_BeamOpt_training_SingleCore.py:73-87)."""

    displacements: jax.Array  # (n, 3) full (ux, uy, rz) field
    deflections: jax.Array    # (n,)  == nodeDisp(node, 2)
    rotations: jax.Array      # (n,)  == nodeDisp(node, 3)
    shear_forces: jax.Array   # (nelem,) == eleResponse(e,'forces')[1]
    bending_moments: jax.Array  # (nelem,) == eleResponse(e,'forces')[2]
    # full (nelem, 6) element end forces; None on the fused-kernel path,
    # which recovers only the V/M components the losses and datasets use
    end_forces: Optional[jax.Array] = None


def constraint_mask(scenario: BeamScenario) -> jax.Array:
    """(n, 3) bool mask of constrained DOFs: pin (ux, uy) at node 0 plus
    roller uy constraints."""
    n = scenario.num_nodes
    con = jnp.zeros((n, 3), dtype=bool)
    con = con.at[0, 0].set(True)
    con = con.at[0, 1].set(True)
    con = con.at[:, 1].set(con[:, 1] | scenario.roller_mask)
    return con


def assemble_beam_system(I, scenario: BeamScenario, E, A):
    """Assemble the constrained block-tridiagonal system K(I) u = f.

    Returns (diag (n,3,3), upper (n-1,3,3), rhs (n,3)).  Constraints are
    imposed by masking rows/columns and keeping the original diagonal entry,
    which preserves symmetry, bandedness, and differentiability (u = 0 at
    constrained DOFs exactly since the masked RHS is 0 there).
    """
    node_x = scenario.node_x
    Le = jnp.diff(node_x)
    k_all = beam_element_stiffness(E, A, I, Le)  # (nelem, 6, 6)

    n = node_x.shape[-1]
    dtype = k_all.dtype
    diag = jnp.zeros((n, 3, 3), dtype=dtype)
    diag = diag.at[:-1].add(k_all[:, :3, :3])
    diag = diag.at[1:].add(k_all[:, 3:, 3:])
    upper = k_all[:, :3, 3:]

    f = jnp.zeros((n, 3), dtype=dtype)
    f = f.at[:, 1].add(scenario.point_loads.astype(dtype))
    feq = udl_equivalent_loads(scenario.udl, Le).astype(dtype)
    f = f.at[:-1].add(feq[:, :3])
    f = f.at[1:].add(feq[:, 3:])

    con = constraint_mask(scenario)
    free = (~con).astype(dtype)  # (n, 3)

    orig_dd = jnp.diagonal(diag, axis1=-2, axis2=-1)  # (n, 3)
    diag = diag * free[:, :, None] * free[:, None, :]
    # Re-install the original (positive) diagonal entry on constrained DOFs to
    # keep the system well-scaled and SPD.
    con_f = con.astype(dtype)
    diag = diag + jnp.eye(3, dtype=dtype) * (con_f * orig_dd)[:, None, :]
    upper = upper * free[:-1, :, None] * free[1:, None, :]
    f = f * free
    return diag, upper, f


def beam_min_pivot(I, scenario: BeamScenario, E, A):
    """Singularity diagnostic: min Schur-pivot determinant of the scaled
    system (see :func:`block_tridiag_min_pivot`).  Valid configurations stay
    above ~1e-7 in float32; structurally singular ones collapse to ~1e-10.
    The TPU-native stand-in for OpenSees' analyze-failure return code."""
    diag, upper, _ = assemble_beam_system(I, scenario, E, A)
    return block_tridiag_min_pivot(diag, upper)


def solve_beam(
    I,
    scenario: BeamScenario,
    E,
    A,
    refine: int = 0,
    jacobi_scale: bool = True,
) -> BeamSolution:
    """Linear static solve, the batched replacement for one
    ``ops.analyze(1)`` + response sweep (OpenPyStruct_BeamOpt.py:206-210,
    128-144).  Fully differentiable w.r.t. ``I`` through the solver's
    implicit adjoint.

    Args:
      I: (nelem,) per-element moments of inertia.
      scenario: the load/support configuration.
      E, A: material / section constants.
      refine: iterative-refinement sweeps (for float32 on TPU).
      jacobi_scale: symmetric diagonal pre-scaling; equilibrates the huge
        translation-vs-rotation scale disparity, cutting the condition number
        before the float32 factorization.
    """
    diag, upper, f = assemble_beam_system(I, scenario, E, A)

    if jacobi_scale:
        d = jnp.diagonal(diag, axis1=-2, axis2=-1)  # (n, 3)
        s = jax.lax.rsqrt(d)
        diag_s = diag * s[:, :, None] * s[:, None, :]
        upper_s = upper * s[:-1, :, None] * s[1:, None, :]
        f_s = f * s
        u = block_tridiag_solve(diag_s, upper_s, f_s, refine=refine)
        u = u * s
    else:
        u = block_tridiag_solve(diag, upper, f, refine=refine)

    u_e = jnp.concatenate([u[:-1], u[1:]], axis=-1)  # (nelem, 6)
    Le = jnp.diff(scenario.node_x)
    end_forces = element_end_forces(u_e, E, A, I, Le, scenario.udl)

    return BeamSolution(
        displacements=u,
        deflections=u[:, 1],
        rotations=u[:, 2],
        shear_forces=end_forces[:, 1],
        bending_moments=end_forces[:, 2],
        end_forces=end_forces,
    )


def solve_beam_batched(
    I,
    scenario: BeamScenario,
    E,
    A,
    refine: int = 0,
    use_pallas: bool = True,
    interpret: bool = False,
) -> BeamSolution:
    """Batched linear static solve: ``I`` is (B, nelem) and every leaf of
    ``scenario`` carries a leading batch dim.

    This is the production datagen/optimizer path: assembly and force
    recovery vmap, while the solve itself runs the Pallas block-Thomas
    kernel on the whole batch (~30x the per-sample ``lax.scan`` route on a
    v5e; set ``use_pallas=False`` to fall back, ``interpret=True`` for CPU
    testing of the kernel).
    """
    from openpystruct_tpu.ops.block_tridiag import pallas_solve_sym

    diag, upper, f = jax.vmap(
        lambda I, sc: assemble_beam_system(I, sc, E, A)
    )(I, scenario)

    d = jnp.diagonal(diag, axis1=-2, axis2=-1)  # (B, n, 3)
    s = jax.lax.rsqrt(d)
    diag_s = diag * s[..., :, None] * s[..., None, :]
    upper_s = upper * s[..., :-1, :, None] * s[..., 1:, None, :]
    f_s = f * s
    if use_pallas:
        u = pallas_solve_sym(diag_s, upper_s, f_s, refine, interpret)
    else:
        u = jax.vmap(lambda d, up, b: block_tridiag_solve(d, up, b,
                                                          refine=refine))(
            diag_s, upper_s, f_s
        )
    u = u * s

    u_e = jnp.concatenate([u[..., :-1, :], u[..., 1:, :]], axis=-1)
    Le = jnp.diff(scenario.node_x, axis=-1)
    end_forces = element_end_forces(
        u_e, E, A, I, Le, scenario.udl[..., None]
    )
    return BeamSolution(
        displacements=u,
        deflections=u[..., 1],
        rotations=u[..., 2],
        shear_forces=end_forces[..., 1],
        bending_moments=end_forces[..., 2],
        end_forces=end_forces,
    )

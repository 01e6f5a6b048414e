"""2D frame finite elements.

Replaces the reference's ``setup_frame_model``
(OpenPyStruct_FrameOpt_Discrete_Beta.py:75-139): a (stories+1) x (bays+1)
node grid, fixed base (``fix(tag,1,1,1)`` at y=0), column elements then beam
elements, lateral nodal loads on the x=0 nodes above ground, and a uniform
load on beam elements only.

Faithful-parity notes:
- the reference's ``eleLoad '-beamUniform' w, w`` passes TWO arguments: in
  OpenSees 2D these are (Wy, Wx) — transverse AND axial distributed load,
  both equal to ``vertical_load``.  Both components are applied here.
- ``end_forces`` are element resisting forces in GLOBAL coordinates
  (what ``eleResponse(e,'forces')`` returns), so for a vertical column
  index 1 is the global-Y force — the member's AXIAL force, not its shear.
  The reference's frame loss reads exactly that index
  (FrameOpt_Discrete_Beta.py:151-153); reproduce it via
  ``end_forces[:, 1]``.
- the reference configures Newton iteration (FrameOpt:138) but the problem
  is linear, so Newton converges in one step; a direct linear solve is
  exactly equivalent.

Solver: the grid stiffness is assembled dense and solved with LU — at the
reference's maximum size (11x11 nodes = 363 DOF) a batched dense solve is
MXU-friendly and far below the crossover where a banded factorization wins.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from openpystruct_tpu.config import FrameConfig
from openpystruct_tpu.fem.elements import beam_element_stiffness


@struct.dataclass
class FrameStructure:
    """Static frame topology (index arrays are fixed at trace time)."""

    node_xy: jax.Array      # (N, 2) coordinates
    elems: jax.Array        # (E, 2) node indices (0-based)
    is_beam: jax.Array      # (E,) True for horizontal beam members
    fixed_mask: jax.Array   # (N,) True where the base is fully fixed
    lateral_mask: jax.Array  # (N,) True where the lateral load applies
    # grid shape as STATIC metadata (not pytree leaves): the banded solver
    # derives its level/block layout from these at trace time
    num_bays: int = struct.field(pytree_node=False, default=0)
    num_stories: int = struct.field(pytree_node=False, default=0)

    @property
    def num_nodes(self) -> int:
        return self.node_xy.shape[0]

    @property
    def num_elems(self) -> int:
        return self.elems.shape[0]


@struct.dataclass
class FrameSolution:
    displacements: jax.Array  # (N, 3)
    end_forces: jax.Array     # (E, 6) global-coordinate resisting forces


def build_frame(num_bays: int, num_stories: int,
                cfg: FrameConfig = FrameConfig()) -> FrameStructure:
    """Node grid + column/beam element lists, ordered exactly as the
    reference builds them: all columns story-by-story, then all beams
    (FrameOpt_Discrete_Beta.py:97-114) — the I vector indexes elements in
    this order."""
    nb, ns = num_bays, num_stories
    cols = nb + 1
    xy = np.zeros(((ns + 1) * cols, 2), np.float64)
    for i in range(ns + 1):
        for j in range(cols):
            xy[i * cols + j] = (j * cfg.bay_width, i * cfg.story_height)

    elems, is_beam = [], []
    for i in range(ns):            # columns
        for j in range(cols):
            elems.append((i * cols + j, (i + 1) * cols + j))
            is_beam.append(False)
    for i in range(1, ns + 1):     # beams
        for j in range(nb):
            elems.append((i * cols + j, i * cols + j + 1))
            is_beam.append(True)

    fixed = xy[:, 1] == 0.0
    lateral = (xy[:, 0] == 0.0) & (xy[:, 1] > 0.0)
    return FrameStructure(
        node_xy=jnp.asarray(xy),
        elems=jnp.asarray(np.asarray(elems, np.int32)),
        is_beam=jnp.asarray(np.asarray(is_beam)),
        fixed_mask=jnp.asarray(fixed),
        lateral_mask=jnp.asarray(lateral),
        num_bays=nb,
        num_stories=ns,
    )


def _element_transform(dx, dy, L):
    """(..., 6, 6) local->global rotation for a 2D frame element."""
    c, s = dx / L, dy / L
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    rows = [
        [c, s, z, z, z, z],
        [-s, c, z, z, z, z],
        [z, z, o, z, z, z],
        [z, z, z, c, s, z],
        [z, z, z, -s, c, z],
        [z, z, z, z, z, o],
    ]
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


def frame_element_data(I, structure: FrameStructure, cfg: FrameConfig,
                       dtype=jnp.float32, udl=None, lateral_load=None):
    """Per-element stiffness/load data + the unconstrained global RHS —
    shared by the dense assembly below and the block-tridiagonal assembly
    in fem/frame_banded.py.

    Returns ``(k_global, f_nodal, con, (k_local, T, f_local, L))``:
    (E,6,6) global element stiffness, (3N,) nodal force vector (element
    equivalents + lateral loads, unconstrained), (3N,) constrained-DOF
    mask, and the local-frame recovery tuple."""
    if udl is None:
        udl = jnp.asarray(cfg.udl, dtype)
    if lateral_load is None:
        lateral_load = jnp.asarray(cfg.lateral_load, dtype)
    xy = structure.node_xy.astype(dtype)
    e = structure.elems
    d = xy[e[:, 1]] - xy[e[:, 0]]
    L = jnp.sqrt(jnp.sum(d**2, axis=-1))
    T = _element_transform(d[:, 0], d[:, 1], L).astype(dtype)

    k_local = beam_element_stiffness(cfg.E, cfg.A, I.astype(dtype), L)
    k_global = jnp.einsum(
        "eji,ejk,ekl->eil", T, k_local, T,
        precision=jax.lax.Precision.HIGHEST,
    )

    # Uniform load on beams only: local (Wy, Wx) both = udl
    # (the reference's two-argument eleLoad, FrameOpt:131).
    w = jnp.where(structure.is_beam, jnp.asarray(udl, dtype), 0.0)
    half_y = w * L / 2.0
    m = w * L * L / 12.0
    half_x = w * L / 2.0
    f_local = jnp.stack(
        [half_x, half_y, m, half_x, half_y, -m], axis=-1
    )
    f_global_e = jnp.einsum(
        "eji,ej->ei", T, f_local, precision=jax.lax.Precision.HIGHEST
    )

    N = structure.num_nodes
    dof = jnp.concatenate(
        [3 * e[:, 0:1] + jnp.arange(3), 3 * e[:, 1:2] + jnp.arange(3)],
        axis=1,
    )  # (E, 6)
    f = jnp.zeros((3 * N,), dtype)
    f = f.at[dof].add(f_global_e)
    lat = jnp.where(
        structure.lateral_mask, jnp.asarray(lateral_load, dtype), 0.0
    )
    f = f.at[3 * jnp.arange(N)].add(lat)
    con = jnp.repeat(structure.fixed_mask, 3)
    return k_global, f, con, (k_local, T, f_local, L)


def frame_system(I, structure: FrameStructure, cfg: FrameConfig,
                 dtype=jnp.float32, udl=None, lateral_load=None):
    """Assemble the constrained dense system K(I) u = f and per-element
    (k_local, T, f_eq_local) for force recovery.

    ``udl``/``lateral_load`` override the config scalars with traced
    values — the hook that lets the batched driver vmap over per-lane
    load scenarios (the reference only ever solves one frame at a time,
    FrameOpt_Discrete_Beta.py:166-206)."""
    k_global, f, con, aux = frame_element_data(
        I, structure, cfg, dtype, udl=udl, lateral_load=lateral_load
    )
    e = structure.elems
    N = structure.num_nodes
    K = jnp.zeros((3 * N, 3 * N), dtype)
    dof = jnp.concatenate(
        [3 * e[:, 0:1] + jnp.arange(3), 3 * e[:, 1:2] + jnp.arange(3)],
        axis=1,
    )  # (E, 6)
    K = K.at[dof[:, :, None], dof[:, None, :]].add(k_global)

    # fixed base: zero rows/cols, original diagonal back on constrained DOFs
    free = (~con).astype(dtype)
    dK = jnp.diagonal(K)
    K = K * free[:, None] * free[None, :]
    K = K + jnp.diag(jnp.where(con, dK, 0.0))
    f = f * free
    return K, f, aux


def recover_end_forces(u_nodes, structure: FrameStructure, aux):
    """Global end forces from nodal displacements (the ``eleResponse``
    recovery shared by every frame solve path)."""
    k_local, T, f_local, _L = aux
    e = structure.elems
    u_e = jnp.concatenate([u_nodes[e[:, 0]], u_nodes[e[:, 1]]], axis=-1)
    u_local = jnp.einsum(
        "eij,ej->ei", T, u_e, precision=jax.lax.Precision.HIGHEST
    )
    p_local = jnp.einsum(
        "eij,ej->ei", k_local, u_local,
        precision=jax.lax.Precision.HIGHEST,
    ) - f_local
    return jnp.einsum(
        "eji,ej->ei", T, p_local, precision=jax.lax.Precision.HIGHEST
    )


def solve_frame(I, structure: FrameStructure,
                cfg: FrameConfig = FrameConfig(),
                dtype=jnp.float32, udl=None,
                lateral_load=None, method: str = "auto") -> FrameSolution:
    """Linear static solve + global end-force recovery (vmappable over I
    and the load overrides).

    Matches ``ops.analyze(1)`` + ``eleResponse(e,'forces')``
    (FrameOpt_Discrete_Beta.py:139,149-153).

    ``method``: ``"dense"`` = batched dense LU, ``"banded"`` = story-level
    block-tridiagonal Cholesky-Thomas factorization (fem/frame_banded.py —
    O(stories·m³) instead of O((stories·m)³), the structure OpenSees'
    BandGeneral exploits, FrameOpt_Discrete_Beta.py:134).  ``"auto"`` =
    banded ALWAYS: measured in-loop on v5e it wins at every topology,
    including the degenerate ones where the asymptotics don't apply —
    8.0x at the reference's 3x3, 7.9/9.8x at the squat/tall extremes
    10x1/1x10 (unpivoted Cholesky + unrolled block factors vs XLA's
    batched pivoted LU; table in BENCHMARKS.md).  ``"dense"`` is kept as
    the A/B reference implementation."""
    if method == "auto":
        method = "banded"
    if method == "banded":
        from openpystruct_tpu.fem.frame_banded import solve_frame_banded

        sol, _piv = solve_frame_banded(
            I, structure, cfg, dtype, udl=udl, lateral_load=lateral_load
        )
        return sol
    K, f, aux = frame_system(
        I, structure, cfg, dtype, udl=udl, lateral_load=lateral_load
    )
    u = jnp.linalg.solve(K, f)
    u_nodes = u.reshape(structure.num_nodes, 3)
    return FrameSolution(
        displacements=u_nodes,
        end_forces=recover_end_forces(u_nodes, structure, aux),
    )

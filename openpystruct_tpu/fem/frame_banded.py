"""Story-level block-tridiagonal frame solver + accuracy autopilot.

The reference solves its frames with OpenSees' **BandGeneral** system
(OpenPyStruct_FrameOpt_Discrete_Beta.py:134-139) — a float64 banded LU that
implicitly exploits the grid's structure.  The dense batched LU that served
round 3 is O((3N)³) per lane and caps the "mesh is a free axis" story at
the reference's 11x11; this module exploits the same structure OpenSees
does, TPU-style:

Node numbering is story-major (fem/frame.py:build_frame), so grouping each
story level's ``m = 3·(bays+1)`` DOFs into one super-node makes K(I)
**block-tridiagonal over levels**: only column elements couple adjacent
levels.  A block-Thomas factorization (``lax.scan`` over levels, one
``m×m`` unpivoted Cholesky per level — K is SPD — with the factor columns
fully unrolled, batched over lanes) costs O(levels·m³) — a (stories)²-ish
flop reduction over dense — and its Cholesky diagonals are the Schur
pivots of the Jacobi-scaled system, giving the frame path the same
singularity/conditioning diagnostic the beam path has
(``fem.beam.beam_min_pivot``).

``solve_frame_checked`` mirrors ``fem.accuracy.solve_beam_checked``: f32 +
adaptive refinement with a measured error estimate, escalation of
uncertifiable lanes to float64 on the host CPU (the reference's own
arithmetic; dd is unnecessary at frame DOF counts — VERDICT r4 item 2).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from openpystruct_tpu.config import FrameConfig
from openpystruct_tpu.fem.frame import (
    FrameSolution,
    FrameStructure,
    frame_element_data,
    recover_end_forces,
)

_HI = jax.lax.Precision.HIGHEST

# float32 / float64 unit roundoffs (escalation bookkeeping)
_EPS32 = 2.0 ** -24
_EPS64 = 2.0 ** -53

# Scaled-pivot floor below which an f32 frame factorization is treated as
# numerically SINGULAR in solve_frame_checked (a NaN Cholesky factor
# sanitizes to 0 and trips this).  Accuracy flagging is the refinement
# estimate's job, so this floor only needs to sit below every
# merely-ill-conditioned regime.
FRAME_PIVOT_TOL32 = 1e-9
# f64 floor (mirrors datagen.generate.RESCUE_PIVOT_TOL's rationale).
FRAME_PIVOT_TOL64 = 1e-12
# Datagen VALIDITY threshold (accuracy-grade, not just singularity):
# measured calibration (BENCHMARKS.md frame section) — healthy frames
# across topology x I-contrast factor with scaled pivots >= ~2e-3 and f32
# error <= ~1e-4; garbage-f32 regimes collapse to <= ~1.4e-5 pivots with
# >= 12% error (or NaN).  1e-3 splits the regimes with >= 1 decade of
# margin each side, and real OPTIMIZED lanes measure pivots >= ~0.2 —
# two further decades above the threshold.
FRAME_VALID_PIVOT = 1e-3


def frame_blocks(I, structure: FrameStructure, cfg: FrameConfig,
                 dtype=jnp.float32, udl=None, lateral_load=None):
    """Assemble the constrained system as story-level blocks.

    Returns ``(D, U, f, aux)``: (L, m, m) level-diagonal blocks,
    (L-1, m, m) super-diagonal blocks (level i -> i+1 coupling; the
    sub-diagonal is ``U_iᵀ`` by symmetry), (L, m) RHS, and the force-
    recovery tuple — where ``L = stories+1`` levels and
    ``m = 3·(bays+1)``.  Memory O(L·m²) per lane instead of the dense
    O((L·m)²), so grids far past 11x11 stay batchable."""
    cols = structure.num_bays + 1
    Lv = structure.num_stories + 1
    m = 3 * cols

    k_global, f_nodal, con, aux = frame_element_data(
        I, structure, cfg, dtype, udl=udl, lateral_load=lateral_load
    )
    e = structure.elems
    lev = e // cols          # (E, 2) level of each element end
    slot = e % cols          # (E, 2) within-level node slot
    r3 = jnp.arange(3)

    D = jnp.zeros((Lv, m, m), dtype)
    U = jnp.zeros((Lv - 1, m, m), dtype)
    for p in (0, 1):
        rows = (3 * slot[:, p])[:, None] + r3     # (E, 3)
        lp = lev[:, p]
        for q in (0, 1):
            cols_ = (3 * slot[:, q])[:, None] + r3
            lq = lev[:, q]
            blk = k_global[:, 3 * p:3 * p + 3, 3 * q:3 * q + 3]
            # same-level quadrant -> D[level]; out-of-range target drops
            tgt = jnp.where(lp == lq, lp, Lv)
            D = D.at[
                tgt[:, None, None], rows[:, :, None], cols_[:, None, :]
            ].add(blk, mode="drop")
            # upward coupling -> U[level]; the downward quadrant is its
            # transpose and is applied implicitly in the solve
            tgt_u = jnp.where(lq == lp + 1, lp, Lv)
            U = U.at[
                tgt_u[:, None, None], rows[:, :, None], cols_[:, None, :]
            ].add(blk, mode="drop")

    # fixed-base constraints: zero rows/cols, original diagonal back on
    # constrained DOFs (same convention as the dense path)
    conL = con.reshape(Lv, m)
    freeL = (~conL).astype(dtype)
    dD = jnp.diagonal(D, axis1=-2, axis2=-1)
    D = D * freeL[:, :, None] * freeL[:, None, :]
    D = D + jnp.eye(m, dtype=dtype) * jnp.where(conL, dD, 0.0)[:, :, None]
    U = U * freeL[:-1, :, None] * freeL[1:, None, :]
    f = f_nodal.reshape(Lv, m) * freeL
    return D, U, f, aux


def _chol_unrolled(A):
    """Lower-Cholesky of one (m, m) SPD block by m unrolled rank-1 updates
    (m is static — the topology fixes it at trace time).

    XLA's batched ``jnp.linalg.cholesky`` lowers to a column-loop of masked
    dynamic updates that costs **1274 ns/lane** at (4096, 12, 12) on v5e;
    this unrolled outer-product form costs **27 ns/lane** (47x) — measured
    head-to-head, BENCHMARKS.md frame section.  It is the entire difference
    between the frame optimizer being Cholesky-bound and solve-cost-free.
    A non-positive pivot produces NaN via ``rsqrt`` exactly like the lapack
    lowering, so the validity/escalation layers see the same signal."""
    m = A.shape[-1]
    idx = jnp.arange(m)
    cols = []
    for j in range(m):
        d = jax.lax.rsqrt(A[j, j])
        col = A[:, j] * d * (idx >= j).astype(A.dtype)
        A = A - col[:, None] * col[None, :]
        cols.append(col)
    return jnp.stack(cols, axis=-1)


# Level width above which the panel-blocked Cholesky replaces the fully
# unrolled one: the unrolled form's PROGRAM SIZE grows linearly with m
# (m sequential rank-1 updates on (m, m) slabs), which at 30x30 grids
# (m = 93) costs ~160 s of XLA compile per topology; the blocked form
# keeps the program O(panel) and puts the trailing update on the MXU.
# At reference widths (m <= 36) the unrolled form stays — it is 47x
# XLA's cholesky there and compiles instantly.
_CHOL_BLOCK_MIN_WIDTH = 49
_CHOL_PANEL = 16


def _chol_blocked(A, panel=_CHOL_PANEL):
    """Lower-Cholesky of one (m, m) SPD block by right-looking panel
    factorization: per panel, an unrolled ``panel x panel`` factor, one
    triangular panel solve, and one (m, panel) x (panel, m) rank-panel
    Schur update — a real matmul the MXU tiles, unlike the unrolled
    form's m rank-1 VPU updates.  ``lax.fori_loop`` over panels keeps
    the compiled program O(panel) in size regardless of m.

    m is padded to a multiple of ``panel`` with an identity diagonal
    (pivot 1, no coupling), so any static m works.  A non-positive pivot
    produces NaN via ``rsqrt`` and the rank-panel update propagates it
    to every later entry — the same failure signal as ``_chol_unrolled``.
    """
    m = A.shape[-1]
    mp = ((m + panel - 1) // panel) * panel
    if mp != m:
        pad = mp - m
        A = jnp.pad(A, ((0, pad), (0, pad)))
        A = A.at[jnp.arange(m, mp), jnp.arange(m, mp)].set(1.0)
    idxp = jnp.arange(panel)
    rows = jnp.arange(mp)

    def small_chol(Ablk):
        cols = []
        for j in range(panel):
            d = jax.lax.rsqrt(Ablk[j, j])
            col = Ablk[:, j] * d * (idxp >= j).astype(Ablk.dtype)
            Ablk = Ablk - col[:, None] * col[None, :]
            cols.append(col)
        return jnp.stack(cols, axis=-1)

    def body(i, carry):
        A, L = carry
        k = i * panel
        L11 = small_chol(jax.lax.dynamic_slice(A, (k, k), (panel, panel)))
        strip = jax.lax.dynamic_slice(A, (0, k), (mp, panel))
        # X = strip @ L11^{-T}: rows below the panel become L21
        X = jax.lax.linalg.triangular_solve(
            L11, strip, left_side=False, lower=True, transpose_a=True
        )
        X21 = X * (rows >= k + panel).astype(A.dtype)[:, None]
        A = A - jnp.einsum("ik,jk->ij", X21, X21, precision=_HI)
        colblk = jax.lax.dynamic_update_slice(X21, L11, (k, 0))
        L = jax.lax.dynamic_update_slice(L, colblk, (0, k))
        return A, L

    _, L = jax.lax.fori_loop(
        0, mp // panel, body, (A, jnp.zeros_like(A))
    )
    return L[:m, :m]


def _chol(A):
    """Static-shape dispatch between the two Cholesky forms."""
    if A.shape[-1] >= _CHOL_BLOCK_MIN_WIDTH:
        return _chol_blocked(A)
    return _chol_unrolled(A)


def _tri(C, r):
    return jax.lax.linalg.triangular_solve(
        C, r, lower=True, transpose_a=False, left_side=True
    )


def _triT(C, r):
    return jax.lax.linalg.triangular_solve(
        C, r, lower=True, transpose_a=True, left_side=True
    )


def _chol_vec_solve(C, r):
    """S⁻¹ r from the Cholesky factor C (two vector triangular sweeps)."""
    return _triT(C, _tri(C, r[:, None]))[:, 0]


def _thomas_impl(D, U, f):
    """Block-Thomas factor-and-solve; returns ``(x, min_pivot, Cs)`` where
    ``Cs`` are the (L, m, m) per-level Schur Cholesky factors — kept so
    the implicit adjoint and iterative refinement can substitute without
    re-factoring."""
    Lv, m = f.shape

    C0 = _chol(D[0])
    if Lv == 1:
        x = _chol_vec_solve(C0, f[0])[None]
        return x, jnp.min(jnp.diagonal(C0)) ** 2, C0[None]

    def fwd(carry, inp):
        C_p, y_p = carry
        D_i, U_prev, f_i = inp
        # one triangular solve against [U_prev | y_prev] gives both the
        # Schur update (S = D - GᵀG, G = C⁻¹U) and the forward RHS
        X = _tri(C_p, jnp.concatenate([U_prev, y_p[:, None]], axis=1))
        G, h = X[:, :m], X[:, m]
        S_i = D_i - jnp.einsum("ji,jk->ik", G, G, precision=_HI)
        y_i = f_i - jnp.einsum("ji,j->i", G, h, precision=_HI)
        C_i = _chol(S_i)
        return (C_i, y_i), (C_i, y_i)

    _, (Cs, ys) = jax.lax.scan(fwd, (C0, f[0]), (D[1:], U, f[1:]))
    Cs = jnp.concatenate([C0[None], Cs])
    ys = jnp.concatenate([f[0][None], ys])

    x_last = _chol_vec_solve(Cs[-1], ys[-1])

    def bwd(x_next, inp):
        C_i, y_i, U_i = inp
        x_i = _chol_vec_solve(
            C_i, y_i - jnp.einsum("ij,j->i", U_i, x_next, precision=_HI)
        )
        return x_i, x_i

    _, xs = jax.lax.scan(
        bwd, x_last, (Cs[:-1], ys[:-1], U), reverse=True
    )
    x = jnp.concatenate([xs, x_last[None]], axis=0)
    min_pivot = jnp.min(jnp.diagonal(Cs, axis1=-2, axis2=-1)) ** 2
    return x, min_pivot, Cs


def thomas_substitute(Cs, U, b):
    """Solve K x = b from SAVED factors (substitution only, O(L·m²)):
    forward Schur RHS sweep ``y_i = b_i - U_{i-1}ᵀ S_{i-1}⁻¹ y_{i-1}``
    then the standard backward sweep.  This is what makes the implicit
    adjoint and refinement sweeps factorization-free."""
    Lv = b.shape[0]
    if Lv == 1:
        return _chol_vec_solve(Cs[0], b[0])[None]

    def fwd(y_p, inp):
        C_p, U_prev, b_i = inp
        y_i = b_i - jnp.einsum(
            "ji,j->i", U_prev, _chol_vec_solve(C_p, y_p), precision=_HI
        )
        return y_i, y_i

    _, ys = jax.lax.scan(fwd, b[0], (Cs[:-1], U, b[1:]))
    ys = jnp.concatenate([b[0][None], ys])

    x_last = _chol_vec_solve(Cs[-1], ys[-1])

    def bwd(x_next, inp):
        C_i, y_i, U_i = inp
        x_i = _chol_vec_solve(
            C_i, y_i - jnp.einsum("ij,j->i", U_i, x_next, precision=_HI)
        )
        return x_i, x_i

    _, xs = jax.lax.scan(
        bwd, x_last, (Cs[:-1], ys[:-1], U), reverse=True
    )
    return jnp.concatenate([xs, x_last[None]], axis=0)


@jax.custom_vjp
def block_thomas_solve(D, U, f):
    """Solve the block-tridiagonal system (D, U symmetric layout) by
    block-Thomas with CHOLESKY level factors: forward Schur elimination
    over levels (one m×m Cholesky per level, reused by the
    back-substitution), backward sweep.

    Cholesky, not pivoted LU, because K is SPD by construction (fixed-base
    frames are never mechanisms and I >= clamp > 0) and TPU pays dearly
    for pivoting — measured 2.6x faster than the LU variant at 11x11
    (BENCHMARKS.md frame section).  A NaN factor (f32 near-singularity) is
    the failure signal: it propagates into ``min_pivot`` and the solution,
    where the validity/escalation layers catch it.

    Returns ``(x, min_pivot)`` where ``min_pivot`` is the smallest squared
    Cholesky diagonal over every level — the Schur pivots; on a
    Jacobi-scaled system this is the singularity/conditioning diagnostic
    (beam analog: ``block_tridiag_min_pivot``).

    Gradient: IMPLICIT adjoint (the frame counterpart of the beam's
    ``fem.solve._solve`` custom_vjp) — K is symmetric, so the adjoint
    system K λ = x̄ reuses the forward factors and the backward pass is
    substitution-only, instead of reverse-AD through the factorization
    (which would save every intermediate of the per-level Cholesky chain,
    O(L·m³) residuals).  ``min_pivot`` is a diagnostic and is defined
    non-differentiable (its cotangent is ignored)."""
    x, piv, _ = _thomas_impl(D, U, f)
    return x, piv


def _thomas_fwd(D, U, f):
    x, piv, Cs = _thomas_impl(D, U, f)
    return (x, piv), (U, x, Cs)


def _thomas_bwd(res, cot):
    U, x, Cs = res
    x_bar, _piv_bar = cot  # pivot is a non-differentiable diagnostic
    lam = thomas_substitute(Cs, U, x_bar)   # K λ = x̄ (K symmetric)
    # dL/dK = -λ xᵀ restricted to the (D, U) block sparsity; the
    # sub-diagonal Uᵀ usage folds into the symmetrized Ū term.
    D_bar = -lam[:, :, None] * x[:, None, :]
    U_bar = -(
        lam[:-1, :, None] * x[1:, None, :]
        + x[:-1, :, None] * lam[1:, None, :]
    )
    return D_bar, U_bar, lam


block_thomas_solve.defvjp(_thomas_fwd, _thomas_bwd)


def _scale_blocks(D, U, f):
    """Jacobi scaling (the beam solver's convention): solve the scaled
    system, pivots become dimensionless conditioning measures."""
    dd = jnp.diagonal(D, axis1=-2, axis2=-1)
    s = jax.lax.rsqrt(dd)
    D_s = D * s[:, :, None] * s[:, None, :]
    U_s = U * s[:-1, :, None] * s[1:, None, :]
    return D_s, U_s, f * s, s


def block_matvec(D, U, x):
    """y = K x through the block structure (residual computation)."""
    y = jnp.einsum("lij,lj->li", D, x, precision=_HI)
    y = y.at[:-1].add(
        jnp.einsum("lij,lj->li", U, x[1:], precision=_HI)
    )
    y = y.at[1:].add(
        jnp.einsum("lji,lj->li", U, x[:-1], precision=_HI)
    )
    return y


def solve_frame_banded(I, structure: FrameStructure,
                       cfg: FrameConfig = FrameConfig(),
                       dtype=jnp.float32, udl=None, lateral_load=None):
    """Banded linear static solve + end-force recovery (vmappable).

    Returns ``(FrameSolution, min_pivot)`` — the scaled-system Schur
    pivot is free here, unlike the dense path."""
    D, U, f, aux = frame_blocks(
        I, structure, cfg, dtype, udl=udl, lateral_load=lateral_load
    )
    D_s, U_s, f_s, s = _scale_blocks(D, U, f)
    x, piv = block_thomas_solve(D_s, U_s, f_s)
    u_nodes = (x * s).reshape(structure.num_nodes, 3)
    return FrameSolution(
        displacements=u_nodes,
        end_forces=recover_end_forces(u_nodes, structure, aux),
    ), piv


def frame_min_pivot(I, structure: FrameStructure,
                    cfg: FrameConfig = FrameConfig(), dtype=jnp.float32):
    """Min |Schur pivot| of the Jacobi-scaled frame system — the validity
    signal the beam path gets from ``beam_min_pivot``.  Load-independent
    (pivots come from the factorization alone); vmappable over I."""
    D, U, f, _ = frame_blocks(I, structure, cfg, dtype)
    D_s, U_s, f_s, _ = _scale_blocks(D, U, f)
    _, piv = block_thomas_solve(D_s, U_s, jnp.zeros_like(f_s))
    return piv


@functools.lru_cache(maxsize=32)
def _checked_fns(num_bays: int, num_stories: int, cfg: FrameConfig,
                 refine_max: int):
    """Jitted f32 checked-solve runner + f64 escalation runner, cached per
    topology (jit caches live on the wrapper object — CLAUDE.md)."""
    from openpystruct_tpu.fem.frame import build_frame

    structure = build_frame(num_bays, num_stories, cfg)

    def one32(I, w, p):
        D, U, f, aux = frame_blocks(I, structure, cfg, jnp.float32, w, p)
        D_s, U_s, f_s, s = _scale_blocks(D, U, f)
        # factor ONCE; refinement sweeps substitute from the saved factors
        x, piv, Cs = _thomas_impl(D_s, U_s, f_s)
        xnorm = jnp.max(jnp.abs(x)) + 1e-30
        est = jnp.asarray(jnp.inf, jnp.float32)
        for _ in range(refine_max):
            r = f_s - block_matvec(D_s, U_s, x)
            e = thomas_substitute(Cs, U_s, r)
            e_new = jnp.max(jnp.abs(e)) / xnorm
            # freeze on divergence, like the beam autopilot
            x = jnp.where(e_new < est, x + e, x)
            est = jnp.minimum(est, e_new)
        u = (x * s).reshape(structure.num_nodes, 3)
        return u, recover_end_forces(u, structure, aux), est, piv

    run32 = jax.jit(jax.vmap(one32))

    def one64(I, w, p):
        sol, piv = solve_frame_banded(
            I, structure, cfg, jnp.float64, udl=w, lateral_load=p
        )
        return sol.displacements, sol.end_forces, piv

    run64 = jax.jit(jax.vmap(one64))
    return structure, run32, run64


def solve_frame_checked(
    I,
    structure: FrameStructure,
    cfg: FrameConfig = FrameConfig(),
    udl=None,
    lateral_load=None,
    tol: float = 1e-4,
    refine_max: int = 2,
    on_fail: str = "warn",   # "warn" | "raise"
):
    """Batched frame solve with a certified-accuracy contract — the frame
    counterpart of ``fem.accuracy.solve_beam_checked`` (VERDICT r4 item 2;
    the reference's implicit guarantee is f64 BandGeneral,
    OpenPyStruct_FrameOpt_Discrete_Beta.py:134-139).

    float32 banded solve + adaptive refinement first; lanes whose measured
    relative-error estimate exceeds ``tol`` — or whose scaled Schur pivot
    signals a near-singular f32 factorization — are re-solved in float64
    on the host CPU (frame systems are <= a few thousand DOF; dd is
    unnecessary).  Returns ``(FrameSolution, info)`` with per-lane ``est``,
    ``used_f64`` and ``pivot``.  Eager diagnostic API, not a hot loop.
    """
    import warnings

    B = I.shape[0]
    dt = jnp.float32
    w = jnp.broadcast_to(jnp.asarray(
        cfg.udl if udl is None else udl, dt), (B,))
    p = jnp.broadcast_to(jnp.asarray(
        cfg.lateral_load if lateral_load is None else lateral_load, dt),
        (B,))
    _, run32, run64 = _checked_fns(
        structure.num_bays, structure.num_stories, cfg, refine_max
    )
    u, ef, est, piv32 = run32(jnp.asarray(I, dt), w, p)

    est = np.asarray(est)
    est = np.where(np.isfinite(est), est, np.inf)
    piv32 = np.asarray(piv32)
    piv32 = np.where(np.isfinite(piv32), piv32, 0.0)
    # the refinement estimate certifies accuracy but cannot see
    # singularity (self-consistent garbage has small corrections) —
    # the pivot covers that axis, as in the beam autopilot
    flagged = np.flatnonzero((est > tol) | (piv32 < FRAME_PIVOT_TOL32))
    used_f64 = np.zeros(B, bool)
    pivot = piv32.astype(np.float64).copy()

    if flagged.size:
        gidx = flagged
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.enable_x64(), jax.default_device(cpu):
            # fresh f64 trace under the x64 scope (cache key includes x64
            # state, so this does not poison the f32 cache)
            u64, ef64, piv64 = run64(
                jnp.asarray(np.asarray(I)[gidx], jnp.float64),
                jnp.asarray(np.asarray(w)[gidx], jnp.float64),
                jnp.asarray(np.asarray(p)[gidx], jnp.float64),
            )
            u64, ef64, piv64 = map(np.asarray, (u64, ef64, piv64))
        u = np.array(u)
        ef = np.array(ef)
        u[gidx] = u64.astype(u.dtype)
        ef[gidx] = ef64.astype(ef.dtype)
        used_f64[gidx] = True
        pivot[gidx] = piv64
        # f64 certification: scaled f32 estimate + pivot-based normwise
        # bound (amplification ~ 1/min scaled pivot), whichever is larger
        with np.errstate(divide="ignore", invalid="ignore"):
            est64 = np.maximum(
                np.where(np.isfinite(est[gidx]),
                         est[gidx] * (_EPS64 / _EPS32), 0.0),
                _EPS64 / np.abs(piv64),
            )
        est = np.array(est)
        est[gidx] = est64
        bad = ~(est64 <= tol) | ~(piv64 > FRAME_PIVOT_TOL64)
        if bad.any():
            msg = (
                f"{int(bad.sum())} of {B} frame systems cannot be "
                f"certified at tol={tol:g} even in float64 (min pivot "
                f"{piv64.min():.3e}); results for those lanes may be "
                "inaccurate"
            )
            if on_fail == "raise":
                raise ValueError(msg)
            warnings.warn(msg, RuntimeWarning, stacklevel=2)

    sol = FrameSolution(
        displacements=jnp.asarray(u), end_forces=jnp.asarray(ef)
    )
    return sol, dict(est=est, used_f64=used_f64, pivot=pivot)

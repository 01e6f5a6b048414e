"""Fully-fused beam FEA kernels: assembly + BCs + scaling + solve + forces,
plus a whole-optimizer-iteration kernel (loss + gradient + Adam in VMEM).

The split pipeline (XLA assembly -> Pallas solve) materializes the
(B, nelem, 6, 6) element-stiffness table in HBM every optimizer iteration
(~118 MB at B=8192) plus the banded system itself.  These kernels take only
the raw scenario arrays — I, element lengths, constraint masks, nodal loads,
UDL — and perform the entire linear-static analysis in VMEM:

  element stiffness coefficients -> block-tridiagonal assembly ->
  constraint masking -> Jacobi scaling -> block-Thomas factorization
  (Schur inverses SAVED) -> substitution [-> compensated-residual
  refinement, substitution-only] -> displacement unscaling ->
  element end-force recovery (shear V, moment M).

Saving the Schur inverses makes every extra solve against the same K a pair
of O(n k^2) substitution sweeps instead of an O(n k^3) refactorization —
that is what makes both iterative refinement and the adjoint solve cheap.

Two entry points ride this machinery:

- ``pallas_beam_analysis``: the batched FEA with an analytic ``custom_vjp``
  (implicit adjoint = one more fused solve), so adjoint-mode optimization
  runs at fused-kernel speed;
- ``pallas_beam_opt_step``: ONE WHOLE optimizer iteration — solve, combined
  loss (OpenPyStruct_BeamOpt.py:128-168 semantics), its gradient in either
  semi-gradient or exact-adjoint mode, and the Adam update — per kernel
  launch, with only (B, nelem) state arrays touching HBM.

Everything is (sublane, lane) element-wise VPU work with the scenario batch
across lanes, like ops/block_tridiag.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openpystruct_tpu.ops.block_tridiag import (
    LANES,
    SUB,
    TILE,
    _VMEM_BUDGET,
    pick_sub,
    _inv2_sym,
    _inv3_slabs,
    _mm,
    _mv,
    _sub_m,
    _sub_v,
    _t,
)

# Error-free transforms: one canonical implementation (ops/dd.py) —
# keeping Dekker/Knuth sequences in sync by hand across copies is how
# compensated arithmetic silently rots.
from openpystruct_tpu.ops.dd import two_prod as _two_prod
from openpystruct_tpu.ops.dd import two_sum as _two_sum


def _det3(m):
    a, b, c = m[0]
    d, e, f = m[1]
    g, h, i_ = m[2]
    return (a * (e * i_ - f * h) - b * (d * i_ - f * g)
            + c * (d * h - e * g))


def _read_mat(ref, i):
    return [[ref[i, a, b] for b in range(3)] for a in range(3)]


def _read_vec(ref, i):
    return [ref[i, a] for a in range(3)]


# ---------------------------------------------------------------------------
# Shared kernel stages.  Each takes the scratch refs it reads/writes; all
# solve-space quantities are in the Jacobi-scaled system K_s = S K S.
#
# The stages are precision-POLYMORPHIC: handed plain float32 refs they are
# the production float32 pipeline (bitwise unchanged — the dd dispatch
# helpers are identities on plain arrays); handed ops.dd RefPair/LiftRef
# refs they run the same algorithm in double-double (~48-bit) arithmetic,
# which is how the random-bridge rescue kernel (ops/beam_kernel_dd.py)
# reuses this exact code.  Convention required by that reuse: when mixing
# dd values with plain float32 masks/loads, the dd value goes on the LEFT
# of * and + (jnp arrays don't defer to DD's __rmul__).
# ---------------------------------------------------------------------------

from openpystruct_tpu.ops.dd import (
    absval as _absval,
    dd_rsqrt as _dd_rsqrt,
    dd_where as _dd_where,
    zeros_entry as _zeros_entry,
)

def _stage_stiffness(nelem, I_ref, Le_ref, E, EA, ks_scr):
    """ks rows per element: EA/Le, 12EI/Le^3, 6EI/Le^2, 4EI/Le, 2EI/Le."""

    def body(j, _):
        Le = Le_ref[0, j]
        I = I_ref[0, j]
        inv_le = 1.0 / Le
        eil = E * I * inv_le
        eil2 = eil * inv_le
        eil3 = eil2 * inv_le
        ks_scr[j, 0] = EA * inv_le
        ks_scr[j, 1] = 12.0 * eil3
        ks_scr[j, 2] = 6.0 * eil2
        ks_scr[j, 3] = 4.0 * eil
        ks_scr[j, 4] = 2.0 * eil
        return 0

    jax.lax.fori_loop(0, nelem, body, 0)


def _stage_assemble(nelem, Le_ref, free_ref, load_ref, udl_ref, rhs_ref,
                    ks_scr, diag_scr, upper_scr, f_scr):
    """Masked block-tridiagonal assembly + RHS (loads+UDL or explicit)."""
    n = nelem + 1
    zero = _zeros_entry(ks_scr[0, 0])
    w = udl_ref[0, 0] if udl_ref is not None else None

    def body(i, _):
        has_prev = i > 0
        has_next = i < nelem

        def ks_of(j, active):
            jj = jnp.clip(j, 0, nelem - 1)
            m = jnp.where(active, 1.0, 0.0).astype(free_ref.dtype)
            return [ks_scr[jj, k] * m for k in range(5)]

        ea_p, k11_p, k12_p, k13_p, _k2p = ks_of(i - 1, has_prev)
        ea_n, k11_n, k12_n, k13_n, k2_n = ks_of(i, has_next)

        d00 = ea_p + ea_n
        d11 = k11_p + k11_n
        d12 = -k12_p + k12_n
        d22 = k13_p + k13_n

        free = [free_ref[0, i, a] for a in range(3)]
        con = [1.0 - fa for fa in free]

        # masked diag: zero rows/cols of constrained DOFs, original
        # diagonal entry back on the diagonal
        diag_scr[i, 0, 0] = d00 * free[0] * free[0] + d00 * con[0]
        diag_scr[i, 0, 1] = zero
        diag_scr[i, 0, 2] = zero
        diag_scr[i, 1, 0] = zero
        diag_scr[i, 1, 1] = d11 * free[1] * free[1] + d11 * con[1]
        diag_scr[i, 1, 2] = d12 * free[1] * free[2]
        diag_scr[i, 2, 0] = zero
        diag_scr[i, 2, 1] = d12 * free[2] * free[1]
        diag_scr[i, 2, 2] = d22 * free[2] * free[2] + d22 * con[2]

        # upper block couples node i to i+1 (element i); zero at the end
        free_n = [free_ref[0, jnp.clip(i + 1, 0, n - 1), a]
                  for a in range(3)]
        upper_scr[i, 0, 0] = -ea_n * free[0] * free_n[0]
        upper_scr[i, 0, 1] = zero
        upper_scr[i, 0, 2] = zero
        upper_scr[i, 1, 0] = zero
        upper_scr[i, 1, 1] = -k11_n * free[1] * free_n[1]
        upper_scr[i, 1, 2] = k12_n * free[1] * free_n[2]
        upper_scr[i, 2, 0] = zero
        upper_scr[i, 2, 1] = -k12_n * free[2] * free_n[1]
        upper_scr[i, 2, 2] = k2_n * free[2] * free_n[2]

        if rhs_ref is not None:
            f_scr[i, 0] = rhs_ref[0, i, 0] * free[0]
            f_scr[i, 1] = rhs_ref[0, i, 1] * free[1]
            f_scr[i, 2] = rhs_ref[0, i, 2] * free[2]
        else:
            # consistent UDL loads + nodal point loads
            Le_p = _dd_where(
                has_prev, Le_ref[0, jnp.clip(i - 1, 0, nelem - 1)], zero
            )
            Le_n = _dd_where(
                has_next, Le_ref[0, jnp.clip(i, 0, nelem - 1)], zero
            )
            fy = (Le_p + Le_n) * w * 0.5 + load_ref[0, i]
            fm = (Le_n * Le_n - Le_p * Le_p) * w / 12.0
            f_scr[i, 0] = zero
            f_scr[i, 1] = fy * free[1]
            f_scr[i, 2] = fm * free[2]
        return 0

    jax.lax.fori_loop(0, n, body, 0)


def _stage_scale(n, diag_scr, upper_scr, f_scr, s_scr):
    """Jacobi scaling s = rsqrt(diag); scale diag/upper/f in place."""

    def body(i, _):
        for a in range(3):
            s_scr[i, a] = _dd_rsqrt(diag_scr[i, a, a])
        for a in range(3):
            for b in range(3):
                diag_scr[i, a, b] = (
                    diag_scr[i, a, b] * s_scr[i, a] * s_scr[i, b]
                )
        for a in range(3):
            f_scr[i, a] = f_scr[i, a] * s_scr[i, a]
        return 0

    jax.lax.fori_loop(0, n, body, 0)

    def body_u(i, _):
        for a in range(3):
            for b in range(3):
                upper_scr[i, a, b] = (
                    upper_scr[i, a, b] * s_scr[i, a] * s_scr[i + 1, b]
                )
        return 0

    jax.lax.fori_loop(0, n - 1, body_u, 0)


def _stage_factor(n, diag_scr, upper_scr, sinv_scr, c_scr=None,
                  rhs_ref=None, y_ref=None):
    """Block-Thomas factorization storing the Schur-complement INVERSES
    (and, when ``c_scr`` is given, the back-substitution multipliers
    C_i = Sinv_i U_i): every subsequent solve against this K is then two
    O(n k^2) substitution sweeps.  Returns min |det S_i| (the singularity
    pivot diagnostic).

    Storing C costs one more (n, 3, 3) VMEM buffer but halves the serial
    dependency chain of the (latency-bound) backward sweep; kernels with
    VMEM to spare pass ``c_scr``, the opt-step kernel (tighter budget)
    recomputes Sinv_i (U_i x) on the fly instead.

    When ``rhs_ref``/``y_ref`` are given, the primal forward substitution
    y_i = Sinv_i (f_i - U_{i-1}^T y_{i-1}) is FUSED into the same serial
    sweep — the factorization and the forward solve are one O(n) pass, so
    the primal solve costs only one extra (backward) sweep.
    """
    d0 = _read_mat(diag_scr, 0)
    sinv0 = _inv3_slabs(d0)
    for a in range(3):
        for b in range(3):
            sinv_scr[0, a, b] = sinv0[a][b]
    if c_scr is not None:
        c0 = _mm(sinv0, _read_mat(upper_scr, 0))
        for a in range(3):
            for b in range(3):
                c_scr[0, a, b] = c0[a][b]
    if rhs_ref is not None:
        y0 = _mv(sinv0, _read_vec(rhs_ref, 0))
        for a in range(3):
            y_ref[0, a] = y0[a]

    def fwd(i, min_det):
        u_prev = _read_mat(upper_scr, i - 1)
        if c_scr is not None:
            c_prev = _read_mat(c_scr, i - 1)
        else:
            c_prev = _mm(_read_mat(sinv_scr, i - 1), u_prev)
        s = _sub_m(_read_mat(diag_scr, i), _mm(_t(u_prev), c_prev))
        sinv = _inv3_slabs(s)
        for a in range(3):
            for b in range(3):
                sinv_scr[i, a, b] = sinv[a][b]
        if c_scr is not None:
            c = _mm(sinv, _read_mat(upper_scr, i))
            for a in range(3):
                for b in range(3):
                    c_scr[i, a, b] = c[a][b]
        if rhs_ref is not None:
            y = _mv(sinv, _sub_v(_read_vec(rhs_ref, i),
                                 _mv(_t(u_prev), _read_vec(y_ref, i - 1))))
            for a in range(3):
                y_ref[i, a] = y[a]
        return jnp.minimum(min_det, _absval(_det3(s)))

    return jax.lax.fori_loop(1, n, fwd, _absval(_det3(d0)))


def _substitute_inplace(n, upper_scr, sinv_scr, x_ref, c_scr=None):
    """Solve K_s x = rhs in place (x_ref holds rhs on entry, x on exit)
    using the saved factors: forward y_i = Sinv_i (r_i - U_{i-1}^T
    y_{i-1}), backward x_i = y_i - C_i x_{i+1} (C read from ``c_scr`` when
    stored, else recomputed as Sinv_i (U_i x_{i+1}))."""
    y0 = _mv(_read_mat(sinv_scr, 0), _read_vec(x_ref, 0))
    for a in range(3):
        x_ref[0, a] = y0[a]

    def fwd(i, _):
        lm = _t(_read_mat(upper_scr, i - 1))
        y = _mv(
            _read_mat(sinv_scr, i),
            _sub_v(_read_vec(x_ref, i), _mv(lm, _read_vec(x_ref, i - 1))),
        )
        for a in range(3):
            x_ref[i, a] = y[a]
        return 0

    jax.lax.fori_loop(1, n, fwd, 0)
    _back_substitute(n, upper_scr, sinv_scr, x_ref, c_scr)


def _back_substitute(n, upper_scr, sinv_scr, x_ref, c_scr=None):
    """x_i = y_i - C_i x_{i+1} in place (y in x_ref on entry)."""

    def bwd(k, _):
        i = n - 2 - k
        if c_scr is not None:
            cx = _mv(_read_mat(c_scr, i), _read_vec(x_ref, i + 1))
        else:
            cx = _mv(_read_mat(sinv_scr, i),
                     _mv(_read_mat(upper_scr, i), _read_vec(x_ref, i + 1)))
        x = _sub_v(_read_vec(x_ref, i), cx)
        for a in range(3):
            x_ref[i, a] = x[a]
        return 0

    jax.lax.fori_loop(0, n - 1, bwd, 0)


def _stage_refine(n, refine, diag_scr, upper_scr, sinv_scr, rhs_ref, x_ref,
                  work_ref, c_scr=None):
    """``refine`` compensated-residual sweeps; each is one error-free
    residual + one substitution (factors reused, no refactorization)."""
    for _ in range(refine):
        def resid_body(i, _):
            one = jnp.ones_like(rhs_ref[0, 0])
            m_prev = jnp.where(i > 0, one, 0.0 * one)
            m_next = jnp.where(i < n - 1, one, 0.0 * one)
            ip = jnp.maximum(i - 1, 0)
            iq = jnp.minimum(i, n - 2)
            inx = jnp.minimum(i + 1, n - 1)
            x_i = _read_vec(x_ref, i)
            x_p = [x_ref[ip, b] * m_prev for b in range(3)]
            x_n = [x_ref[inx, b] * m_next for b in range(3)]
            m_d = _read_mat(diag_scr, i)
            lm = _t(_read_mat(upper_scr, ip))      # masked via x_p
            um = _read_mat(upper_scr, iq)          # masked via x_n
            for a in range(3):
                acc_s = rhs_ref[i, a]
                acc_c = jnp.zeros_like(acc_s)
                for b in range(3):
                    for mat, vec in ((m_d, x_i), (lm, x_p), (um, x_n)):
                        p, e = _two_prod(-mat[a][b], vec[b])
                        acc_s, e2 = _two_sum(acc_s, p)
                        acc_c = acc_c + e2 + e
                work_ref[i, a] = acc_s + acc_c
            return 0

        jax.lax.fori_loop(0, n, resid_body, 0)
        _substitute_inplace(n, upper_scr, sinv_scr, work_ref, c_scr)

        def addcorr(i, _):
            for a in range(3):
                x_ref[i, a] = x_ref[i, a] + work_ref[i, a]
            return 0

        jax.lax.fori_loop(0, n, addcorr, 0)


# ---------------------------------------------------------------------------
# Bending-only (2-DOF) stages — round 4's dd discovery applied to the f32
# production kernels.
#
# The straight-beam 3-DOF system is block-diagonal per DOF class: the axial
# DOF u_x couples only to u_x (see the zero off-entries _stage_assemble
# writes) and its RHS is identically zero — the scenario schema has no
# x-direction loads (OpenPyStruct_BeamOpt.py:112-119 applies vertical point
# loads and '-beamUniform' only).  So u_x == 0 exactly and the bending
# (w, theta) 2x2 chain carries the entire solution.  Factoring 2x2 blocks
# instead of 3x3 cuts the per-node multiply count ~2.6x and (unlike the
# 3-DOF layout) leaves a working set small enough for FULL-DEPTH (8, 128)
# slabs at reference sizes — shallow slabs cost a whole vreg op regardless
# of depth, so both factors land on the hot path.
#
# Unlike the dd rescue kernels (ops/beam_kernel_dd.py, no refinement),
# the f32 pipeline keeps the original scaled system (diag/upper/rhs) for
# the compensated-residual refinement and the in-kernel adjoint, so the
# Schur inverses are stored separately rather than overwriting D in place.
#
# The Schur-pivot diagnostic keeps its 3-DOF semantics: the chain's Schur
# complements are block-diagonal too, so det3(S_i) = a_i * det2(S2_i) with
# a_i the scalar axial Schur pivot — tracked alongside the bending
# factorization exactly as in the dd kernels, keeping validity thresholds
# calibrated identically.
# ---------------------------------------------------------------------------


def _axial_pivot_step(ax_ref, i, a_prev):
    """One f32 step of the axial scalar Schur chain (Jacobi-scaled):
    a_i = d00s_i - u00s_{i-1}^2 / a_{i-1}."""
    d_prev = ax_ref[i - 1, 0]
    d_cur = ax_ref[i, 0]
    r_prev = jax.lax.rsqrt(d_prev)
    r_cur = jax.lax.rsqrt(d_cur)
    u00s = ax_ref[i - 1, 1] * r_prev * r_cur
    d00s = d_cur * r_cur * r_cur
    return d00s - u00s * u00s / a_prev


def _assemble_b2(nelem, Le_ref, free_ref, load_ref, udl_ref,
                 ks_scr, diag_scr, upper_scr, f_scr, ax_scr=None):
    """Masked bending-only assembly (2 DOF/node: w, theta) + RHS.

    ``diag_scr`` holds the symmetric diagonal blocks as (n, 3) rows
    [d_ww, d_wt, d_tt]; ``upper_scr`` the full (n, 2, 2) coupling blocks.
    When ``ax_scr`` is given, the axial chain's unscaled d00/u00 are
    written there for the pivot diagnostic.  Same masked-BC scheme as
    ``_stage_assemble``: constrained rows/cols zeroed, original diagonal
    entry restored on the diagonal."""
    n = nelem + 1
    zero = _zeros_entry(ks_scr[0, 0])
    w = udl_ref[0, 0]

    def body(i, _):
        has_prev = i > 0
        has_next = i < nelem

        def ks_of(j, active):
            jj = jnp.clip(j, 0, nelem - 1)
            m = jnp.where(active, 1.0, 0.0).astype(free_ref.dtype)
            return [ks_scr[jj, k] * m for k in range(5)]

        ea_p, k11_p, k12_p, k13_p, _k2p = ks_of(i - 1, has_prev)
        ea_n, k11_n, k12_n, k13_n, k2_n = ks_of(i, has_next)

        d11 = k11_p + k11_n
        d12 = -k12_p + k12_n
        d22 = k13_p + k13_n

        f0 = free_ref[0, i, 0]
        f1 = free_ref[0, i, 1]
        f2 = free_ref[0, i, 2]

        diag_scr[i, 0] = d11 * (f1 * f1 + (1.0 - f1))
        diag_scr[i, 1] = d12 * (f1 * f2)
        diag_scr[i, 2] = d22 * (f2 * f2 + (1.0 - f2))

        inx = jnp.clip(i + 1, 0, n - 1)
        fn0 = free_ref[0, inx, 0]
        fn1 = free_ref[0, inx, 1]
        fn2 = free_ref[0, inx, 2]
        upper_scr[i, 0, 0] = -(k11_n * (f1 * fn1))
        upper_scr[i, 0, 1] = k12_n * (f1 * fn2)
        upper_scr[i, 1, 0] = -(k12_n * (f2 * fn1))
        upper_scr[i, 1, 1] = k2_n * (f2 * fn2)

        # consistent UDL loads + nodal point loads (no axial RHS exists)
        Le_p = _dd_where(has_prev, Le_ref[0, jnp.clip(i - 1, 0, nelem - 1)],
                         zero)
        Le_n = _dd_where(has_next, Le_ref[0, jnp.clip(i, 0, nelem - 1)],
                         zero)
        fy = (Le_p + Le_n) * w * 0.5 + load_ref[0, i]
        fm = (Le_n * Le_n - Le_p * Le_p) * w / 12.0
        f_scr[i, 0] = fy * f1
        f_scr[i, 1] = fm * f2

        if ax_scr is not None:
            d00 = ea_p + ea_n
            ax_scr[i, 0] = d00 * (f0 * f0 + (1.0 - f0))
            ax_scr[i, 1] = -ea_n * (f0 * fn0)
        return 0

    jax.lax.fori_loop(0, n, body, 0)


def _scale_b2(n, diag_scr, upper_scr, f_scr, s_scr):
    """Jacobi scaling of the bending system (s = rsqrt(diag))."""

    def body(i, _):
        s_scr[i, 0] = _dd_rsqrt(diag_scr[i, 0])
        s_scr[i, 1] = _dd_rsqrt(diag_scr[i, 2])
        s1, s2 = s_scr[i, 0], s_scr[i, 1]
        diag_scr[i, 0] = diag_scr[i, 0] * s1 * s1
        diag_scr[i, 1] = diag_scr[i, 1] * s1 * s2
        diag_scr[i, 2] = diag_scr[i, 2] * s2 * s2
        f_scr[i, 0] = f_scr[i, 0] * s1
        f_scr[i, 1] = f_scr[i, 1] * s2
        return 0

    jax.lax.fori_loop(0, n, body, 0)

    def body_u(i, _):
        si = (s_scr[i, 0], s_scr[i, 1])
        sn = (s_scr[i + 1, 0], s_scr[i + 1, 1])
        for a in range(2):
            for b in range(2):
                upper_scr[i, a, b] = upper_scr[i, a, b] * si[a] * sn[b]
        return 0

    jax.lax.fori_loop(0, n - 1, body_u, 0)


def _factor_b2(n, diag_scr, upper_scr, sinv_scr, f_ref, y_ref,
               c_scr=None, ax_scr=None):
    """Block-Thomas factorization of the bending 2x2 chain with FUSED
    forward substitution (y written to ``y_ref``; ``f_ref`` preserved for
    refinement residuals).  ``sinv_scr`` receives the symmetric Schur
    inverses as (n, 3) rows; ``c_scr``, when given, the back-substitution
    multipliers C_i = Sinv_i U_i.  Returns the min pivot — the 3-DOF-
    equivalent a_i * |det2(S_i)| when ``ax_scr`` tracks the axial chain,
    plain |det2| otherwise (callers that never read it)."""
    i0, i1, i2, det0 = _inv2_sym(diag_scr[0, 0], diag_scr[0, 1],
                                 diag_scr[0, 2])
    sinv_scr[0, 0] = i0
    sinv_scr[0, 1] = i1
    sinv_scr[0, 2] = i2
    if c_scr is not None:
        u00, u01 = upper_scr[0, 0, 0], upper_scr[0, 0, 1]
        u10, u11 = upper_scr[0, 1, 0], upper_scr[0, 1, 1]
        c_scr[0, 0, 0] = i0 * u00 + i1 * u10
        c_scr[0, 0, 1] = i0 * u01 + i1 * u11
        c_scr[0, 1, 0] = i1 * u00 + i2 * u10
        c_scr[0, 1, 1] = i1 * u01 + i2 * u11
    r0, r1 = f_ref[0, 0], f_ref[0, 1]
    y_ref[0, 0] = i0 * r0 + i1 * r1
    y_ref[0, 1] = i1 * r0 + i2 * r1

    det0 = _absval(det0)
    if ax_scr is not None:
        a0 = ax_scr[0, 0] * jax.lax.rsqrt(ax_scr[0, 0]) ** 2
        carry0 = (a0 * det0, a0)
    else:
        carry0 = (det0, det0)

    def fwd(i, carry):
        min_piv, a_prev = carry
        u00 = upper_scr[i - 1, 0, 0]
        u01 = upper_scr[i - 1, 0, 1]
        u10 = upper_scr[i - 1, 1, 0]
        u11 = upper_scr[i - 1, 1, 1]
        if c_scr is not None:
            w00 = c_scr[i - 1, 0, 0]
            w01 = c_scr[i - 1, 0, 1]
            w10 = c_scr[i - 1, 1, 0]
            w11 = c_scr[i - 1, 1, 1]
        else:
            s00 = sinv_scr[i - 1, 0]
            s01 = sinv_scr[i - 1, 1]
            s11 = sinv_scr[i - 1, 2]
            w00 = s00 * u00 + s01 * u10
            w01 = s00 * u01 + s01 * u11
            w10 = s01 * u00 + s11 * u10
            w11 = s01 * u01 + s11 * u11
        # S_i = D_i - U^T W (symmetric)
        S0 = diag_scr[i, 0] - (u00 * w00 + u10 * w10)
        S1 = diag_scr[i, 1] - (u00 * w01 + u10 * w11)
        S2 = diag_scr[i, 2] - (u01 * w01 + u11 * w11)
        i0_, i1_, i2_, det = _inv2_sym(S0, S1, S2)
        sinv_scr[i, 0] = i0_
        sinv_scr[i, 1] = i1_
        sinv_scr[i, 2] = i2_
        if c_scr is not None:
            un00 = upper_scr[i, 0, 0]
            un01 = upper_scr[i, 0, 1]
            un10 = upper_scr[i, 1, 0]
            un11 = upper_scr[i, 1, 1]
            c_scr[i, 0, 0] = i0_ * un00 + i1_ * un10
            c_scr[i, 0, 1] = i0_ * un01 + i1_ * un11
            c_scr[i, 1, 0] = i1_ * un00 + i2_ * un10
            c_scr[i, 1, 1] = i1_ * un01 + i2_ * un11
        # fused forward substitution: y_i = Sinv_i (f_i - U^T y_{i-1})
        yp0, yp1 = y_ref[i - 1, 0], y_ref[i - 1, 1]
        r0_ = f_ref[i, 0] - (u00 * yp0 + u10 * yp1)
        r1_ = f_ref[i, 1] - (u01 * yp0 + u11 * yp1)
        y_ref[i, 0] = i0_ * r0_ + i1_ * r1_
        y_ref[i, 1] = i1_ * r0_ + i2_ * r1_

        det = _absval(det)
        if ax_scr is not None:
            a_i = _axial_pivot_step(ax_scr, i, a_prev)
            return (jnp.minimum(min_piv, a_i * det), a_i)
        return (jnp.minimum(min_piv, det), a_prev)

    min_piv, _ = jax.lax.fori_loop(1, n, fwd, carry0)
    return min_piv


def _bsub_b2(n, upper_scr, sinv_scr, x_ref, c_scr=None):
    """x_i = y_i - C_i x_{i+1} in place (y in x_ref on entry; C read from
    ``c_scr`` when stored, else recomputed as Sinv_i (U_i x_{i+1}))."""

    def bwd(k, _):
        i = n - 2 - k
        x0, x1 = x_ref[i + 1, 0], x_ref[i + 1, 1]
        if c_scr is not None:
            v0 = c_scr[i, 0, 0] * x0 + c_scr[i, 0, 1] * x1
            v1 = c_scr[i, 1, 0] * x0 + c_scr[i, 1, 1] * x1
        else:
            t0 = upper_scr[i, 0, 0] * x0 + upper_scr[i, 0, 1] * x1
            t1 = upper_scr[i, 1, 0] * x0 + upper_scr[i, 1, 1] * x1
            s00 = sinv_scr[i, 0]
            s01 = sinv_scr[i, 1]
            s11 = sinv_scr[i, 2]
            v0 = s00 * t0 + s01 * t1
            v1 = s01 * t0 + s11 * t1
        x_ref[i, 0] = x_ref[i, 0] - v0
        x_ref[i, 1] = x_ref[i, 1] - v1
        return 0

    jax.lax.fori_loop(0, n - 1, bwd, 0)


def _subst_b2(n, upper_scr, sinv_scr, x_ref, c_scr=None):
    """Solve K_s x = rhs in place (x_ref holds rhs on entry, x on exit)
    with the saved 2x2 factors."""
    s00, s01, s11 = sinv_scr[0, 0], sinv_scr[0, 1], sinv_scr[0, 2]
    r0, r1 = x_ref[0, 0], x_ref[0, 1]
    x_ref[0, 0] = s00 * r0 + s01 * r1
    x_ref[0, 1] = s01 * r0 + s11 * r1

    def fwd(i, _):
        u00 = upper_scr[i - 1, 0, 0]
        u01 = upper_scr[i - 1, 0, 1]
        u10 = upper_scr[i - 1, 1, 0]
        u11 = upper_scr[i - 1, 1, 1]
        xp0, xp1 = x_ref[i - 1, 0], x_ref[i - 1, 1]
        r0_ = x_ref[i, 0] - (u00 * xp0 + u10 * xp1)
        r1_ = x_ref[i, 1] - (u01 * xp0 + u11 * xp1)
        s00_ = sinv_scr[i, 0]
        s01_ = sinv_scr[i, 1]
        s11_ = sinv_scr[i, 2]
        x_ref[i, 0] = s00_ * r0_ + s01_ * r1_
        x_ref[i, 1] = s01_ * r0_ + s11_ * r1_
        return 0

    jax.lax.fori_loop(1, n, fwd, 0)
    _bsub_b2(n, upper_scr, sinv_scr, x_ref, c_scr)


def _refine_b2(n, refine, diag_scr, upper_scr, sinv_scr, rhs_ref, x_ref,
               work_ref, c_scr=None):
    """``refine`` compensated-residual sweeps on the bending chain; each
    is one error-free residual + one substitution against the saved
    factors (no refactorization)."""
    for _ in range(refine):
        def resid_body(i, _):
            one = jnp.ones_like(rhs_ref[0, 0])
            m_prev = jnp.where(i > 0, one, 0.0 * one)
            m_next = jnp.where(i < n - 1, one, 0.0 * one)
            ip = jnp.maximum(i - 1, 0)
            iq = jnp.minimum(i, n - 2)
            inx = jnp.minimum(i + 1, n - 1)
            x_i = [x_ref[i, b] for b in range(2)]
            x_p = [x_ref[ip, b] * m_prev for b in range(2)]
            x_n = [x_ref[inx, b] * m_next for b in range(2)]
            m_d = [[diag_scr[i, 0], diag_scr[i, 1]],
                   [diag_scr[i, 1], diag_scr[i, 2]]]
            lm = [[upper_scr[ip, 0, 0], upper_scr[ip, 1, 0]],
                  [upper_scr[ip, 0, 1], upper_scr[ip, 1, 1]]]   # U^T
            um = [[upper_scr[iq, 0, 0], upper_scr[iq, 0, 1]],
                  [upper_scr[iq, 1, 0], upper_scr[iq, 1, 1]]]
            for a in range(2):
                acc_s = rhs_ref[i, a]
                acc_c = jnp.zeros_like(acc_s)
                for b in range(2):
                    for mat, vec in ((m_d, x_i), (lm, x_p), (um, x_n)):
                        p, e = _two_prod(-mat[a][b], vec[b])
                        acc_s, e2 = _two_sum(acc_s, p)
                        acc_c = acc_c + e2 + e
                work_ref[i, a] = acc_s + acc_c
            return 0

        jax.lax.fori_loop(0, n, resid_body, 0)
        _subst_b2(n, upper_scr, sinv_scr, work_ref, c_scr)

        def addcorr(i, _):
            for a in range(2):
                x_ref[i, a] = x_ref[i, a] + work_ref[i, a]
            return 0

        jax.lax.fori_loop(0, n, addcorr, 0)


# ---------------------------------------------------------------------------
# Kernel bodies
# ---------------------------------------------------------------------------

def _beam_kernel(refine, explicit_rhs, recover_forces, *refs):
    """FEA kernel: u (+ V, M) + pivot for one slab of scenarios."""
    if explicit_rhs:
        (I_ref, Le_ref, free_ref, rhs_ref, ea_ref, e_ref, *refs) = refs
        load_ref = udl_ref = None
    else:
        (I_ref, Le_ref, free_ref, load_ref, udl_ref, ea_ref, e_ref,
         *refs) = refs
        rhs_ref = None
    if recover_forces:
        u_out, V_out, M_out, piv_out, *refs = refs
    else:
        u_out, piv_out, *refs = refs
    ks_scr, diag_scr, upper_scr, f_scr, s_scr, sinv_scr, c_scr, y_scr = refs

    nelem = I_ref.shape[1]
    n = nelem + 1
    E = e_ref[0, 0]
    EA = ea_ref[0, 0]

    _stage_stiffness(nelem, I_ref, Le_ref, E, EA, ks_scr)
    _stage_assemble(nelem, Le_ref, free_ref, load_ref, udl_ref, rhs_ref,
                    ks_scr, diag_scr, upper_scr, f_scr)
    _stage_scale(n, diag_scr, upper_scr, f_scr, s_scr)
    # factor + forward substitution fused in one serial sweep
    piv_out[0, 0] = _stage_factor(n, diag_scr, upper_scr, sinv_scr, c_scr,
                                  f_scr, y_scr)
    _back_substitute(n, upper_scr, sinv_scr, y_scr, c_scr)
    # refinement work vector: borrow the (n, 3) u output block (overwritten
    # with the real displacements right after)
    _stage_refine(n, refine, diag_scr, upper_scr, sinv_scr, f_scr, y_scr,
                  u_out.at[0], c_scr)

    # unscale displacements
    def unscale(i, _):
        for a in range(3):
            u_out[0, i, a] = y_scr[i, a] * s_scr[i, a]
        return 0

    jax.lax.fori_loop(0, n, unscale, 0)

    if not recover_forces:
        return
    w = udl_ref[0, 0] if udl_ref is not None else jnp.zeros_like(E)

    # element end forces: local p = k_e [u_i; u_j] - f_eq; V = p[1], M = p[2]
    def force_body(j, _):
        k11 = ks_scr[j, 1]
        k12 = ks_scr[j, 2]
        k13 = ks_scr[j, 3]
        k2 = ks_scr[j, 4]
        Le = Le_ref[0, j]
        uy_i = u_out[0, j, 1]
        th_i = u_out[0, j, 2]
        uy_j = u_out[0, j + 1, 1]
        th_j = u_out[0, j + 1, 2]
        V_out[0, j] = (
            k11 * uy_i + k12 * th_i - k11 * uy_j + k12 * th_j
            - w * Le * 0.5
        )
        M_out[0, j] = (
            k12 * uy_i + k13 * th_i - k12 * uy_j + k2 * th_j
            - w * Le * Le / 12.0
        )
        return 0

    jax.lax.fori_loop(0, nelem, force_body, 0)


def _beam_kernel_b2(refine, recover_forces, *refs):
    """Bending-only FEA kernel: u (+ V, M) + pivot for one slab.

    Contract identical to ``_beam_kernel`` with implicit loads (u_x is
    written as exact zero — the module comment above _assemble_b2)."""
    (I_ref, Le_ref, free_ref, load_ref, udl_ref, ea_ref, e_ref,
     *refs) = refs
    if recover_forces:
        u_out, V_out, M_out, piv_out, *refs = refs
    else:
        u_out, piv_out, *refs = refs
    (ks_scr, diag_scr, upper_scr, f_scr, s_scr, sinv_scr, c_scr, y_scr,
     ax_scr) = refs

    nelem = I_ref.shape[1]
    n = nelem + 1
    E = e_ref[0, 0]
    EA = ea_ref[0, 0]

    _stage_stiffness(nelem, I_ref, Le_ref, E, EA, ks_scr)
    _assemble_b2(nelem, Le_ref, free_ref, load_ref, udl_ref,
                 ks_scr, diag_scr, upper_scr, f_scr, ax_scr)
    _scale_b2(n, diag_scr, upper_scr, f_scr, s_scr)
    piv_out[0, 0] = _factor_b2(n, diag_scr, upper_scr, sinv_scr, f_scr,
                               y_scr, c_scr, ax_scr)
    _bsub_b2(n, upper_scr, sinv_scr, y_scr, c_scr)
    # refinement work vector: borrow the (n, 3) u output block (first two
    # components; overwritten with the real displacements right after)
    _refine_b2(n, refine, diag_scr, upper_scr, sinv_scr, f_scr, y_scr,
               u_out.at[0], c_scr)

    zero = y_scr[0, 0] * 0.0

    def unscale(i, _):
        u_out[0, i, 0] = zero                        # u_x == 0 exactly
        u_out[0, i, 1] = y_scr[i, 0] * s_scr[i, 0]
        u_out[0, i, 2] = y_scr[i, 1] * s_scr[i, 1]
        return 0

    jax.lax.fori_loop(0, n, unscale, 0)

    if not recover_forces:
        return
    w = udl_ref[0, 0]

    def force_body(j, _):
        k11 = ks_scr[j, 1]
        k12 = ks_scr[j, 2]
        k13 = ks_scr[j, 3]
        k2 = ks_scr[j, 4]
        Le = Le_ref[0, j]
        uy_i = u_out[0, j, 1]
        th_i = u_out[0, j, 2]
        uy_j = u_out[0, j + 1, 1]
        th_j = u_out[0, j + 1, 2]
        V_out[0, j] = (
            k11 * uy_i + k12 * th_i - k11 * uy_j + k12 * th_j
            - w * Le * 0.5
        )
        M_out[0, j] = (
            k12 * uy_i + k13 * th_i - k12 * uy_j + k2 * th_j
            - w * Le * Le / 12.0
        )
        return 0

    jax.lax.fori_loop(0, nelem, force_body, 0)


def _beam_opt_kernel_b2(refine, grad_semi, G, alpha_m, alpha_s, clamp_min,
                        *refs):
    """One whole Adam iteration on the bending-only chain.

    Semantics identical to ``_beam_opt_kernel`` (loss per
    OpenPyStruct_BeamOpt.py:128-168, semi or exact-adjoint gradient);
    no axial chain at all — nothing here reads the pivot, the loss sees
    only bending quantities, and the adjoint RHS has zero axial component
    by construction."""
    (I_ref, Le_ref, free_ref, load_ref, udl_ref, ea_ref, e_ref,
     mu_ref, nu_ref, hyp_ref,
     I_out, mu_out, nu_out, stats_out,
     ks_scr, diag_scr, upper_scr, f_scr, s_scr, sinv_scr, y_scr, r_scr,
     g_scr, *adj_refs) = refs
    if not grad_semi:
        gv_scr, gm_scr, rthj_scr = adj_refs

    nelem = I_ref.shape[1]
    n = nelem + 1
    E = e_ref[0, 0]
    EA = ea_ref[0, 0]
    w = udl_ref[0, 0]

    # ---- solve at the current I ----------------------------------------
    _stage_stiffness(nelem, I_ref, Le_ref, E, EA, ks_scr)
    _assemble_b2(nelem, Le_ref, free_ref, load_ref, udl_ref,
                 ks_scr, diag_scr, upper_scr, f_scr)
    _scale_b2(n, diag_scr, upper_scr, f_scr, s_scr)
    _factor_b2(n, diag_scr, upper_scr, sinv_scr, f_scr, y_scr)
    _bsub_b2(n, upper_scr, sinv_scr, y_scr)
    _refine_b2(n, refine, diag_scr, upper_scr, sinv_scr, f_scr, y_scr,
               r_scr)

    # ---- forces, loss, explicit dL/dI per element -----------------------
    def u_at(i, a):
        return y_scr[i, a] * s_scr[i, a]

    def loss_body(j, acc):
        tb, ts, ti = acc
        k11 = ks_scr[j, 1]
        k12 = ks_scr[j, 2]
        k13 = ks_scr[j, 3]
        k2 = ks_scr[j, 4]
        Le = Le_ref[0, j]
        I_j = I_ref[0, j]
        uy_i, th_i = u_at(j, 0), u_at(j, 1)
        uy_j, th_j = u_at(j + 1, 0), u_at(j + 1, 1)
        V = (k11 * uy_i + k12 * th_i - k11 * uy_j + k12 * th_j
             - w * Le * 0.5)
        M = (k12 * uy_i + k13 * th_i - k12 * uy_j + k2 * th_j
             - w * Le * Le / 12.0)
        den_b = 2.0 * E * I_j + 1e-6
        den_s = G * (0.03 * jnp.sqrt(I_j))
        be = M * M / den_b
        se = V * V / den_s
        # explicit dL/dI (M, V held constant) — the semi-gradient
        g = (1.0 - alpha_m * be * 2.0 * E / den_b
             - alpha_s * 0.5 * se / I_j)
        if not grad_semi:
            # loss cotangents on the force fields, for the adjoint chain
            gV = alpha_s * 2.0 * V / den_s
            gM = alpha_m * 2.0 * M / den_b
            # direct dV/dI, dM/dI at fixed u (V, M linear in I)
            c1 = E / (Le * Le * Le)
            dV = c1 * (12.0 * (uy_i - uy_j) + 6.0 * Le * (th_i + th_j))
            dM = c1 * Le * (6.0 * (uy_i - uy_j)
                            + Le * (4.0 * th_i + 2.0 * th_j))
            g = g + gV * dV + gM * dM
            gv_scr[j] = gV
            gm_scr[j] = gM
        g_scr[j] = g
        return (tb + be, ts + se, ti + I_j)

    zero = jnp.zeros_like(E)
    tb, ts, ti = jax.lax.fori_loop(
        0, nelem, loss_body, (zero, zero, zero)
    )
    stats_out[0, 0] = ti + alpha_m * tb + alpha_s * ts
    stats_out[0, 1] = ti
    stats_out[0, 2] = alpha_m * tb
    stats_out[0, 3] = alpha_s * ts

    if not grad_semi:
        # ---- adjoint: K lam = g_hat with the saved factors --------------
        dtype = E.dtype

        def ghat_body(i, _):
            has_prev = i > 0
            has_next = i < nelem
            jp = jnp.clip(i - 1, 0, nelem - 1)
            jn = jnp.clip(i, 0, nelem - 1)
            m_p = jnp.where(has_prev, 1.0, 0.0).astype(dtype)
            m_n = jnp.where(has_next, 1.0, 0.0).astype(dtype)
            gV_p, gM_p = gv_scr[jp] * m_p, gm_scr[jp] * m_p
            gV_n, gM_n = gv_scr[jn] * m_n, gm_scr[jn] * m_n
            gy = (gV_n * ks_scr[jn, 1] + gM_n * ks_scr[jn, 2]
                  - gV_p * ks_scr[jp, 1] - gM_p * ks_scr[jp, 2])
            gt = (gV_n * ks_scr[jn, 2] + gM_n * ks_scr[jn, 3]
                  + gV_p * ks_scr[jp, 2] + gM_p * ks_scr[jp, 4])
            f_scr[i, 0] = gy * free_ref[0, i, 1] * s_scr[i, 0]
            f_scr[i, 1] = gt * free_ref[0, i, 2] * s_scr[i, 1]
            return 0

        jax.lax.fori_loop(0, n, ghat_body, 0)

        # gv/gm are consumed; stash the (dK_e/dI_e) u_e row products
        # instead BEFORE the adjoint refinement clobbers y_scr (= u)
        def stash_body(j, _):
            Le = Le_ref[0, j]
            uy_i, th_i = u_at(j, 0), u_at(j, 1)
            uy_j, th_j = u_at(j + 1, 0), u_at(j + 1, 1)
            c1 = E / (Le * Le * Le)
            gv_scr[j] = c1 * (12.0 * (uy_i - uy_j)
                              + 6.0 * Le * (th_i + th_j))       # r_uyi
            gm_scr[j] = c1 * Le * (6.0 * (uy_i - uy_j)
                                   + Le * (4.0 * th_i + 2.0 * th_j))
            rthj_scr[j] = c1 * Le * (6.0 * (uy_i - uy_j)
                                     + Le * (2.0 * th_i + 4.0 * th_j))
            return 0

        jax.lax.fori_loop(0, nelem, stash_body, 0)

        # lam_s solved in place in r_scr (f_scr keeps the rhs for the
        # refinement residual; y_scr becomes the work vector)
        def cp2(i, _):
            r_scr[i, 0] = f_scr[i, 0]
            r_scr[i, 1] = f_scr[i, 1]
            return 0

        jax.lax.fori_loop(0, n, cp2, 0)
        _subst_b2(n, upper_scr, sinv_scr, r_scr)
        _refine_b2(n, refine, diag_scr, upper_scr, sinv_scr, f_scr,
                   r_scr, y_scr)

        # ---- banded products: gI += -lam^T (dK/dI_e) u ------------------
        def adj_body(j, _):
            ly_i = r_scr[j, 0] * s_scr[j, 0]
            lt_i = r_scr[j, 1] * s_scr[j, 1]
            ly_j = r_scr[j + 1, 0] * s_scr[j + 1, 0]
            lt_j = r_scr[j + 1, 1] * s_scr[j + 1, 1]
            g_scr[j] = g_scr[j] - (
                (ly_i - ly_j) * gv_scr[j] + lt_i * gm_scr[j]
                + lt_j * rthj_scr[j]
            )
            return 0

        jax.lax.fori_loop(0, nelem, adj_body, 0)

    # ---- Adam update (torch-identical math) ------------------------------
    lr_t = hyp_ref[0, 0]
    bc1 = hyp_ref[0, 1]
    bc2 = hyp_ref[0, 2]
    b1, b2, eps = 0.9, 0.999, 1e-8

    def adam_body(j, _):
        g = g_scr[j]
        mu = b1 * mu_ref[0, j] + (1.0 - b1) * g
        nu = b2 * nu_ref[0, j] + (1.0 - b2) * g * g
        mu_out[0, j] = mu
        nu_out[0, j] = nu
        step = lr_t * (mu * bc1) / (jnp.sqrt(nu * bc2) + eps)
        I_out[0, j] = jnp.maximum(I_ref[0, j] - step, clamp_min)
        return 0

    jax.lax.fori_loop(0, nelem, adam_body, 0)


# ---------------------------------------------------------------------------
# Host-side launchers
# ---------------------------------------------------------------------------

def _kernel_trace_scope(dtype):
    """Mosaic lowers loop indices as 32-bit regardless of the x64 flag;
    under a *globally enabled* x64 the kernel body's Python int literals
    would lower as i64 and hit 'arith.cmpi requires all operands to have
    the same type'.  Trace float32 kernels with x64 scoped off (a no-op
    when x64 is already off); float64 interpret-mode tracing keeps x64."""
    import contextlib

    if dtype == jnp.float32:
        return jax.enable_x64(False)
    return contextlib.nullcontext()


def _to_slab(x, tail_dims, sub=SUB):
    """(B, d1, ..., dk) -> (T, d1, ..., dk, sub, LANES)."""
    B = x.shape[0]
    tile = sub * LANES
    T = max((B + tile - 1) // tile, 1)
    pad = T * tile - B
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
        )
    x = x.reshape((T, sub, LANES) + x.shape[1:])
    perm = (0,) + tuple(range(3, 3 + tail_dims)) + (1, 2)
    return x.transpose(perm), B, T


def _from_slab(x, B):
    nd = x.ndim
    perm = (0, nd - 2, nd - 1) + tuple(range(1, nd - 2))
    x = x.transpose(perm)
    return x.reshape((-1,) + x.shape[3:])[:B]


def _spec(*block):
    nd = len(block)
    return pl.BlockSpec(
        (1,) + tuple(block),
        lambda t, nd=nd: (t,) + (0,) * nd,
        memory_space=pltpu.VMEM,
    )


def _pad_lane_fixup(I_s, Le_s, free_s, B0, T, sub=SUB):
    """Padded lanes: free everything and set I=1, Le=1 -> well-posed."""
    tile = sub * LANES
    if T * tile > B0:
        lane_ids = jnp.arange(T * tile).reshape(T, sub, LANES)
        padm = (lane_ids >= B0)
        I_s = jnp.where(padm[:, None], 1.0, I_s)
        Le_s = jnp.where(padm[:, None], 1.0, Le_s)
        free_s = jnp.where(padm[:, None, None], 0.0, free_s)
    return I_s, Le_s, free_s


# Slab floats/node for the bending-only kernels (scratch + I/O staging,
# same accounting as the 3-DOF kernels' 61/66): analysis = 27 scratch
# (ks 5, diag 3, upper 4, f 2, s 2, sinv 3, c 4, y 2, ax 2) + ~11 I/O;
# opt-step = 24 scratch + ~18 I/O (+3 adjoint rows when grad_semi=False).
_FLOATS_ANALYSIS_B2 = 38
_FLOATS_OPT_B2 = 42


def _pick_sub_b2(n_nodes: int, floats_per_node: int):
    """Slab depth for the bending-only kernels: their smaller working set
    admits FULL-DEPTH (8, 128) slabs at reference sizes — a shallow slab
    op costs a whole (8, 128) vreg op regardless of depth, so depth 8
    doubles VPU utilization over the 3-DOF kernels' SUB=4 — falling back
    to ``pick_sub``'s 4/2/1 ladder past the VMEM budget."""
    if floats_per_node * n_nodes * 8 * LANES * 4 <= _VMEM_BUDGET:
        return 8
    return pick_sub(n_nodes, floats_per_node)


def _run_kernel(I, Le, free_mask, E, A, refine, interpret,
                point_loads=None, udl=None, rhs=None,
                recover_forces=True):
    """Shared pallas_call launcher for the forward analysis (bending-only
    2x2 kernel) and the explicit-RHS (adjoint) solve (3-DOF kernel: an
    arbitrary RHS may load the axial chain, which the bending-only layout
    drops because the scenario schema cannot express axial loads)."""
    explicit_rhs = rhs is not None
    B, nelem = I.shape
    n = nelem + 1
    dtype = I.dtype
    if explicit_rhs:
        sub = pick_sub(n, 61)   # ~61 slab floats per node live in VMEM
    else:
        sub = _pick_sub_b2(n, _FLOATS_ANALYSIS_B2)
    if sub is None:
        raise ValueError(
            f"mesh of {n} nodes exceeds the fused kernel even at sub=1; "
            "use the split path (solve_beam_batched falls back automatically)"
        )

    I_s, B0, T = _to_slab(I, 1, sub)
    Le_s, _, _ = _to_slab(Le, 1, sub)
    free_s, _, _ = _to_slab(free_mask.astype(dtype), 2, sub)
    I_s, Le_s, free_s = _pad_lane_fixup(I_s, Le_s, free_s, B0, T, sub)

    ea = jnp.full((T, 1, sub, LANES), E * A, dtype)
    ee = jnp.full((T, 1, sub, LANES), E, dtype)

    in_specs = [
        _spec(nelem, sub, LANES),          # I
        _spec(nelem, sub, LANES),          # Le
        _spec(n, 3, sub, LANES),           # free
    ]
    if explicit_rhs:
        rhs_s, _, _ = _to_slab(rhs, 2, sub)
        in_specs += [_spec(n, 3, sub, LANES)]
        inputs = (I_s, Le_s, free_s, rhs_s)
    else:
        load_s, _, _ = _to_slab(point_loads, 1, sub)
        udl_s, _, _ = _to_slab(udl[:, None], 1, sub)
        in_specs += [_spec(n, sub, LANES), _spec(1, sub, LANES)]
        inputs = (I_s, Le_s, free_s, load_s, udl_s)
    in_specs += [_spec(1, sub, LANES), _spec(1, sub, LANES)]   # EA, E
    inputs = inputs + (ea, ee)

    out_specs = [_spec(n, 3, sub, LANES)]                       # u
    out_shape = [jax.ShapeDtypeStruct((T, n, 3, sub, LANES), dtype)]
    if recover_forces:
        out_specs += [_spec(nelem, sub, LANES), _spec(nelem, sub, LANES)]
        out_shape += [
            jax.ShapeDtypeStruct((T, nelem, sub, LANES), dtype),
            jax.ShapeDtypeStruct((T, nelem, sub, LANES), dtype),
        ]
    out_specs += [_spec(1, sub, LANES)]                         # pivot
    out_shape += [jax.ShapeDtypeStruct((T, 1, sub, LANES), dtype)]

    if explicit_rhs:
        scratch_shapes = [
            pltpu.VMEM((nelem, 5, sub, LANES), dtype),   # ks
            pltpu.VMEM((n, 3, 3, sub, LANES), dtype),    # diag
            pltpu.VMEM((n, 3, 3, sub, LANES), dtype),    # upper
            pltpu.VMEM((n, 3, sub, LANES), dtype),       # f
            pltpu.VMEM((n, 3, sub, LANES), dtype),       # s
            pltpu.VMEM((n, 3, 3, sub, LANES), dtype),    # sinv
            pltpu.VMEM((n, 3, 3, sub, LANES), dtype),    # c
            pltpu.VMEM((n, 3, sub, LANES), dtype),       # y
        ]
        kernel = functools.partial(_beam_kernel, refine, explicit_rhs,
                                   recover_forces)
    else:
        scratch_shapes = [
            pltpu.VMEM((nelem, 5, sub, LANES), dtype),   # ks
            pltpu.VMEM((n, 3, sub, LANES), dtype),       # diag (sym 2x2)
            pltpu.VMEM((n, 2, 2, sub, LANES), dtype),    # upper
            pltpu.VMEM((n, 2, sub, LANES), dtype),       # f
            pltpu.VMEM((n, 2, sub, LANES), dtype),       # s
            pltpu.VMEM((n, 3, sub, LANES), dtype),       # sinv (sym)
            pltpu.VMEM((n, 2, 2, sub, LANES), dtype),    # c
            pltpu.VMEM((n, 2, sub, LANES), dtype),       # y
            pltpu.VMEM((n, 2, sub, LANES), dtype),       # axial d00/u00
        ]
        kernel = functools.partial(_beam_kernel_b2, refine, recover_forces)

    grid_spec = pl.GridSpec(
        grid=(T,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )
    with _kernel_trace_scope(dtype):
        outs = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid_spec=grid_spec,
            interpret=interpret,
        )(*inputs)
    if recover_forces:
        u_s, V_s, M_s, piv_s = outs
        return (
            _from_slab(u_s, B0),
            _from_slab(V_s, B0),
            _from_slab(M_s, B0),
            _from_slab(piv_s, B0)[:, 0],
        )
    u_s, piv_s = outs
    return _from_slab(u_s, B0), _from_slab(piv_s, B0)[:, 0]


@functools.partial(
    jax.jit, static_argnames=("E", "A", "refine", "interpret")
)
def pallas_beam_solve(I, Le, free_mask, rhs, E: float, A: float,
                      refine: int = 1, interpret: bool = False):
    """Fused assembly + solve of K(I) x = rhs for an explicit (B, n, 3)
    right-hand side (constrained DOFs are projected out).  This is the
    primitive the adjoint pass rides — K is symmetric, so the backward
    system is the same operator with the output cotangent as RHS.

    Returns (x (B, n, 3), pivot (B,)).
    """
    return _run_kernel(I, Le, free_mask, E, A, refine, interpret,
                       rhs=rhs, recover_forces=False)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _analysis(I, Le, free_mask, point_loads, udl, E, A, refine, interpret):
    return _run_kernel(I, Le, free_mask, E, A, refine, interpret,
                       point_loads=point_loads, udl=udl)


def _analysis_fwd(I, Le, free_mask, point_loads, udl, E, A, refine,
                  interpret):
    out = _analysis(I, Le, free_mask, point_loads, udl, E, A, refine,
                    interpret)
    u = out[0]
    return out, (I, Le, free_mask, udl, u)


def _analysis_bwd(E, A, refine, interpret, res, cts):
    """Analytic reverse pass at fused-kernel speed.

    With K(I) u = f(udl, loads) and the end forces (V, M) linear in the
    element displacements with I-linear coefficients, the chain is:

      g_hat  = gu + (dV/du)^T gV + (dM/du)^T gM        (banded scatter)
      lam    = K^{-1} g_hat                            (one fused solve;
                                                        K is symmetric)
      gI_e   = -lam_e^T (dK_e/dI_e) u_e  +  gV dV/dI + gM dM/dI
      gloads = lam[:, :, 1]
      gudl   = lam . df/dw + direct -wLe/2, -wLe^2/12 recovery terms

    which is the split-path adjoint of fem/solve.py:161-173 specialized to
    the chain mesh and executed entirely on the fused kernel's bandwidth.
    """
    I, Le, free_mask, udl, u = res
    gu, gV, gM, _gpiv = cts
    dtype = I.dtype

    k11 = 12.0 * E * I / Le**3
    k12 = 6.0 * E * I / Le**2
    k13 = 4.0 * E * I / Le
    k2 = 2.0 * E * I / Le

    # (dV/du)^T gV + (dM/du)^T gM scattered onto the nodal cotangent
    g_hat = jnp.asarray(gu, dtype)
    g_hat = g_hat.at[:, :-1, 1].add(gV * k11 + gM * k12)
    g_hat = g_hat.at[:, :-1, 2].add(gV * k12 + gM * k13)
    g_hat = g_hat.at[:, 1:, 1].add(-gV * k11 - gM * k12)
    g_hat = g_hat.at[:, 1:, 2].add(gV * k12 + gM * k2)
    g_hat = g_hat * free_mask.astype(dtype)

    lam, _ = pallas_beam_solve(I, Le, free_mask, g_hat, E, A,
                               refine=refine, interpret=interpret)

    uy_i, th_i = u[:, :-1, 1], u[:, :-1, 2]
    uy_j, th_j = u[:, 1:, 1], u[:, 1:, 2]
    ly_i, lt_i = lam[:, :-1, 1], lam[:, :-1, 2]
    ly_j, lt_j = lam[:, 1:, 1], lam[:, 1:, 2]

    # (dK_e/dI_e) u_e rows (bending block per unit I): E/Le^3 *
    # [[12, 6L, -12, 6L], [6L, 4L^2, -6L, 2L^2],
    #  [-12, -6L, 12, -6L], [6L, 2L^2, -6L, 4L^2]]
    c1 = E / Le**3
    r_uyi = c1 * (12.0 * (uy_i - uy_j) + 6.0 * Le * (th_i + th_j))
    r_thi = c1 * Le * (6.0 * (uy_i - uy_j)
                       + Le * (4.0 * th_i + 2.0 * th_j))
    r_thj = c1 * Le * (6.0 * (uy_i - uy_j)
                       + Le * (2.0 * th_i + 4.0 * th_j))
    gI_K = -(ly_i * r_uyi - ly_j * r_uyi + lt_i * r_thi + lt_j * r_thj)

    # direct dV/dI, dM/dI of the force recovery (V, M linear in I at
    # fixed u; the -w terms are I-independent)
    gI = gI_K + gV * r_uyi + gM * r_thi

    # RHS cotangents: f[i,1] += loads[i] (lam is already zero at
    # constrained DOFs, so no extra masking needed)
    gloads = lam[..., 1]

    # udl: consistent-load terms on the RHS + the -w Le/2, -w Le^2/12
    # constants inside the force recovery
    zcol = jnp.zeros(Le.shape[:-1] + (1,), dtype)
    Le_p = jnp.concatenate([zcol, Le], axis=-1)          # Le_{i-1}
    Le_n = jnp.concatenate([Le, zcol], axis=-1)          # Le_i
    gudl = (
        jnp.sum(lam[..., 1] * (Le_p + Le_n) * 0.5, axis=-1)
        + jnp.sum(lam[..., 2] * (Le_n**2 - Le_p**2) / 12.0, axis=-1)
        - jnp.sum(gV * Le * 0.5 + gM * Le**2 / 12.0, axis=-1)
    )

    # Le and the constraint mask are structural inputs, never optimized.
    return gI, jnp.zeros_like(Le), jnp.zeros_like(free_mask), gloads, gudl


_analysis.defvjp(_analysis_fwd, _analysis_bwd)


@functools.partial(
    jax.jit, static_argnames=("E", "A", "refine", "interpret")
)
def pallas_beam_analysis(I, Le, free_mask, point_loads, udl,
                         E: float, A: float, refine: int = 1,
                         interpret: bool = False):
    """Fused batched beam FEA, differentiable in I, loads and udl.

    Args:
      I: (B, nelem) moments of inertia.
      Le: (B, nelem) element lengths.
      free_mask: (B, n, 3) float 0/1 — 1 where the DOF is free.
      point_loads: (B, n) nodal Fy.
      udl: (B,) uniform load per scenario.
      E, A: material constants (static).
      refine: compensated-refinement sweeps (static unroll).

    Returns (u (B, n, 3), V (B, nelem), M (B, nelem), pivot (B,)) where
    ``pivot`` is the minimum Schur-pivot determinant of the Jacobi-scaled
    factorization — the singularity diagnostic of
    ``fem.solve.block_tridiag_min_pivot``, captured for free during the
    forward sweep (so datagen needs no separate factorization pass).

    Reverse-mode differentiation runs the analytic implicit adjoint (one
    more fused solve + banded products; see ``_analysis_bwd``), so adjoint
    -mode optimization runs at fused-kernel speed — the exact d(u,V,M)/dI
    the reference never computes (OpenPyStruct_BeamOpt.py:150-151).
    """
    return _analysis(I, Le, free_mask, point_loads, udl, E, A, refine,
                     interpret)


@functools.partial(
    jax.jit,
    static_argnames=("E", "A", "G", "alpha_m", "alpha_s", "clamp_min",
                     "grad_semi", "refine", "interpret"),
)
def pallas_beam_opt_step(I, mu, nu, Le, free_mask, point_loads, udl,
                         lr_t, bc1, bc2,
                         E: float, A: float, G: float,
                         alpha_m: float = 1e-2, alpha_s: float = 1e-2,
                         clamp_min: float = 1e-8, grad_semi: bool = True,
                         refine: int = 1, interpret: bool = False):
    """One fused optimizer iteration for the whole batch.

    Solve + combined loss + its gradient (semi or exact adjoint) + Adam
    update + clamp, entirely in VMEM; HBM sees only the (B, nelem) state
    arrays and (B, 4) loss stats per iteration — no displacement or force
    fields.  ``lr_t``/``bc1``/``bc2`` are the per-epoch learning rate and
    Adam bias corrections 1/(1-b1^t), 1/(1-b2^t) (scalars).

    Returns (I_new, mu_new, nu_new, stats (B, 4): total, primary,
    bending_energy, shear_energy).
    """
    B, nelem = I.shape
    n = nelem + 1
    dtype = I.dtype
    sub = _pick_sub_b2(n, _FLOATS_OPT_B2 + (0 if grad_semi else 3))
    if sub is None:
        raise ValueError(
            f"mesh of {n} nodes exceeds the fused opt-step kernel even at "
            "sub=1; use the split path (fused=False)"
        )

    I_s, B0, T = _to_slab(I, 1, sub)
    mu_s, _, _ = _to_slab(mu, 1, sub)
    nu_s, _, _ = _to_slab(nu, 1, sub)
    Le_s, _, _ = _to_slab(Le, 1, sub)
    free_s, _, _ = _to_slab(free_mask.astype(dtype), 2, sub)
    load_s, _, _ = _to_slab(point_loads, 1, sub)
    udl_s, _, _ = _to_slab(udl[:, None], 1, sub)
    I_s, Le_s, free_s = _pad_lane_fixup(I_s, Le_s, free_s, B0, T, sub)

    ea = jnp.full((T, 1, sub, LANES), E * A, dtype)
    ee = jnp.full((T, 1, sub, LANES), E, dtype)
    hyp = jnp.broadcast_to(
        jnp.stack([
            jnp.asarray(lr_t, dtype), jnp.asarray(bc1, dtype),
            jnp.asarray(bc2, dtype),
        ]).reshape(1, 3, 1, 1),
        (T, 3, sub, LANES),
    )

    grid_spec = pl.GridSpec(
        grid=(T,),
        in_specs=[
            _spec(nelem, sub, LANES),    # I
            _spec(nelem, sub, LANES),    # Le
            _spec(n, 3, sub, LANES),     # free
            _spec(n, sub, LANES),        # loads
            _spec(1, sub, LANES),        # udl
            _spec(1, sub, LANES),        # EA
            _spec(1, sub, LANES),        # E
            _spec(nelem, sub, LANES),    # mu
            _spec(nelem, sub, LANES),    # nu
            _spec(3, sub, LANES),        # hyp
        ],
        out_specs=[
            _spec(nelem, sub, LANES),    # I_new
            _spec(nelem, sub, LANES),    # mu_new
            _spec(nelem, sub, LANES),    # nu_new
            _spec(4, sub, LANES),        # stats
        ],
        scratch_shapes=[
            pltpu.VMEM((nelem, 5, sub, LANES), dtype),   # ks
            pltpu.VMEM((n, 3, sub, LANES), dtype),       # diag (sym 2x2)
            pltpu.VMEM((n, 2, 2, sub, LANES), dtype),    # upper
            pltpu.VMEM((n, 2, sub, LANES), dtype),       # f
            pltpu.VMEM((n, 2, sub, LANES), dtype),       # s
            pltpu.VMEM((n, 3, sub, LANES), dtype),       # sinv (sym)
            pltpu.VMEM((n, 2, sub, LANES), dtype),       # y (u, scaled)
            pltpu.VMEM((n, 2, sub, LANES), dtype),       # r (work / lam)
            pltpu.VMEM((nelem, sub, LANES), dtype),      # g
        ] + ([] if grad_semi else [
            pltpu.VMEM((nelem, sub, LANES), dtype),      # gV / r_uyi
            pltpu.VMEM((nelem, sub, LANES), dtype),      # gM / r_thi
            pltpu.VMEM((nelem, sub, LANES), dtype),      # r_thj
        ]),
    )
    with _kernel_trace_scope(dtype):
        I_o, mu_o, nu_o, stats_s = pl.pallas_call(
            functools.partial(_beam_opt_kernel_b2, refine, grad_semi, G,
                              alpha_m, alpha_s, clamp_min),
            out_shape=[
                jax.ShapeDtypeStruct((T, nelem, sub, LANES), dtype),
                jax.ShapeDtypeStruct((T, nelem, sub, LANES), dtype),
                jax.ShapeDtypeStruct((T, nelem, sub, LANES), dtype),
                jax.ShapeDtypeStruct((T, 4, sub, LANES), dtype),
            ],
            grid_spec=grid_spec,
            interpret=interpret,
        )(I_s, Le_s, free_s, load_s, udl_s, ea, ee, mu_s, nu_s, hyp)
    return (
        _from_slab(I_o, B0),
        _from_slab(mu_o, B0),
        _from_slab(nu_o, B0),
        _from_slab(stats_s, B0),
    )

"""Double-double (two-float) fused beam kernels: the random-bridge rescue
ON the TPU.

Random-bridge scenarios are frequently so ill-conditioned (one roller near
the pin plus the 1e-8 I clamp -> ~5e7 stiffness contrast,
OpenPyStruct_BeamOpt_training_MultiCore.py:137-162 + the clamp at :219)
that a float32 factorization keeps no correct digits (cond * eps_f32 ~ 6)
and compensated refinement cannot converge.  The reference never notices
because torch/OpenSees run float64 end-to-end.  Round 2 closed the
distribution gap by re-optimizing pivot-rejected lanes in float64 on the
host CPU — correct, but ~78 s per 4096-lane batch on one core while the
TPU idles.

These kernels run the SAME fused pipeline (assembly -> BC -> Jacobi scale
-> block-Thomas -> substitution -> forces -> loss/gradient -> Adam) with
every solve-space quantity held as an unevaluated float32 sum hi + lo
(~48-bit mantissa; ops/dd.py), entirely on the float32 VPU datapath.  At
cond * eps_dd ~ 2e-7 this is the same numerical regime the f64 reference
occupies, so rescued lanes stay on-chip at kernel speed instead of
detouring through the host.

Implementation: the stage functions in ops/beam_kernel.py are
precision-polymorphic — this module hands them ``RefPair`` (hi/lo VMEM
scratch pairs) and ``LiftRef`` (float32 inputs lifted on read) and DD
material scalars, so the factorization code is literally the same source
as the float32 production kernel.  No refinement stage: dd forward error
is already below float32 representation.  Adam runs in plain float32 on
the dd-accurate collapsed gradient (the trajectory acceptance is
statistical, and loss magnitudes sit ~9 decades above f32 eps).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openpystruct_tpu.ops.block_tridiag import LANES, pick_sub, _inv2_sym
from openpystruct_tpu.ops.beam_kernel import (
    _axial_pivot_step,
    _kernel_trace_scope,
    _pad_lane_fixup,
    _spec,
    _stage_stiffness,
    _to_slab,
    _from_slab,
)
from openpystruct_tpu.ops.dd import (
    DD,
    CollapseRef,
    LiftRef,
    RefPair,
    absval,
    collapse,
    dd_rsqrt,
    dd_sqrt,
    dd_where,
)

# dd-slab floats per node for pick_sub.  The dd kernels' SCOPED stack
# allocation is the scratch (the v5e compiler counts it against a 16M
# scoped-vmem limit); pick_sub's 20M budget constant is calibrated on
# the f32 kernels' looser accounting, so these counts are inflated by
# 20/16 over the real floats/node.
#
# Round-4 layout (bending-only 2x2 blocks, see _stage_assemble_b2):
# hi/lo pairs for ks (10/elem), symmetric 2x2 diag-then-Sinv in place
# (6), 2x2 upper (8), ONE shared pair for rhs/solution (4; the fused
# forward substitution consumes rhs[i] exactly when y[i] is produced),
# plus plain-f32 Jacobi scale (2), axial chain rows (2) and the opt
# kernel's gradient row (1) — ~32-33 real floats/node + compiler
# temporaries.  The r3 3x3 layout measured ~6 floats/node of staging
# overhead beyond the declared scratch, so the constants carry ~8 of
# headroom: real ~41 * 20/16 ~= 52.
_FLOATS_ANALYSIS = 52
_FLOATS_OPT = 54


def fits_dd(n_nodes: int) -> bool:
    """Whether the dd opt-step kernel fits VMEM at this mesh size."""
    return pick_sub(n_nodes, _FLOATS_OPT) is not None


# ---------------------------------------------------------------------------
# Bending-only (2-DOF) dd pipeline.
#
# The straight-beam 3-DOF system is block-diagonal per DOF class: the
# axial DOF u_x couples only to u_x (elasticBeamColumn with a Linear
# transform on a straight chain; see the zero off-entries written by
# ops/beam_kernel.py:_stage_assemble), and its RHS is identically zero —
# the scenario schema has no x-direction loads (OpenPyStruct_BeamOpt.py:
# 112-119 applies vertical point loads and '-beamUniform' only).  So
# u_x == 0 exactly, and the bending (w, theta) 2x2 block-tridiagonal
# chain carries the entire solution.  Factoring 2x2 blocks instead of
# 3x3 cuts the dd multiply count per node ~4x (27 vs ~115) and roughly
# halves the register working set — double-double arithmetic pays ~20
# f32 ops per multiply, so this is where the rescue's wall-clock lives.
#
# The Schur-pivot diagnostic keeps its 3-DOF semantics: for the
# block-diagonal system det3(S_i) = a_i * det2(S_i) with a_i the axial
# scalar Schur pivot, which is O(1) after Jacobi scaling — it is tracked
# in plain f32 alongside the dd bending factorization, so validity
# thresholds (datagen RESCUE_PIVOT_TOL, accuracy certification) stay
# calibrated identically to the f64 3-DOF reference values.
# ---------------------------------------------------------------------------


def _dd_scratch(n, nelem, sub, dtype):
    """Scratch for the bending-only dd pipeline: hi/lo pairs for
    ks / sym-2x2 diag (rewritten as Sinv in place) / 2x2 upper / rhs-y,
    plus plain f32 Jacobi scale and axial-chain rows."""
    pairs = [
        (nelem, 5, sub, LANES),   # ks
        (n, 3, sub, LANES),       # diag sym [d_ww, d_wt, d_tt] -> Sinv
        (n, 2, 2, sub, LANES),    # upper (bending 2x2)
        (n, 2, sub, LANES),       # f / y (aliased: fused fwd subst)
    ]
    out = []
    for s in pairs:
        out += [pltpu.VMEM(s, dtype), pltpu.VMEM(s, dtype)]
    out.append(pltpu.VMEM((n, 2, sub, LANES), dtype))   # s (plain f32)
    out.append(pltpu.VMEM((n, 2, sub, LANES), dtype))   # axial d00,u00
    return out


def _pair_up(scr):
    """[h0, l0, ..., s_plain, ax_plain] -> [RefPair..., CollapseRef, ref]."""
    pairs = [RefPair(scr[i], scr[i + 1]) for i in range(0, len(scr) - 2, 2)]
    return pairs + [CollapseRef(scr[-2]), scr[-1]]


def _stage_assemble_b2(nelem, Le_ref, free_ref, load_ref, udl_ref,
                       ks, diag, upper, fy, ax_ref):
    """Masked bending-only assembly (2 DOF/node: w, theta) + RHS, with
    the axial chain's diag/upper written unscaled to ``ax_ref`` in plain
    f32 for the pivot diagnostic.  Same masked-BC scheme as the 3-DOF
    ops/beam_kernel.py:_stage_assemble: constrained rows/cols zeroed,
    original diagonal entry restored on the diagonal."""
    n = nelem + 1
    zero = ks[0, 0] * 0.0

    w = udl_ref[0, 0]

    def body(i, _):
        has_prev = i > 0
        has_next = i < nelem

        def ks_of(j, active):
            jj = jnp.clip(j, 0, nelem - 1)
            m = jnp.where(active, 1.0, 0.0).astype(free_ref.dtype)
            return [ks[jj, k] * m for k in range(5)]

        ea_p, k11_p, k12_p, k13_p, _k2p = ks_of(i - 1, has_prev)
        ea_n, k11_n, k12_n, k13_n, k2_n = ks_of(i, has_next)

        d11 = k11_p + k11_n
        d12 = -k12_p + k12_n
        d22 = k13_p + k13_n

        f0 = free_ref[0, i, 0]
        f1 = free_ref[0, i, 1]
        f2 = free_ref[0, i, 2]

        diag[i, 0] = d11 * (f1 * f1 + (1.0 - f1))
        diag[i, 1] = d12 * (f1 * f2)
        diag[i, 2] = d22 * (f2 * f2 + (1.0 - f2))

        inx = jnp.clip(i + 1, 0, n - 1)
        fn0 = free_ref[0, inx, 0]
        fn1 = free_ref[0, inx, 1]
        fn2 = free_ref[0, inx, 2]
        upper[i, 0, 0] = -(k11_n * (f1 * fn1))
        upper[i, 0, 1] = k12_n * (f1 * fn2)
        upper[i, 1, 0] = -(k12_n * (f2 * fn1))
        upper[i, 1, 1] = k2_n * (f2 * fn2)

        # consistent UDL loads + nodal point loads (no axial RHS exists)
        Le_p = dd_where(has_prev, Le_ref[0, jnp.clip(i - 1, 0, nelem - 1)],
                        zero)
        Le_n = dd_where(has_next, Le_ref[0, jnp.clip(i, 0, nelem - 1)],
                        zero)
        fyv = (Le_p + Le_n) * w * 0.5 + load_ref[0, i]
        fm = (Le_n * Le_n - Le_p * Le_p) * w / 12.0
        fy[i, 0] = fyv * f1
        fy[i, 1] = fm * f2

        # axial chain (plain f32, unscaled; pivot parity with 3-DOF)
        d00 = collapse(ea_p + ea_n)
        ax_ref[i, 0] = d00 * (f0 * f0 + (1.0 - f0))
        ax_ref[i, 1] = -collapse(ea_n) * (f0 * fn0)
        return 0

    jax.lax.fori_loop(0, n, body, 0)


def _stage_scale_b2(n, diag, upper, fy, s):
    """Jacobi scaling of the bending system; s stored collapsed f32
    (consistency, not precision — any fixed S gives an exactly
    equivalent scaled system)."""

    def body(i, _):
        s[i, 0] = dd_rsqrt(diag[i, 0])
        s[i, 1] = dd_rsqrt(diag[i, 2])
        s1, s2 = s[i, 0], s[i, 1]   # lifted exact f32
        diag[i, 0] = diag[i, 0] * s1 * s1
        diag[i, 1] = diag[i, 1] * s1 * s2
        diag[i, 2] = diag[i, 2] * s2 * s2
        fy[i, 0] = fy[i, 0] * s1
        fy[i, 1] = fy[i, 1] * s2
        return 0

    jax.lax.fori_loop(0, n, body, 0)

    def body_u(i, _):
        si = (s[i, 0], s[i, 1])
        sn = (s[i + 1, 0], s[i + 1, 1])
        for a in range(2):
            for b in range(2):
                upper[i, a, b] = upper[i, a, b] * si[a] * sn[b]
        return 0

    jax.lax.fori_loop(0, n - 1, body_u, 0)


def _stage_factor_b2(n, diag, upper, fy, ax_ref):
    """Block-Thomas factorization of the bending 2x2 chain with FUSED
    forward substitution (y overwrites rhs in place); ``diag`` is
    rewritten as the Schur INVERSES (D_i is dead once Sinv_i exists —
    dd has no refinement stage needing the original blocks).  Returns
    the min 3-DOF-equivalent pivot a_i * |det2(S_i)| as an f32 slab."""
    d0, d1, d2 = diag[0, 0], diag[0, 1], diag[0, 2]
    i0, i1, i2, det0 = _inv2_sym(d0, d1, d2)
    diag[0, 0] = i0
    diag[0, 1] = i1
    diag[0, 2] = i2
    r0, r1 = fy[0, 0], fy[0, 1]
    fy[0, 0] = i0 * r0 + i1 * r1
    fy[0, 1] = i1 * r0 + i2 * r1
    a0 = ax_ref[0, 0] * jax.lax.rsqrt(ax_ref[0, 0]) ** 2
    piv0 = a0 * absval(det0)

    def fwd(i, carry):
        min_piv, a_prev = carry
        u00 = upper[i - 1, 0, 0]
        u01 = upper[i - 1, 0, 1]
        u10 = upper[i - 1, 1, 0]
        u11 = upper[i - 1, 1, 1]
        s00 = diag[i - 1, 0]
        s01 = diag[i - 1, 1]
        s11 = diag[i - 1, 2]
        # W = Sinv_{i-1} U_{i-1}
        w00 = s00 * u00 + s01 * u10
        w01 = s00 * u01 + s01 * u11
        w10 = s01 * u00 + s11 * u10
        w11 = s01 * u01 + s11 * u11
        # S_i = D_i - U^T W (symmetric)
        S0 = diag[i, 0] - (u00 * w00 + u10 * w10)
        S1 = diag[i, 1] - (u00 * w01 + u10 * w11)
        S2 = diag[i, 2] - (u01 * w01 + u11 * w11)
        i0_, i1_, i2_, det = _inv2_sym(S0, S1, S2)
        diag[i, 0] = i0_
        diag[i, 1] = i1_
        diag[i, 2] = i2_
        # fused forward substitution: y_i = Sinv_i (f_i - U^T y_{i-1})
        yp0, yp1 = fy[i - 1, 0], fy[i - 1, 1]
        r0_ = fy[i, 0] - (u00 * yp0 + u10 * yp1)
        r1_ = fy[i, 1] - (u01 * yp0 + u11 * yp1)
        fy[i, 0] = i0_ * r0_ + i1_ * r1_
        fy[i, 1] = i1_ * r0_ + i2_ * r1_

        a_i = _axial_pivot_step(ax_ref, i, a_prev)
        return (jnp.minimum(min_piv, a_i * absval(det)), a_i)

    min_piv, _ = jax.lax.fori_loop(1, n, fwd, (piv0, a0))
    return min_piv


def _back_substitute_b2(n, upper, diag, fy):
    """x_i = y_i - Sinv_i (U_i x_{i+1}) in place (y in fy on entry;
    ``diag`` holds the Schur inverses after _stage_factor_b2)."""

    def bwd(k, _):
        i = n - 2 - k
        x0, x1 = fy[i + 1, 0], fy[i + 1, 1]
        v0 = upper[i, 0, 0] * x0 + upper[i, 0, 1] * x1
        v1 = upper[i, 1, 0] * x0 + upper[i, 1, 1] * x1
        s00, s01, s11 = diag[i, 0], diag[i, 1], diag[i, 2]
        fy[i, 0] = fy[i, 0] - (s00 * v0 + s01 * v1)
        fy[i, 1] = fy[i, 1] - (s01 * v0 + s11 * v1)
        return 0

    jax.lax.fori_loop(0, n - 1, bwd, 0)


def _dd_solve_stages(I_ref, Le_ref, free_ref, load_ref, udl_ref,
                     ea_ref, e_ref, scr):
    """dd pipeline: stiffness -> bending-only assembly -> scale ->
    factor with fused forward substitution -> back substitution.
    Returns (ks, s, y, pivot f32 slab, nelem); y/s are 2-component
    (w, theta) — u_x is identically zero (module comment above)."""
    ks, diag, upper, fy, s, ax = _pair_up(scr)
    nelem = I_ref.shape[1]
    n = nelem + 1
    E = DD.lift(e_ref[0, 0])
    EA = DD.lift(ea_ref[0, 0])

    _stage_stiffness(nelem, LiftRef(I_ref), LiftRef(Le_ref), E, EA, ks)
    _stage_assemble_b2(nelem, LiftRef(Le_ref), free_ref, load_ref,
                       udl_ref, ks, diag, upper, fy, ax)
    _stage_scale_b2(n, diag, upper, fy, s)
    piv = _stage_factor_b2(n, diag, upper, fy, ax)
    _back_substitute_b2(n, upper, diag, fy)
    return ks, s, fy, piv, nelem


def _dd_u(y, s, i, a):
    """Unscaled displacement component a in {0: w, 1: theta} as DD."""
    return y[i, a] * s[i, a]


def _dd_VM(ks, Le_ref, y, s, w, j):
    """Element end forces (V, M) as DD at element j (w: plain f32 udl)."""
    k11, k12, k13, k2 = ks[j, 1], ks[j, 2], ks[j, 3], ks[j, 4]
    Le = DD.lift(Le_ref[0, j])
    uy_i, th_i = _dd_u(y, s, j, 0), _dd_u(y, s, j, 1)
    uy_j, th_j = _dd_u(y, s, j + 1, 0), _dd_u(y, s, j + 1, 1)
    V = (k11 * uy_i + k12 * th_i - k11 * uy_j + k12 * th_j
         - Le * w * 0.5)
    M = (k12 * uy_i + k13 * th_i - k12 * uy_j + k2 * th_j
         - Le * Le * w / 12.0)
    return V, M


def _beam_dd_kernel(recover_forces, *refs):
    """dd FEA: u (+ V, M) + pivot for one slab of scenarios."""
    (I_ref, Le_ref, free_ref, load_ref, udl_ref, ea_ref, e_ref,
     *refs) = refs
    if recover_forces:
        u_out, V_out, M_out, piv_out, *scr = refs
    else:
        u_out, piv_out, *scr = refs

    ks, s, y, piv, nelem = _dd_solve_stages(
        I_ref, Le_ref, free_ref, load_ref, udl_ref, ea_ref, e_ref, scr
    )
    n = nelem + 1
    piv_out[0, 0] = piv

    zero = collapse(y[0, 0]) * 0.0

    def unscale(i, _):
        # u_x is identically zero in the bending-only formulation
        u_out[0, i, 0] = zero
        u_out[0, i, 1] = collapse(_dd_u(y, s, i, 0))
        u_out[0, i, 2] = collapse(_dd_u(y, s, i, 1))
        return 0

    jax.lax.fori_loop(0, n, unscale, 0)

    if not recover_forces:
        return
    w = udl_ref[0, 0]

    def force_body(j, _):
        V, M = _dd_VM(ks, Le_ref, y, s, w, j)
        V_out[0, j] = collapse(V)
        M_out[0, j] = collapse(M)
        return 0

    jax.lax.fori_loop(0, nelem, force_body, 0)


def _beam_dd_opt_kernel(G, alpha_m, alpha_s, clamp_min, *refs):
    """One whole semi-gradient Adam iteration in dd arithmetic.

    Loss semantics identical to ops/beam_kernel.py:_beam_opt_kernel
    (OpenPyStruct_BeamOpt.py:128-168): sum(I) + alpha_m sum(M^2/(2EI+1e-6))
    + alpha_s sum(V^2/(G 0.03 sqrt(I))), M and V constants per iteration.
    """
    (I_ref, Le_ref, free_ref, load_ref, udl_ref, ea_ref, e_ref,
     mu_ref, nu_ref, hyp_ref,
     I_out, mu_out, nu_out, stats_out, piv_out,
     g_scr, *scr) = refs

    ks, s, y, piv, nelem = _dd_solve_stages(
        I_ref, Le_ref, free_ref, load_ref, udl_ref, ea_ref, e_ref, scr
    )
    piv_out[0, 0] = piv
    E = DD.lift(e_ref[0, 0])
    w = udl_ref[0, 0]
    zero = jnp.zeros_like(w)

    def loss_body(j, acc):
        tb, ts, ti = acc
        I_j = DD.lift(I_ref[0, j])
        V, M = _dd_VM(ks, Le_ref, y, s, w, j)
        den_b = E * I_j * 2.0 + 1e-6
        den_s = dd_sqrt(I_j) * 0.03 * G
        be = M * M / den_b
        se = V * V / den_s
        # explicit dL/dI with M, V held constant — the semi-gradient
        g = 1.0 - be * (2.0 * alpha_m) * E / den_b \
            - se * (0.5 * alpha_s) / I_j
        g_scr[j] = collapse(g)
        return (tb + be, ts + se, ti + I_j)

    zdd = DD(zero, zero)
    tb, ts, ti = jax.lax.fori_loop(0, nelem, loss_body, (zdd, zdd, zdd))
    stats_out[0, 0] = collapse(ti + tb * alpha_m + ts * alpha_s)
    stats_out[0, 1] = collapse(ti)
    stats_out[0, 2] = collapse(tb * alpha_m)
    stats_out[0, 3] = collapse(ts * alpha_s)

    # Adam update: torch-identical float32 math on the dd-accurate gradient
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
# Host-side launchers (plumbing mirrors ops/beam_kernel.py)
# ---------------------------------------------------------------------------


def _common_slabs(I, Le, free_mask, point_loads, udl, E, A, sub):
    dtype = I.dtype
    I_s, B0, T = _to_slab(I, 1, sub)
    Le_s, _, _ = _to_slab(Le, 1, sub)
    free_s, _, _ = _to_slab(free_mask.astype(dtype), 2, sub)
    load_s, _, _ = _to_slab(point_loads, 1, sub)
    udl_s, _, _ = _to_slab(udl[:, None], 1, sub)
    I_s, Le_s, free_s = _pad_lane_fixup(I_s, Le_s, free_s, B0, T, sub)
    ea = jnp.full((T, 1, sub, LANES), E * A, dtype)
    ee = jnp.full((T, 1, sub, LANES), E, dtype)
    return (I_s, Le_s, free_s, load_s, udl_s, ea, ee), B0, T


@functools.partial(
    jax.jit, static_argnames=("E", "A", "interpret", "sub")
)
def pallas_beam_analysis_dd(I, Le, free_mask, point_loads, udl,
                            E: float, A: float, interpret: bool = False,
                            sub=None):
    """Fused batched beam FEA in double-double arithmetic.

    Same contract as ``pallas_beam_analysis`` (u, V, M, pivot — all
    float32, the dd internals collapse at the boundary) minus the custom
    VJP: the dd path serves the semi-gradient rescue, which never
    differentiates through the solve.  ``pivot`` is the min Schur-pivot
    determinant computed in dd — trustworthy down to ~1e-13, where the
    float32 kernel's bottoms out at ~1e-10 noise.
    """
    B, nelem = I.shape
    n = nelem + 1
    dtype = I.dtype
    if sub is None:
        sub = pick_sub(n, _FLOATS_ANALYSIS)
    if sub is None:
        raise ValueError(
            f"mesh of {n} nodes exceeds the dd kernel even at sub=1"
        )
    inputs, B0, T = _common_slabs(I, Le, free_mask, point_loads, udl,
                                  E, A, sub)
    grid_spec = pl.GridSpec(
        grid=(T,),
        in_specs=[
            _spec(nelem, sub, LANES),      # I
            _spec(nelem, sub, LANES),      # Le
            _spec(n, 3, sub, LANES),       # free
            _spec(n, sub, LANES),          # loads
            _spec(1, sub, LANES),          # udl
            _spec(1, sub, LANES),          # EA
            _spec(1, sub, LANES),          # E
        ],
        out_specs=[
            _spec(n, 3, sub, LANES),       # u
            _spec(nelem, sub, LANES),      # V
            _spec(nelem, sub, LANES),      # M
            _spec(1, sub, LANES),          # pivot
        ],
        scratch_shapes=_dd_scratch(n, nelem, sub, dtype),
    )
    with _kernel_trace_scope(dtype):
        u_s, V_s, M_s, piv_s = pl.pallas_call(
            functools.partial(_beam_dd_kernel, True),
            out_shape=[
                jax.ShapeDtypeStruct((T, n, 3, sub, LANES), dtype),
                jax.ShapeDtypeStruct((T, nelem, sub, LANES), dtype),
                jax.ShapeDtypeStruct((T, nelem, sub, LANES), dtype),
                jax.ShapeDtypeStruct((T, 1, sub, LANES), dtype),
            ],
            grid_spec=grid_spec,
            interpret=interpret,
        )(*inputs)
    return (
        _from_slab(u_s, B0),
        _from_slab(V_s, B0),
        _from_slab(M_s, B0),
        _from_slab(piv_s, B0)[:, 0],
    )


@functools.partial(
    jax.jit,
    static_argnames=("E", "A", "G", "alpha_m", "alpha_s", "clamp_min",
                     "interpret", "sub"),
)
def pallas_beam_opt_step_dd(I, mu, nu, Le, free_mask, point_loads, udl,
                            lr_t, bc1, bc2,
                            E: float, A: float, G: float,
                            alpha_m: float = 1e-2, alpha_s: float = 1e-2,
                            clamp_min: float = 1e-8,
                            interpret: bool = False, sub=None):
    """One fused semi-gradient Adam iteration in dd arithmetic.

    Contract matches ``pallas_beam_opt_step`` (I_new, mu, nu, stats) plus
    a fifth output: the dd min-Schur-pivot of the solved system, which the
    rescue uses for validity at f64-grade thresholds.
    """
    B, nelem = I.shape
    n = nelem + 1
    dtype = I.dtype
    if sub is None:
        sub = pick_sub(n, _FLOATS_OPT)
    if sub is None:
        raise ValueError(
            f"mesh of {n} nodes exceeds the dd opt-step kernel even at "
            "sub=1"
        )
    inputs, B0, T = _common_slabs(I, Le, free_mask, point_loads, udl,
                                  E, A, sub)
    mu_s, _, _ = _to_slab(mu, 1, sub)
    nu_s, _, _ = _to_slab(nu, 1, sub)
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
            _spec(nelem, sub, LANES),      # I
            _spec(nelem, sub, LANES),      # Le
            _spec(n, 3, sub, LANES),       # free
            _spec(n, sub, LANES),          # loads
            _spec(1, sub, LANES),          # udl
            _spec(1, sub, LANES),          # EA
            _spec(1, sub, LANES),          # E
            _spec(nelem, sub, LANES),      # mu
            _spec(nelem, sub, LANES),      # nu
            _spec(3, sub, LANES),          # hyp
        ],
        out_specs=[
            _spec(nelem, sub, LANES),      # I_new
            _spec(nelem, sub, LANES),      # mu_new
            _spec(nelem, sub, LANES),      # nu_new
            _spec(4, sub, LANES),          # stats
            _spec(1, sub, LANES),          # pivot
        ],
        scratch_shapes=[
            pltpu.VMEM((nelem, sub, LANES), dtype),      # g (plain f32)
        ] + _dd_scratch(n, nelem, sub, dtype),
    )
    with _kernel_trace_scope(dtype):
        I_o, mu_o, nu_o, stats_s, piv_s = pl.pallas_call(
            functools.partial(_beam_dd_opt_kernel, G, alpha_m, alpha_s,
                              clamp_min),
            out_shape=[
                jax.ShapeDtypeStruct((T, nelem, sub, LANES), dtype),
                jax.ShapeDtypeStruct((T, nelem, sub, LANES), dtype),
                jax.ShapeDtypeStruct((T, nelem, sub, LANES), dtype),
                jax.ShapeDtypeStruct((T, 4, sub, LANES), dtype),
                jax.ShapeDtypeStruct((T, 1, sub, LANES), dtype),
            ],
            grid_spec=grid_spec,
            interpret=interpret,
        )(*inputs[:5], inputs[5], inputs[6], mu_s, nu_s, hyp)
    return (
        _from_slab(I_o, B0),
        _from_slab(mu_o, B0),
        _from_slab(nu_o, B0),
        _from_slab(stats_s, B0),
        _from_slab(piv_s, B0)[:, 0],
    )

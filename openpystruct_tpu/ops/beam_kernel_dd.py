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

from openpystruct_tpu.ops.block_tridiag import LANES, pick_sub
from openpystruct_tpu.ops.beam_kernel import (
    _back_substitute,
    _kernel_trace_scope,
    _pad_lane_fixup,
    _spec,
    _stage_assemble,
    _stage_factor,
    _stage_scale,
    _stage_stiffness,
    _to_slab,
    _from_slab,
)
from openpystruct_tpu.ops.dd import (
    DD,
    CollapseRef,
    LiftRef,
    RefPair,
    collapse,
    dd_sqrt,
)

# dd-slab floats per node for pick_sub.  The dd kernels' SCOPED stack
# allocation is the scratch (the v5e compiler counts it against a 16M
# scoped-vmem limit; measured 16.29M at 83 floats/node, n=101, sub=4).
# The layout keeps scratch at 73-74 floats/node — hi/lo pairs for
# ks/diag/upper/sinv (64), ONE shared pair for rhs/solution (the fused
# forward substitution consumes rhs[i] exactly when y[i] is produced, so
# they alias), a plain-f32 Jacobi scale (consistency, not precision —
# ops/dd.py CollapseRef), and the opt kernel's f32 gradient row — which
# puts n=101 at sub=4 (15.3M scoped), doubling lane occupancy vs the
# first-cut 82-float layout.  pick_sub's 20M budget constant is
# calibrated on the f32 kernels' looser accounting, so these counts are
# inflated by 20/16.
#
# _FLOATS_ANALYSIS is MEASURED, not derived: the analysis kernel's
# compiled scoped footprint at n=101/sub=4 is 16.74M (80.1 real
# floats/node; the extra V/M output staging beyond the opt kernel's
# measured 16.29M), which EXCEEDS the 16M limit — sub=4 must fail the
# pick_sub check at n=101, hence 80.1 * 20/16 ~= 101 (r4 fix: the old
# 92 OOM'd on hardware; interpret-mode tests can't see scoped vmem).
_FLOATS_ANALYSIS = 101
_FLOATS_OPT = 94


def fits_dd(n_nodes: int) -> bool:
    """Whether the dd opt-step kernel fits VMEM at this mesh size."""
    return pick_sub(n_nodes, _FLOATS_OPT) is not None


def _dd_scratch(n, nelem, sub, dtype):
    """Scratch shapes for the dd solve pipeline: hi/lo pairs for
    ks/diag/upper/fy/sinv plus one PLAIN f32 buffer for the Jacobi
    scale (CollapseRef semantics — see the floats-per-node comment)."""
    pairs = [
        (nelem, 5, sub, LANES),   # ks
        (n, 3, 3, sub, LANES),    # diag
        (n, 3, 3, sub, LANES),    # upper
        (n, 3, sub, LANES),       # f / y (aliased: fused fwd subst)
        (n, 3, 3, sub, LANES),    # sinv
    ]
    out = []
    for s in pairs:
        out += [pltpu.VMEM(s, dtype), pltpu.VMEM(s, dtype)]
    out.append(pltpu.VMEM((n, 3, sub, LANES), dtype))   # s (plain f32)
    return out


def _pair_up(scr):
    """[h0, l0, h1, l1, ..., s_plain] -> [RefPair..., CollapseRef]."""
    pairs = [RefPair(scr[i], scr[i + 1]) for i in range(0, len(scr) - 1, 2)]
    return pairs + [CollapseRef(scr[-1])]


def _dd_solve_stages(I_ref, Le_ref, free_ref, load_ref, udl_ref,
                     ea_ref, e_ref, scr):
    """Shared dd pipeline: stiffness -> assembly -> scale -> factor with
    FUSED forward substitution (y overwrites the rhs in place — rhs[i] is
    consumed exactly when y[i] is produced) -> back substitution.
    Returns (ks, s, y, pivot f32 slab, nelem)."""
    ks, diag, upper, fy, sinv, s = _pair_up(scr)
    nelem = I_ref.shape[1]
    n = nelem + 1
    E = DD.lift(e_ref[0, 0])
    EA = DD.lift(ea_ref[0, 0])

    _stage_stiffness(nelem, LiftRef(I_ref), LiftRef(Le_ref), E, EA, ks)
    _stage_assemble(nelem, LiftRef(Le_ref), free_ref, load_ref, udl_ref,
                    None, ks, diag, upper, fy)
    _stage_scale(n, diag, upper, fy, s)
    piv = _stage_factor(n, diag, upper, sinv, None, fy, fy)
    _back_substitute(n, upper, sinv, fy)
    return ks, s, fy, piv, nelem


def _dd_u(y, s, i, a):
    """Unscaled displacement u = y * s as DD."""
    return y[i, a] * s[i, a]


def _dd_VM(ks, Le_ref, y, s, w, j):
    """Element end forces (V, M) as DD at element j (w: plain f32 udl)."""
    k11, k12, k13, k2 = ks[j, 1], ks[j, 2], ks[j, 3], ks[j, 4]
    Le = DD.lift(Le_ref[0, j])
    uy_i, th_i = _dd_u(y, s, j, 1), _dd_u(y, s, j, 2)
    uy_j, th_j = _dd_u(y, s, j + 1, 1), _dd_u(y, s, j + 1, 2)
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

    def unscale(i, _):
        for a in range(3):
            u_out[0, i, a] = collapse(_dd_u(y, s, i, a))
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

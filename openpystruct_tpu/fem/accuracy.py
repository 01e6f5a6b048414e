"""Accuracy autopilot: refine-count selection, a computable error
estimate, and automatic escalation to double-double arithmetic.

OpenSees gives the reference an implicit float64 guarantee on every
solve (OpenPyStruct_BeamOpt.py:122-126); on TPU float32 the achievable
accuracy depends on conditioning, which varies over THREE orders of
regime for the same API call:

- benign meshes (spans of ~constant element count): compensated
  refinement reaches ~1e-6;
- refined meshes of a FIXED span (cond ~ n^4 for Euler-Bernoulli):
  float32 refinement stalls at n~200 and outright diverges by n~500
  (measured: relative error 2.07 at n=501 with refine=1);
- the random-bridge tail: float32 keeps no digits at all.

Round 2 left the knowledge of which regime you are in to a BENCHMARKS.md
table and a manual ``refine`` knob.  ``solve_beam_checked`` removes the
knob: it solves in float32 with an adaptive number of compensated
refinement sweeps, measures the achieved accuracy from the refinement
correction itself (the classic mixed-precision iterative-refinement
estimate: after convergence the last correction bounds the remaining
error), and re-solves the lanes that cannot meet the tolerance on the
double-double kernel (ops/beam_kernel_dd.py) — warning or raising if
even that cannot be certified.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from openpystruct_tpu.fem.beam import (
    BeamScenario,
    BeamSolution,
    assemble_beam_system,
    constraint_mask,
)

# float32 / double-double unit roundoffs
_EPS32 = 2.0 ** -24
_EPS_DD = 2.0 ** -48

# dd pivot floor below which a system is treated as structurally
# singular rather than merely ill-conditioned (datagen.generate's
# RESCUE_PIVOT_TOL rationale).
_SINGULAR_PIVOT = 1e-12


def auto_refine(n_nodes: int) -> int:
    """Refine-sweep count from mesh size alone — the cheap static layer
    of the autopilot (benign-conditioning regime).  Calibrated against
    float64 on span-scaled meshes; ill-conditioned systems need the full
    :func:`solve_beam_checked` escalation instead, which uses this as
    its starting point."""
    if n_nodes <= 150:
        return 1
    if n_nodes <= 400:
        return 2
    return 3


import functools


@functools.partial(jax.jit, static_argnums=(3,))
def _scaled_solve_with_estimate(diag, upper, f, refine_max: int = 4):
    """Jacobi-scaled f32 solve + adaptive compensated refinement.

    Runs up to ``refine_max`` sweeps, stopping early (per batch) when
    the correction stops improving; returns (x_scaled, s, est) where
    ``est`` is the per-lane relative magnitude of the LAST refinement
    correction — after convergence this bounds the remaining forward
    error; under divergence it saturates near/above 1, which is exactly
    the escalation signal."""
    from openpystruct_tpu.fem.solve import (
        block_tridiag_residual_compensated,
    )
    from openpystruct_tpu.ops.block_tridiag import pallas_solve_sym

    d = jnp.diagonal(diag, axis1=-2, axis2=-1)
    s = jax.lax.rsqrt(d)
    diag_s = diag * s[..., :, None] * s[..., None, :]
    upper_s = upper * s[..., :-1, :, None] * s[..., 1:, None, :]
    f_s = f * s

    interp = jax.default_backend() != "tpu"
    x = pallas_solve_sym(diag_s, upper_s, f_s, 0, interp)
    xnorm = jnp.max(jnp.abs(x), axis=(-2, -1)) + 1e-30

    def sweep(x):
        r = jax.vmap(block_tridiag_residual_compensated)(
            diag_s, upper_s, f_s, x
        )
        e = pallas_solve_sym(diag_s, upper_s, r, 0, interp)
        est = jnp.max(jnp.abs(e), axis=(-2, -1)) / xnorm
        return x + e, est

    est = jnp.full(x.shape[0], jnp.inf, x.dtype)
    for _ in range(refine_max):
        # correction clamped per lane: once a lane's correction stops
        # shrinking (divergence), freeze it rather than amplifying
        x_new, est_new = sweep(x)
        improved = est_new < est
        x = jnp.where(improved[:, None, None], x_new, x)
        est = jnp.minimum(est, est_new)
    return x, s, est


def _min_pivot_batch(diag, upper):
    from openpystruct_tpu.fem.solve import block_tridiag_min_pivot

    return jax.vmap(block_tridiag_min_pivot)(diag, upper)


# jit caches live on the wrapper object (CLAUDE.md) — module-level /
# lru_cached wrappers, never fresh jax.jit(...) per call
_min_pivot_batch = jax.jit(_min_pivot_batch)


@functools.lru_cache(maxsize=8)
def _f64_solve_fns(E: float, A: float):
    """Jitted f64 batched solve + pivot for the off-TPU escalation path
    (cached per material constants; traced under the enable_x64 scope of
    the caller)."""
    from openpystruct_tpu.fem.beam import beam_min_pivot, solve_beam

    disp = jax.jit(jax.vmap(
        lambda I_, sc: solve_beam(I_, sc, E, A).displacements
    ))
    piv = jax.jit(jax.vmap(
        lambda I_, sc: beam_min_pivot(I_, sc, E, A)
    ))
    return disp, piv


def solve_beam_checked(
    I,
    scenario: BeamScenario,
    E,
    A,
    tol: float = 1e-4,
    refine_max: int = 4,
    on_fail: str = "warn",   # "warn" | "raise"
):
    """Batched linear-static solve with a certified-accuracy contract.

    No manual precision knob: float32 + adaptive compensated refinement
    first; lanes whose measured error estimate exceeds ``tol`` are
    re-solved on the double-double fused kernel — past its ~430-node VMEM
    range the HBM-streaming dd solver takes over on TPU (no mesh
    ceiling; ops/block_stream_dd.py), while off-TPU hosts use native
    float64 (the reference's own arithmetic; this is a diagnostic API,
    not a hot loop).  Returns ``(BeamSolution, info)``
    where ``info`` has per-lane ``est`` (relative error estimate),
    ``used_dd`` (escalated-lane mask) and ``pivot`` (high-precision Schur
    pivots for escalated lanes, NaN elsewhere).

    Escalation to dd is always automatic; ``on_fail`` controls what
    happens when a lane cannot be certified at ``tol`` even in dd (or
    is structurally singular): "warn" emits a RuntimeWarning, "raise"
    raises ValueError.

    Eager, non-differentiable diagnostic API — the optimizer/datagen hot
    loops keep their dedicated paths (this adds one correction solve for
    the estimate).
    """
    import warnings

    B = I.shape[0]
    diag, upper, f = jax.vmap(
        lambda I_, sc: assemble_beam_system(I_, sc, E, A)
    )(I, scenario)

    x, s, est = _scaled_solve_with_estimate(diag, upper, f, refine_max)
    u = x * s
    # Non-finite estimates mean the f32 factorization itself blew up
    # (inf/NaN pivots); NaN compares False against every threshold, so
    # sanitize HERE or such lanes would be silently "certified".
    est = np.array(est)
    est = np.where(np.isfinite(est), est, np.inf)

    # the correction estimate certifies ACCURACY but cannot see
    # SINGULARITY (a singular factorization produces self-consistent
    # garbage whose corrections look small) — the Schur-pivot detector
    # covers that axis, exactly as in datagen validity filtering
    piv32 = np.asarray(_min_pivot_batch(diag, upper))
    piv32 = np.where(np.isfinite(piv32), piv32, 0.0)
    flagged = np.flatnonzero((est > tol) | (piv32 < 1e-9))
    used_dd = np.zeros(B, bool)
    pivot = np.full(B, np.nan, np.float32)

    from openpystruct_tpu.fem.elements import element_end_forces

    Le = jnp.diff(scenario.node_x, axis=-1)

    if flagged.size:
        from openpystruct_tpu.ops.block_tridiag import pick_sub
        from openpystruct_tpu.ops.beam_kernel_dd import (
            _FLOATS_ANALYSIS,
            pallas_beam_analysis_dd,
        )

        bucket = 1 << max(int(flagged.size) - 1, 0).bit_length()
        bucket = min(max(bucket, 1), B)
        gidx = np.concatenate(
            [flagged, np.zeros(bucket - flagged.size, flagged.dtype)]
        )
        gi = jnp.asarray(gidx)
        n = scenario.node_x.shape[-1]
        if pick_sub(n, _FLOATS_ANALYSIS) is not None:
            free = (~jax.vmap(constraint_mask)(scenario)).astype(I.dtype)
            u_hi, _, _, piv_hi = pallas_beam_analysis_dd(
                I[gi], Le.astype(I.dtype)[gi], free[gi],
                scenario.point_loads[gi], scenario.udl[gi],
                float(E), float(A),
                interpret=jax.default_backend() != "tpu",
            )
        elif jax.default_backend() == "tpu":
            # meshes past the resident dd kernel's VMEM range stay
            # ON-CHIP: the HBM-streaming dd solver has no mesh ceiling
            # (ops/block_stream_dd.py — chunked node axis, dd recurrence
            # carries in scratch)
            from openpystruct_tpu.ops.block_stream_dd import (
                solve_beam_dd_streamed,
            )

            free = (~jax.vmap(constraint_mask)(scenario)).astype(I.dtype)
            u_hi, piv_hi = solve_beam_dd_streamed(
                I[gi], Le.astype(I.dtype)[gi], free[gi],
                scenario.point_loads[gi], scenario.udl[gi],
                float(E), float(A),
            )
        else:
            # off-TPU (CPU tests/tools): float64 is native there, so the
            # scan solve in f64 — the reference's own arithmetic — beats
            # interpreting the streamed dd kernel
            sub_scen = jax.tree.map(
                lambda x: np.asarray(x)[gidx], scenario
            )
            # process-local CPU device (multi-host safe)
            cpu = jax.local_devices(backend="cpu")[0]
            with jax.enable_x64(), jax.default_device(cpu):
                scen64 = jax.tree.map(
                    lambda x: jnp.asarray(
                        x, jnp.float64
                        if np.issubdtype(x.dtype, np.floating) else x.dtype
                    ),
                    sub_scen,
                )
                I64 = jnp.asarray(np.asarray(I)[gidx], jnp.float64)
                disp_fn, piv_fn = _f64_solve_fns(float(E), float(A))
                sol64 = disp_fn(I64, scen64)
                piv64 = piv_fn(I64, scen64)
                u_hi = np.asarray(sol64).astype(np.float32)
                piv_hi = np.asarray(piv64).astype(np.float32)
        u = np.array(u)
        u[gidx[: flagged.size]] = np.asarray(u_hi)[: flagged.size]
        u = jnp.asarray(u)
        used_dd[flagged] = True
        piv_np = np.asarray(piv_hi)[: flagged.size]
        pivot[flagged] = piv_np

        # dd certification: error ~ (measured f32 amplification) x
        # eps_dd/eps32, floored by the pivot-based normwise bound
        # eps_dd/|min pivot| (Jacobi-scaled system: amplification ~
        # 1/min pivot).  The max of the two is taken for EVERY escalated
        # lane, not just non-finite ones: when f32 refinement diverges
        # est_f32 saturates near O(1), capping the scaled estimate at
        # ~1e-7 regardless of true conditioning — for cond >~ 1e11 the
        # true dd error (~cond*eps_dd) exceeds tol while the pivot stays
        # above the singularity floor, so the scaled term alone would
        # falsely certify (ADVICE r3).  Singular systems are flagged by
        # the dd pivot; `~(piv > floor)` (not `piv < floor`) so a NaN
        # pivot counts as failed, never as certified (a NaN pivot also
        # makes est_dd NaN here, which fails `est_dd <= tol` the same
        # way).
        est_f32 = est[flagged]
        with np.errstate(divide="ignore", invalid="ignore"):
            est_dd = np.maximum(
                np.where(
                    np.isfinite(est_f32),
                    est_f32 * (_EPS_DD / _EPS32),
                    0.0,
                ),
                _EPS_DD / np.abs(piv_np),
            )
        est[flagged] = est_dd
        bad = ~(est_dd <= tol) | ~(piv_np > _SINGULAR_PIVOT)
        if bad.any():
            msg = (
                f"{int(bad.sum())} of {B} systems cannot be certified at "
                f"tol={tol:g} even in double-double arithmetic "
                f"(min dd pivot {piv_np.min():.3e}); results for those "
                "lanes may be inaccurate"
            )
            if on_fail == "raise":
                raise ValueError(msg)
            warnings.warn(msg, RuntimeWarning, stacklevel=2)

    u_e = jnp.concatenate([u[..., :-1, :], u[..., 1:, :]], axis=-1)
    end_forces = element_end_forces(
        u_e, E, A, I, Le, scenario.udl[..., None]
    )
    sol = BeamSolution(
        displacements=u,
        deflections=u[..., 1],
        rotations=u[..., 2],
        shear_forces=end_forces[..., 1],
        bending_moments=end_forces[..., 2],
        end_forces=end_forces,
    )
    return sol, dict(est=est, used_dd=used_dd, pivot=pivot)

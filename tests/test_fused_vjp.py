"""Analytic custom_vjp of the fused beam kernel (VERDICT.md round 1,
next-round item 3): the fused adjoint must match the split path's implicit
adjoint and finite differences in float64 interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np

from openpystruct_tpu.config import BeamConfig, OptimizerConfig
from openpystruct_tpu.datagen import sample_scenario
from openpystruct_tpu.fem.beam import constraint_mask, solve_beam_batched
from openpystruct_tpu.ops.beam_kernel import (
    pallas_beam_analysis,
    pallas_beam_solve,
)
from openpystruct_tpu.opt.beam_opt import optimize_beam_batched
from openpystruct_tpu.opt.loss import structural_loss

E, A, G = 200e9, 0.01, 200e9 / 2.6


def setup(B=3, seed=0, dtype=jnp.float64):
    keys = jax.random.split(jax.random.PRNGKey(seed), B)
    scs = jax.vmap(sample_scenario)(keys)
    scs = jax.tree.map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, scs,
    )
    n = scs.node_x.shape[1]
    I = (
        jnp.exp(jax.random.normal(jax.random.PRNGKey(seed + 1),
                                  (B, n - 1)) * 0.3) * 0.5
    ).astype(dtype)
    Le = jnp.diff(scs.node_x, axis=-1)
    free = (~jax.vmap(constraint_mask)(scs)).astype(dtype)
    return scs, I, Le, free


def _fused_loss(I, scs, Le, free):
    u, V, M, _ = pallas_beam_analysis(
        I, Le, free, scs.point_loads, scs.udl, E, A, refine=0,
        interpret=True,
    )
    # touch every differentiable output head
    return (jnp.sum(M**2) * 1e-9 + jnp.sum(V**2) * 1e-7
            + jnp.sum(u[..., 1] ** 2) * 1e3)


def _split_loss(I, scs):
    sol = solve_beam_batched(I, scs, E, A, use_pallas=False)
    return (jnp.sum(sol.bending_moments**2) * 1e-9
            + jnp.sum(sol.shear_forces**2) * 1e-7
            + jnp.sum(sol.deflections**2) * 1e3)


def test_fused_vjp_matches_split_adjoint():
    scs, I, Le, free = setup()
    g_fused = jax.grad(lambda I: _fused_loss(I, scs, Le, free))(I)
    g_split = jax.grad(lambda I: _split_loss(I, scs))(I)
    scale = float(jnp.max(jnp.abs(g_split)))
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_split), rtol=1e-6,
        atol=1e-9 * scale,
    )


def test_fused_vjp_matches_finite_differences():
    scs, I, Le, free = setup(B=2, seed=3)
    f = lambda I: _fused_loss(I, scs, Le, free)
    g = np.asarray(jax.grad(f)(I))
    rng = np.random.default_rng(0)
    # directional derivative check along random tangents; h trades FD
    # truncation against roundoff in the heavily-cancelling loss — 1e-4 is
    # the sweet spot (verified by an h-sweep: smaller h diverges on BOTH
    # the fused and the already-FD-validated split path)
    for _ in range(3):
        v = rng.normal(size=I.shape)
        v /= np.linalg.norm(v)
        h = 1e-4
        fd = (float(f(I + h * v)) - float(f(I - h * v))) / (2 * h)
        an = float((g * v).sum())
        np.testing.assert_allclose(an, fd, rtol=1e-4)


def test_fused_vjp_loads_and_udl():
    scs, I, Le, free = setup(B=2, seed=5)

    def f(loads, udl):
        u, V, M, _ = pallas_beam_analysis(
            I, Le, free, loads, udl, E, A, refine=0, interpret=True,
        )
        return (jnp.sum(M**2) * 1e-9 + jnp.sum(V**2) * 1e-7
                + jnp.sum(u[..., 1] ** 2) * 1e3)

    def f_split(loads, udl):
        sol = solve_beam_batched(
            I, scs.replace(point_loads=loads, udl=udl), E, A,
            use_pallas=False,
        )
        return (jnp.sum(sol.bending_moments**2) * 1e-9
                + jnp.sum(sol.shear_forces**2) * 1e-7
                + jnp.sum(sol.deflections**2) * 1e3)

    gl, gw = jax.grad(f, argnums=(0, 1))(scs.point_loads, scs.udl)
    gl_s, gw_s = jax.grad(f_split, argnums=(0, 1))(
        scs.point_loads, scs.udl
    )
    np.testing.assert_allclose(
        np.asarray(gl), np.asarray(gl_s), rtol=1e-6,
        atol=1e-9 * float(jnp.max(jnp.abs(gl_s))),
    )
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_s), rtol=1e-6)


def test_pallas_beam_solve_rhs_matches_forward():
    """K x = f with the explicit-RHS entry point must reproduce the
    forward analysis' displacements when fed the same consistent loads."""
    scs, I, Le, free = setup(B=2, seed=7)
    u, _, _, _ = pallas_beam_analysis(
        I, Le, free, scs.point_loads, scs.udl, E, A, refine=0,
        interpret=True,
    )
    # build the consistent RHS exactly as the kernel does
    zcol = jnp.zeros(Le.shape[:-1] + (1,), Le.dtype)
    Le_p = jnp.concatenate([zcol, Le], axis=-1)
    Le_n = jnp.concatenate([Le, zcol], axis=-1)
    w = scs.udl[:, None]
    rhs = jnp.stack([
        jnp.zeros_like(scs.point_loads),
        scs.point_loads + w * (Le_p + Le_n) * 0.5,
        w * (Le_n**2 - Le_p**2) / 12.0,
    ], axis=-1)
    x, piv = pallas_beam_solve(I, Le, free, rhs, E, A, refine=0,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(x), np.asarray(u), rtol=1e-9,
                               atol=1e-18)
    assert piv.shape == (2,)


def test_batched_adjoint_mode_runs_fused():
    """optimize_beam_batched in adjoint mode defaults onto the fused kernel
    and still converges to a valid I field."""
    scs, I, Le, free = setup(B=2, seed=9, dtype=jnp.float32)
    beam = BeamConfig(udl=-1000.0)
    opt = OptimizerConfig(max_epochs=15, tolerance=5e-3, patience=5,
                          grad_mode="adjoint")
    res = optimize_beam_batched(scs, beam, opt, use_pallas=True,
                                interpret=True)
    assert np.isfinite(np.asarray(res.I)).all()
    assert (np.asarray(res.I) >= 1e-8).all()


def test_fused_semi_and_adjoint_trajectories_differ():
    """Sanity: adjoint mode actually uses the solve gradient (trajectories
    must differ from semi-gradient after a few steps)."""
    scs, I, Le, free = setup(B=2, seed=11, dtype=jnp.float32)
    beam = BeamConfig(udl=-1000.0)
    out = {}
    for mode in ("semi", "adjoint"):
        opt = OptimizerConfig(max_epochs=10, tolerance=0.0, patience=100,
                              grad_mode=mode)
        res = optimize_beam_batched(scs, beam, opt, use_pallas=True,
                                    interpret=True)
        out[mode] = np.asarray(res.I)
    assert np.abs(out["semi"] - out["adjoint"]).max() > 1e-6

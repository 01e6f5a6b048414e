"""Batched (Pallas-path) optimizer vs vmap(optimize_beam) differential tests."""

import jax
import jax.numpy as jnp
import numpy as np

from openpystruct_tpu.config import BeamConfig, OptimizerConfig
from openpystruct_tpu.datagen import sample_scenario
from openpystruct_tpu.fem.beam import solve_beam_batched, solve_beam
from openpystruct_tpu.opt import optimize_beam
from openpystruct_tpu.opt.beam_opt import optimize_beam_batched


def batched_scenarios(B=6, seed=0, dtype=jnp.float32):
    keys = jax.random.split(jax.random.PRNGKey(seed), B)
    scs = jax.vmap(sample_scenario)(keys)
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        scs,
    )


def test_solve_beam_batched_matches_vmap():
    scs = batched_scenarios(B=6)
    B, n = scs.node_x.shape
    I = (
        jnp.exp(jax.random.normal(jax.random.PRNGKey(1), (B, n - 1)) * 0.3)
        * 0.5
    ).astype(jnp.float32)
    sol_v = jax.vmap(lambda I, s: solve_beam(I, s, 200e9, 0.01))(I, scs)
    sol_b = solve_beam_batched(I, scs, 200e9, 0.01, use_pallas=False)
    np.testing.assert_allclose(
        np.asarray(sol_b.displacements), np.asarray(sol_v.displacements),
        rtol=1e-6, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(sol_b.bending_moments), np.asarray(sol_v.bending_moments),
        rtol=1e-5, atol=1e-3,
    )


def test_solve_beam_batched_pallas_interpret():
    """With one refinement sweep both float32 paths land within ~1e-4 of
    each other (measured ~9e-5 vs f64 truth; raw unrefined solves differ by
    conditioning noise ~1e-2)."""
    scs = batched_scenarios(B=4)
    B, n = scs.node_x.shape
    I = jnp.full((B, n - 1), 0.5, jnp.float32)
    sol_s = solve_beam_batched(I, scs, 200e9, 0.01, refine=1,
                               use_pallas=False)
    sol_p = solve_beam_batched(I, scs, 200e9, 0.01, refine=1,
                               use_pallas=True, interpret=True)
    scale = float(jnp.max(jnp.abs(sol_s.deflections)))
    np.testing.assert_allclose(
        np.asarray(sol_p.deflections), np.asarray(sol_s.deflections),
        rtol=5e-3, atol=5e-4 * scale,
    )


def test_optimize_beam_batched_matches_vmap():
    """Same solver, same update rule -> same trajectory as vmap(optimize).
    Run in float64: in float32 the two (mathematically identical)
    implementations diverge chaotically through the semi-gradient iteration
    (~1% after 25 epochs), while float64 agreement is ~1e-7."""
    scs = batched_scenarios(B=4, dtype=jnp.float64)
    beam = BeamConfig(udl=-1000.0)
    opt = OptimizerConfig(max_epochs=25, tolerance=5e-3, patience=5)
    B, n = scs.node_x.shape
    I0 = jnp.full((B, n - 1), 0.5, jnp.float64)
    res_v = jax.jit(
        jax.vmap(lambda s, i: optimize_beam(s, beam, opt, I0=i))
    )(scs, I0)
    res_b = jax.jit(
        lambda s: optimize_beam_batched(s, beam, opt, I0=I0,
                                        use_pallas=False)
    )(scs)
    np.testing.assert_array_equal(
        np.asarray(res_b.n_epochs), np.asarray(res_v.n_epochs)
    )
    np.testing.assert_allclose(
        np.asarray(res_b.I), np.asarray(res_v.I), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(res_b.loss.total), np.asarray(res_v.loss.total),
        rtol=1e-6,
    )


def test_optimize_beam_batched_pallas_interpret_converges():
    scs = batched_scenarios(B=3)
    beam = BeamConfig(udl=-1000.0)
    opt = OptimizerConfig(max_epochs=15, tolerance=5e-3, patience=5)
    res = optimize_beam_batched(scs, beam, opt, use_pallas=True,
                                interpret=True)
    assert np.isfinite(np.asarray(res.I)).all()
    assert (np.asarray(res.I) >= 1e-8).all()


def test_pallas_adjoint_gradient():
    """Gradient through the pallas solve (adjoint mode) vs the scan path,
    in float64 interpret mode where both must agree to roundoff."""
    scs = batched_scenarios(B=2, dtype=jnp.float64)
    B, n = scs.node_x.shape
    I = jnp.full((B, n - 1), 0.5, jnp.float64)

    def loss(I, use_pallas):
        sol = solve_beam_batched(I, scs, 200e9, 0.01,
                                 use_pallas=use_pallas,
                                 interpret=use_pallas)
        return jnp.sum(sol.deflections**2) * 1e3

    g_scan = jax.grad(lambda I: loss(I, False))(I)
    g_pal = jax.grad(lambda I: loss(I, True))(I)
    scale = float(jnp.max(jnp.abs(g_scan)))
    np.testing.assert_allclose(
        np.asarray(g_pal), np.asarray(g_scan), rtol=1e-6,
        atol=1e-9 * scale,
    )

"""Optimizer-semantics tests.

The key gate is the differential test against a PyTorch reimplementation of
the reference's exact update rule (torch.Adam + ExponentialLR + clamp +
early-stop, OpenPyStruct_BeamOpt.py:179-244) driven by the same FEM fields —
verifying that optax reproduces the reference trajectory step-for-step.
"""

import jax
import jax.numpy as jnp
import numpy as np

from openpystruct_tpu.config import BeamConfig, OptimizerConfig
from openpystruct_tpu.fem import BeamScenario, solve_beam
from openpystruct_tpu.opt import optimize_beam, structural_loss


def scenario_fixed_bridge(n=101, L=200.0, udl=-1000.0):
    node_x = jnp.linspace(0.0, L, n)
    roller = jnp.zeros(n, bool).at[jnp.array([9, 29, 69, 84, 99])].set(True)
    loads = jnp.zeros(n).at[jnp.array([15, 44, 91])].set(
        jnp.array([-3e5, -1e5, -2.5e5])
    )
    return BeamScenario(
        node_x=node_x, roller_mask=roller, point_loads=loads,
        udl=jnp.asarray(udl),
    )


def test_optimize_beam_converges_and_improves():
    sc = scenario_fixed_bridge()
    beam = BeamConfig(udl=-1000.0)
    opt = OptimizerConfig(max_epochs=600, tolerance=5e-3, patience=5)
    res = jax.jit(
        lambda s: optimize_beam(s, beam, opt, record_history=True)
    )(sc)
    hist = np.asarray(res.loss_history)
    n = int(res.n_epochs)
    assert n > 10
    assert bool(res.converged) or n == 600
    # loss decreased substantially from the first epoch
    assert hist[n - 1, 0] < hist[0, 0] * 0.9
    # clamp respected
    assert float(jnp.min(res.I)) >= 1e-8
    # un-recorded epochs stay NaN
    if n < 600:
        assert np.all(np.isnan(hist[n:]))


def test_adjoint_mode_runs_and_converges():
    sc = scenario_fixed_bridge()
    beam = BeamConfig(udl=-1000.0)
    opt = OptimizerConfig(
        max_epochs=200, tolerance=5e-3, patience=5, grad_mode="adjoint"
    )
    res = jax.jit(lambda s: optimize_beam(s, beam, opt))(sc)
    assert float(res.loss.total) > 0
    assert float(jnp.min(res.I)) >= 1e-8


def test_vmap_optimize_matches_single():
    sc = scenario_fixed_bridge()
    beam = BeamConfig(udl=-1000.0)
    opt = OptimizerConfig(max_epochs=40, tolerance=5e-3, patience=5)
    B = 4
    batched = jax.tree.map(lambda x: jnp.stack([x] * B), sc)
    res_b = jax.jit(
        jax.vmap(lambda s: optimize_beam(s, beam, opt))
    )(batched)
    res_s = jax.jit(lambda s: optimize_beam(s, beam, opt))(sc)
    np.testing.assert_allclose(res_b.I[0], res_s.I, rtol=1e-6)
    np.testing.assert_allclose(res_b.I[3], res_s.I, rtol=1e-6)


def test_update_rule_matches_torch_reference():
    """Step-for-step trajectory match vs torch Adam + ExponentialLR + clamp
    (the reference's exact update rule), fed identical FEM fields."""
    import torch

    n = 41
    L = 80.0
    sc = scenario_fixed_bridge(n=n, L=L)
    # shrink rollers/loads to the smaller mesh
    roller = jnp.zeros(n, bool).at[jnp.array([9, 29, n - 1])].set(True)
    loads = jnp.zeros(n).at[jnp.array([15, 33])].set(jnp.array([-3e5, -1e5]))
    sc = sc.replace(roller_mask=roller, point_loads=loads)

    beam = BeamConfig(udl=-1000.0)
    E, G, A = beam.E, beam.G, beam.A
    alpha_m = alpha_s = 1e-2
    lr, gamma = 0.01, 0.98
    steps = 30

    # --- JAX side: manual unrolled loop in float64 (same code path as
    # optimize_beam's body, unrolled so we can compare per-step) ---
    import optax

    I_j = jnp.full(n - 1, 0.5, jnp.float64)
    tx = optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(
            optax.exponential_decay(lr, transition_steps=1, decay_rate=gamma)
        ),
    )
    state = tx.init(I_j)

    def loss_j(I):
        sol = solve_beam(I, sc, E, A)
        return structural_loss(
            I, sol.bending_moments, sol.shear_forces, E, G, alpha_m, alpha_s
        ).total

    jax_traj = []
    for _ in range(steps):
        total, g = jax.value_and_grad(loss_j)(I_j)
        jax_traj.append(float(total))
        upd, state = tx.update(g, state, I_j)
        I_j = jnp.maximum(optax.apply_updates(I_j, upd), 1e-8)

    # --- torch side: the reference's update rule verbatim, with M, V
    # computed by the same FEM at the torch I each epoch ---
    I_t = torch.tensor(
        np.full(n - 1, 0.5), dtype=torch.float64, requires_grad=True
    )
    optt = torch.optim.Adam([I_t], lr=lr)
    sch = torch.optim.lr_scheduler.ExponentialLR(optt, gamma=gamma)
    torch_traj = []
    for _ in range(steps):
        optt.zero_grad()
        sol = solve_beam(jnp.asarray(I_t.detach().numpy()), sc, E, A)
        M = torch.tensor(np.asarray(sol.bending_moments), dtype=torch.float64)
        V = torch.tensor(np.asarray(sol.shear_forces), dtype=torch.float64)
        bending = torch.sum(M**2 / (2 * E * I_t + 1e-6))
        shear = torch.sum(V**2 / (G * (0.03 * I_t**0.5)))
        total = torch.sum(I_t) + alpha_m * bending + alpha_s * shear
        torch_traj.append(float(total))
        total.backward()
        optt.step()
        sch.step()
        with torch.no_grad():
            I_t.clamp_(min=1e-8)

    # fp64 rounding differences in the two loss evaluations compound through
    # Adam; ~1e-7 relative agreement over 30 steps is the achievable bound.
    np.testing.assert_allclose(jax_traj, torch_traj, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(I_j), I_t.detach().numpy(), rtol=1e-5
    )


def _random_batch(B=24, seed=0):
    from openpystruct_tpu.config import ScenarioConfig
    from openpystruct_tpu.datagen.sampler import sample_scenario

    scen_cfg = ScenarioConfig()
    keys = jax.random.split(jax.random.PRNGKey(seed), B)
    sc = jax.vmap(lambda k: sample_scenario(k, scen_cfg))(keys)
    sc = jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        sc,
    )
    return sc, scen_cfg


def test_compact_matches_batched_exactly():
    """Lane compaction must not change any per-lane trajectory: the cascade
    only re-partitions independent lanes, so every output field is bitwise
    identical to the plain batched driver."""
    from openpystruct_tpu.opt.beam_opt import (
        optimize_beam_batched,
        optimize_beam_compact,
    )

    sc, scen_cfg = _random_batch(B=24)
    beam = BeamConfig(udl=scen_cfg.udl)
    opt = OptimizerConfig(max_epochs=150, tolerance=5e-3, patience=5)

    r1 = jax.jit(
        lambda s: optimize_beam_batched(s, beam, opt, use_pallas=False,
                                        fused=False)
    )(sc)
    # min_bucket far below B so several compaction stages actually run
    r2 = jax.jit(
        lambda s: optimize_beam_compact(s, beam, opt, use_pallas=False,
                                        fused=False, min_bucket=4)
    )(sc)
    # lanes must converge at spread-out epochs for the test to mean anything
    assert len(np.unique(np.asarray(r1.n_epochs))) > 3
    np.testing.assert_array_equal(np.asarray(r1.n_epochs),
                                  np.asarray(r2.n_epochs))
    np.testing.assert_array_equal(np.asarray(r1.converged),
                                  np.asarray(r2.converged))
    np.testing.assert_array_equal(np.asarray(r1.I), np.asarray(r2.I))
    np.testing.assert_array_equal(np.asarray(r1.solution.deflections),
                                  np.asarray(r2.solution.deflections))
    np.testing.assert_array_equal(np.asarray(r1.loss.total),
                                  np.asarray(r2.loss.total))


def test_compact_composes_with_shard_map():
    """The cascade is one traced program, so it shards: each device compacts
    its local lanes and the result matches the unsharded run exactly."""
    from functools import partial

    from openpystruct_tpu.opt.beam_opt import optimize_beam_compact

    sc, scen_cfg = _random_batch(B=32, seed=3)
    beam = BeamConfig(udl=scen_cfg.udl)
    opt = OptimizerConfig(max_epochs=40, tolerance=5e-3, patience=5)

    def run(s):
        return optimize_beam_compact(s, beam, opt, use_pallas=False,
                                     fused=False, min_bucket=2)

    r_single = jax.jit(run)(sc)

    mesh = jax.sharding.Mesh(np.array(jax.devices("cpu")[:8]), ("data",))
    spec = jax.sharding.PartitionSpec("data")
    r_shard = jax.jit(
        jax.shard_map(run, mesh=mesh, in_specs=spec, out_specs=spec,
                      check_vma=False)
    )(sc)
    np.testing.assert_array_equal(np.asarray(r_single.n_epochs),
                                  np.asarray(r_shard.n_epochs))
    np.testing.assert_array_equal(np.asarray(r_single.I),
                                  np.asarray(r_shard.I))


def test_compact_sizes_schedule():
    from openpystruct_tpu.opt.beam_opt import _compact_sizes

    assert _compact_sizes(8192, 512) == [8192, 4096, 2048, 1024, 512]
    assert _compact_sizes(3000, 512) == [3000, 2048, 1024, 512]
    assert _compact_sizes(64, 512) == [64]
    assert _compact_sizes(64, 4) == [64, 32, 16, 8, 4]
    assert _compact_sizes(1, 512) == [1]

"""Accuracy-autopilot tests (VERDICT round 2, item 4).

The gate: n=201/301/501 fixed-span refined meshes — the regime where
float32 refinement stalls (n~200) or diverges (n~500) — must reach 1e-4
relative accuracy against float64 with NO manual precision knob, and the
warning must fire on a system no arithmetic can certify.
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openpystruct_tpu.fem import (
    BeamScenario,
    auto_refine,
    solve_beam,
    solve_beam_checked,
)

E, A = 200e9, 0.01


def _refined_mesh_batch(n, B=2, key=0):
    """Fixed 200 m span discretized at n nodes: cond ~ n^4, the regime
    the static refine table cannot handle past n~200."""
    node_x = jnp.linspace(0.0, 200.0, n, dtype=jnp.float32)
    tags = (jnp.array([9, 29, 69, 84, 99]) * (n - 1)) // 100
    mask = jnp.zeros(n, bool).at[tags].set(True)

    def mk(k):
        loads = jnp.zeros(n, jnp.float32).at[n // 2].set(
            -3.5e5 * (0.5 + jax.random.uniform(k, dtype=jnp.float32))
        )
        I = 0.05 * jax.random.uniform(k, (n - 1,), minval=0.2, maxval=2.0,
                                      dtype=jnp.float32)
        sc = BeamScenario(node_x=node_x, roller_mask=mask,
                          point_loads=loads,
                          udl=jnp.asarray(-1000.0, jnp.float32))
        return sc, I

    keys = jax.random.split(jax.random.PRNGKey(key), B)
    scs, Is = jax.vmap(mk)(keys)
    return scs, Is


def _f64_deflections(scs, Is):
    scs64 = jax.tree.map(
        lambda x: x.astype(jnp.float64)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, scs,
    )
    return np.asarray(jax.jit(jax.vmap(
        lambda I, sc: solve_beam(I, sc, E, A).deflections
    ))(Is.astype(jnp.float64), scs64))


@pytest.mark.parametrize("n", [201, 301, 501])
def test_autopilot_hits_1e4_no_knob(n):
    scs, Is = _refined_mesh_batch(n, B=2, key=n)
    with warnings.catch_warnings():
        # these systems ARE f64-solvable: spurious cannot-certify
        # warnings would mean the singularity classifier misfires
        warnings.simplefilter("error", RuntimeWarning)
        sol, info = solve_beam_checked(Is, scs, E, A, tol=1e-4)
    d64 = _f64_deflections(scs, Is)
    scale = np.abs(d64).max(axis=1, keepdims=True)
    err = (np.abs(np.asarray(sol.deflections) - d64) / scale).max()
    assert err < 1e-4, (n, err, info["est"], info["used_dd"])
    # fixed-span refinement genuinely needs the dd escalation — if not,
    # the test is not exercising the autopilot
    assert info["used_dd"].any(), info["est"]


def test_attainable_tolerance_stays_f32():
    """At a tolerance float32 CAN meet, no dd escalation happens — the
    autopilot escalates only when needed."""
    n = 201
    node_x = jnp.linspace(0.0, 2.0 * n, n, dtype=jnp.float32)
    rollers = jnp.zeros(n, bool).at[jnp.arange(19, n - 1, 20)].set(True)
    sc = BeamScenario(
        node_x=jnp.broadcast_to(node_x, (2, n)),
        roller_mask=jnp.broadcast_to(rollers, (2, n)),
        point_loads=jnp.zeros((2, n), jnp.float32).at[:, n // 2].set(-3e5),
        udl=jnp.full((2,), -1000.0, jnp.float32),
    )
    I = jnp.full((2, n - 1), 0.05, jnp.float32)
    sol, info = solve_beam_checked(I, sc, E, A, tol=1e-2)
    assert not info["used_dd"].any(), info["est"]
    assert (info["est"] < 1e-2).all()
    d64 = _f64_deflections(sc, I)
    scale = np.abs(d64).max()
    err = (np.abs(np.asarray(sol.deflections) - d64) / scale).max()
    assert err < 1e-2, err


def test_warning_fires_on_uncertifiable_system():
    """A structurally singular system (no rollers at all) cannot be
    certified by any arithmetic — the autopilot must say so."""
    n = 101
    sc = BeamScenario(
        node_x=jnp.broadcast_to(
            jnp.linspace(0.0, 200.0, n, dtype=jnp.float32), (1, n)
        ),
        roller_mask=jnp.zeros((1, n), bool),
        point_loads=jnp.zeros((1, n), jnp.float32).at[:, 50].set(-3e5),
        udl=jnp.full((1,), -1000.0, jnp.float32),
    )
    I = jnp.full((1, n - 1), 0.5, jnp.float32)
    with pytest.warns(RuntimeWarning, match="cannot be certified"):
        _, info = solve_beam_checked(I, sc, E, A, tol=1e-4)
    assert info["used_dd"].all()
    with pytest.raises(ValueError, match="cannot be certified"):
        solve_beam_checked(I, sc, E, A, tol=1e-4, on_fail="raise")


def test_auto_refine_table():
    assert auto_refine(101) == 1
    assert auto_refine(201) == 2
    assert auto_refine(501) == 3
    # monotone
    ks = [auto_refine(n) for n in (50, 150, 200, 400, 800, 2000)]
    assert ks == sorted(ks)


def test_nan_solve_is_never_silently_certified():
    """A lane whose f32 solve is non-finite (here: a zero I element makes
    K exactly singular) must be escalated and reported — NaN estimates
    compare False against every threshold, so without explicit
    sanitization such lanes sailed through as 'certified'."""
    scs, Is = _refined_mesh_batch(101, B=3)
    Is = np.array(Is)  # writable copy
    # zero bending stiffness on the whole lane: rigid mechanisms, K
    # exactly singular in every arithmetic; the f32 Jacobi scale hits
    # rsqrt(0) and the whole estimate pipeline goes NaN
    Is[1, :] = 0.0
    Is = jnp.asarray(Is)

    with pytest.raises(ValueError, match="cannot be certified"):
        solve_beam_checked(Is, scs, E, A, tol=1e-4, on_fail="raise")

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        sol, info = solve_beam_checked(Is, scs, E, A, tol=1e-4)
    assert any("cannot be certified" in str(w.message) for w in rec)
    assert info["used_dd"][1]          # the broken lane escalated
    assert not np.isfinite(info["est"][1]) or info["est"][1] > 1e-4
    # healthy lanes unaffected
    assert info["est"][0] <= 1e-4 and info["est"][2] <= 1e-4


def test_auto_rescue_mode_respects_dd_ceiling(monkeypatch):
    """rescue=True auto mode must never select the resident dd kernel
    past its VMEM mesh ceiling (it would raise mid-datagen); it falls
    back to the host-f64 rescue there."""
    from openpystruct_tpu.datagen.generate import _auto_rescue_mode
    from openpystruct_tpu.ops.beam_kernel_dd import fits_dd

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert fits_dd(101)
    assert _auto_rescue_mode(101) == "dd"
    # the r4 bending-only layout raised the opt-kernel ceiling to ~720
    assert fits_dd(501)
    assert _auto_rescue_mode(501) == "dd"
    assert not fits_dd(801)
    assert _auto_rescue_mode(801) == "f64"

    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert _auto_rescue_mode(101) == "f64"

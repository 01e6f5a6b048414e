"""Pallas block-tridiagonal kernel vs the lax.scan solver (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from openpystruct_tpu.fem import (
    BeamScenario,
    assemble_beam_system,
    block_tridiag_solve,
)
from openpystruct_tpu.ops import pallas_block_tridiag_solve


def beam_batch(B=16, n=31, seed=0):
    key = jax.random.PRNGKey(seed)
    node_x = jnp.linspace(0.0, 60.0, n)
    roller = jnp.zeros(n, bool).at[jnp.array([n // 3, n - 1])].set(True)
    diags, uppers, fs = [], [], []
    for i in range(B):
        kI, kF, key = jax.random.split(key, 3)
        I = (jnp.exp(jax.random.normal(kI, (n - 1,)) * 0.3) * 0.5).astype(
            jnp.float32
        )
        loads = jnp.zeros(n).at[5 + (i % (n - 7))].set(
            -1e5 * (1 + (i % 4))
        )
        sc = BeamScenario(
            node_x=node_x.astype(jnp.float32),
            roller_mask=roller,
            point_loads=loads.astype(jnp.float32),
            udl=jnp.asarray(-1000.0, jnp.float32),
        )
        d, u, f = assemble_beam_system(I, sc, 200e9, 0.01)
        # Jacobi-scale for float32 conditioning, as solve_beam does
        dd = jnp.diagonal(d, axis1=-2, axis2=-1)
        s = jax.lax.rsqrt(dd)
        diags.append(d * s[:, :, None] * s[:, None, :])
        uppers.append(u * s[:-1, :, None] * s[1:, None, :])
        fs.append(f * s)
    return (jnp.stack(diags), jnp.stack(uppers), jnp.stack(fs))


def _f64_truth(diag, upper, f):
    return jax.vmap(block_tridiag_solve)(
        diag.astype(jnp.float64), upper.astype(jnp.float64),
        f.astype(jnp.float64),
    )


def _rel_err(x, ref):
    ref = np.asarray(ref)
    return np.abs(np.asarray(x, np.float64) - ref).max() / np.abs(ref).max()


def test_pallas_matches_scan_solver():
    """Both float32 solvers must land equally close to the float64 truth
    (their raw difference is dominated by conditioning noise between two
    valid elimination orders, so compare errors, not solutions)."""
    diag, upper, f = beam_batch(B=16, n=31)
    truth = _f64_truth(diag, upper, f)
    err_scan = _rel_err(jax.vmap(block_tridiag_solve)(diag, upper, f), truth)
    err_pal = _rel_err(
        pallas_block_tridiag_solve(diag, upper, f, interpret=True), truth
    )
    assert err_pal < 1e-2, f"pallas err {err_pal}"
    assert err_pal < max(err_scan * 10, 1e-5), (err_pal, err_scan)


def test_pallas_batch_padding():
    """Batch sizes not divisible by the lane tile must still be exact."""
    diag, upper, f = beam_batch(B=3, n=21, seed=1)
    truth = _f64_truth(diag, upper, f)
    x_pal = pallas_block_tridiag_solve(diag, upper, f, interpret=True)
    assert x_pal.shape == truth.shape
    err_scan = _rel_err(jax.vmap(block_tridiag_solve)(diag, upper, f), truth)
    err_pal = _rel_err(x_pal, truth)
    assert err_pal < 1e-2, f"pallas err {err_pal}"
    assert err_pal < max(err_scan * 10, 1e-5), (err_pal, err_scan)


def test_pallas_random_spd():
    key = jax.random.PRNGKey(2)
    B, n, k = 8, 17, 3
    kd, ku, kb = jax.random.split(key, 3)
    diag = (
        jax.random.normal(kd, (B, n, k, k), jnp.float32) * 0.1
        + jnp.eye(k, dtype=jnp.float32) * 4.0
    )
    diag = (diag + jnp.swapaxes(diag, -1, -2)) / 2
    upper = jax.random.normal(ku, (B, n - 1, k, k), jnp.float32) * 0.3
    b = jax.random.normal(kb, (B, n, k), jnp.float32)
    x_ref = jax.vmap(block_tridiag_solve)(diag, upper, b)
    x_pal = pallas_block_tridiag_solve(diag, upper, b, interpret=True)
    np.testing.assert_allclose(
        np.asarray(x_pal), np.asarray(x_ref), rtol=2e-5, atol=1e-6
    )

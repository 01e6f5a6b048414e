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


def test_slab_depth_parity_and_pick():
    """Size-adaptive slab depth: halving ``sub`` (to fit bigger meshes in
    VMEM) only re-partitions lanes — solutions are identical across depths
    — and ``pick_sub`` steps down as the mesh grows, returning None past
    the VMEM-resident range (callers fall back to the scan path)."""
    import numpy as np

    from openpystruct_tpu.fem.solve import block_tridiag_solve
    from openpystruct_tpu.ops.block_tridiag import (
        pallas_block_tridiag_solve,
        pick_sub,
    )

    # the fused analysis kernel's footprint (~61 floats/node)
    assert pick_sub(101, 61) == 4
    assert pick_sub(201, 61) == 2
    assert pick_sub(401, 61) == 1
    assert pick_sub(1400, 61) is None
    # the solve-only kernel fits ~2x further at each depth
    assert pick_sub(201, 36) == 4

    rng = np.random.default_rng(3)
    B, n = 9, 17
    diag = jnp.asarray(rng.normal(size=(B, n, 3, 3)).astype(np.float32))
    diag = diag @ diag.transpose(0, 1, 3, 2) + 6 * jnp.eye(3)
    upper = jnp.asarray(
        rng.normal(size=(B, n - 1, 3, 3)).astype(np.float32)) * 0.3
    b = jnp.asarray(rng.normal(size=(B, n, 3)).astype(np.float32))
    ref = jax.vmap(lambda d, u, r: block_tridiag_solve(d, u, r))(
        diag, upper, b
    )
    for sub in (4, 2, 1):
        x = pallas_block_tridiag_solve(diag, upper, b, interpret=True,
                                       sub=sub)
        np.testing.assert_allclose(np.asarray(x), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)


def test_bidi_kernel_parity():
    """Bidirectional (two-chain) elimination vs the standard sweep: same
    factorization family, different elimination ORDER — solutions agree
    to float32 rounding on well-conditioned systems, at every parity of
    n and with batch padding."""
    for n, B, seed in ((31, 16, 0), (32, 3, 1), (21, 5, 2)):
        diag, upper, f = beam_batch(B=B, n=n, seed=seed)
        truth = _f64_truth(diag, upper, f)
        err_std = _rel_err(
            pallas_block_tridiag_solve(diag, upper, f, interpret=True),
            truth,
        )
        err_bidi = _rel_err(
            pallas_block_tridiag_solve(diag, upper, f, interpret=True,
                                       bidi=True),
            truth,
        )
        assert err_bidi < max(err_std * 10, 1e-5), (n, err_bidi, err_std)

    # random SPD, tight elementwise agreement
    key = jax.random.PRNGKey(7)
    kd, ku, kb = jax.random.split(key, 3)
    B, n, k = 8, 23, 3
    diag = (
        jax.random.normal(kd, (B, n, k, k), jnp.float32) * 0.1
        + jnp.eye(k, dtype=jnp.float32) * 4.0
    )
    diag = (diag + jnp.swapaxes(diag, -1, -2)) / 2
    upper = jax.random.normal(ku, (B, n - 1, k, k), jnp.float32) * 0.3
    b = jax.random.normal(kb, (B, n, k), jnp.float32)
    x_std = pallas_block_tridiag_solve(diag, upper, b, interpret=True)
    x_bidi = pallas_block_tridiag_solve(diag, upper, b, interpret=True,
                                        bidi=True)
    np.testing.assert_allclose(
        np.asarray(x_bidi), np.asarray(x_std), rtol=2e-5, atol=1e-6
    )


def test_large_mesh_auto_fallback():
    """Past the VMEM-resident range the batched paths must route around
    the kernels instead of failing at compile time."""
    from openpystruct_tpu.opt.beam_opt import _fits_fused

    assert _fits_fused(101) and _fits_fused(501)
    assert not _fits_fused(1500)

"""Unit tests of the block-tridiagonal solver against dense references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openpystruct_tpu.fem.solve import (
    block_tridiag_matvec,
    block_tridiag_solve,
)


def random_spd_block_tridiag(key, n, k):
    """Random SPD block-tridiagonal system via A = B B^T + n*I on a banded B."""
    kd, ku = jax.random.split(key)
    dense = jnp.zeros((n * k, n * k))
    diag_blocks = jax.random.normal(kd, (n, k, k))
    upper_blocks = jax.random.normal(ku, (n - 1, k, k)) * 0.3
    for i in range(n):
        dense = dense.at[i * k : (i + 1) * k, i * k : (i + 1) * k].set(
            diag_blocks[i]
        )
    for i in range(n - 1):
        dense = dense.at[i * k : (i + 1) * k, (i + 1) * k : (i + 2) * k].set(
            upper_blocks[i]
        )
        dense = dense.at[(i + 1) * k : (i + 2) * k, i * k : (i + 1) * k].set(
            upper_blocks[i].T
        )
    dense = dense @ dense.T + n * jnp.eye(n * k)
    # SPD product of a block-tridiag is block-pentadiagonal; re-extract a
    # block-tridiag part that is still SPD by diagonal dominance.
    diag = jnp.stack(
        [dense[i * k : (i + 1) * k, i * k : (i + 1) * k] for i in range(n)]
    )
    upper = jnp.stack(
        [
            dense[i * k : (i + 1) * k, (i + 1) * k : (i + 2) * k]
            for i in range(n - 1)
        ]
    )
    tridense = jnp.zeros_like(dense)
    for i in range(n):
        tridense = tridense.at[i * k : (i + 1) * k, i * k : (i + 1) * k].set(
            diag[i]
        )
    for i in range(n - 1):
        tridense = tridense.at[
            i * k : (i + 1) * k, (i + 1) * k : (i + 2) * k
        ].set(upper[i])
        tridense = tridense.at[
            (i + 1) * k : (i + 2) * k, i * k : (i + 1) * k
        ].set(upper[i].T)
    return diag, upper, tridense


@pytest.mark.parametrize("n,k", [(5, 1), (7, 2), (11, 3), (101, 3)])
def test_solve_matches_dense(n, k):
    key = jax.random.PRNGKey(0)
    diag, upper, dense = random_spd_block_tridiag(key, n, k)
    b = jax.random.normal(jax.random.PRNGKey(1), (n, k))
    x = block_tridiag_solve(diag, upper, b)
    x_dense = jnp.linalg.solve(dense, b.reshape(-1)).reshape(n, k)
    np.testing.assert_allclose(x, x_dense, rtol=1e-9, atol=1e-12)


def test_matvec_matches_dense():
    n, k = 9, 3
    diag, upper, dense = random_spd_block_tridiag(jax.random.PRNGKey(2), n, k)
    v = jax.random.normal(jax.random.PRNGKey(3), (n, k))
    r = block_tridiag_matvec(diag, upper, v)
    r_dense = (dense @ v.reshape(-1)).reshape(n, k)
    np.testing.assert_allclose(r, r_dense, rtol=1e-10, atol=1e-12)


def test_nonsymmetric_solve():
    n, k = 8, 3
    key = jax.random.PRNGKey(4)
    kd, ku, kl, kb = jax.random.split(key, 4)
    diag = jax.random.normal(kd, (n, k, k)) + 10.0 * jnp.eye(k)
    upper = jax.random.normal(ku, (n - 1, k, k)) * 0.2
    lower = jax.random.normal(kl, (n - 1, k, k)) * 0.2
    b = jax.random.normal(kb, (n, k))
    dense = jnp.zeros((n * k, n * k))
    for i in range(n):
        dense = dense.at[i * k : (i + 1) * k, i * k : (i + 1) * k].set(diag[i])
    for i in range(n - 1):
        dense = dense.at[i * k : (i + 1) * k, (i + 1) * k : (i + 2) * k].set(
            upper[i]
        )
        dense = dense.at[(i + 1) * k : (i + 2) * k, i * k : (i + 1) * k].set(
            lower[i]
        )
    x = block_tridiag_solve(diag, upper, b, lower=lower)
    x_dense = jnp.linalg.solve(dense, b.reshape(-1)).reshape(n, k)
    np.testing.assert_allclose(x, x_dense, rtol=1e-8, atol=1e-12)


def test_vmap_batched_solve():
    n, k, B = 12, 3, 16
    diag, upper, dense = random_spd_block_tridiag(jax.random.PRNGKey(5), n, k)
    bs = jax.random.normal(jax.random.PRNGKey(6), (B, n, k))
    xs = jax.vmap(lambda b: block_tridiag_solve(diag, upper, b))(bs)
    for i in range(B):
        ref = jnp.linalg.solve(dense, bs[i].reshape(-1)).reshape(n, k)
        np.testing.assert_allclose(xs[i], ref, rtol=1e-9, atol=1e-12)


def test_custom_vjp_matches_dense_autodiff():
    """Adjoint gradients must equal autodiff through a dense solve."""
    n, k = 6, 3
    diag, upper, dense = random_spd_block_tridiag(jax.random.PRNGKey(7), n, k)
    b = jax.random.normal(jax.random.PRNGKey(8), (n, k))
    w = jax.random.normal(jax.random.PRNGKey(9), (n, k))

    def loss_sparse(diag, upper, b):
        x = block_tridiag_solve(diag, upper, b)
        return jnp.sum(w * jnp.sin(x))

    def to_dense(diag, upper):
        d = jnp.zeros((n * k, n * k))
        for i in range(n):
            d = d.at[i * k : (i + 1) * k, i * k : (i + 1) * k].set(diag[i])
        for i in range(n - 1):
            d = d.at[i * k : (i + 1) * k, (i + 1) * k : (i + 2) * k].set(
                upper[i]
            )
            d = d.at[(i + 1) * k : (i + 2) * k, i * k : (i + 1) * k].set(
                jnp.swapaxes(upper[i], -1, -2)
            )
        return d

    def loss_dense(diag, upper, b):
        x = jnp.linalg.solve(to_dense(diag, upper), b.reshape(-1)).reshape(
            n, k
        )
        return jnp.sum(w * jnp.sin(x))

    g_sparse = jax.grad(loss_sparse, argnums=(0, 1, 2))(diag, upper, b)
    g_dense = jax.grad(loss_dense, argnums=(0, 1, 2))(diag, upper, b)
    for gs, gd in zip(g_sparse, g_dense):
        np.testing.assert_allclose(gs, gd, rtol=1e-7, atol=1e-10)


def test_custom_vjp_finite_differences():
    n, k = 5, 2
    diag, upper, _ = random_spd_block_tridiag(jax.random.PRNGKey(10), n, k)
    b = jax.random.normal(jax.random.PRNGKey(11), (n, k))

    def loss(b):
        return jnp.sum(block_tridiag_solve(diag, upper, b) ** 2)

    g = jax.grad(loss)(b)
    eps = 1e-6
    for idx in [(0, 0), (2, 1), (4, 0)]:
        db = jnp.zeros_like(b).at[idx].set(eps)
        fd = (loss(b + db) - loss(b - db)) / (2 * eps)
        np.testing.assert_allclose(g[idx], fd, rtol=1e-6)


def test_iterative_refinement_improves_f32():
    n, k = 101, 3
    diag, upper, dense = random_spd_block_tridiag(jax.random.PRNGKey(12), n, k)
    b = jax.random.normal(jax.random.PRNGKey(13), (n, k))
    x_ref = jnp.linalg.solve(dense, b.reshape(-1)).reshape(n, k)
    d32, u32, b32 = (
        diag.astype(jnp.float32),
        upper.astype(jnp.float32),
        b.astype(jnp.float32),
    )
    err0 = jnp.linalg.norm(
        block_tridiag_solve(d32, u32, b32).astype(jnp.float64) - x_ref
    )
    err2 = jnp.linalg.norm(
        block_tridiag_solve(d32, u32, b32, refine=2).astype(jnp.float64)
        - x_ref
    )
    assert err2 <= err0 * 1.5  # refinement must not hurt, usually helps

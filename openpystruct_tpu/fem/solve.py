"""Block-tridiagonal direct solver with an implicit-differentiation adjoint.

The chain beam mesh assembles into a block-tridiagonal stiffness (3x3 nodal
blocks).  OpenSees reaches the same structure at runtime through its BandSPD
system + RCM numberer (reference OpenPyStruct_BeamOpt.py:122-123); here the
structure is explicit, the factorization is an O(N) block-Thomas sweep
expressed as ``lax.scan`` (compiler-friendly: static shapes, no Python loop),
and the whole solve is vmappable over scenario batches — each scan step then
performs (batch, k, k) element-wise work on the VPU.

Gradient: ``block_tridiag_solve`` carries a ``jax.custom_vjp`` implementing
the classical adjoint of a linear solve,

    x = K^-1 b,   dL/db = K^-T g,   dL/dK = -(K^-T g) x^T  (on the sparsity),

so reverse-mode differentiation costs one extra O(N) solve instead of
replaying the factorization graph.  This is the exact d(u)/dI path the
reference never computes (it treats forces as constants,
OpenPyStruct_BeamOpt.py:150-151).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _inv_small(m):
    """Inverse of (..., k, k) blocks for small static k via closed forms.

    Cofactor expansion vectorizes to pure VPU element-wise work (no LU),
    which is what makes the batched Thomas sweep fast on TPU.
    """
    k = m.shape[-1]
    if k == 1:
        return 1.0 / m
    if k == 2:
        a, b = m[..., 0, 0], m[..., 0, 1]
        c, d = m[..., 1, 0], m[..., 1, 1]
        det = a * d - b * c
        adj = jnp.stack(
            [jnp.stack([d, -b], axis=-1), jnp.stack([-c, a], axis=-1)],
            axis=-2,
        )
        return adj / det[..., None, None]
    if k == 3:
        a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
        d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
        g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
        A = e * i - f * h
        B = -(d * i - f * g)
        C = d * h - e * g
        D = -(b * i - c * h)
        E = a * i - c * g
        F = -(a * h - b * g)
        G = b * f - c * e
        H = -(a * f - c * d)
        I = a * e - b * d
        det = a * A + b * B + c * C
        adj = jnp.stack(
            [
                jnp.stack([A, D, G], axis=-1),
                jnp.stack([B, E, H], axis=-1),
                jnp.stack([C, F, I], axis=-1),
            ],
            axis=-2,
        )
        return adj / det[..., None, None]
    return jnp.linalg.inv(m)


def _mv(m, v):
    return jnp.einsum("...ij,...j->...i", m, v)


def _mm(a, b):
    return jnp.einsum("...ij,...jk->...ik", a, b)


def _factor(diag, upper, lower):
    """Block-Thomas factorization.

    diag: (n, k, k) diagonal blocks K[i, i]
    upper: (n-1, k, k) super-diagonal blocks K[i, i+1]
    lower: (n-1, k, k) sub-diagonal blocks K[i+1, i]

    Returns (Sinv, C): (n, k, k) inverted Schur complements and (n, k, k)
    back-substitution multipliers (last C block is zero padding).
    """
    n, k, _ = diag.shape
    upper_p = jnp.concatenate(
        [upper, jnp.zeros((1, k, k), dtype=upper.dtype)], axis=0
    )

    sinv0 = _inv_small(diag[0])
    c0 = _mm(sinv0, upper_p[0])

    def step(c_prev, inp):
        d_i, u_i, l_im1 = inp
        s = d_i - _mm(l_im1, c_prev)
        sinv = _inv_small(s)
        c = _mm(sinv, u_i)
        return c, (sinv, c)

    _, (sinvs, cs) = jax.lax.scan(step, c0, (diag[1:], upper_p[1:], lower))
    sinv = jnp.concatenate([sinv0[None], sinvs], axis=0)
    c = jnp.concatenate([c0[None], cs], axis=0)
    return sinv, c


def _solve_factored(sinv, c, lower, b):
    """Forward/back substitution given block-Thomas factors."""
    y0 = _mv(sinv[0], b[0])

    def fwd_step(y_prev, inp):
        sinv_i, l_im1, b_i = inp
        y = _mv(sinv_i, b_i - _mv(l_im1, y_prev))
        return y, y

    _, ys = jax.lax.scan(fwd_step, y0, (sinv[1:], lower, b[1:]))
    y = jnp.concatenate([y0[None], ys], axis=0)

    def bwd_step(x_next, inp):
        c_i, y_i = inp
        x = y_i - _mv(c_i, x_next)
        return x, x

    _, xs = jax.lax.scan(bwd_step, y[-1], (c[:-1], y[:-1]), reverse=True)
    return jnp.concatenate([xs, y[-1][None]], axis=0)


@jax.custom_vjp
def _solve(diag, upper, lower, b):
    sinv, c = _factor(diag, upper, lower)
    return _solve_factored(sinv, c, lower, b)


def _solve_fwd(diag, upper, lower, b):
    sinv, c = _factor(diag, upper, lower)
    x = _solve_factored(sinv, c, lower, b)
    return x, (diag, upper, lower, x)


def _solve_bwd(res, g):
    diag, upper, lower, x = res
    # Adjoint system K^T lam = g: transpose every block and swap the bands.
    d_t = jnp.swapaxes(diag, -1, -2)
    u_t = jnp.swapaxes(lower, -1, -2)
    l_t = jnp.swapaxes(upper, -1, -2)
    sinv_t, c_t = _factor(d_t, u_t, l_t)
    lam = _solve_factored(sinv_t, c_t, l_t, g)
    # dL/dK = -lam x^T restricted to the block-tridiagonal sparsity.
    diag_bar = -lam[:, :, None] * x[:, None, :]
    upper_bar = -lam[:-1, :, None] * x[1:, None, :]
    lower_bar = -lam[1:, :, None] * x[:-1, None, :]
    return diag_bar, upper_bar, lower_bar, lam


_solve.defvjp(_solve_fwd, _solve_bwd)


def block_tridiag_matvec(diag, upper, b, lower=None):
    """K @ b for a block-tridiagonal K (symmetric if ``lower`` is None)."""
    if lower is None:
        lower = jnp.swapaxes(upper, -1, -2)
    r = _mv(diag, b)
    r = r.at[:-1].add(_mv(upper, b[1:]))
    r = r.at[1:].add(_mv(lower, b[:-1]))
    return r


def block_tridiag_solve(diag, upper, b, lower=None, refine=0):
    """Solve the block-tridiagonal system K x = b.

    Args:
      diag: (n, k, k) diagonal blocks.
      upper: (n-1, k, k) super-diagonal blocks.
      b: (n, k) right-hand side.
      lower: (n-1, k, k) sub-diagonal blocks; defaults to ``upper^T``
        (symmetric K, the BandSPD case of OpenPyStruct_BeamOpt.py:122).
      refine: number of iterative-refinement sweeps (r = b - Kx; x += K^-1 r).
        Use 1-2 on TPU float32 to recover accuracy lost to the ~1e-7 epsilon;
        costs one extra factorization + solve per sweep.

    Vmappable over leading batch axes of all operands.
    """
    if lower is None:
        lower = jnp.swapaxes(upper, -1, -2)
    x = _solve(diag, upper, lower, b)
    for _ in range(refine):
        r = b - block_tridiag_matvec(diag, upper, x, lower)
        x = x + _solve(diag, upper, lower, r)
    return x

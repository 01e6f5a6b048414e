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

from functools import partial

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


# The 3x3 recurrence products MUST run at full float32 precision: TPU einsum
# otherwise defaults to bfloat16 MXU passes (eps ~ 8e-3), which corrupts the
# factorization.  These ops are tiny and VPU-bound, so HIGHEST costs nothing.
_PREC = jax.lax.Precision.HIGHEST


def _mv(m, v):
    return jnp.einsum("...ij,...j->...i", m, v, precision=_PREC)


def _mm(a, b):
    return jnp.einsum("...ij,...jk->...ik", a, b, precision=_PREC)


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


def _solve_impl(diag, upper, lower, b, refine):
    """Factor once; optional iterative-refinement sweeps reuse the factors
    (each sweep = one compensated residual + one O(N k^2) substitution)."""
    sinv, c = _factor(diag, upper, lower)
    x = _solve_factored(sinv, c, lower, b)
    for _ in range(refine):
        r = block_tridiag_residual_compensated(diag, upper, b, x, lower)
        x = x + _solve_factored(sinv, c, lower, r)
    return x


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _solve(diag, upper, lower, b, refine):
    return _solve_impl(diag, upper, lower, b, refine)


def _solve_fwd(diag, upper, lower, b, refine):
    x = _solve_impl(diag, upper, lower, b, refine)
    return x, (diag, upper, lower, x)


def _solve_bwd(refine, res, g):
    diag, upper, lower, x = res
    # Adjoint system K^T lam = g: transpose every block and swap the bands.
    # The adjoint solve refines to the same accuracy as the primal.
    d_t = jnp.swapaxes(diag, -1, -2)
    u_t = jnp.swapaxes(lower, -1, -2)
    l_t = jnp.swapaxes(upper, -1, -2)
    lam = _solve_impl(d_t, u_t, l_t, g, refine)
    # dL/dK = -lam x^T restricted to the block-tridiagonal sparsity.
    diag_bar = -lam[:, :, None] * x[:, None, :]
    upper_bar = -lam[:-1, :, None] * x[1:, None, :]
    lower_bar = -lam[1:, :, None] * x[:-1, None, :]
    return diag_bar, upper_bar, lower_bar, lam


_solve.defvjp(_solve_fwd, _solve_bwd)


def _det_small(m):
    """Determinant of (..., k, k) blocks for small static k."""
    k = m.shape[-1]
    if k == 1:
        return m[..., 0, 0]
    if k == 2:
        return m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]
    if k == 3:
        a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
        d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
        g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
        return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)
    return jnp.linalg.det(m)


def block_tridiag_min_pivot(diag, upper, lower=None):
    """min_i |det(S_i)| over the block-Thomas Schur pivots of the
    Jacobi-scaled system — a singularity detector.

    A structurally singular system (e.g. a beam with no roller: rigid
    rotation about the pin) produces a pivot at float32 noise level
    (~1e-10), while valid systems stay orders of magnitude above; this is
    the TPU-native analog of OpenSees' ``analyze`` failure return
    (OpenPyStruct_BeamOpt_training_MultiCore.py:184-186).
    """
    d = jnp.diagonal(diag, axis1=-2, axis2=-1)
    s = jax.lax.rsqrt(d)
    diag_s = diag * s[..., :, None] * s[..., None, :]
    upper_s = upper * s[..., :-1, :, None] * s[..., 1:, None, :]
    if lower is None:
        lower_s = jnp.swapaxes(upper_s, -1, -2)
    else:
        lower_s = lower * s[..., 1:, :, None] * s[..., :-1, None, :]

    # Constant-memory recurrence: carry only (C, running min |det S|) —
    # stacking the factors (as _factor does) costs O(n * B * 9) HBM, which
    # OOMs large datagen batches.
    k = diag_s.shape[-1]
    n = diag_s.shape[-3]
    upper_p = jnp.concatenate(
        [upper_s, jnp.zeros(upper_s.shape[:-3] + (1, k, k), upper_s.dtype)],
        axis=-3,
    )

    def step(carry, inp):
        c_prev, min_det = carry
        d_i, u_i, l_im1 = inp
        sblk = d_i - _mm(l_im1, c_prev)
        det = jnp.abs(_det_small(sblk))
        c = _mm(_inv_small(sblk), u_i)
        return (c, jnp.minimum(min_det, det)), None

    d0 = jnp.moveaxis(diag_s, -3, 0)[0]
    det0 = jnp.abs(_det_small(d0))
    c0 = _mm(_inv_small(d0), jnp.moveaxis(upper_p, -3, 0)[0])
    (_, min_det), _ = jax.lax.scan(
        step,
        (c0, det0),
        (
            jnp.moveaxis(diag_s, -3, 0)[1:],
            jnp.moveaxis(upper_p, -3, 0)[1:],
            jnp.moveaxis(lower_s, -3, 0),
        ),
    )
    return min_det


# ---------------------------------------------------------------------------
# Compensated (double-float) residual for iterative refinement.
#
# A plain float32 residual b - K x is dominated by rounding when
# ||K||*||x|| >> ||b|| (always true for stiff FE systems), so refinement
# stalls.  Error-free transformations (Dekker two-product, Knuth two-sum)
# compute the residual to ~2^-45 relative, letting one or two refinement
# sweeps recover near-full float32 forward accuracy even for ill-conditioned
# long-span beams.  All element-wise VPU work.
# ---------------------------------------------------------------------------

# Error-free transforms: canonical implementation in ops/dd.py (shared
# with the Pallas kernels) — see that module for the Dekker/Knuth
# derivations.
from openpystruct_tpu.ops.dd import two_prod as _two_prod
from openpystruct_tpu.ops.dd import two_sum as _two_sum


def block_tridiag_residual_compensated(diag, upper, b, x, lower=None):
    """b - K x computed with compensated float32 arithmetic (~double
    accuracy).  Shapes as in :func:`block_tridiag_solve`."""
    if lower is None:
        lower = jnp.swapaxes(upper, -1, -2)
    n, k, _ = diag.shape[-3:]
    zpad = jnp.zeros(diag.shape[:-3] + (1, k, k), dtype=diag.dtype)
    up = jnp.concatenate([upper, zpad], axis=-3)      # row i couples x[i+1]
    lo = jnp.concatenate([zpad, lower], axis=-3)      # row i couples x[i-1]
    xz = jnp.zeros(x.shape[:-2] + (1, k), dtype=x.dtype)
    x_next = jnp.concatenate([x[..., 1:, :], xz], axis=-2)
    x_prev = jnp.concatenate([xz, x[..., :-1, :]], axis=-2)

    # products: (..., n, k_out, k_in) term groups
    terms = []
    for m, v in ((diag, x), (up, x_next), (lo, x_prev)):
        p, e = _two_prod(-m, v[..., None, :])
        terms.append((p, e))

    # Neumaier accumulation of 3*k products + b per output component.
    s = b
    comp = jnp.zeros_like(b)
    for p, e in terms:
        for j in range(k):
            s, c = _two_sum(s, p[..., j])
            comp = comp + c + e[..., j]
    return s + comp


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
      refine: number of iterative-refinement sweeps with a compensated
        (double-float) residual.  Use 1-2 on TPU float32: the accurate
        residual lets refinement recover near-full float32 forward accuracy
        even for ill-conditioned long single-span beams, where a plain f32
        solve can be ~10% off.

    Vmappable over leading batch axes of all operands.
    """
    if lower is None:
        lower = jnp.swapaxes(upper, -1, -2)
    return _solve(diag, upper, lower, b, refine)

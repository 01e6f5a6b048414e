"""Fourier Neural Operator surrogate (1D over the load-case axis).

Reference: ``SpectralConv1d`` + ``FNOBlock1d`` + ``FNO1dModel``
(OpenPyStruct_FNO_MultiCase_Beta.py:340-495): lift feat_dim -> width with a
pointwise Dense, 4 blocks of [spectral conv + pointwise conv + BatchNorm +
GELU] along the n_cases axis, then flatten -> MLP -> n_elem.

Spectral-mixing semantics: the proper FNO per-mode complex channel mixing
``out[b,o,m] = sum_i x_ft[b,i,m] * W[i,o,m]`` is the default.  The
reference's einsum ``"bim,iojm->bojm"`` with a size-1 leading weight axis
actually *broadcast-sums* the input channels and multiplies by the
channel-summed weight (verified against torch) — i.e. it degenerates to
``(sum_i x_ft[b,i,m]) * (sum_j W[o,j,m])``; set ``degenerate_mixing=True``
to replicate that behavior exactly.

TPU note: the FFT axis is n_cases (6-8 points) — trivially small, so the
rfft/irfft pair is evaluated as real DFT *matmuls* (cos/sin matrices built
at trace time).  This is both the MXU-native formulation at this size and
a necessity: the TPU backend has no complex64 support, so
``jnp.fft``/complex einsums would not lower at all.  The matmul form
reproduces rfft -> truncate-to-modes -> mix -> zero-pad -> irfft exactly,
including the c2r transform's ignore-the-imaginary-part semantics at the
DC and Nyquist bins (their sine columns are identically zero).  Everything
runs in float32 at HIGHEST precision (the reference disables AMP for
exactly this layer, OpenPyStruct_FNO_MultiCase_Beta.py:617-618).
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax.numpy as jnp
import jax
from flax import linen as nn

_HI = jax.lax.Precision.HIGHEST


def _dft_mats(n: int, modes: int):
    """Real-DFT analysis/synthesis matrices for the truncated spectrum.

    Forward (rfft bins 0..modes-1):  Xr = x @ cosF,  Xi = -(x @ sinF).
    Inverse (zero-padded to n):      y  = Xr @ A + Xi @ B, with the
    Hermitian-reflection weights c_m (1 at DC/Nyquist, 2 elsewhere) folded
    in; B's DC/Nyquist rows are zero, which IS numpy/pocketfft's c2r
    behavior of ignoring those bins' imaginary parts.
    """
    k = np.arange(n)[:, None]
    m = np.arange(modes)[None, :]
    ang = 2.0 * np.pi * k * m / n
    cosF = np.cos(ang)                     # (n, modes)
    sinF = np.sin(ang)
    c = np.full(modes, 2.0)
    c[0] = 1.0
    if n % 2 == 0 and modes - 1 == n // 2:
        c[n // 2] = 1.0
    A = (c * cosF).T / n                   # (modes, n)
    B = -(c * sinF).T / n                  # minus: y = Xr cos - Xi sin
    return (jnp.asarray(cosF, jnp.float32), jnp.asarray(sinF, jnp.float32),
            jnp.asarray(A, jnp.float32), jnp.asarray(B, jnp.float32))


class SpectralConv1d(nn.Module):
    in_channels: int
    out_channels: int
    modes: int
    degenerate_mixing: bool = False

    @nn.compact
    def __call__(self, x):
        """x: (B, in_channels, n) float32 -> (B, out_channels, n)."""
        B, inC, n = x.shape
        x = x.astype(jnp.float32)
        modes = min(self.modes, n // 2 + 1)
        cosF, sinF, inv_c, inv_s = _dft_mats(n, modes)

        # truncated real DFT: x_ft[b,i,m] = Xr + i*Xi
        xr = jnp.einsum("bin,nm->bim", x, cosF, precision=_HI)
        xi = -jnp.einsum("bin,nm->bim", x, sinF, precision=_HI)

        # scale * U(0,1) init, matching torch.rand scaling
        # (OpenPyStruct_FNO_MultiCase_Beta.py:349-356); float32 params
        scale = 1.0 / (self.in_channels * self.out_channels)
        shape = (self.in_channels, self.out_channels, self.modes)

        def w_init(key, shp):
            return jax.random.uniform(key, shp, jnp.float32, 0.0, scale)

        w_r = self.param("weights_real", w_init, shape)[:, :, :modes]
        w_i = self.param("weights_imag", w_init, shape)[:, :, :modes]

        if self.degenerate_mixing:
            # the reference's effective computation (see module docstring):
            # (sum_i x_ft)[b,m] * (sum_j W)[o,m] — torch labels the weight's
            # first axis as the output channel, so the sum runs over axis 1
            sr, si = xr.sum(axis=1), xi.sum(axis=1)          # (B, modes)
            vr, vi = w_r.sum(axis=1), w_i.sum(axis=1)        # (O, modes)
            out_r = sr[:, None, :] * vr[None] - si[:, None, :] * vi[None]
            out_i = sr[:, None, :] * vi[None] + si[:, None, :] * vr[None]
        else:
            # complex per-mode channel mixing, in real arithmetic
            out_r = (jnp.einsum("bim,iom->bom", xr, w_r, precision=_HI)
                     - jnp.einsum("bim,iom->bom", xi, w_i, precision=_HI))
            out_i = (jnp.einsum("bim,iom->bom", xr, w_i, precision=_HI)
                     + jnp.einsum("bim,iom->bom", xi, w_r, precision=_HI))

        # inverse real DFT of the zero-padded spectrum
        return (jnp.einsum("bom,mn->bon", out_r, inv_c, precision=_HI)
                + jnp.einsum("bom,mn->bon", out_i, inv_s, precision=_HI))


class FNOBlock1d(nn.Module):
    width: int
    modes: int
    degenerate_mixing: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool):
        """x: (B, width, n)."""
        x1 = SpectralConv1d(
            self.width, self.width, self.modes,
            degenerate_mixing=self.degenerate_mixing,
        )(x)
        # pointwise conv == Dense over the channel axis
        x2 = nn.Dense(self.width, dtype=jnp.float32)(
            x.transpose(0, 2, 1)
        ).transpose(0, 2, 1)
        out = x1 + x2
        # BatchNorm1d over (B, n) per channel; torch momentum 0.1 == flax 0.9
        out = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, axis=1,
            dtype=jnp.float32,
        )(out)
        return nn.gelu(out)


class FNO1dModel(nn.Module):
    n_cases: int = 6
    n_elem: int = 100
    fno_modes: int = 4
    fno_width: int = 128
    num_fno_layers: int = 4
    hidden_units: int = 512
    dropout_rate: float = 0.1
    degenerate_mixing: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        """x: (B, n_cases, feat_dim) -> (B, n_elem)."""
        B = x.shape[0]
        x = x.astype(jnp.float32)
        # lift: feat_dim -> width (OpenPyStruct_FNO_MultiCase_Beta.py:475-478)
        x = nn.Dense(self.fno_width, dtype=jnp.float32)(x)  # (B, Nc, width)
        x = x.transpose(0, 2, 1)  # (B, width, n_cases)
        for _ in range(self.num_fno_layers):
            x = FNOBlock1d(
                self.fno_width, self.fno_modes,
                degenerate_mixing=self.degenerate_mixing,
            )(x, train=train)
        x = x.reshape(B, -1)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(self.hidden_units, dtype=jnp.float32)(x)
        x = nn.leaky_relu(x, negative_slope=0.1)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return nn.Dense(self.n_elem, dtype=jnp.float32)(x)

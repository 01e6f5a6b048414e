"""FNN-with-residual-blocks surrogate.

Reference: ``ResidualBlock`` + ``FNNWithResidual``
(OpenPyStruct_FNN_MultiCase.py:330-380, instantiated with 4 blocks at
:472-478): input Linear -> LeakyReLU(0.01) -> Dropout -> 4 x [Linear +
LeakyReLU + Dropout + skip + LayerNorm + LeakyReLU] -> output Linear.
Input is the flattened (n_cases * feat_dim) multi-case feature vector.

TPU notes: compute runs in a configurable ``dtype`` (bfloat16 by default —
the analog of the reference's AMP autocast) with float32 parameters and a
float32 output head.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


class ResidualBlock(nn.Module):
    dim: int
    dropout_rate: float
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool):
        residual = x
        out = nn.Dense(self.dim, dtype=self.dtype)(x)
        out = nn.leaky_relu(out, negative_slope=0.01)
        out = nn.Dropout(self.dropout_rate, deterministic=not train)(out)
        out = out + residual
        # LayerNorm statistics in float32 for stability.
        out = nn.LayerNorm(dtype=jnp.float32)(out).astype(self.dtype)
        return nn.leaky_relu(out, negative_slope=0.01)


class FNNWithResidual(nn.Module):
    hidden_dim: int = 128
    num_blocks: int = 4
    output_dim: int = 100
    dropout_rate: float = 0.5
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        # Accept (B, n_cases, feat) and flatten, like the reference's
        # host-side reshape (OpenPyStruct_FNN_MultiCase.py:293).
        if x.ndim == 3:
            x = x.reshape(x.shape[0], -1)
        x = x.astype(self.dtype)
        out = nn.Dense(self.hidden_dim, dtype=self.dtype)(x)
        out = nn.leaky_relu(out, negative_slope=0.01)
        out = nn.Dropout(self.dropout_rate, deterministic=not train)(out)
        for _ in range(self.num_blocks):
            out = ResidualBlock(
                self.hidden_dim, self.dropout_rate, dtype=self.dtype
            )(out, train=train)
        out = nn.Dense(self.output_dim, dtype=jnp.float32)(out)
        return out

"""Transformer-Diffusion surrogate.

Reference: ``PositionalEncoding`` (odd-dim-safe sin/cos),
``DiffusionSchedule`` (linear beta 1e-12 -> 1e-5, T=512 — flagged "very
sensitive" at OpenPyStruct_TransformerDiffusionModule_MultiCase.py:423),
``DiffusionModule`` (random t per (B, case), forward-noise, MLP predicts
epsilon, single-step algebraic denoise — applied at train AND eval time) and
``ModelOnePassTransformerWithDiffusion`` (diffusion -> prepend CLS ->
positional encoding -> 2-layer post-LN TransformerEncoder with d_model =
feat_dim / 8 heads / ff 256 -> CLS representation -> MLP -> n_elem)
(TransformerDiffusionModule:383-575).

The diffusion stochasticity uses the ``"diffusion"`` rng collection — pass
``model_rng_keys=("dropout", "diffusion")`` to the harness so noise is drawn
at eval time too, matching the reference's stochastic inference.

TPU note: sequence length is 1 + n_cases (7-9 tokens), so attention is a
tiny MXU matmul — no flash/blockwise machinery is warranted (SURVEY.md
section 5, long-context: N/A).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def sincos_positional_encoding(max_len: int, d_model: int) -> np.ndarray:
    """Odd-dim-safe sin/cos table (reference TFD:383-417)."""
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    n_pairs = d_model // 2
    div_term = np.exp(
        -math.log(10000.0) * np.arange(n_pairs, dtype=np.float32) / d_model
    )
    pe[:, 0 : 2 * n_pairs : 2] = np.sin(position * div_term)
    pe[:, 1 : 2 * n_pairs : 2] = np.cos(position * div_term)
    return pe  # odd d_model: last column stays zero


class DiffusionModule(nn.Module):
    """Single-pass stochastic noise/denoise (reference TFD:428-476)."""

    feat_dim: int
    hidden_dim: int = 256
    T: int = 512
    beta_start: float = 1e-12
    beta_end: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, Nc, F = x.shape
        beta = jnp.linspace(
            self.beta_start, self.beta_end, self.T, dtype=x.dtype
        )
        alpha_cumprod = jnp.cumprod(1.0 - beta)

        rng = self.make_rng("diffusion")
        k_t, k_eps = jax.random.split(rng)
        t = jax.random.randint(k_t, (B, Nc), 0, self.T)
        sac = jnp.sqrt(alpha_cumprod[t])[..., None]          # (B, Nc, 1)
        somac = jnp.sqrt(1.0 - alpha_cumprod[t])[..., None]

        eps = jax.random.normal(k_eps, x.shape, x.dtype)
        x_noisy = sac * x + somac * eps

        h = nn.Dense(self.hidden_dim, dtype=self.dtype)(x_noisy)
        h = nn.relu(h)
        eps_pred = nn.Dense(self.feat_dim, dtype=self.dtype)(h)

        return (x_noisy - somac * eps_pred) / sac


class TransformerEncoderLayer(nn.Module):
    """torch nn.TransformerEncoderLayer, post-LN, relu, batch_first
    (the reference's configuration, TFD:510-523)."""

    d_model: int
    num_heads: int
    dim_feedforward: int
    dropout_rate: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dropout_rate=self.dropout_rate,
            deterministic=not train,
            dtype=self.dtype,
        )(x, x)
        attn = nn.Dropout(self.dropout_rate, deterministic=not train)(attn)
        x = nn.LayerNorm(dtype=jnp.float32)(x + attn).astype(self.dtype)

        ff = nn.Dense(self.dim_feedforward, dtype=self.dtype)(x)
        ff = nn.relu(ff)
        ff = nn.Dropout(self.dropout_rate, deterministic=not train)(ff)
        ff = nn.Dense(self.d_model, dtype=self.dtype)(ff)
        ff = nn.Dropout(self.dropout_rate, deterministic=not train)(ff)
        return nn.LayerNorm(dtype=jnp.float32)(x + ff).astype(self.dtype)


class TransformerDiffusionModel(nn.Module):
    """The reference's ModelOnePassTransformerWithDiffusion (TFD:480-575)."""

    n_cases: int = 6
    feat_dim: int = 120            # must be a multiple of num_heads
    n_elem: int = 100
    hidden_units: int = 128
    num_transformer_layers: int = 2
    num_heads: int = 8
    dim_feedforward: int = 256
    dropout_rate: float = 0.1
    max_len: int = 512
    diffusion_hidden_dim: int = 256
    diffusion_T: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        B, Nc, F = x.shape
        assert Nc == self.n_cases and F == self.feat_dim, (
            f"Input dims {x.shape} do not match "
            f"(B, {self.n_cases}, {self.feat_dim})."
        )
        x = x.astype(self.dtype)
        x = DiffusionModule(
            feat_dim=self.feat_dim,
            hidden_dim=self.diffusion_hidden_dim,
            T=self.diffusion_T,
            dtype=self.dtype,
        )(x)

        cls = self.param(
            "cls_token",
            nn.initializers.normal(stddev=0.02),
            (1, 1, self.feat_dim),
        ).astype(self.dtype)
        x = jnp.concatenate([jnp.tile(cls, (B, 1, 1)), x], axis=1)

        pe = jnp.asarray(
            sincos_positional_encoding(self.max_len, self.feat_dim),
            self.dtype,
        )
        x = x + pe[None, : x.shape[1], :]

        for _ in range(self.num_transformer_layers):
            x = TransformerEncoderLayer(
                d_model=self.feat_dim,
                num_heads=self.num_heads,
                dim_feedforward=self.dim_feedforward,
                dropout_rate=self.dropout_rate,
                dtype=self.dtype,
            )(x, train=train)

        cls_rep = x[:, 0, :]
        h = nn.Dense(self.hidden_units, dtype=self.dtype)(cls_rep)
        h = nn.LayerNorm(dtype=jnp.float32)(h).astype(self.dtype)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        return nn.Dense(self.n_elem, dtype=jnp.float32)(h)

"""Bayesian Transformer-Diffusion surrogates.

Reference: ``BayesianDiffusionMLP`` + ``BayesianOutputMLP`` built on
``torchbnn.BayesLinear(prior_mu=0, prior_sigma=0.01)`` around the same
transformer trunk (OpenPyStruct_Bayesian_TFDModule_MultiCase_Beta.py:392-580,
4 layers / 24 heads / ff 512), KL summed over Bayesian layers and scaled by
``bnn_kl_scale=1e-6`` into train and val losses (BNN:706-709,729-730).
The Meta variant (OpenPyStruct_Bayesian_TFDModule_Meta_MultiCase_Beta.py)
adds a trainable per-element ``output_scales`` multiplier (Meta:551-555,
587-592) and Monte-Carlo mean/std uncertainty via repeated stochastic
forwards (``get_bnn_output_stats``, Meta:806-824) — here a vmap over rng
keys.

Implementation: reparameterized sampling w = mu + exp(log_sigma) * eps per
forward (the ``"bayes"`` rng collection) and the analytic Gaussian KL

    KL(N(mu, s^2) || N(m0, s0^2))
      = log(s0/s) + (s^2 + (mu-m0)^2) / (2 s0^2) - 1/2

summed over all variational parameters — ``bayes_kl`` walks the param tree,
so it plugs into the harness's ``param_loss_fn``.

Reference quirk (not reproduced): the reference computes its KL as
``sum(m.kl_loss() for m in model.modules() if hasattr(m, 'kl_loss'))`` —
torchbnn's BayesLinear has no ``kl_loss`` method, so that sum is empty and
the KL term is silently zero.  Here the KL is real; set the scale to 0 to
replicate the quirk.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from openpystruct_tpu.models.transformer_diffusion import (
    TransformerEncoderLayer,
    sincos_positional_encoding,
)

PRIOR_MU = 0.0
PRIOR_SIGMA = 0.01


class BayesLinear(nn.Module):
    """Variational linear layer: w ~ N(mu, exp(log_sigma)^2), sampled per
    forward via the ``"bayes"`` rng collection."""

    features: int
    prior_mu: float = PRIOR_MU
    prior_sigma: float = PRIOR_SIGMA
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        k = 1.0 / math.sqrt(in_f)

        def sym_uniform(key, shape):
            # torch Linear-style U(-k, k) init for the posterior means;
            # params pinned to float32 regardless of the x64 flag
            return jax.random.uniform(key, shape, jnp.float32, -k, k)

        def log_sigma_init(key, shape):
            return jnp.full(shape, math.log(self.prior_sigma), jnp.float32)

        mu_kernel = self.param("mu_kernel", sym_uniform, (in_f, self.features))
        log_sigma_kernel = self.param(
            "log_sigma_kernel", log_sigma_init, (in_f, self.features)
        )
        mu_bias = self.param("mu_bias", sym_uniform, (self.features,))
        log_sigma_bias = self.param(
            "log_sigma_bias", log_sigma_init, (self.features,)
        )
        rng = self.make_rng("bayes")
        kw, kb = jax.random.split(rng)
        w = mu_kernel + jnp.exp(log_sigma_kernel) * jax.random.normal(
            kw, mu_kernel.shape, self.dtype
        )
        b = mu_bias + jnp.exp(log_sigma_bias) * jax.random.normal(
            kb, mu_bias.shape, self.dtype
        )
        return x.astype(self.dtype) @ w.astype(self.dtype) + b


def bayes_kl(params, prior_mu: float = PRIOR_MU,
             prior_sigma: float = PRIOR_SIGMA):
    """Analytic Gaussian KL summed over every BayesLinear in ``params``.

    Pass ``lambda p: scale * bayes_kl(p)`` as the harness's
    ``param_loss_fn`` (the reference's ``bnn_kl_scale * kl_loss``,
    BNN:706-709).

    Matches any Mapping (plain dict or flax FrozenDict) so the KL cannot
    silently evaluate to 0 when flax returns frozen params — the exact
    silent-zero-KL quirk of the reference's torchbnn setup this module
    documents fixing."""
    from collections.abc import Mapping

    total = 0.0

    def visit(tree):
        nonlocal total
        if isinstance(tree, Mapping):
            if "mu_kernel" in tree and "log_sigma_kernel" in tree:
                for mu_k, ls_k in (
                    ("mu_kernel", "log_sigma_kernel"),
                    ("mu_bias", "log_sigma_bias"),
                ):
                    mu, ls = tree[mu_k], tree[ls_k]
                    sigma2 = jnp.exp(2.0 * ls)
                    total = total + jnp.sum(
                        math.log(prior_sigma)
                        - ls
                        + (sigma2 + (mu - prior_mu) ** 2)
                        / (2.0 * prior_sigma**2)
                        - 0.5
                    )
            else:
                for v in tree.values():
                    visit(v)

    visit(params)
    return total


class BayesianDiffusionMLP(nn.Module):
    """BayesLinear -> LayerNorm -> LeakyReLU(0.1) -> Dropout -> BayesLinear
    (BNN:392-421)."""

    feat_dim: int
    hidden_dim: int
    dropout_rate: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        x = BayesLinear(self.hidden_dim, dtype=self.dtype)(x)
        x = nn.LayerNorm(dtype=jnp.float32)(x).astype(self.dtype)
        x = nn.leaky_relu(x, negative_slope=0.1)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return BayesLinear(self.feat_dim, dtype=self.dtype)(x)


class BayesianDiffusionModule(nn.Module):
    """The diffusion noise/denoise pass with a Bayesian epsilon-predictor
    (BNN:424-470)."""

    feat_dim: int
    hidden_dim: int = 512
    T: int = 512
    beta_start: float = 1e-12
    beta_end: float = 1e-5
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        B, Nc, F = x.shape
        beta = jnp.linspace(
            self.beta_start, self.beta_end, self.T, dtype=x.dtype
        )
        alpha_cumprod = jnp.cumprod(1.0 - beta)
        rng = self.make_rng("diffusion")
        k_t, k_eps = jax.random.split(rng)
        t = jax.random.randint(k_t, (B, Nc), 0, self.T)
        sac = jnp.sqrt(alpha_cumprod[t])[..., None]
        somac = jnp.sqrt(1.0 - alpha_cumprod[t])[..., None]
        eps = jax.random.normal(k_eps, x.shape, x.dtype)
        x_noisy = sac * x + somac * eps
        eps_pred = BayesianDiffusionMLP(
            self.feat_dim, self.hidden_dim, self.dropout_rate,
            dtype=self.dtype,
        )(x_noisy, train=train)
        return (x_noisy - somac * eps_pred) / sac


class BayesianOutputMLP(nn.Module):
    """BayesLinear -> LayerNorm -> LeakyReLU(0.1) -> Dropout -> BayesLinear
    (BNN:473-501)."""

    hidden_dim: int
    out_dim: int
    dropout_rate: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        x = BayesLinear(self.hidden_dim, dtype=self.dtype)(x)
        x = nn.LayerNorm(dtype=jnp.float32)(x).astype(self.dtype)
        x = nn.leaky_relu(x, negative_slope=0.1)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return BayesLinear(self.out_dim, dtype=self.dtype)(x)


class BayesianTransformerDiffusionModel(nn.Module):
    """The Bayesian TFD (BNN:503-580).  ``use_output_scales=True`` gives the
    Meta variant's trainable per-element multiplier (Meta:551-555,587-592);
    the Meta script also uses n_cases=8, dropout 0.01, c=1."""

    n_cases: int = 6
    feat_dim: int = 120            # padded to a multiple of num_heads
    n_elem: int = 100
    hidden_units: int = 512
    num_transformer_layers: int = 4
    num_heads: int = 24
    dim_feedforward: int = 512
    dropout_rate: float = 0.1
    max_len: int = 512
    diffusion_hidden_dim: int = 512
    diffusion_T: int = 512
    use_output_scales: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        B, Nc, F = x.shape
        assert Nc == self.n_cases and F == self.feat_dim, (
            f"Input dims {x.shape} do not match "
            f"(B, {self.n_cases}, {self.feat_dim})."
        )
        x = x.astype(self.dtype)
        x = BayesianDiffusionModule(
            feat_dim=self.feat_dim,
            hidden_dim=self.diffusion_hidden_dim,
            T=self.diffusion_T,
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
        )(x, train=train)

        cls = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.feat_dim)
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
        out = BayesianOutputMLP(
            self.hidden_units, self.n_elem, self.dropout_rate,
            dtype=self.dtype,
        )(cls_rep, train=train)
        if self.use_output_scales:
            scales = self.param(
                "output_scales", nn.initializers.ones, (self.n_elem,)
            )
            out = out * scales
        return out.astype(jnp.float32)


import functools


@functools.lru_cache(maxsize=16)
def _mc_forward(model):
    """Jitted vmapped stochastic forward for one (hashable) flax module."""

    @jax.jit
    def run(variables, x, keys):
        def one(key):
            kb, kd, kdo = jax.random.split(key, 3)
            return model.apply(
                variables, x, train=False,
                rngs={"bayes": kb, "diffusion": kd, "dropout": kdo},
            )

        return jax.vmap(one)(keys)

    return run


def mc_output_stats(model, variables, x, n_samples: int = 50, rng=None,
                    scaler_Y=None):
    """Monte-Carlo predictive mean/std over stochastic forwards — the Meta
    script's ``get_bnn_output_stats`` (Meta:806-824) with 50 samples at
    inference (Meta:864), vmapped over rng keys on-device.

    Returns (mean (B, n_elem), std (B, n_elem)); with ``scaler_Y`` the mean
    is inverse-transformed and the std multiplied by ``scaler_Y.scale``
    (Meta:864-868)."""
    import numpy as np

    if rng is None:
        rng = jax.random.PRNGKey(0)
    keys = jax.random.split(rng, n_samples)

    # (n_samples, B, n_elem); the jitted vmap is cached per model — a fresh
    # jax.jit wrapper per call would recompile every time (its compile
    # cache lives on the wrapper object)
    preds = _mc_forward(model)(variables, x, keys)
    mean = np.asarray(preds.mean(axis=0))
    std = np.asarray(preds.std(axis=0))
    if scaler_Y is not None:
        mean = scaler_Y.inverse_transform(mean)
        std = std * np.asarray(scaler_Y.scale)
    return mean, std

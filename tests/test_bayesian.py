"""Bayesian TFD tests: stochastic weights, analytic KL, MC uncertainty."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from openpystruct_tpu.config import TrainConfig
from openpystruct_tpu.models import (
    BayesLinear,
    BayesianTransformerDiffusionModel,
    bayes_kl,
    mc_output_stats,
)
from openpystruct_tpu.train import fit

B, N_CASES, FEAT, NELEM = 4, 6, 24, 10

RNGS = ("dropout", "diffusion", "bayes")


def small_model(**kw):
    return BayesianTransformerDiffusionModel(
        n_cases=N_CASES, feat_dim=FEAT, n_elem=NELEM, hidden_units=16,
        num_transformer_layers=1, num_heads=8, dim_feedforward=16,
        dropout_rate=0.0, diffusion_hidden_dim=16, **kw,
    )


def rand_x():
    return jax.random.normal(
        jax.random.PRNGKey(0), (B, N_CASES, FEAT), jnp.float32
    )


def init_vars(model, x):
    rngs = {"params": jax.random.PRNGKey(0)}
    for i, k in enumerate(RNGS):
        rngs[k] = jax.random.PRNGKey(i + 1)
    return model.init(rngs, x, train=True)


def test_bayes_linear_stochastic_and_kl():
    layer = BayesLinear(8)
    x = jnp.ones((3, 5))
    v = layer.init(
        {"params": jax.random.PRNGKey(0), "bayes": jax.random.PRNGKey(1)}, x
    )
    o1 = layer.apply(v, x, rngs={"bayes": jax.random.PRNGKey(2)})
    o2 = layer.apply(v, x, rngs={"bayes": jax.random.PRNGKey(3)})
    assert not jnp.allclose(o1, o2)  # weights resampled per forward
    # KL at init: sigma == prior_sigma, so KL = sum (mu - mu0)^2 / (2 s0^2)
    kl = bayes_kl(v["params"])
    mus = jnp.concatenate(
        [v["params"]["mu_kernel"].ravel(), v["params"]["mu_bias"].ravel()]
    )
    expect = float(jnp.sum(mus**2) / (2 * 0.01**2))
    np.testing.assert_allclose(float(kl), expect, rtol=1e-5)


def test_bayesian_tfd_shapes_and_scales():
    x = rand_x()
    m = small_model(use_output_scales=True)
    v = init_vars(m, x)
    assert v["params"]["output_scales"].shape == (NELEM,)
    out = m.apply(v, x, train=False,
                  rngs={k: jax.random.PRNGKey(9) for k in RNGS})
    assert out.shape == (B, NELEM)
    m0 = small_model()
    v0 = init_vars(m0, x)
    assert "output_scales" not in v0["params"]


def test_mc_output_stats():
    x = rand_x()
    m = small_model()
    v = init_vars(m, x)
    mean, std = mc_output_stats(m, v, x, n_samples=16,
                                rng=jax.random.PRNGKey(5))
    assert mean.shape == (B, NELEM) and std.shape == (B, NELEM)
    assert (std > 0).all()  # weight sampling induces spread


def test_bayesian_tfd_trains_with_kl():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(24, N_CASES, FEAT)).astype(np.float32)
    Y = rng.normal(size=(24, NELEM)).astype(np.float32)
    cfg = TrainConfig(num_epochs=5, batch_size=8, patience=20, sigma_0=0.0,
                      learning_rate=1e-3)
    res = fit(
        small_model(), X[:16], Y[:16], X[16:], Y[16:], cfg,
        model_rng_keys=RNGS,
        param_loss_fn=lambda p: 1e-6 * bayes_kl(p),
    )
    assert np.isfinite(res.train_losses).all()
    assert res.train_losses[-1] < res.train_losses[0]

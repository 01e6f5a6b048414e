"""Family registry: every named family builds and trains on tiny data."""

import dataclasses

import jax
import numpy as np
import pytest

from openpystruct_tpu.families import FAMILIES, build_family
from openpystruct_tpu.train import fit


@pytest.mark.parametrize("name", sorted(FAMILIES))
def test_family_builds_and_fits(name):
    spec = FAMILIES[name]
    n_cases = spec.train.n_cases
    nelem = 12
    feat_base = 20
    nheads = spec.nheads_pad or 1
    feat_dim = ((feat_base + nheads - 1) // nheads) * nheads
    label_dim = nelem + 2 * (nelem + 1) if name == "pinn" else nelem

    model, spec, fit_kwargs = build_family(
        name, feat_dim, nelem=nelem, label_dim=label_dim
    )
    cfg = dataclasses.replace(
        spec.train, num_epochs=2, batch_size=8, patience=10, sigma_0=0.0
    )
    rng = np.random.default_rng(0)
    X = rng.normal(size=(24, n_cases, feat_dim)).astype(np.float32)
    Y = rng.normal(size=(24, label_dim)).astype(np.float32)
    res = fit(model, X[:16], Y[:16], X[16:], Y[16:], cfg,
              rng=jax.random.PRNGKey(0), **fit_kwargs)
    assert np.isfinite(res.train_losses).all()
    assert len(res.train_losses) == 2


@pytest.mark.parametrize("name", sorted(FAMILIES))
def test_compute_dtype_threaded(name):
    """C19 AMP analog: every family computes in its config compute_dtype —
    bfloat16 by default, FNO pinned float32 (the reference's AMP exception,
    OpenPyStruct_FNO_MultiCase_Beta.py:617-618) — and the override reaches
    the model."""
    import jax.numpy as jnp

    spec = FAMILIES[name]
    expected = "float32" if name == "fno" else "bfloat16"
    assert spec.train.compute_dtype == expected

    model, _, _ = build_family(name, feat_dim=24, nelem=10, label_dim=10)
    if hasattr(model, "dtype"):  # FNO1dModel hard-pins f32 internally
        assert model.dtype == (jnp.float32 if name == "fno"
                               else jnp.bfloat16)

    m32, s32, _ = build_family(name, feat_dim=24, nelem=10, label_dim=10,
                               compute_dtype="float32")
    assert s32.train.compute_dtype == "float32"
    if hasattr(m32, "dtype"):
        assert m32.dtype == jnp.float32

    # forward output stays float32 regardless of compute dtype (the loss
    # runs full-precision, like GradScaler-managed AMP)
    X = jnp.zeros((2, spec.train.n_cases, 24), jnp.float32)
    rngs = {k: jax.random.PRNGKey(i)
            for i, k in enumerate(("params",) + spec.model_rng_keys)}
    variables = model.init(rngs, X, train=False)
    out = model.apply(variables, X, train=False,
                      rngs={k: rngs[k] for k in spec.model_rng_keys})
    assert out.dtype == jnp.float32


def test_fno_rejects_low_precision():
    with pytest.raises(ValueError, match="pinned float32"):
        build_family("fno", feat_dim=24, nelem=10,
                     compute_dtype="bfloat16")


def test_reference_hyperparameters_pinned():
    """Spot-check hyperparameters against the reference constants blocks."""
    assert FAMILIES["fnn"].train.learning_rate == 2e-4
    assert FAMILIES["fnn"].train.c == 1.0
    assert FAMILIES["pinn"].train.hidden_units == 350
    assert FAMILIES["pinn"].train.box_constraint_coeff == 1e-1
    assert FAMILIES["fno"].train.weight_decay == 1e-6
    assert FAMILIES["gnn"].decoupled_weight_decay
    assert FAMILIES["tfd"].train.gamma_noise == 0.90
    assert FAMILIES["bnn"].train.learning_rate == 3e-4
    assert FAMILIES["bnn-meta"].train.n_cases == 8
    assert FAMILIES["bnn-meta"].train.c == 1.0
    assert FAMILIES["bnn-meta"].train.dropout_rate == 0.01

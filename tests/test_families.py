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

"""Golden-shape + training smoke tests for each surrogate family."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openpystruct_tpu.config import TrainConfig
from openpystruct_tpu.models import (
    ChainGNN,
    FNO1dModel,
    FNNWithResidual,
    PINNWithResidual,
    TransformerDiffusionModel,
    composite_pinn_loss,
)
from openpystruct_tpu.train import fit

B, N_CASES, FEAT, NELEM = 8, 6, 24, 16


def rand_x(rng=0, feat=FEAT):
    return jax.random.normal(
        jax.random.PRNGKey(rng), (B, N_CASES, feat), jnp.float32
    )


def init_and_apply(model, x, rng_keys=("dropout",)):
    rngs = {"params": jax.random.PRNGKey(0)}
    for i, k in enumerate(rng_keys):
        rngs[k] = jax.random.PRNGKey(i + 1)
    variables = model.init(rngs, x, train=True)
    apply_rngs = {k: jax.random.PRNGKey(10 + i)
                  for i, k in enumerate(rng_keys)}
    if "batch_stats" in variables:
        out, _ = model.apply(
            variables, x, train=True, rngs=apply_rngs,
            mutable=["batch_stats"],
        )
    else:
        out = model.apply(variables, x, train=True, rngs=apply_rngs)
    return out, variables


def test_fnn_shape():
    out, _ = init_and_apply(
        FNNWithResidual(hidden_dim=32, num_blocks=2, output_dim=NELEM,
                        dropout_rate=0.1, dtype=jnp.float32),
        rand_x(),
    )
    assert out.shape == (B, NELEM)


def test_gnn_shape():
    out, _ = init_and_apply(
        ChainGNN(n_elem=NELEM, encoder_hidden_dim=32, gnn_hidden_dim=16,
                 dropout_rate=0.1, dtype=jnp.float32),
        rand_x(),
    )
    assert out.shape == (B, NELEM)


@pytest.mark.parametrize("degenerate", [False, True])
def test_fno_shape(degenerate):
    out, variables = init_and_apply(
        FNO1dModel(n_cases=N_CASES, n_elem=NELEM, fno_modes=4, fno_width=16,
                   num_fno_layers=2, hidden_units=32, dropout_rate=0.1,
                   degenerate_mixing=degenerate),
        rand_x(),
    )
    assert out.shape == (B, NELEM)
    assert "batch_stats" in variables  # BatchNorm present
    assert jnp.isfinite(out).all()


def test_pinn_shape_and_loss():
    out_dim = NELEM + 2 * (NELEM + 1)
    out, variables = init_and_apply(
        PINNWithResidual(hidden_dim=48, num_blocks=2, output_dim=out_dim,
                         dropout_rate=0.1),
        rand_x(),
    )
    assert out.shape == (B, out_dim)
    assert "batch_stats" in variables
    targets = jnp.ones_like(out)
    loss = composite_pinn_loss(0.5, out, targets, nelem=NELEM,
                               min_constraint=-1.0, max_constraint=1.0)
    assert jnp.isfinite(loss)


def test_pinn_layernorm_variant():
    out, variables = init_and_apply(
        PINNWithResidual(hidden_dim=32, num_blocks=1, output_dim=NELEM,
                         dropout_rate=0.1, norm_type="layer",
                         use_conv=False),
        rand_x(),
    )
    assert out.shape == (B, NELEM)
    assert "batch_stats" not in variables


def test_tfd_shape_and_stochasticity():
    model = TransformerDiffusionModel(
        n_cases=N_CASES, feat_dim=FEAT, n_elem=NELEM, hidden_units=32,
        num_transformer_layers=2, num_heads=8, dim_feedforward=32,
        dropout_rate=0.1,
    )
    x = rand_x()
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "diffusion": jax.random.PRNGKey(2)}
    variables = model.init(rngs, x, train=True)
    out1 = model.apply(variables, x, train=False,
                       rngs={"diffusion": jax.random.PRNGKey(3)})
    out2 = model.apply(variables, x, train=False,
                       rngs={"diffusion": jax.random.PRNGKey(4)})
    assert out1.shape == (B, NELEM)
    # the diffusion pass is stochastic at eval time, like the reference
    assert not jnp.allclose(out1, out2)
    # but tiny: beta <= 1e-5 keeps the denoised features close to the input
    assert jnp.max(jnp.abs(out1 - out2)) < 1.0


def synth_xy(label_dim=NELEM, n=32, feat=FEAT):
    rng = np.random.default_rng(0)
    X = rng.normal(size=(n, N_CASES, feat)).astype(np.float32)
    W = rng.normal(size=(N_CASES * feat, label_dim)).astype(np.float32) * 0.1
    Y = X.reshape(n, -1) @ W + 0.01 * rng.normal(size=(n, label_dim))
    return X, Y.astype(np.float32)


@pytest.mark.parametrize(
    "name",
    ["gnn", "fno", "pinn", "tfd"],
)
def test_each_model_trains(name):
    cfg = TrainConfig(num_epochs=8, batch_size=8, patience=20, sigma_0=0.0,
                      learning_rate=1e-3, dropout_rate=0.0)
    label_dim = NELEM
    rng_keys = ("dropout",)
    loss_fn = None
    if name == "gnn":
        model = ChainGNN(n_elem=NELEM, encoder_hidden_dim=32,
                         gnn_hidden_dim=16, dropout_rate=0.0,
                         dtype=jnp.float32)
    elif name == "fno":
        model = FNO1dModel(n_cases=N_CASES, n_elem=NELEM, fno_modes=4,
                           fno_width=16, num_fno_layers=2, hidden_units=32,
                           dropout_rate=0.0)
    elif name == "pinn":
        label_dim = NELEM + 2 * (NELEM + 1)
        model = PINNWithResidual(hidden_dim=48, num_blocks=2,
                                 output_dim=label_dim, dropout_rate=0.0)

        def loss_fn(alpha, preds, targets):
            return composite_pinn_loss(alpha, preds, targets, nelem=NELEM,
                                       min_constraint=None,
                                       max_constraint=None)
    else:
        model = TransformerDiffusionModel(
            n_cases=N_CASES, feat_dim=FEAT, n_elem=NELEM, hidden_units=32,
            num_transformer_layers=1, num_heads=8, dim_feedforward=32,
            dropout_rate=0.0,
        )
        rng_keys = ("dropout", "diffusion")
    X, Y = synth_xy(label_dim)
    res = fit(model, X[:24], Y[:24], X[24:], Y[24:], cfg,
              loss_fn=loss_fn, model_rng_keys=rng_keys,
              decoupled_weight_decay=(name == "gnn"))
    assert np.isfinite(res.train_losses).all()
    assert res.train_losses[-1] < res.train_losses[0]


def test_spectral_conv_matches_complex_fft_oracle():
    """The TPU-safe real-DFT-matmul spectral conv must equal the complex
    rfft -> truncate -> mix -> zero-pad -> irfft formulation (numpy oracle)
    to float32 round-off — across even/odd lengths, Nyquist-inclusive mode
    counts, over-long mode counts, and the degenerate-mixing quirk."""
    import numpy as np

    from openpystruct_tpu.models.fno import SpectralConv1d

    rng = np.random.default_rng(0)
    for n, modes, degen in [(6, 4, False), (6, 4, True), (8, 4, False),
                            (7, 4, False), (9, 5, True), (6, 10, False)]:
        B, C, O = 3, 5, 5
        x = jnp.asarray(rng.normal(size=(B, C, n)).astype(np.float32))
        mod = SpectralConv1d(C, O, modes, degenerate_mixing=degen)
        params = mod.init(jax.random.PRNGKey(0), x)
        y = np.asarray(mod.apply(params, x))

        wr = np.asarray(params["params"]["weights_real"])
        wi = np.asarray(params["params"]["weights_imag"])
        m_eff = min(modes, n // 2 + 1)
        w = (wr + 1j * wi)[:, :, :m_eff]
        x_ft = np.fft.rfft(np.asarray(x), n=n, axis=-1)
        xm = x_ft[:, :, :m_eff]
        if degen:
            out_m = xm.sum(axis=1)[:, None, :] * w.sum(axis=1)[None, :, :]
        else:
            out_m = np.einsum("bim,iom->bom", xm, w)
        out_ft = np.zeros((B, O, x_ft.shape[-1]), np.complex128)
        out_ft[:, :, :m_eff] = out_m
        ref = np.fft.irfft(out_ft, n=n, axis=-1)
        err = np.abs(y - ref).max() / (np.abs(ref).max() + 1e-12)
        assert err < 1e-5, (n, modes, degen, err)

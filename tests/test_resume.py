"""Mid-run training resume: a run killed at a sync boundary and resumed must
reproduce the uninterrupted val-loss trajectory exactly (VERDICT.md round 1,
next-round item 5)."""

import numpy as np
import pytest

import jax

from openpystruct_tpu.config import TrainConfig
from openpystruct_tpu.models import FNNWithResidual
from openpystruct_tpu.train import fit

pytest.importorskip("orbax.checkpoint")


def _data(seed=0, B=64, n_cases=4, feat=12, nelem=10):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(B, n_cases, feat)).astype(np.float32)
    Y = rng.normal(size=(B, nelem)).astype(np.float32)
    Xv = rng.normal(size=(16, n_cases, feat)).astype(np.float32)
    Yv = rng.normal(size=(16, nelem)).astype(np.float32)
    return X, Y, Xv, Yv


def _model(nelem=10):
    return FNNWithResidual(hidden_dim=16, num_blocks=1, output_dim=nelem,
                           dropout_rate=0.1)


def test_kill_and_resume_reproduces_trajectory(tmp_path):
    X, Y, Xv, Yv = _data()
    cfg = TrainConfig(num_epochs=8, batch_size=16, patience=50,
                      hidden_units=16)
    ckpt = str(tmp_path / "state")

    # Uninterrupted reference run.
    full = fit(_model(), X, Y, Xv, Yv, cfg, rng=jax.random.PRNGKey(7),
               epochs_per_sync=2)

    # "Killed" run: stop after 4 epochs, checkpointing every chunk.
    cfg_half = TrainConfig(num_epochs=4, batch_size=16, patience=50,
                           hidden_units=16)
    part = fit(_model(), X, Y, Xv, Yv, cfg_half, rng=jax.random.PRNGKey(7),
               epochs_per_sync=2, checkpoint_dir=ckpt)
    np.testing.assert_allclose(part.val_losses, full.val_losses[:4],
                               rtol=1e-6)

    # Resume to the full budget.
    resumed = fit(_model(), X, Y, Xv, Yv, cfg, rng=jax.random.PRNGKey(7),
                  epochs_per_sync=2, resume_from=ckpt)
    assert len(resumed.val_losses) == 8
    np.testing.assert_allclose(resumed.val_losses, full.val_losses,
                               rtol=1e-6)
    np.testing.assert_allclose(resumed.train_losses, full.train_losses,
                               rtol=1e-6)
    assert resumed.best_epoch == full.best_epoch
    # best params identical too
    for a, b in zip(jax.tree.leaves(resumed.params),
                    jax.tree.leaves(full.params)):
        np.testing.assert_allclose(a, b, rtol=1e-6)


def test_resume_restores_optimizer_state(tmp_path):
    # A fresh-optimizer restart would diverge immediately from the
    # uninterrupted run; equality above already guards this, but check the
    # restored Adam moments are non-trivial (not zero-initialized).
    X, Y, Xv, Yv = _data(seed=1)
    cfg = TrainConfig(num_epochs=2, batch_size=16, patience=50,
                      hidden_units=16)
    ckpt = str(tmp_path / "state")
    fit(_model(), X, Y, Xv, Yv, cfg, rng=jax.random.PRNGKey(0),
        epochs_per_sync=1, checkpoint_dir=ckpt)

    import os

    from openpystruct_tpu.train.checkpoint import load_checkpoint

    raw = load_checkpoint(os.path.join(ckpt, "tree"))
    moments = [
        np.asarray(x) for x in jax.tree.leaves(raw["state"]["opt_state"])
        if hasattr(x, "shape") and getattr(x, "size", 0) > 1
    ]
    assert any(np.abs(m).max() > 0 for m in moments)
    with np.load(os.path.join(ckpt, "aux.npz")) as aux:
        assert int(aux["epoch0"]) == 2

"""End-to-end surrogate training test: datagen -> pipeline -> FNN -> R^2."""

import jax
import jax.numpy as jnp
import numpy as np

from openpystruct_tpu.config import OptimizerConfig, TrainConfig
from openpystruct_tpu.data import prepare_dataset
from openpystruct_tpu.datagen import generate_dataset
from openpystruct_tpu.models import FNNWithResidual
from openpystruct_tpu.train import evaluate_r2, fit, predict

FAST_OPT = OptimizerConfig(max_epochs=40, tolerance=5e-3, patience=5)


def small_dataset(n=96):
    return generate_dataset(
        jax.random.PRNGKey(0), n, batch_size=n, opt_cfg=FAST_OPT
    )


def test_fnn_end_to_end_loss_decreases():
    data = small_dataset()
    ds = prepare_dataset(data, n_cases=6, train_split=0.75, seed=0)
    cfg = TrainConfig(
        num_epochs=30, batch_size=4, patience=30, dropout_rate=0.1,
        learning_rate=1e-3, sigma_0=0.0,
    )
    model = FNNWithResidual(
        hidden_dim=64, num_blocks=2, output_dim=ds.label_dim,
        dropout_rate=cfg.dropout_rate, dtype=jnp.float32,
    )
    res = fit(model, ds.X_train, ds.Y_train, ds.X_val, ds.Y_val, cfg)
    assert res.train_losses[-1] < res.train_losses[0] * 0.9
    r2 = evaluate_r2(model, res.params, ds.X_val, ds.Y_val, ds.scaler_Y)
    assert np.isfinite(r2)
    preds = predict(model, res.params, ds.X_val, ds.scaler_Y)
    assert preds.shape == (ds.X_val.shape[0], ds.label_dim)
    assert (preds >= 0).all()  # clipped at 0 like the reference eval


def test_fnn_alpha_trains_and_freezes():
    data = small_dataset()
    ds = prepare_dataset(data, n_cases=6, train_split=0.75, seed=0)
    cfg = TrainConfig(num_epochs=5, batch_size=4, patience=50, sigma_0=0.0)
    model = FNNWithResidual(
        hidden_dim=32, num_blocks=1, output_dim=ds.label_dim,
        dropout_rate=0.0, dtype=jnp.float32,
    )
    res_t = fit(model, ds.X_train, ds.Y_train, ds.X_val, ds.Y_val, cfg,
                train_alpha=True)
    res_f = fit(model, ds.X_train, ds.Y_train, ds.X_val, ds.Y_val, cfg,
                train_alpha=False)
    assert abs(float(res_t.state.params["alpha"]) - 0.5) > 1e-6
    # faithful reference mode: alpha never moves
    assert float(res_f.state.params["alpha"]) == 0.5


def test_fnn_data_parallel_matches_single(tmp_path):
    from openpystruct_tpu.parallel import default_mesh

    data = small_dataset(192)  # 32 groups -> 24 train / 8 val (8 devices)
    ds = prepare_dataset(data, n_cases=6, train_split=0.75, seed=0)
    cfg = TrainConfig(num_epochs=3, batch_size=8, patience=50, sigma_0=0.0,
                      dropout_rate=0.0)
    model = FNNWithResidual(
        hidden_dim=32, num_blocks=1, output_dim=ds.label_dim,
        dropout_rate=0.0, dtype=jnp.float32,
    )
    r_single = fit(model, ds.X_train, ds.Y_train, ds.X_val, ds.Y_val, cfg,
                   rng=jax.random.PRNGKey(7))
    mesh = default_mesh(("data",))
    r_mesh = fit(model, ds.X_train, ds.Y_train, ds.X_val, ds.Y_val, cfg,
                 rng=jax.random.PRNGKey(7), mesh=mesh)
    # identical math, just sharded: final losses agree tightly
    np.testing.assert_allclose(
        r_single.val_losses, r_mesh.val_losses, rtol=1e-4
    )


def test_fit_metrics_logger(tmp_path):
    from openpystruct_tpu.utils import MetricsLogger

    data = small_dataset()
    ds = prepare_dataset(data, n_cases=6, train_split=0.75, seed=0)
    cfg = TrainConfig(num_epochs=3, batch_size=4, patience=50, sigma_0=0.0)
    model = FNNWithResidual(hidden_dim=16, num_blocks=1,
                            output_dim=ds.label_dim, dropout_rate=0.0,
                            dtype=jnp.float32)
    m = MetricsLogger(jsonl=str(tmp_path / "m.jsonl"))
    fit(model, ds.X_train, ds.Y_train, ds.X_val, ds.Y_val, cfg, metrics=m)
    assert len(m.column("train_loss")) == 3
    assert all(isinstance(v, float) for v in m.column("val_loss"))


def test_checkpoint_roundtrip(tmp_path):
    from openpystruct_tpu.train import load_checkpoint, save_checkpoint

    tree = {
        "model": {"w": jnp.arange(6.0).reshape(2, 3)},
        "alpha": jnp.asarray(0.5),
    }
    p = str(tmp_path / "ckpt")
    save_checkpoint(p, tree)
    back = load_checkpoint(p, target=tree)
    np.testing.assert_allclose(back["model"]["w"], tree["model"]["w"])


def test_full_val_early_stop_metric_ragged():
    """The early-stop val metric must see EVERY val sample: with a ragged
    val size (n_val not a multiple of batch), fit's recorded val losses
    equal a by-hand full-set evaluation (mean over all batches including
    the ragged tail, the reference DataLoader semantics) — and differ from
    the truncated evaluation round 2 performed."""
    from openpystruct_tpu.models.losses import trainable_l1l2_loss

    rng = np.random.default_rng(0)
    X_tr = rng.normal(size=(32, 10)).astype(np.float32)
    Y_tr = (X_tr[:, :3] * 2.0).astype(np.float32)
    # 11 val samples, batch 4 -> 2 full batches + tail of 3
    X_val = rng.normal(size=(11, 10)).astype(np.float32)
    Y_val = (X_val[:, :3] * 2.0).astype(np.float32)

    cfg = TrainConfig(num_epochs=1, batch_size=4, patience=10, sigma_0=0.0)
    model = FNNWithResidual(
        hidden_dim=16, num_blocks=1, output_dim=3, dropout_rate=0.0,
        dtype=jnp.float32,
    )
    res = fit(model, X_tr, Y_tr, X_val, Y_val, cfg,
              rng=jax.random.PRNGKey(3))

    # by-hand full-set evaluation at the final params (num_epochs=1 and
    # patience>epochs => final state == the state val was computed at)
    params = res.state.params
    min_c, max_c = float(Y_tr.min()), float(Y_tr.max())

    def batch_loss(Xb, Yb):
        preds = model.apply({"params": params["model"]},
                            jnp.asarray(Xb), train=False)
        loss = trainable_l1l2_loss(
            params["alpha"], preds, jnp.asarray(Yb), min_c, max_c,
            cfg.box_constraint_coeff,
        )
        return float(loss + (cfg.initial_alpha - params["alpha"]) ** 2)

    losses = [batch_loss(X_val[i:i + 4], Y_val[i:i + 4])
              for i in range(0, 11, 4)]
    assert len(losses) == 3  # 4 + 4 + 3
    full = sum(losses) / len(losses)
    truncated = sum(losses[:2]) / 2
    got = float(res.val_losses[-1])
    assert got == pytest_approx(full), (got, full)
    assert abs(got - truncated) > 1e-9, "val metric still truncates"


def pytest_approx(x):
    import pytest

    return pytest.approx(x, rel=1e-5)


def test_trajectory_independent_of_epochs_per_sync():
    """The documented fit() contract: trajectories/histories/best are
    bit-identical for ANY epochs_per_sync.  Epoch rng keys must derive
    from fold_in(base, epoch) — a chunk-chained key stream would make
    epoch k's shuffle/noise depend on where its sync boundary fell."""
    rng = np.random.default_rng(1)
    X_tr = rng.normal(size=(24, 8)).astype(np.float32)
    Y_tr = (X_tr[:, :3] * 1.5).astype(np.float32)
    X_val = rng.normal(size=(9, 8)).astype(np.float32)
    Y_val = (X_val[:, :3] * 1.5).astype(np.float32)

    cfg = TrainConfig(num_epochs=7, batch_size=4, patience=50,
                      sigma_0=0.05, dropout_rate=0.2)
    model = FNNWithResidual(
        hidden_dim=16, num_blocks=1, output_dim=3,
        dropout_rate=cfg.dropout_rate, dtype=jnp.float32,
    )
    runs = [
        fit(model, X_tr, Y_tr, X_val, Y_val, cfg,
            rng=jax.random.PRNGKey(7), epochs_per_sync=k)
        for k in (1, 3, 8)
    ]
    for other in runs[1:]:
        np.testing.assert_array_equal(
            np.asarray(runs[0].train_losses), np.asarray(other.train_losses)
        )
        np.testing.assert_array_equal(
            np.asarray(runs[0].val_losses), np.asarray(other.val_losses)
        )
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            runs[0].params, other.params,
        )


def test_per_shard_epoch_batches_keep_rows_on_device():
    """per_shard shuffling: every device's slice of every batch comes from
    that device's resident rows (zero cross-shard movement), each row used
    at most once per epoch."""
    from openpystruct_tpu.parallel import default_mesh, make_global_batch
    from openpystruct_tpu.train.harness import _per_shard_epoch_batches

    mesh = default_mesh(("data",))
    n_shards = mesh.shape["data"]
    rows_per_shard, steps, batch = 8, 2, 4 * n_shards
    n = rows_per_shard * n_shards
    # row id encoded in the feature value; contiguous sharding puts rows
    # [i*rps, (i+1)*rps) on shard i
    X = np.arange(n, dtype=np.float32)[:, None] * np.ones((1, 3), np.float32)
    Y = np.arange(n, dtype=np.float32)[:, None]
    Xg = make_global_batch(X, mesh, "data")
    Yg = make_global_batch(Y, mesh, "data")

    Xe, Ye = jax.jit(
        lambda k, X, Y: _per_shard_epoch_batches(
            k, X, Y, steps, batch, mesh, "data"
        )
    )(jax.random.PRNGKey(0), Xg, Yg)
    assert Xe.shape == (steps, batch, 3) and Ye.shape == (steps, batch, 1)
    ids = np.asarray(Ye)[..., 0]          # (steps, batch) of row ids
    lbatch = batch // n_shards
    per_dev = ids.reshape(steps, n_shards, lbatch)
    for i in range(n_shards):
        got = per_dev[:, i, :].ravel()
        lo, hi = i * rows_per_shard, (i + 1) * rows_per_shard
        assert ((got >= lo) & (got < hi)).all(), (i, got)
        assert len(np.unique(got)) == got.size  # no row reused in an epoch
    np.testing.assert_array_equal(np.asarray(Xe)[..., 0], ids)


def test_per_shard_without_mesh_warns():
    """ADVICE r4: requesting the zero-communication shuffle where it cannot
    take effect (no mesh / single shard) must warn, not silently run the
    global shuffle."""
    import pytest

    data = small_dataset(48)
    ds = prepare_dataset(data, n_cases=6, train_split=0.75, seed=0)
    cfg = TrainConfig(num_epochs=1, batch_size=8, patience=50, sigma_0=0.0,
                      dropout_rate=0.0)
    model = FNNWithResidual(
        hidden_dim=16, num_blocks=1, output_dim=ds.label_dim,
        dropout_rate=0.0, dtype=jnp.float32,
    )
    with pytest.warns(UserWarning, match="per_shard"):
        fit(model, ds.X_train, ds.Y_train, ds.X_val, ds.Y_val, cfg,
            rng=jax.random.PRNGKey(0), shuffle_scope="per_shard")


def test_per_shard_shuffle_trains_and_is_sync_invariant():
    from openpystruct_tpu.parallel import default_mesh

    data = small_dataset(192)
    ds = prepare_dataset(data, n_cases=6, train_split=0.75, seed=0)
    cfg = TrainConfig(num_epochs=6, batch_size=8, patience=50, sigma_0=0.0,
                      dropout_rate=0.0)
    model = FNNWithResidual(
        hidden_dim=32, num_blocks=1, output_dim=ds.label_dim,
        dropout_rate=0.0, dtype=jnp.float32,
    )
    mesh = default_mesh(("data",))
    runs = [
        fit(model, ds.X_train, ds.Y_train, ds.X_val, ds.Y_val, cfg,
            rng=jax.random.PRNGKey(7), mesh=mesh, shuffle_scope="per_shard",
            epochs_per_sync=k)
        for k in (1, 4)
    ]
    assert np.isfinite(runs[0].val_losses).all()
    assert runs[0].train_losses[-1] < runs[0].train_losses[0]
    # bit-identical across sync chunking, same as the global path
    np.testing.assert_array_equal(
        np.asarray(runs[0].val_losses), np.asarray(runs[1].val_losses)
    )

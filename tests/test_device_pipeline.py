"""On-device feature extraction + preprocessing vs the host pipeline."""

import jax
import jax.numpy as jnp
import numpy as np

from openpystruct_tpu.config import OptimizerConfig
from openpystruct_tpu.data import prepare_dataset, prepare_dataset_device
from openpystruct_tpu.datagen import (
    batch_feature_arrays,
    generate_batch,
)
from openpystruct_tpu.datagen.io import batch_to_columnar

FAST_OPT = OptimizerConfig(max_epochs=20, tolerance=5e-3, patience=5)


def test_feature_extraction_matches_columnar():
    batch = generate_batch(jax.random.PRNGKey(0), 10, opt_cfg=FAST_OPT)
    arrays = batch_feature_arrays(batch, max_rollers=5, max_forces=4)
    cols = batch_to_columnar(batch)
    for b in range(10):
        np.testing.assert_allclose(
            np.asarray(arrays["roller_x"][b])[: len(cols["roller_x_locations"][b])],
            cols["roller_x_locations"][b], rtol=1e-6,
        )
        # ascending order: fixed-bridge matches the reference ordering
        fx = cols["force_x_locations"][b]
        np.testing.assert_allclose(
            np.sort(np.asarray(arrays["force_x"][b])[: len(fx)]),
            np.sort(fx), rtol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(arrays["I"][b]), cols["I_values"][b], rtol=1e-6
        )


def test_device_pipeline_matches_host():
    """Same grouping/standardization math as the host pipeline (modulo the
    sample permutation, which uses a different rng): check the invariants
    rather than exact values."""
    batch = generate_batch(jax.random.PRNGKey(1), 48, opt_cfg=FAST_OPT)
    arrays = batch_feature_arrays(batch)
    ds = prepare_dataset_device(arrays, n_cases=6, train_split=0.75, seed=0,
                                nheads_pad=8)
    assert ds.X_train.shape == (6, 6, ds.feat_dim)
    assert ds.X_val.shape == (2, 6, ds.feat_dim)
    assert ds.feat_dim % 8 == 0
    assert ds.Y_train.shape == (6, 100)
    # standardized train stats
    assert abs(float(ds.Y_train.mean())) < 1e-5
    # inverse transform round-trips the raw aggregated labels
    np.testing.assert_allclose(
        np.asarray(ds.Y_train) * np.asarray(ds.scaler_Y.scale)
        + np.asarray(ds.scaler_Y.mean),
        np.asarray(ds.Y_train_raw), rtol=1e-4, atol=1e-6,
    )
    # the aggregated labels use the same mean + c*std formula as host
    host_cols = batch_to_columnar(batch)
    host_ds = prepare_dataset(host_cols, n_cases=6, train_split=0.75, seed=0)
    np.testing.assert_allclose(
        float(np.sort(np.asarray(ds.Y_train_raw).ravel())[::100].mean()),
        float(np.sort(
            np.concatenate([host_ds.Y_train_raw, host_ds.Y_val_raw]).ravel()
        )[::100].mean()),
        rtol=0.2,
    )


def test_device_pipeline_drops_invalid():
    batch = generate_batch(jax.random.PRNGKey(2), 24, opt_cfg=FAST_OPT)
    valid = np.asarray(batch.valid).copy()
    valid[:6] = False
    batch = batch.replace(valid=jnp.asarray(valid))
    arrays = batch_feature_arrays(batch)
    ds = prepare_dataset_device(arrays, n_cases=6, train_split=0.7)
    # 18 valid -> 3 groups
    assert ds.X_train.shape[0] + ds.X_val.shape[0] == 3


def test_device_pipeline_extra_label_keys():
    """PINN-style labels: [I | deflections | rotations], each aggregated
    mean + c*std per case group and jointly standardized — the device
    mirror of prepare_dataset(extra_label_keys=...) (pipeline.py:204-243)."""
    batch = generate_batch(jax.random.PRNGKey(3), 24, opt_cfg=FAST_OPT)
    arrays = batch_feature_arrays(batch, include_solution=True)
    n = arrays["node_positions"].shape[-1]
    assert arrays["deflections"].shape == (24, n)
    assert arrays["rotations"].shape == (24, n)

    c = 0.5
    ds = prepare_dataset_device(
        arrays, n_cases=6, train_split=0.75, c=c, seed=0,
        extra_label_keys=("deflections", "rotations"),
    )
    nelem = arrays["I"].shape[-1]
    n_valid = int(np.asarray(arrays["valid"]).sum())
    total = n_valid // 6
    assert ds.label_dim == nelem + 2 * n
    assert ds.Y_train.shape == (int(0.75 * total), ds.label_dim)

    # the raw label must be the per-key mean + c*std of SOME grouping of
    # the valid samples; check the deflection slice's global stats against
    # a direct recomputation over all groups (order-independent)
    defl = np.asarray(arrays["deflections"])[np.asarray(arrays["valid"])]
    g = defl[: total * 6].reshape(total, 6, n)
    expect = g.mean(axis=1) + c * g.std(axis=1)
    got = np.concatenate(
        [np.asarray(ds.Y_train_raw), np.asarray(ds.Y_val_raw)]
    )[:, nelem : nelem + n]
    np.testing.assert_allclose(
        np.sort(expect.ravel()), np.sort(got.ravel()), rtol=1e-5, atol=1e-7
    )

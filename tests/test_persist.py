"""Preprocessing persistence + user-inference path round-trip."""

import jax
import numpy as np

from openpystruct_tpu.config import OptimizerConfig
from openpystruct_tpu.data import (
    build_user_input,
    load_preprocessing,
    prepare_dataset,
    save_preprocessing,
)
from openpystruct_tpu.datagen import generate_dataset

FAST_OPT = OptimizerConfig(max_epochs=15, tolerance=5e-3, patience=5)


def test_preprocessing_roundtrip_and_user_input(tmp_path):
    data = generate_dataset(jax.random.PRNGKey(0), 48, batch_size=48,
                            opt_cfg=FAST_OPT)
    ds = prepare_dataset(data, n_cases=6, nheads_pad=8)
    p = str(tmp_path / "pre.npz")
    save_preprocessing(ds, p, nelem=100)
    pre = load_preprocessing(p)
    assert pre["n_cases"] == 6
    assert pre["nelem"] == 100
    # pre-round-5 files without nelem load with nelem=None (caller falls
    # back to the reference's 100-element mesh)
    save_preprocessing(ds, p)
    assert load_preprocessing(p)["nelem"] is None
    assert pre["feat_dim"] == ds.feat_dim
    assert pre["label_dim"] == ds.label_dim
    for name, sc in pre["scalers"].items():
        np.testing.assert_allclose(sc.mean, ds.scalers[name].mean)
        np.testing.assert_allclose(sc.scale, ds.scalers[name].scale)
    np.testing.assert_allclose(pre["scaler_Y"].mean, ds.scaler_Y.mean)

    # the persisted scalers drive the user-inference path
    n_cases = 6
    rollers = [[18.0, 58.0, 138.0, 170.0, 200.0]] * n_cases
    fx = [[30.0, 90.0]] * n_cases
    fv = [[-1e5, -2e5]] * n_cases
    nodes = [np.linspace(0, 200.0, 101).tolist()] * n_cases
    X = build_user_input(rollers, fx, fv, nodes, pre["scalers"], n_cases,
                         pre["max_lengths"])
    assert np.isfinite(X).all()
    X2 = build_user_input(rollers, fx, fv, nodes, ds.scalers, n_cases,
                          ds.max_lengths)
    np.testing.assert_allclose(X, X2)

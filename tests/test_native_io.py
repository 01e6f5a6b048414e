"""Native (C++) dataset writer vs the Python path."""

import json

import jax
import numpy as np
import pytest

from openpystruct_tpu.config import OptimizerConfig
from openpystruct_tpu.datagen import generate_batch
from openpystruct_tpu.datagen.io import batch_to_columnar
from openpystruct_tpu.datagen.native import (
    native_available,
    write_json_dataset_native,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain"
)

FAST_OPT = OptimizerConfig(max_epochs=20, tolerance=5e-3, patience=5)


def test_native_writer_matches_python(tmp_path):
    batch = generate_batch(jax.random.PRNGKey(0), 12, opt_cfg=FAST_OPT)
    py = batch_to_columnar(batch)

    p = tmp_path / "native.json"
    written = write_json_dataset_native(batch, str(p))
    assert written == len(py["I_values"])
    with open(p) as f:
        nat = json.load(f)

    assert list(nat.keys()) == list(py.keys())
    for k in py:
        assert len(nat[k]) == len(py[k]), k
    # ragged int columns match exactly
    assert nat["roller_nodes"] == py["roller_nodes"]
    assert nat["force_nodes"] == py["force_nodes"]
    assert nat["num_nodes"] == py["num_nodes"]
    # float columns: the native writer formats float64 shortest-round-trip,
    # identical in value to CPython's repr path
    for k in ("I_values", "shear_forces", "bending_moments", "node_positions",
              "deflections", "rotations", "force_values",
              "roller_x_locations", "force_x_locations"):
        a = np.concatenate([np.asarray(r, np.float64) for r in nat[k]])
        b = np.concatenate([np.asarray(r, np.float64) for r in py[k]])
        np.testing.assert_array_equal(a, b, err_msg=k)
    np.testing.assert_array_equal(nat["L"], py["L"])


def test_native_writer_drops_invalid(tmp_path):
    batch = generate_batch(jax.random.PRNGKey(1), 8, opt_cfg=FAST_OPT)
    valid = np.asarray(batch.valid).copy()
    valid[0] = False
    valid[5] = False
    batch = batch.replace(valid=jax.numpy.asarray(valid))
    p = tmp_path / "filtered.json"
    written = write_json_dataset_native(batch, str(p))
    assert written == int(valid.sum())
    with open(p) as f:
        nat = json.load(f)
    assert len(nat["I_values"]) == written

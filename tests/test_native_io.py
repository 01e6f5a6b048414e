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


def test_native_reader_matches_json_load(tmp_path):
    """The C++ single-pass reader must reproduce json.load exactly
    (values and row structure), including the ragged columns, and feed the
    pipeline unchanged."""
    from openpystruct_tpu.data import prepare_dataset
    from openpystruct_tpu.datagen.io import read_json_dataset
    from openpystruct_tpu.datagen.native import reader_available

    if not reader_available():
        pytest.skip("no native reader")

    batch = generate_batch(jax.random.PRNGKey(3), 16, opt_cfg=FAST_OPT)
    p = tmp_path / "ds.json"
    write_json_dataset_native(batch, str(p))

    nat = read_json_dataset(str(p), native=True)
    ref = read_json_dataset(str(p), native=False)
    assert set(ref.keys()) <= set(nat.keys())
    for k in ref:
        assert len(nat[k]) == len(ref[k]), k
        for i in range(len(ref[k])):
            np.testing.assert_allclose(
                np.atleast_1d(np.asarray(nat[k][i], np.float64)),
                np.atleast_1d(np.asarray(ref[k][i], np.float64)),
                rtol=1e-6, err_msg=k,
            )

    # numpy-array columns are drop-in for the reference pipeline
    ds = prepare_dataset(nat, n_cases=4)
    ds_ref = prepare_dataset(ref, n_cases=4)
    np.testing.assert_allclose(
        np.asarray(ds.X_train), np.asarray(ds_ref.X_train), rtol=1e-6
    )


def test_native_reader_rejects_garbage(tmp_path):
    from openpystruct_tpu.datagen.native import (
        read_json_dataset_native,
        reader_available,
    )

    if not reader_available():
        pytest.skip("no native reader")
    p = tmp_path / "bad.json"
    p.write_text('{"I_values": [[1, 2,')
    assert read_json_dataset_native(str(p), ("I_values",)) is None
    p2 = tmp_path / "weird.json"
    # unknown keys and non-array values are skipped, known ones parsed
    p2.write_text(
        '{"note": "hi", "num_nodes": [3, 3], "I_values": [[1.5, 2.5], [3, 4]]}'
    )
    out = read_json_dataset_native(str(p2), ("I_values", "num_nodes"))
    np.testing.assert_allclose(out["I_values"], [[1.5, 2.5], [3.0, 4.0]])
    np.testing.assert_allclose(out["num_nodes"], [3.0, 3.0])


def test_native_reader_duplicate_keys_last_wins(tmp_path):
    from openpystruct_tpu.datagen.native import (
        read_json_dataset_native,
        reader_available,
    )

    if not reader_available():
        pytest.skip("no native reader")
    p = tmp_path / "dup.json"
    p.write_text('{"I_values": [[1.0]], "I_values": [[2.0, 3.0]]}')
    with open(p) as f:
        ref = json.load(f)
    out = read_json_dataset_native(str(p), ("I_values",))
    np.testing.assert_allclose(out["I_values"], ref["I_values"])

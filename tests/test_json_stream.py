"""Streaming JSON writer: batch-by-batch output must equal the one-shot
serialization, in both the native and pure-Python fragment paths."""

import json

import jax
import numpy as np
import pytest

from openpystruct_tpu.config import OptimizerConfig
from openpystruct_tpu.datagen import (
    generate_batch,
    generate_dataset_json,
    generate_to_shards,
    shards_to_json,
)
from openpystruct_tpu.datagen.generate import _json_fields
from openpystruct_tpu.datagen.io import batch_to_columnar, merge_columnar
from openpystruct_tpu.datagen.native import JsonStreamWriter, native_available

FAST_OPT = OptimizerConfig(max_epochs=20, tolerance=5e-3, patience=5)


def _reference_doc(batches):
    return merge_columnar([batch_to_columnar(b) for b in batches])


def _assert_docs_equal(doc, ref):
    assert list(doc.keys()) == list(ref.keys())
    for k in ref:
        assert len(doc[k]) == len(ref[k]), k
    assert doc["roller_nodes"] == ref["roller_nodes"]
    assert doc["num_nodes"] == ref["num_nodes"]
    for k in ("I_values", "deflections", "force_values"):
        a = np.concatenate([np.asarray(r, np.float64) for r in doc[k]])
        b = np.concatenate([np.asarray(r, np.float64) for r in ref[k]])
        np.testing.assert_array_equal(a, b, err_msg=k)


@pytest.mark.parametrize("force_python", [False, True])
def test_stream_writer_matches_oneshot(tmp_path, monkeypatch, force_python):
    if force_python:
        monkeypatch.setattr(
            "openpystruct_tpu.datagen.native._build_and_load", lambda: None
        )
    elif not native_available():
        pytest.skip("no C++ toolchain")
    batches = [
        generate_batch(jax.random.PRNGKey(i), 6, opt_cfg=FAST_OPT)
        for i in range(3)
    ]
    p = tmp_path / "stream.json"
    w = JsonStreamWriter(str(p))
    total = sum(w.append(_json_fields(b)) for b in batches)
    assert w.finalize() == total
    with open(p) as f:
        doc = json.load(f)
    _assert_docs_equal(doc, _reference_doc(batches))


def test_generate_dataset_json_streams(tmp_path):
    p = tmp_path / "ds.json"
    n = generate_dataset_json(
        jax.random.PRNGKey(0), 10, str(p), batch_size=4, opt_cfg=FAST_OPT
    )
    with open(p) as f:
        doc = json.load(f)
    assert len(doc["I_values"]) == n
    # no fragment dirs left behind
    assert not [d for d in tmp_path.iterdir() if d.name.startswith(".json")]


def test_shards_to_json_roundtrip(tmp_path):
    shard_dir = tmp_path / "shards"
    paths = generate_to_shards(
        jax.random.PRNGKey(0), 8, str(shard_dir), batch_size=4,
        opt_cfg=FAST_OPT,
    )
    assert len(paths) == 2
    p = tmp_path / "from_shards.json"
    n = shards_to_json(paths, str(p))
    # same rng folding as generate_to_shards -> identical batches
    batches = [
        generate_batch(jax.random.fold_in(jax.random.PRNGKey(0), i), 4,
                       opt_cfg=FAST_OPT)
        for i in range(2)
    ]
    with open(p) as f:
        doc = json.load(f)
    assert len(doc["I_values"]) == n
    _assert_docs_equal(doc, _reference_doc(batches))

"""Dataset serialization.

Two formats:
- the reference's 13-key columnar JSON schema (the contract between its
  datagen and surrogate layers, OpenPyStruct_BeamOpt_training_SingleCore.py:73-87),
  for interop — ragged per-sample lists, 1-based node tags;
- array-native ``.npz`` shards of the masked fixed-size representation, the
  efficient path for feeding TPU training (no ragged padding round-trip).
"""

from __future__ import annotations

import json
from typing import Iterable, List

import numpy as np

SCHEMA_KEYS = (
    "roller_x_locations",
    "force_x_locations",
    "force_values",
    "I_values",
    "shear_forces",
    "bending_moments",
    "node_positions",
    "roller_nodes",
    "force_nodes",
    "num_nodes",
    "L",
    "rotations",
    "deflections",
)


def batch_to_columnar(batch) -> dict:
    """Convert one DatagenBatch to the 13-key columnar schema (host-side),
    dropping invalid samples (the reference's None-filtering,
    OpenPyStruct_BeamOpt_training_MultiCore.py:264-265)."""
    sc = batch.scenario
    res = batch.result
    fields = dict(
        node_x=np.asarray(sc.node_x),
        roller=np.asarray(sc.roller_mask),
        loads=np.asarray(sc.point_loads),
        I=np.asarray(res.I),
        shear=np.asarray(res.solution.shear_forces),
        moment=np.asarray(res.solution.bending_moments),
        defl=np.asarray(res.solution.deflections),
        rot=np.asarray(res.solution.rotations),
        valid=np.asarray(batch.valid),
    )
    if sc.roller_order is not None:
        fields["roller_order"] = np.asarray(sc.roller_order)
    if sc.force_order is not None:
        fields["force_order"] = np.asarray(sc.force_order)
    return columnar_from_fields(fields)


def columnar_from_fields(fields: dict) -> dict:
    """Fields dict (node_x, roller, loads, I, shear, moment, defl, rot,
    valid — all (B, ...) numpy arrays) -> 13-key columnar schema.

    Optional ``roller_order``/``force_order`` (B, n) int fields reorder the
    per-sample roller/force lists into the reference's random draw order
    (OpenPyStruct_BeamOpt_training_MultiCore.py:137-162,227-240); absent,
    lists come out in ascending node order."""
    valid = np.asarray(fields["valid"])
    node_x = np.asarray(fields["node_x"])
    roller_mask = np.asarray(fields["roller"])
    loads = np.asarray(fields["loads"])
    I = np.asarray(fields["I"])
    shear = np.asarray(fields["shear"])
    moment = np.asarray(fields["moment"])
    rot = np.asarray(fields["rot"])
    defl = np.asarray(fields["defl"])
    r_order = fields.get("roller_order")
    f_order = fields.get("force_order")

    out = {k: [] for k in SCHEMA_KEYS}
    for b in np.nonzero(valid)[0]:
        r_idx = np.nonzero(roller_mask[b])[0]
        f_idx = np.nonzero(loads[b] != 0.0)[0]
        if r_order is not None:
            r_idx = r_idx[np.argsort(r_order[b][r_idx], kind="stable")]
        if f_order is not None:
            f_idx = f_idx[np.argsort(f_order[b][f_idx], kind="stable")]
        out["roller_x_locations"].append(node_x[b, r_idx].tolist())
        out["force_x_locations"].append(node_x[b, f_idx].tolist())
        out["force_values"].append(loads[b, f_idx].tolist())
        out["I_values"].append(I[b].tolist())
        out["shear_forces"].append(shear[b].tolist())
        out["bending_moments"].append(moment[b].tolist())
        out["node_positions"].append(node_x[b].tolist())
        # 1-based OpenSees node tags, as the reference stores them
        # (MultiCore.py:227-240).
        out["roller_nodes"].append((r_idx + 1).tolist())
        out["force_nodes"].append((f_idx + 1).tolist())
        out["num_nodes"].append(int(node_x.shape[1]))
        out["L"].append(float(node_x[b, -1]))
        out["rotations"].append(rot[b].tolist())
        out["deflections"].append(defl[b].tolist())
    return out


def merge_columnar(chunks: Iterable[dict]) -> dict:
    out = {k: [] for k in SCHEMA_KEYS}
    for c in chunks:
        for k in SCHEMA_KEYS:
            out[k].extend(c[k])
    return out


def write_json_dataset(columnar: dict, path: str) -> None:
    with open(path, "w") as f:
        json.dump(columnar, f)


def read_json_dataset(path: str, native: bool = True) -> dict:
    """Load a 13-key schema dataset.

    With ``native=True`` (default) the C++ single-pass parser is used when
    the toolchain is available: columns come back as numpy arrays (2D where
    rows are uniform, lists of row arrays where ragged) instead of nested
    Python lists — ~10x faster and far smaller than ``json.load`` on
    multi-GB files, and drop-in for the pipeline (which only iterates rows
    and calls ``len``).  Falls back to ``json.load`` transparently.

    Known native/json.load divergences on *foreign* files (files from the
    bundled writer are unaffected): scalar columns (num_nodes, L) come back
    float64 where json.load yields Python ints, and string escapes inside
    keys are not decoded (the schema keys contain none).
    """
    data = None
    if native:
        from openpystruct_tpu.datagen.native import read_json_dataset_native

        data = read_json_dataset_native(path, SCHEMA_KEYS)
    if data is None:
        with open(path, "r") as f:
            data = json.load(f)
    missing = [k for k in SCHEMA_KEYS if k not in data]
    if missing:
        raise ValueError(f"dataset at {path} missing keys: {missing}")
    return data


def write_npz_shard(batch, path: str) -> None:
    """Array-native shard: masked fixed-size arrays, no ragged lists."""
    extra = {}
    if batch.scenario.roller_order is not None:
        extra["roller_order"] = np.asarray(batch.scenario.roller_order)
    if batch.scenario.force_order is not None:
        extra["force_order"] = np.asarray(batch.scenario.force_order)
    np.savez_compressed(
        path,
        **extra,
        node_x=np.asarray(batch.scenario.node_x),
        roller_mask=np.asarray(batch.scenario.roller_mask),
        point_loads=np.asarray(batch.scenario.point_loads),
        udl=np.asarray(batch.scenario.udl),
        I=np.asarray(batch.result.I),
        shear_forces=np.asarray(batch.result.solution.shear_forces),
        bending_moments=np.asarray(batch.result.solution.bending_moments),
        deflections=np.asarray(batch.result.solution.deflections),
        rotations=np.asarray(batch.result.solution.rotations),
        n_epochs=np.asarray(batch.result.n_epochs),
        valid=np.asarray(batch.valid),
        residual=np.asarray(batch.residual),
    )


def read_npz_shards(paths: List[str]) -> dict:
    arrays = {}
    for p in paths:
        with np.load(p) as z:
            for k in z.files:
                arrays.setdefault(k, []).append(z[k])
    return {k: np.concatenate(v, axis=0) for k, v in arrays.items()}

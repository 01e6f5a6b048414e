"""Persist preprocessing state (scalers + shape metadata).

The reference never persists its fitted StandardScalers — inference only
works inside the same script run that trained the model.  Here the
(mean, scale) pairs and padding metadata round-trip through one ``.npz`` so
a saved checkpoint is usable by a later process (the CLI ``predict``
subcommand).
"""

from __future__ import annotations

import json
from typing import Dict

import numpy as np

from openpystruct_tpu.data.pipeline import (
    DatasetSplits,
    FEATURE_NAMES,
    Scaler,
)


def save_preprocessing(ds: DatasetSplits, path: str,
                       nelem: int = None) -> None:
    """Save the fitted scalers and metadata of a prepared dataset.

    ``nelem``: the element count of the TRAINING dataset's mesh (the
    label's I-slice width).  Persisting it lets ``predict`` rebuild the
    model and the user-input node grid at the right mesh size — the mesh
    is a free axis here, unlike the reference's hard-coded 100 elements
    (OpenPyStruct_FNN_MultiCase.py:660)."""
    arrays = {}
    for name in FEATURE_NAMES:
        arrays[f"{name}__mean"] = np.asarray(ds.scalers[name].mean)
        arrays[f"{name}__scale"] = np.asarray(ds.scalers[name].scale)
    arrays["Y__mean"] = np.asarray(ds.scaler_Y.mean)
    arrays["Y__scale"] = np.asarray(ds.scaler_Y.scale)
    meta = dict(
        max_lengths=ds.max_lengths,
        n_cases=ds.n_cases,
        feat_dim=ds.feat_dim,
        label_dim=ds.label_dim,
    )
    if nelem is not None:
        meta["nelem"] = int(nelem)
    np.savez(path, __meta__=json.dumps(meta), **arrays)


def load_preprocessing(path: str) -> Dict:
    """Load scalers + metadata: returns a dict with 'scalers', 'scaler_Y',
    'max_lengths', 'n_cases', 'feat_dim', 'label_dim'."""
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["__meta__"]))
        scalers = {
            name: Scaler(
                mean=z[f"{name}__mean"], scale=z[f"{name}__scale"]
            )
            for name in FEATURE_NAMES
        }
        scaler_Y = Scaler(mean=z["Y__mean"], scale=z["Y__scale"])
    return dict(
        scalers=scalers,
        scaler_Y=scaler_Y,
        max_lengths=meta["max_lengths"],
        n_cases=meta["n_cases"],
        feat_dim=meta["feat_dim"],
        label_dim=meta["label_dim"],
        # absent in pre-round-5 files: callers fall back to the reference
        # mesh (100 elements)
        nelem=meta.get("nelem"),
    )

"""On-device preprocessing: feature arrays -> standardized training splits.

The jnp mirror of ``data.pipeline.prepare_dataset`` for device-resident
feature arrays (from ``datagen.features.batch_feature_arrays``): case
grouping, permuted train/val split, per-feature standardization fitted on
train only, label aggregation (mean + c*std), label standardization —
without the ragged-JSON round trip.  Semantics match the host pipeline
(same formulas; sklearn-style population std with zero->1 guard).

The whole transform runs as ONE jitted program (shapes keyed on the valid
count): eager per-op dispatch is pathological over remote-device links.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from openpystruct_tpu.data.pipeline import DatasetSplits, Scaler

_FEATS = ("roller_x", "force_x", "force_values", "node_positions")


def _fit_scaler(flat2d):
    mean = flat2d.mean(axis=0)
    scale = flat2d.std(axis=0)
    scale = jnp.where(scale == 0.0, 1.0, scale)
    return mean, scale


@functools.partial(
    jax.jit,
    static_argnames=("n_valid", "n_cases", "tr_sz", "total", "c",
                     "nheads_pad", "widths", "label_keys"),
)
def _prepare(arrays, key, *, n_valid, n_cases, tr_sz, total, c, nheads_pad,
             widths, label_keys=("I",)):
    # Concatenate features FIRST: four narrow arrays (last dims 4-5) pad to
    # 128 lanes each under TPU tiling, so per-feature gathers move ~25x more
    # HBM than the data; one wide (B, ~114) array keeps padding marginal.
    # Standardization is per-column either way, so the math is unchanged.
    X_all = jnp.concatenate([arrays[k] for k in _FEATS], axis=-1)

    valid = arrays["valid"]
    order = jnp.argsort(~valid)  # valid first, stable
    trim = total * n_cases

    def group(x):
        return x[order][:trim].reshape(total, n_cases, -1)

    X3 = group(X_all)
    labels3 = [group(arrays[k]) for k in label_keys]

    perm = jax.random.permutation(key, total)
    tr, va = perm[:tr_sz], perm[tr_sz:]

    x_tr, x_va = X3[tr], X3[va]
    M = x_tr.shape[-1]
    mean, scale = _fit_scaler(x_tr.reshape(-1, M))
    X_tr = (x_tr - mean) / scale
    X_va = (x_va - mean) / scale

    # per-feature scaler views (column slices of the joint scaler)
    scalers = {}
    off = 0
    for name in _FEATS:
        w = widths[_FEATS.index(name)]
        scalers[name] = (mean[off : off + w], scale[off : off + w])
        off += w

    if nheads_pad:
        rem = X_tr.shape[-1] % nheads_pad
        if rem:
            pad = nheads_pad - rem
            X_tr = jnp.pad(X_tr, ((0, 0), (0, 0), (0, pad)))
            X_va = jnp.pad(X_va, ((0, 0), (0, 0), (0, pad)))

    # per-key mean + c*std over the case axis, concatenated — the host
    # pipeline's unify_label + concat for extra_label_keys (pipeline.py:238)
    Y_tr_raw = jnp.concatenate(
        [l3[tr].mean(axis=1) + c * l3[tr].std(axis=1) for l3 in labels3],
        axis=1,
    )
    Y_va_raw = jnp.concatenate(
        [l3[va].mean(axis=1) + c * l3[va].std(axis=1) for l3 in labels3],
        axis=1,
    )
    y_mean, y_scale = _fit_scaler(Y_tr_raw)
    return dict(
        X_tr=X_tr, X_va=X_va,
        Y_tr=(Y_tr_raw - y_mean) / y_scale,
        Y_va=(Y_va_raw - y_mean) / y_scale,
        Y_tr_raw=Y_tr_raw, Y_va_raw=Y_va_raw,
        scalers=scalers, y_scaler=(y_mean, y_scale),
    )


def prepare_dataset_device(
    arrays: dict,
    n_cases: int = 6,
    train_split: float = 0.8,
    c: float = 1.0,
    seed: int = 0,
    nheads_pad: Optional[int] = None,
    extra_label_keys: tuple = (),
) -> DatasetSplits:
    """Device-side ``prepare_dataset``.

    ``arrays``: dict with roller_x, force_x, force_values, node_positions,
    I, valid — all (B, ...) jnp arrays.  Invalid samples are dropped before
    grouping (like the reference's None-filter).  ``extra_label_keys``
    appends additional aggregated targets after I (the PINN's 302-dim
    deflections+rotations label, OpenPyStruct_PINN_MultiCase.py:35-56) —
    pass ``batch_feature_arrays(..., include_solution=True)`` output.
    Returns a DatasetSplits whose arrays are jnp (device) arrays; the
    scalers hold device buffers usable by the host Scaler API.
    """
    n_valid = int(arrays["valid"].sum())  # the one host sync
    total = n_valid // n_cases
    if total == 0:
        raise ValueError(f"n_cases={n_cases} > total samples={n_valid}.")
    tr_sz = int(train_split * total)

    label_keys = ("I",) + tuple(extra_label_keys)
    widths = tuple(int(arrays[k].shape[-1]) for k in _FEATS)
    out = _prepare(
        {k: arrays[k] for k in _FEATS + label_keys + ("valid",)},
        jax.random.PRNGKey(seed),  # dynamic: new seeds must not recompile
        n_valid=n_valid, n_cases=n_cases, tr_sz=tr_sz, total=total,
        c=float(c), nheads_pad=nheads_pad or 0, widths=widths,
        label_keys=label_keys,
    )

    scalers = {
        name: Scaler(mean=m, scale=s) for name, (m, s) in out["scalers"].items()
    }
    y_mean, y_scale = out["y_scaler"]
    max_lengths = {
        "roller_x": arrays["roller_x"].shape[-1],
        "force_x": arrays["force_x"].shape[-1],
        "force_values": arrays["force_values"].shape[-1],
        "node_positions": arrays["node_positions"].shape[-1],
        "I_values": arrays["I"].shape[-1],
    }
    return DatasetSplits(
        X_train=out["X_tr"],
        X_val=out["X_va"],
        Y_train=out["Y_tr"],
        Y_val=out["Y_va"],
        scalers=scalers,
        scaler_Y=Scaler(mean=y_mean, scale=y_scale),
        max_lengths=max_lengths,
        n_cases=n_cases,
        feat_dim=out["X_tr"].shape[-1],
        label_dim=out["Y_tr"].shape[-1],
        Y_train_raw=out["Y_tr_raw"],
        Y_val_raw=out["Y_va_raw"],
    )

"""On-device feature extraction: DatagenBatch -> training arrays.

The reference round-trips datagen output through ragged JSON lists and
host-side padding (L2 -> JSON -> L3).  On TPU the masked fixed-size scenario
arrays can be turned into the exact same padded feature layout directly on
device, so a generated dataset can feed surrogate training with zero host
IO — the path that makes the 1M-sample north star practical on one chip.

Feature layout matches the reference pipeline (per case):
  [roller_x (max_rollers), force_x (max_forces), force_values (max_forces),
   node_positions (n)]
with zero padding, exactly like ``pad_sequences`` + ``merge_sub_features``
(OpenPyStruct_FNN_MultiCase.py:205-294).

Ordering divergence (documented): positions extracted from masks come out
in ascending node order; the reference's random-bridge mode stores them in
random draw order.  Fixed-bridge rollers are ascending in both.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def extract_padded(values, mask, size: int):
    """Per-sample: values at True positions of ``mask``, ascending order,
    zero-padded to ``size``.  Vmappable; uses fixed-size jnp.nonzero."""
    idx = jnp.nonzero(mask, size=size, fill_value=mask.shape[-1])[0]
    padded = jnp.concatenate(
        [values, jnp.zeros((1,), values.dtype)], axis=-1
    )
    present = idx < mask.shape[-1]
    return jnp.where(present, padded[idx], 0.0)


def batch_feature_arrays(batch, max_rollers: int = 5, max_forces: int = 4):
    """DatagenBatch -> dict of dense per-sample feature/label arrays
    (device-resident).  Keys: roller_x, force_x, force_values,
    node_positions, I, valid."""
    sc = batch.scenario

    def one(node_x, roller_mask, loads):
        force_mask = loads != 0.0
        return (
            extract_padded(node_x, roller_mask, max_rollers),
            extract_padded(node_x, force_mask, max_forces),
            extract_padded(loads, force_mask, max_forces),
        )

    roller_x, force_x, force_values = jax.vmap(one)(
        sc.node_x, sc.roller_mask, sc.point_loads
    )
    return dict(
        roller_x=roller_x,
        force_x=force_x,
        force_values=force_values,
        node_positions=sc.node_x,
        I=batch.result.I,
        valid=batch.valid,
    )

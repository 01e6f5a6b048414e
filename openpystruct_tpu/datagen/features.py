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

Ordering: when the scenario carries draw-order ranks (the sampler's
default, ``ScenarioConfig.store_draw_order``), roller/force features come
out in the reference's random draw order
(OpenPyStruct_BeamOpt_training_MultiCore.py:137-162) — matching what a
JSON round-trip would produce; without them, ascending node order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def extract_padded(values, mask, size: int, order=None):
    """Per-sample: values at True positions of ``mask``, zero-padded to
    ``size``, ordered ascending (default) or by the draw-order ranks in
    ``order`` ((n,) int, >= n where unselected).  Vmappable."""
    n = mask.shape[-1]
    if order is None:
        idx = jnp.nonzero(mask, size=size, fill_value=n)[0]
    else:
        # ranks of selected nodes are 0..k-1, unselected >= n: the first
        # k slots of argsort are exactly the draw-ordered selection
        idx = jnp.argsort(jnp.where(mask, order, n))[:size]
        idx = jnp.where(mask[idx], idx, n)
    padded = jnp.concatenate(
        [values, jnp.zeros((1,), values.dtype)], axis=-1
    )
    present = idx < n
    return jnp.where(present, padded[idx], 0.0)


def batch_feature_arrays(batch, max_rollers: int = 5, max_forces: int = 4,
                         include_solution: bool = False):
    """DatagenBatch -> dict of dense per-sample feature/label arrays
    (device-resident).  Keys: roller_x, force_x, force_values,
    node_positions, I, valid; with ``include_solution`` also deflections
    and rotations (the PINN's auxiliary supervised targets,
    OpenPyStruct_PINN_MultiCase.py:35-56)."""
    sc = batch.scenario
    r_order = sc.roller_order
    f_order = sc.force_order

    def one(node_x, roller_mask, loads, ro, fo):
        force_mask = loads != 0.0
        return (
            extract_padded(node_x, roller_mask, max_rollers, ro),
            extract_padded(node_x, force_mask, max_forces, fo),
            extract_padded(loads, force_mask, max_forces, fo),
        )

    if r_order is None:
        roller_x, force_x, force_values = jax.vmap(
            lambda nx, rm, ld: one(nx, rm, ld, None, None)
        )(sc.node_x, sc.roller_mask, sc.point_loads)
    else:
        roller_x, force_x, force_values = jax.vmap(one)(
            sc.node_x, sc.roller_mask, sc.point_loads, r_order, f_order
        )
    out = dict(
        roller_x=roller_x,
        force_x=force_x,
        force_values=force_values,
        node_positions=sc.node_x,
        I=batch.result.I,
        valid=batch.valid,
    )
    if include_solution:
        sol = batch.result.solution
        out["deflections"] = sol.deflections
        out["rotations"] = sol.rotations
    return out

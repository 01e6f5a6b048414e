"""Mesh construction and sharding helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def default_mesh(
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """A mesh over all local devices.

    One axis (the default) gives pure data parallelism — the natural layout
    for this workload: models are <=~10M params, so the batch axis is the
    only one worth sharding; tensor axes are exposed but unused by default.
    With multiple axis names the devices are folded into a near-square grid.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if len(axis_names) == 1:
        arr = np.asarray(devices)
        return Mesh(arr, axis_names)
    # Fold into a grid: first axis gets the largest divisor <= sqrt(n).
    d1 = int(np.floor(np.sqrt(n)))
    while n % d1:
        d1 -= 1
    shape = (d1, n // d1)
    if len(axis_names) != 2:
        raise ValueError("only 1- or 2-axis default meshes are supported")
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh, axis: str = "data"):
    """Device-put every leaf with its leading dim sharded over ``axis``."""
    sh = batch_sharding(mesh, axis)

    def put(x):
        if getattr(x, "ndim", 0) >= 1:
            return jax.device_put(x, sh)
        return jax.device_put(x, replicated_sharding(mesh))

    return jax.tree.map(put, tree)


def initialize_multihost(**kwargs) -> None:
    """Initialize multi-host JAX (DCN-backed collectives between hosts).

    Thin wrapper over ``jax.distributed.initialize``; tolerates repeated
    initialization but surfaces real failures — silently falling through to
    single-process on a multi-host job would strand N-1 hosts.
    """
    import logging

    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError) as e:
        msg = str(e).lower()
        if "already initialized" in msg:
            return
        if "coordinator_address" in msg:
            # no cluster environment (jax raises ValueError when neither the
            # args nor the env provide a coordinator): stay single-process,
            # but say so — on a real multi-host job this warning in the logs
            # is the breadcrumb for a misconfigured launcher
            logging.getLogger(__name__).warning(
                "initialize_multihost: no coordinator configured; "
                "continuing single-process (%s)", e
            )
            return
        logging.getLogger(__name__).error(
            "jax.distributed.initialize failed: %s", e
        )
        raise

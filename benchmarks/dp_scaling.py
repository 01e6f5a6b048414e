"""Data-parallel training scaling smoke on a VIRTUAL device mesh.

Real multi-chip hardware is not available in this environment, so this
measures the DP training path's *relative* behavior on a CPU mesh
(``--xla_force_host_platform_device_count=8``): the same synthetic fit at
mesh=None and an 8-device mesh with the global vs per_shard shuffle.  All
eight virtual devices share ONE physical core, so absolute numbers mean
nothing — the meaningful comparison is global vs per_shard at the SAME
mesh, which isolates the epoch-shuffle gather (cross-device copies here;
ICI/DCN traffic on real chips) from everything else in the DP path.
Measured (round 5, single-core host): per_shard runs the identical
sharded program 3.6x faster than the global shuffle, confirming the
gather dominates DP scaling and shuffle_scope="per_shard" removes it.
Absolute multi-chip speedup needs real chips; correctness of the sharded
trajectory is covered by tests/test_multihost.py and
tests/test_graft_entry.py.

Run: python benchmarks/dp_scaling.py  [--rows 16384] [--epochs 30]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def run(mesh, shuffle_scope, rows, epochs, feat=64, label=100):
    from openpystruct_tpu.config import TrainConfig
    from openpystruct_tpu.models import FNNWithResidual
    from openpystruct_tpu.train import fit

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(rows, 6, feat)), jnp.float32)
    W = rng.normal(size=(6 * feat, label)) * 0.1
    Y = jnp.asarray(
        np.tanh(X.reshape(rows, -1) @ W) + 0.01 * rng.normal(
            size=(rows, label)), jnp.float32)
    Xv, Yv = X[:1024], Y[:1024]
    model = FNNWithResidual(hidden_dim=256, output_dim=label)
    cfg = TrainConfig(num_epochs=epochs, batch_size=512,
                      learning_rate=1e-3, patience=10**6)

    def one(n_ep):
        c = dataclasses.replace(cfg, num_epochs=n_ep)
        t0 = time.perf_counter()
        fit(model, X, Y, Xv, Yv, c, rng=jax.random.PRNGKey(0), mesh=mesh,
            shuffle_scope=shuffle_scope, epochs_per_sync=10)
        return time.perf_counter() - t0

    one(epochs)                      # compile + warm caches
    t = min(one(epochs) for _ in range(2))
    return rows * epochs / t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=16384)
    ap.add_argument("--epochs", type=int, default=30)
    args = ap.parse_args()

    from openpystruct_tpu.parallel import default_mesh

    print(f"devices: {jax.device_count()} virtual CPU", flush=True)
    base = run(None, "global", args.rows, args.epochs)
    print(f"mesh=None             : {base:,.0f} samples/s", flush=True)
    mesh8 = default_mesh(("data",))
    rates = {}
    for scope in ("global", "per_shard"):
        r = run(mesh8, scope, args.rows, args.epochs)
        rates[scope] = r
        print(f"mesh=8dev {scope:10s}: {r:,.0f} samples/s "
              f"({r / base:.2f}x of unsharded single-core host)",
              flush=True)
    print(f"per_shard vs global shuffle at 8 shards: "
          f"{rates['per_shard'] / rates['global']:.2f}x "
          f"(the gather the zero-communication shuffle removes)",
          flush=True)


if __name__ == "__main__":
    main()

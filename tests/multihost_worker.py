"""Worker process for the two-process multi-host test.

Each worker is one "host" of a 2-process CPU cluster (4 virtual devices
per process, 8 global — the jax.distributed + gloo idiom for exercising
the DCN code path without hardware).  It runs the REAL multi-host code:
``initialize_multihost``'s jax.distributed path, a global mesh spanning
both processes, ``fit()`` with per-process local train shards, and a
mesh-sharded ``generate_batch`` — then saves replicated results so the
parent test can check both processes agree with each other and with a
single-process run.

Usage: python multihost_worker.py <pid> <nprocs> <coordinator> <out_dir>
"""

import sys

import jax

# The environment presets JAX_PLATFORMS to a TPU platform and the plugin
# registers at interpreter start — config updates are the reliable
# override (same reasoning as tests/conftest.py).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
# match the pytest environment (tests/conftest.py) bit-for-bit: under x64
# the samplers draw different random streams (f64 draws consume 64 bits),
# so the parent's single-process comparison requires the same setting
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    pid = int(sys.argv[1])
    nprocs = int(sys.argv[2])
    coordinator = sys.argv[3]
    out_dir = sys.argv[4]

    from openpystruct_tpu.parallel import initialize_multihost

    initialize_multihost(
        coordinator_address=coordinator,
        num_processes=nprocs,
        process_id=pid,
    )
    assert jax.process_count() == nprocs, jax.process_count()
    assert len(jax.devices()) == 4 * nprocs, len(jax.devices())

    from openpystruct_tpu.parallel import default_mesh

    mesh = default_mesh(("data",))  # global: all 8 devices
    assert mesh.devices.size == 4 * nprocs

    # ---- fit() with per-process local train shards --------------------
    from openpystruct_tpu.config import TrainConfig
    from openpystruct_tpu.models import FNNWithResidual
    from openpystruct_tpu.train import fit

    rows, feat, out = 256, 18, 20
    key = jax.random.PRNGKey(0)
    X = jax.random.normal(key, (rows, feat), jnp.float32)
    W = jax.random.normal(jax.random.fold_in(key, 1), (feat, out)) * 0.3
    Y = X @ W
    Xv = jax.random.normal(jax.random.fold_in(key, 2), (44, feat))
    Yv = Xv @ W  # 44 val rows: batch 32 -> one ragged tail of 12

    lo = rows // nprocs * pid
    hi = rows // nprocs * (pid + 1)
    cfg = TrainConfig(
        num_epochs=4, batch_size=32, hidden_units=32, dropout_rate=0.0,
        sigma_0=0.0, compute_dtype="float32", seed=0,
    )
    model = FNNWithResidual(hidden_dim=32, num_blocks=1, output_dim=out,
                            dropout_rate=0.0, dtype=jnp.float32)
    res = fit(
        model, np.asarray(X[lo:hi]), np.asarray(Y[lo:hi]),
        np.asarray(Xv), np.asarray(Yv), cfg, mesh=mesh,
    )

    # ---- per_shard shuffle with UNEQUAL per-process rows (ADVICE r4) --
    # the local-shards data contract allows ragged per-host row counts;
    # every process must trim to the common minimum or shard_map fails at
    # trace time.  p0 gets 130 rows, p1 gets 126.
    split = rows // nprocs + 2
    lo2, hi2 = (0, split) if pid == 0 else (split, rows)
    res_ps = fit(
        model, np.asarray(X[lo2:hi2]), np.asarray(Y[lo2:hi2]),
        np.asarray(Xv), np.asarray(Yv), cfg, mesh=mesh,
        shuffle_scope="per_shard",
    )
    assert np.isfinite(res_ps.train_losses).all()

    # ---- mesh-sharded datagen across both processes -------------------
    from openpystruct_tpu.config import OptimizerConfig, ScenarioConfig
    from openpystruct_tpu.datagen import generate_batch

    opt = OptimizerConfig(max_epochs=20, tolerance=5e-3, patience=5)
    batch = generate_batch(
        jax.random.PRNGKey(3), 16, opt_cfg=opt, mesh=mesh,
        use_pallas=False,
    )
    # gather the sharded result to every host for comparison
    rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    I_full = np.asarray(
        jax.jit(lambda x: x, out_shardings=rep)(batch.result.I)
    )
    valid_full = np.asarray(
        jax.jit(lambda x: x, out_shardings=rep)(batch.valid)
    )

    # ---- multi-host random-bridge rescue (VERDICT r3 item 3) ----------
    # each process re-optimizes ONLY its addressable shard's rejected
    # lanes; the merged batch must keep ~everything, like single-host
    scen = ScenarioConfig(random_bridge=True)
    rb = generate_batch(
        jax.random.PRNGKey(7), 32, scen_cfg=scen, opt_cfg=opt, mesh=mesh,
        use_pallas=False, rescue=True,
    )
    rb_I = np.asarray(jax.jit(lambda x: x, out_shardings=rep)(rb.result.I))
    rb_valid = np.asarray(
        jax.jit(lambda x: x, out_shardings=rep)(rb.valid)
    )
    # keep the workers in lock-step before exiting: per-process rescue
    # work is asymmetric, and a worker reaching jax.distributed's
    # shutdown barrier minutes ahead of the other trips its timeout
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("rescue done")

    leaves = jax.tree.leaves(res.params)
    np.savez(
        f"{out_dir}/p{pid}.npz",
        train_losses=res.train_losses,
        val_losses=res.val_losses,
        ps_train_losses=res_ps.train_losses,
        ps_val_losses=res_ps.val_losses,
        param0=np.asarray(leaves[0]),
        datagen_I=I_full,
        datagen_valid=valid_full,
        rescue_I=rb_I,
        rescue_valid=rb_valid,
    )
    print(f"worker {pid}: OK", flush=True)


if __name__ == "__main__":
    main()

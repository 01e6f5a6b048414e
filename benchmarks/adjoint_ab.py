"""Quantify the exact-adjoint upgrade (VERDICT r3 item 7).

The reference's optimizer is a semi-gradient scheme: M and V are re-wrapped
as constants each epoch, so d(M,V)/dI through the FE solve never flows
(OpenPyStruct_BeamOpt.py:150-151).  This framework also offers the exact
implicit-differentiation adjoint (``OptimizerConfig.grad_mode="adjoint"``),
the BASELINE.json north-star claim.  This script makes the upgrade
measurable: generate MATCHED datasets (same scenario keys) under both
gradient modes, compare the optimizer trajectories (epochs to converge,
final loss components, converged fraction), then train the TFD surrogate
on each and report validation R².

Run: python benchmarks/adjoint_ab.py [--samples 100000] [--batch 16384]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def run_mode(mode: str, samples: int, batch: int, epochs: int):
    from openpystruct_tpu.config import DATAGEN_OPT, ScenarioConfig
    from openpystruct_tpu.data.device_pipeline import prepare_dataset_device
    from openpystruct_tpu.datagen.features import batch_feature_arrays
    from openpystruct_tpu.datagen.generate import generate_batch
    from openpystruct_tpu.families import FAMILIES, build_family
    from openpystruct_tpu.train import evaluate_r2, fit

    scen = ScenarioConfig()
    opt_cfg = dataclasses.replace(DATAGEN_OPT, grad_mode=mode)

    n_batches = (samples + batch - 1) // batch
    t0 = time.time()
    feats, stats = [], []
    for i in range(n_batches):
        b = generate_batch(
            jax.random.fold_in(jax.random.PRNGKey(0), i), batch,
            scen_cfg=scen, opt_cfg=opt_cfg,
        )
        feats.append(batch_feature_arrays(b))
        stats.append(dict(
            n_epochs=np.asarray(b.result.n_epochs),
            converged=np.asarray(b.result.converged),
            total=np.asarray(b.result.loss.total),
            primary=np.asarray(b.result.loss.primary),
            valid=np.asarray(b.valid),
        ))
    arrays = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *feats)
    n_valid = int(arrays["valid"].sum())
    t_gen = time.time() - t0

    # One extra warm batch for a steady-state rate (the loop above pays the
    # one-time remote compile, which is 10x-variance on this tunnel).
    t0 = time.time()
    b = generate_batch(
        jax.random.fold_in(jax.random.PRNGKey(1), 0), batch,
        scen_cfg=scen, opt_cfg=opt_cfg,
    )
    float(b.result.loss.total.sum())  # force completion through the tunnel
    warm_rate = batch / (time.time() - t0)

    st = {k: np.concatenate([s[k] for s in stats]) for k in stats[0]}
    v = st["valid"]
    traj = dict(
        gen_s=t_gen,
        samples_per_s=samples / t_gen,
        warm_samples_per_s=warm_rate,
        valid_frac=float(v.mean()),
        mean_epochs=float(st["n_epochs"][v].mean()),
        converged_frac=float(st["converged"][v].mean()),
        mean_total_loss=float(st["total"][v].mean()),
        mean_primary=float(st["primary"][v].mean()),
    )
    print(f"[{mode}] gen {t_gen:.1f}s ({traj['samples_per_s']:,.0f}/s) "
          f"valid {n_valid:,}  epochs {traj['mean_epochs']:.1f}  "
          f"converged {traj['converged_frac']:.3f}  "
          f"total {traj['mean_total_loss']:.4f}  "
          f"sum(I) {traj['mean_primary']:.4f}", flush=True)

    spec = FAMILIES["tfd"]
    ds = prepare_dataset_device(
        arrays, n_cases=spec.train.n_cases, c=spec.train.c,
        nheads_pad=spec.nheads_pad,
    )
    float(ds.X_train.sum())
    model, spec, fit_kwargs = build_family("tfd", ds.feat_dim)
    cfg = dataclasses.replace(spec.train, num_epochs=epochs)
    t0 = time.time()
    res = fit(model, ds.X_train, ds.Y_train, ds.X_val, ds.Y_val, cfg,
              epochs_per_sync=10, **fit_kwargs)
    t_train = time.time() - t0
    r2 = evaluate_r2(
        model, res.params, ds.X_val, ds.Y_val, ds.scaler_Y,
        model_rng_keys=spec.model_rng_keys, batch_stats=res.batch_stats,
        batch_size=4096,
    )
    print(f"[{mode}] train {len(res.train_losses)} epochs in "
          f"{t_train:.1f}s  val R2 {r2:.4f}", flush=True)
    traj.update(r2=float(r2), train_s=t_train,
                train_epochs=len(res.train_losses))
    # Per-lane arrays for paired (same scenario key) comparison across modes.
    lanes = dict(total=st["total"], n_epochs=st["n_epochs"], valid=v)
    return traj, lanes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=100_000)
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--epochs", type=int, default=120)
    args = ap.parse_args()

    out, lanes = {}, {}
    for mode in ("semi", "adjoint"):
        out[mode], lanes[mode] = run_mode(mode, args.samples, args.batch,
                                          args.epochs)

    s, a = out["semi"], out["adjoint"]
    print("\n=== A/B summary (matched scenario keys) ===")
    for k in ("samples_per_s", "warm_samples_per_s", "valid_frac",
              "mean_epochs", "converged_frac", "mean_total_loss",
              "mean_primary", "r2"):
        print(f"{k:18s}  semi {s[k]:12.4f}   adjoint {a[k]:12.4f}")
    print("adjoint steady-state datagen throughput = "
          f"{a['warm_samples_per_s']/s['warm_samples_per_s']:.2%} of semi")

    # Paired per-lane trajectory comparison: both modes optimized the SAME
    # scenarios in the same lane order, so lane i pairs across modes.
    both = lanes["semi"]["valid"] & lanes["adjoint"]["valid"]
    d_total = (lanes["adjoint"]["total"] - lanes["semi"]["total"])[both]
    d_ep = (lanes["adjoint"]["n_epochs"].astype(np.int64)
            - lanes["semi"]["n_epochs"].astype(np.int64))[both]
    rel = d_total / np.abs(lanes["semi"]["total"][both])
    print("\n=== paired per-lane deltas (adjoint - semi), "
          f"{int(both.sum()):,} lanes ===")
    print(f"total loss:  mean {d_total.mean():+.4f}  "
          f"median {np.median(d_total):+.4f}  "
          f"rel mean {rel.mean():+.3%}  "
          f"adjoint lower on {(d_total < 0).mean():.1%} of lanes")
    print(f"epochs:      mean {d_ep.mean():+.2f}  "
          f"median {np.median(d_ep):+.1f}")


if __name__ == "__main__":
    main()

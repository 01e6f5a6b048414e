"""bf16 vs f32 on the flagship TFD surrogate (VERDICT r4 item 1).

The reference wraps every family's forward/backward in CUDA AMP autocast +
GradScaler except the FNO (OpenPyStruct_FNN_MultiCase.py:490,543-554; FNO
exception at OpenPyStruct_FNO_MultiCase_Beta.py:617-618).  The TPU analog
is the model compute dtype (``TrainConfig.compute_dtype`` -> flax module
``dtype``): matmuls/activations in bfloat16 on the MXU, LayerNorms, output
heads, loss and master weights in float32.  This script quantifies what
that buys on the flagship: ONE dataset, the TFD trained under both dtypes
with identical seeds/budgets, reporting steady-state training throughput
(samples/s/chip, compile time cancelled by differencing two epoch budgets)
and validation R².

Run: python benchmarks/bf16_ab.py [--samples 114688] [--batch 16384]
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


def make_dataset(samples: int, batch: int):
    from openpystruct_tpu.data.device_pipeline import prepare_dataset_device
    from openpystruct_tpu.datagen.features import batch_feature_arrays
    from openpystruct_tpu.datagen.generate import generate_batch
    from openpystruct_tpu.families import FAMILIES

    n_batches = (samples + batch - 1) // batch
    t0 = time.time()
    feats = [
        batch_feature_arrays(generate_batch(
            jax.random.fold_in(jax.random.PRNGKey(0), i), batch
        ))
        for i in range(n_batches)
    ]
    arrays = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *feats)
    spec = FAMILIES["tfd"]
    ds = prepare_dataset_device(
        arrays, n_cases=spec.train.n_cases, c=spec.train.c,
        nheads_pad=spec.nheads_pad,
    )
    float(ds.X_train.sum())  # force completion before reading the clock
    print(f"dataset: {samples:,} samples -> {ds.X_train.shape[0]:,} train / "
          f"{ds.X_val.shape[0]:,} val rows in {time.time()-t0:.1f}s",
          flush=True)
    return ds


def timed_fit(ds, dtype: str, epochs: int):
    from openpystruct_tpu.families import build_family
    from openpystruct_tpu.train import evaluate_r2, fit

    model, spec, fit_kwargs = build_family("tfd", ds.feat_dim,
                                           compute_dtype=dtype)
    # exact epoch counts: disable early stopping so both dtypes and both
    # budgets run the same number of steps
    cfg = dataclasses.replace(spec.train, num_epochs=epochs, patience=10**6)
    t0 = time.time()
    res = fit(model, ds.X_train, ds.Y_train, ds.X_val, ds.Y_val, cfg,
              rng=jax.random.PRNGKey(0), epochs_per_sync=10, **fit_kwargs)
    wall = time.time() - t0
    assert len(res.train_losses) == epochs
    return wall, res, model, spec


def run_dtype(ds, dtype: str, e1: int, e2: int):
    from openpystruct_tpu.train import evaluate_r2

    # warmup fit: populates JAX's in-process compilation cache (compiles
    # persist across fit calls — the executable is keyed by HLO hash, not
    # by the jit wrapper), so the timed run below is compile-free
    t1, _, _, _ = timed_fit(ds, dtype, e1)
    t2, res, model, spec = timed_fit(ds, dtype, e2)
    n_train = ds.X_train.shape[0]
    steady = n_train * e2 / t2
    r2 = evaluate_r2(
        model, res.params, ds.X_val, ds.Y_val, ds.scaler_Y,
        model_rng_keys=spec.model_rng_keys, batch_stats=res.batch_stats,
        batch_size=4096,
    )
    print(f"[{dtype}] warmup {e1} ep {t1:.1f}s | timed {e2} ep {t2:.1f}s | "
          f"steady {steady:,.0f} samples/s/chip | val R2 {r2:.4f}",
          flush=True)
    return dict(dtype=dtype, t1=t1, t2=t2, steady=steady, r2=float(r2),
                final_train=float(res.train_losses[-1]),
                final_val=float(res.val_losses[-1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=114_688)
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--e1", type=int, default=20)
    ap.add_argument("--e2", type=int, default=120)
    args = ap.parse_args()

    ds = make_dataset(args.samples, args.batch)
    out = {d: run_dtype(ds, d, args.e1, args.e2)
           for d in ("float32", "bfloat16")}

    f, b = out["float32"], out["bfloat16"]
    print("\n=== bf16 vs f32, TFD, matched dataset ===")
    print(f"steady samples/s/chip:  f32 {f['steady']:>12,.0f}   "
          f"bf16 {b['steady']:>12,.0f}   ({b['steady']/f['steady']:.2f}x)")
    print(f"val R2:                 f32 {f['r2']:.4f}   bf16 {b['r2']:.4f}   "
          f"(delta {b['r2']-f['r2']:+.4f})")
    print(f"final val loss:         f32 {f['final_val']:.4f}   "
          f"bf16 {b['final_val']:.4f}")


if __name__ == "__main__":
    main()

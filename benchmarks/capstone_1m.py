"""The 1M-sample north star on ONE chip, fully on-device.

BASELINE.json's headline scenario: generate 1,000,000 random multi-load
beam cases (each a full <=600-epoch Adam optimization through the FEA) and
train the Transformer-Diffusion surrogate on them — the pipeline the
reference runs as 22 loky workers for ~14 hours plus a CUDA training
session (OpenPyStruct_BeamOpt_training_MultiCore.py:242-286 ->
OpenPyStruct_TransformerDiffusionModule_MultiCase.py).

Everything stays on the device: datagen -> feature extraction ->
preprocessing -> training, zero host IO on the critical path.  Timings are
forced with host transfers (block_until_ready is unreliable over remote
tunnels).

Run: python benchmarks/capstone_1m.py [--samples 1000000] [--batch 32768]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

# runnable from anywhere: the package lives at the repo root above this file
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=1_000_000)
    ap.add_argument("--batch", type=int, default=32768)
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--no-compact", action="store_true")
    args = ap.parse_args()

    from openpystruct_tpu.config import ScenarioConfig
    from openpystruct_tpu.data.device_pipeline import prepare_dataset_device
    from openpystruct_tpu.datagen.features import batch_feature_arrays
    from openpystruct_tpu.datagen.generate import generate_batch
    from openpystruct_tpu.families import FAMILIES, build_family
    from openpystruct_tpu.train import evaluate_r2, fit

    scen = ScenarioConfig()
    compact = None if not args.no_compact else False

    # --- generate + featurize ---------------------------------------------
    n_batches = (args.samples + args.batch - 1) // args.batch
    print(f"generating {args.samples:,} samples in {n_batches} x "
          f"{args.batch} batches (compact={'off' if args.no_compact else 'auto'})",
          flush=True)
    t0 = time.time()
    feats = []
    for i in range(n_batches):
        b = generate_batch(
            jax.random.fold_in(jax.random.PRNGKey(0), i), args.batch,
            scen_cfg=scen, compact=compact,
        )
        feats.append(batch_feature_arrays(b))
    arrays = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *feats)
    n_valid = int(arrays["valid"].sum())      # forces the whole pipeline
    t_gen = time.time() - t0
    print(f"generate + featurize: {t_gen:.1f}s "
          f"({args.samples / t_gen:,.0f} samples/s; {n_valid:,} valid)",
          flush=True)

    # --- preprocess ---------------------------------------------------------
    spec = FAMILIES["tfd"]
    t0 = time.time()
    ds = prepare_dataset_device(
        arrays, n_cases=spec.train.n_cases, c=spec.train.c,
        nheads_pad=spec.nheads_pad,
    )
    float(ds.X_train.sum())
    t_prep = time.time() - t0
    print(f"preprocess: {t_prep:.1f}s "
          f"({ds.X_train.shape[0]:,} train groups, feat {ds.feat_dim})",
          flush=True)

    # --- train ---------------------------------------------------------------
    import dataclasses

    model, spec, fit_kwargs = build_family("tfd", ds.feat_dim)
    cfg = dataclasses.replace(spec.train, num_epochs=args.epochs)
    t0 = time.time()
    res = fit(
        model, ds.X_train, ds.Y_train, ds.X_val, ds.Y_val, cfg,
        epochs_per_sync=10, **fit_kwargs,
    )
    t_train = time.time() - t0
    ep = len(res.train_losses)
    sps = ep * ds.X_train.shape[0] / t_train
    print(f"train: {ep} epochs in {t_train:.1f}s ({sps:,.0f} samples/s/chip)",
          flush=True)

    r2 = evaluate_r2(
        model, res.params, ds.X_val, ds.Y_val, ds.scaler_Y,
        model_rng_keys=spec.model_rng_keys, batch_stats=res.batch_stats,
        batch_size=4096,
    )
    total = t_gen + t_prep + t_train
    print(f"validation R2: {r2:.4f}")
    print(f"TOTAL: {total:.1f}s end-to-end for {args.samples:,} samples")


if __name__ == "__main__":
    main()

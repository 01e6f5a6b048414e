"""On-device surrogate-family probe: datagen -> preprocess -> train -> R².

The full-family CLI sweep (BENCHMARKS.md "All seven surrogate families")
routes through the reference JSON schema, which is tunnel-D2H-bound in
this environment (~965 MB for 100k samples).  This probe keeps the whole
pipeline on the device — the same path as benchmarks/capstone_1m.py but
parameterized over the family registry, including the PINN's auxiliary
deflection/rotation labels (extra_label_keys on the device pipeline).

It also provides the constraint A/B for the PINN: the reference builds its
TrainableL1L2 with min/max of the standardized train-label I-slice
(OpenPyStruct_PINN_MultiCase.py:377-378,556-558); round 4 wired those
bounds into families.py after they had been silently None.  ``--pinn-
constraints off`` restores the pre-fix behavior on the SAME dataset so the
fix's effect is measured in isolation.

Run: python benchmarks/family_probe.py --model pinn [--samples 100000]
     python benchmarks/family_probe.py --model pinn --pinn-constraints off
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="pinn")
    ap.add_argument("--samples", type=int, default=100_000)
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--epochs", type=int, default=500)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--pinn-constraints", choices=["on", "off"], default="on")
    args = ap.parse_args()

    from openpystruct_tpu.config import ScenarioConfig
    from openpystruct_tpu.data.device_pipeline import prepare_dataset_device
    from openpystruct_tpu.datagen.features import batch_feature_arrays
    from openpystruct_tpu.datagen.generate import generate_batch
    from openpystruct_tpu.families import FAMILIES, PINN_PENALTY, build_family
    from openpystruct_tpu.train import evaluate_r2, fit

    spec = FAMILIES[args.model]
    nelem = 100
    include_solution = bool(spec.extra_label_keys)

    # --- generate + featurize (all on device) -------------------------------
    n_batches = (args.samples + args.batch - 1) // args.batch
    t0 = time.time()
    feats = []
    for i in range(n_batches):
        b = generate_batch(
            jax.random.fold_in(jax.random.PRNGKey(args.seed), i), args.batch,
            scen_cfg=ScenarioConfig(),
        )
        feats.append(batch_feature_arrays(b, include_solution=include_solution))
    arrays = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *feats)
    n_valid = int(arrays["valid"].sum())
    t_gen = time.time() - t0
    print(f"generate: {t_gen:.1f}s ({n_valid:,} valid samples)", flush=True)

    # --- preprocess ----------------------------------------------------------
    ds = prepare_dataset_device(
        arrays, n_cases=spec.train.n_cases, c=spec.train.c,
        nheads_pad=spec.nheads_pad, extra_label_keys=spec.extra_label_keys,
        seed=args.seed,
    )
    print(f"dataset: {ds.X_train.shape[0]:,} train groups, feat {ds.feat_dim}, "
          f"label {ds.label_dim}", flush=True)

    # --- train ---------------------------------------------------------------
    import dataclasses

    model, spec, fit_kwargs = build_family(
        args.model, ds.feat_dim, nelem=nelem, label_dim=ds.label_dim
    )
    if args.model == "pinn" and args.pinn_constraints == "off":
        # pre-round-4 behavior: composite loss with no box bounds
        from openpystruct_tpu.models import composite_pinn_loss

        def no_constraint_builder(Y_train):
            def loss(alpha, preds, targets):
                return composite_pinn_loss(
                    alpha, preds, targets, nelem=nelem,
                    min_constraint=None, max_constraint=None,
                    box_constraint_coeff=spec.train.box_constraint_coeff,
                    penalty_pinn=PINN_PENALTY,
                )
            return loss

        fit_kwargs["loss_fn_builder"] = no_constraint_builder

    cfg = dataclasses.replace(spec.train, num_epochs=args.epochs)
    t0 = time.time()
    res = fit(model, ds.X_train, ds.Y_train, ds.X_val, ds.Y_val, cfg,
              rng=jax.random.PRNGKey(args.seed), **fit_kwargs)
    t_train = time.time() - t0
    ep = len(res.train_losses)
    print(f"train: {ep} epochs in {t_train:.1f}s "
          f"({ep * ds.X_train.shape[0] / t_train:,.0f} samples/s/chip)",
          flush=True)

    label_slice = slice(0, nelem) if args.model == "pinn" else None
    r2 = evaluate_r2(
        model, res.params, ds.X_val, ds.Y_val, ds.scaler_Y,
        model_rng_keys=spec.model_rng_keys, batch_stats=res.batch_stats,
        label_slice=label_slice, batch_size=4096,
    )
    tag = "" if args.model != "pinn" else f" (constraints {args.pinn_constraints})"
    suffix = " (I only)" if args.model == "pinn" else ""
    print(f"{args.model}{tag}: validation R²{suffix} = {r2:.4f}, "
          f"best val loss {float(np.min(res.val_losses)):.6f}")


if __name__ == "__main__":
    main()

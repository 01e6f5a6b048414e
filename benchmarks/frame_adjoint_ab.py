"""A/B the frame implicit adjoint (round 5) on the real TPU.

``block_thomas_solve`` carries an implicit custom_vjp (the frame system is
symmetric, so the adjoint solve substitutes from the SAVED forward
factors, ``fem/frame_banded.py``).  This script measures, at the
BENCHMARKS.md frame protocol (10x10 grid, B=256, fixed epoch budget,
f32, banded method):

1. semi-gradient (reference semantics,
   OpenPyStruct_FrameOpt_Discrete_Beta.py:197-199) — context;
2. adjoint via the implicit vjp;
3. adjoint via reverse-AD THROUGH the factorization (what plain autodiff
   would do — monkeypatches the custom_vjp away), to quantify what the
   implicit rule buys;

and checks 2 and 3 agree on the optimized I (same math, different
program).

Run: python benchmarks/frame_adjoint_ab.py [--epochs 200] [--batch 256]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

import openpystruct_tpu.fem.frame_banded as fb
from openpystruct_tpu.config import FrameConfig
from openpystruct_tpu.datagen.frames import sample_frame_loads
from openpystruct_tpu.fem import build_frame
from openpystruct_tpu.opt.frame_opt import optimize_frame_batched


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--bays", type=int, default=10)
    ap.add_argument("--stories", type=int, default=10)
    args = ap.parse_args()

    print("device:", jax.devices()[0], flush=True)
    cfg = dataclasses.replace(
        FrameConfig(), max_epochs=args.epochs, patience=10**9
    )
    st = build_frame(args.bays, args.stories, cfg)
    udl, lat = sample_frame_loads(jax.random.PRNGKey(0), args.batch, cfg)

    orig = fb.block_thomas_solve

    def raw_ad_solve(D, U, f):
        x, piv, _ = fb._thomas_impl(D, U, f)
        return x, piv

    def run(tag, solve_fn, grad_mode):
        fb.block_thomas_solve = solve_fn
        try:
            fn = jax.jit(lambda u, l: optimize_frame_batched(
                st, u, l, cfg, grad_mode=grad_mode))
            t0 = time.perf_counter()
            r = fn(udl, lat)
            float(np.asarray(r.loss.total).sum())  # force through the tunnel
            cold = time.perf_counter() - t0
            t0 = time.perf_counter()
            r = fn(udl, lat)
            float(np.asarray(r.loss.total).sum())
            warm = time.perf_counter() - t0
            its = args.batch * args.epochs / warm
            print(
                f"{tag:26s} cold {cold:7.1f}s  warm {warm:6.2f}s  "
                f"{its:10,.0f} it/s  "
                f"loss {np.asarray(r.loss.total).mean():.4e}",
                flush=True,
            )
            return np.asarray(r.I)
        finally:
            fb.block_thomas_solve = orig

    run("semi (context)", orig, "semi")
    I_imp = run("adjoint implicit vjp", orig, "adjoint")
    I_raw = run("adjoint raw-AD factor", raw_ad_solve, "adjoint")
    d = np.abs(I_imp - I_raw).max() / np.abs(I_raw).max()
    print(f"implicit-vs-rawAD final-I max rel diff: {d:.2e}", flush=True)


if __name__ == "__main__":
    main()

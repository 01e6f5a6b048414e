"""Stage-level dd kernel cost breakdown on the real TPU (VERDICT r4 item 4).

Measures per-lane-epoch cost of:
  1. f32 fused opt-step kernel   (pallas_beam_opt_step)
  2. dd fused opt-step kernel    (pallas_beam_opt_step_dd)
  3. f32 analysis kernel          (solve only + forces)
  4. dd analysis kernel
at B=8192, n=101 — the rescue shape.  Ratios locate where the dd 18x
flop multiplier becomes the measured ~100x.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from openpystruct_tpu.fem.beam import constraint_mask
from openpystruct_tpu.fem import BeamScenario

E, A, G = 200e9, 0.01, 200e9 / 2.6
B, nelem = 8192, 100
n = nelem + 1

key = jax.random.PRNGKey(0)
node_x = jnp.linspace(0.0, 200.0, n)
roller = jnp.zeros(n, bool).at[jnp.array([9, 29, 69, 84, 99])].set(True)
loads = jnp.zeros(n).at[jnp.array([15, 44, 91])].set(
    jnp.array([-3e5, -1e5, -2.5e5]))
sc = BeamScenario(node_x=node_x, roller_mask=roller, point_loads=loads,
                  udl=jnp.asarray(-1000.0))
sc32 = jax.tree.map(lambda x: x.astype(jnp.float32)
                    if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
                    else x, sc)
sc_b = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), sc32)
Ib = jnp.exp(jax.random.normal(key, (B, nelem), jnp.float32) * 0.3) * 0.5
Le = jnp.diff(sc_b.node_x, axis=-1)
free = (~jax.vmap(constraint_mask)(sc_b)).astype(jnp.float32)
mu = jnp.zeros_like(Ib)
nu = jnp.zeros_like(Ib)


def rate(fn, reps=20, rounds=3):
    out = fn()
    jax.tree.map(lambda x: x.block_until_ready(), out)
    best = 0.0
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        jax.tree.map(lambda x: x.block_until_ready(), out)
        dt = (time.perf_counter() - t0) / reps
        best = max(best, B / dt)
    return best


from openpystruct_tpu.ops.beam_kernel import (
    pallas_beam_analysis, pallas_beam_opt_step,
)
from openpystruct_tpu.ops.beam_kernel_dd import (
    pallas_beam_analysis_dd, pallas_beam_opt_step_dd,
)

f32_an = jax.jit(lambda: pallas_beam_analysis(
    Ib, Le, free, sc_b.point_loads, sc_b.udl, E, A, refine=0)[0])
dd_an = jax.jit(lambda: pallas_beam_analysis_dd(
    Ib, Le, free, sc_b.point_loads, sc_b.udl, E, A)[0])
f32_opt = jax.jit(lambda: pallas_beam_opt_step(
    Ib, mu, nu, Le, free, sc_b.point_loads, sc_b.udl,
    jnp.asarray(0.005, jnp.float32), jnp.asarray(1.0, jnp.float32),
    jnp.asarray(1.0, jnp.float32), E, A, G)[0])
dd_opt = jax.jit(lambda: pallas_beam_opt_step_dd(
    Ib, mu, nu, Le, free, sc_b.point_loads, sc_b.udl,
    jnp.asarray(0.005, jnp.float32), jnp.asarray(1.0, jnp.float32),
    jnp.asarray(1.0, jnp.float32), E, A, G)[0])

results = {}
for name, fn in [("f32 analysis", f32_an), ("dd  analysis", dd_an),
                 ("f32 opt-step", f32_opt), ("dd  opt-step", dd_opt)]:
    try:
        r = rate(fn)
        results[name] = r
        print(f"{name}: {r:12.0f} lanes/s  ({1e9/r:8.1f} ns/lane)", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
if "f32 analysis" in results and "dd  analysis" in results:
    print(f"analysis dd/f32 cost ratio: {results['f32 analysis']/results['dd  analysis']:.1f}x")
if "f32 opt-step" in results and "dd  opt-step" in results:
    print(f"opt-step dd/f32 cost ratio: {results['f32 opt-step']/results['dd  opt-step']:.1f}x")

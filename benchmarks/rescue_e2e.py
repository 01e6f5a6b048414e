"""End-to-end random-bridge datagen throughput at B=8192 (the VERDICT r4
item-4 scoreboard number): f32 pass + on-chip dd rescue of the
pivot-rejected tail."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from openpystruct_tpu.config import ScenarioConfig
from openpystruct_tpu.datagen import generate_batch

B = 8192
scen = ScenarioConfig(random_bridge=True)

# warm-up/compile batch
t0 = time.time()
b = generate_batch(jax.random.PRNGKey(0), B, scen_cfg=scen)
v = np.asarray(b.valid)
print(f"cold: {time.time()-t0:.1f}s  valid {v.sum()}/{v.size}", flush=True)

for i in (1, 2):
    t0 = time.time()
    b = generate_batch(jax.random.PRNGKey(i), B, scen_cfg=scen)
    v = np.asarray(b.valid)
    dt = time.time() - t0
    print(f"warm {i}: {dt:.1f}s = {B/dt:,.0f} samples/s  "
          f"valid {v.sum()}/{v.size}", flush=True)

# reference point: rescue off (drop-the-tail)
t0 = time.time()
b = generate_batch(jax.random.PRNGKey(3), B, scen_cfg=scen, rescue=False)
v = np.asarray(b.valid)
dt = time.time() - t0
print(f"no-rescue: {dt:.1f}s = {B/dt:,.0f} samples/s  "
      f"valid {v.sum()}/{v.size} (cold incl. compile)", flush=True)
t0 = time.time()
b = generate_batch(jax.random.PRNGKey(4), B, scen_cfg=scen, rescue=False)
v = np.asarray(b.valid)
dt = time.time() - t0
print(f"no-rescue warm: {dt:.1f}s = {B/dt:,.0f} samples/s  "
      f"valid {v.sum()}/{v.size}", flush=True)

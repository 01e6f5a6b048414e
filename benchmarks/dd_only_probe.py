import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from openpystruct_tpu.fem import BeamScenario
from openpystruct_tpu.fem.beam import constraint_mask

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

from openpystruct_tpu.ops.beam_kernel_dd import pallas_beam_opt_step_dd

t0 = time.time()
out = pallas_beam_opt_step_dd(
    Ib, mu, nu, Le, free, sc_b.point_loads, sc_b.udl,
    jnp.asarray(0.005, jnp.float32), jnp.asarray(1.0, jnp.float32),
    jnp.asarray(1.0, jnp.float32), E, A, G)
float(out[0].sum())
print(f"dd opt compile+first run: {time.time()-t0:.1f}s")
reps = 20
best = 0.0
for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(reps):
        out = pallas_beam_opt_step_dd(
            Ib, mu, nu, Le, free, sc_b.point_loads, sc_b.udl,
            jnp.asarray(0.005, jnp.float32), jnp.asarray(1.0, jnp.float32),
            jnp.asarray(1.0, jnp.float32), E, A, G)
    float(out[0].sum())
    dt = (time.perf_counter() - t0) / reps
    best = max(best, B / dt)
print(f"dd opt-step: {best:.0f} lanes/s ({1e9/best:.1f} ns/lane)")

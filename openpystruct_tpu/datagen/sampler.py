"""Random load/support scenario sampler.

Reproduces the reference's randomization distributions
(OpenPyStruct_BeamOpt_training_MultiCore.py:58-70,136-162) with jax.random
and fixed-size masked arrays so the whole sampler vmaps:

- fixed-bridge mode (``random_bridge=False``, the default): L = L_max,
  rollers at the fixed 1-based node tags (10, 30, 70, 85, 100)
  (MultiCore.py:66);
- random-bridge mode: L ~ L_min + U(0, L_max); 1..N_rollers_max rollers
  sampled uniformly without replacement from node tags 2..num_nodes-1, with
  no minimum-spacing constraint (MultiCore.py:137-156);
- 1..M_forces_max point forces at non-roller tags in 2..num_nodes-1,
  values ~ U(max_force, max_force/10) (MultiCore.py:159-162; note
  ``random.uniform(min_force, max_force)`` in the reference spans the same
  interval regardless of argument order).

Sampling-without-replacement is implemented by ranking i.i.d. uniform scores
over the candidate set and keeping the k smallest — exactly a uniform
k-subset, and fully vectorized.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from openpystruct_tpu.config import ScenarioConfig
from openpystruct_tpu.fem.beam import BeamScenario


def _rank(scores):
    """rank[i] = position of scores[i] in ascending order."""
    order = jnp.argsort(scores)
    return jnp.argsort(order)


def sample_scenario(key, cfg: ScenarioConfig = ScenarioConfig()) -> BeamScenario:
    """Draw one random scenario (vmappable over a batch of keys)."""
    n = cfg.num_nodes
    k_len, k_nr, k_roll, k_nf, k_fsel, k_fval = jax.random.split(key, 6)

    idx = jnp.arange(n)
    # Candidate node tags 2..num_nodes-1, i.e. 0-based indices 1..n-2
    # (available_nodes = range(2, num_nodes), MultiCore.py:62).
    candidates = (idx >= 1) & (idx <= n - 2)

    if cfg.random_bridge:
        L = cfg.L_min + jax.random.uniform(k_len) * cfg.L_max
        num_rollers = jax.random.randint(k_nr, (), 1, cfg.n_rollers_max + 1)
        r_scores = jnp.where(
            candidates, jax.random.uniform(k_roll, (n,)), jnp.inf
        )
        r_rank = _rank(r_scores)
        roller_mask = r_rank < num_rollers
        # draw position of each selected roller: conditional on the
        # selected set, the score order is a uniform permutation — the
        # same law as the reference's sequential random.choice draws
        # (MultiCore.py:145-156)
        roller_order = jnp.where(roller_mask, r_rank, n)
    else:
        L = jnp.asarray(float(cfg.L_max))
        roller_mask = jnp.zeros(n, dtype=bool)
        for tag in cfg.fixed_roller_tags:
            roller_mask = roller_mask.at[tag - 1].set(True)
        # fixed rollers are stored in the given (ascending-tag) list order
        roller_order = jnp.where(
            roller_mask, jnp.cumsum(roller_mask) - 1, n
        )

    node_x = jnp.linspace(0.0, 1.0, n) * L

    available = candidates & (~roller_mask)
    num_forces = jax.random.randint(k_nf, (), 1, cfg.m_forces_max + 1)
    f_scores = jnp.where(available, jax.random.uniform(k_fsel, (n,)), jnp.inf)
    f_rank = _rank(f_scores)
    force_sel = f_rank < num_forces
    # forces are random.sample'd in BOTH modes (MultiCore.py:159-160), so
    # their storage order is a uniform permutation in both
    force_order = jnp.where(force_sel, f_rank, n)

    lo = jnp.minimum(cfg.max_force, cfg.min_force)
    hi = jnp.maximum(cfg.max_force, cfg.min_force)
    vals = jax.random.uniform(k_fval, (n,), minval=lo, maxval=hi)
    point_loads = jnp.where(force_sel, vals, 0.0)

    return BeamScenario(
        node_x=node_x,
        roller_mask=roller_mask,
        point_loads=point_loads,
        udl=jnp.asarray(float(cfg.udl)),
        roller_order=(roller_order.astype(jnp.int32)
                      if cfg.store_draw_order else None),
        force_order=(force_order.astype(jnp.int32)
                     if cfg.store_draw_order else None),
    )

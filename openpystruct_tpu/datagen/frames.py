"""Batched frame scenario generation — the frame analog of the beam
datagen pipeline.

The reference's frame script optimizes exactly ONE random frame per run
(random 1-10 bays x 1-10 stories, fixed loads,
OpenPyStruct_FrameOpt_Discrete_Beta.py:50-52,166-206) and has no dataset
story at all.  Here a whole batch of load scenarios optimizes in one XLA
program per topology — the (B, 3N, 3N) dense LU batches onto the MXU —
optionally sharded over a device mesh, with columnar output mirroring the
beam schema's spirit.

Topology is a static shape (element index arrays fix the trace), so
datasets group samples by (bays, stories); the jitted batch program is
cached per topology, mirroring datagen/generate.py's lru_cache pattern.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from openpystruct_tpu.config import FrameConfig
from openpystruct_tpu.fem.frame import FrameStructure, build_frame
from openpystruct_tpu.opt.frame_opt import FrameOptResult


@struct.dataclass
class FrameBatch:
    udl: jax.Array            # (B,) per-scenario beam UDL
    lateral_load: jax.Array   # (B,) per-scenario lateral load
    result: FrameOptResult    # batched
    valid: jax.Array          # (B,) finiteness (fixed-base frames are
                              # never mechanisms; no pivot check needed)


def sample_frame_loads(key, batch: int, cfg: FrameConfig = FrameConfig(),
                       scale=(0.5, 1.5)):
    """(B,) load scenarios: the reference's fixed loads scaled by a
    uniform factor per lane (the reference randomizes only geometry,
    FrameOpt_Discrete_Beta.py:50-52 — load variation is the natural
    dataset axis once topology is batched)."""
    kw, kp = jax.random.split(key)
    su = jax.random.uniform(kw, (batch,), jnp.float32, *scale)
    sp = jax.random.uniform(kp, (batch,), jnp.float32, *scale)
    return cfg.udl * su, cfg.lateral_load * sp


@functools.lru_cache(maxsize=32)
def _make_frame_batch_fn(num_bays: int, num_stories: int,
                         cfg: FrameConfig,
                         mesh: Optional[jax.sharding.Mesh],
                         data_axis: str):
    from openpystruct_tpu.opt.frame_opt import optimize_frame_batched

    structure = build_frame(num_bays, num_stories, cfg)

    def batch_fn(udl, lateral):
        res = optimize_frame_batched(structure, udl, lateral, cfg)
        finite = jnp.all(jnp.isfinite(res.I), axis=-1) & jnp.all(
            jnp.isfinite(res.solution.displacements), axis=(-2, -1)
        )
        return FrameBatch(
            udl=udl, lateral_load=lateral, result=res, valid=finite
        )

    if mesh is not None:
        spec = jax.sharding.PartitionSpec(data_axis)
        return structure, jax.jit(
            jax.shard_map(
                batch_fn, mesh=mesh, in_specs=spec, out_specs=spec,
                check_vma=False,
            )
        )
    return structure, jax.jit(batch_fn)


def generate_frame_batch(
    key,
    batch_size: int,
    num_bays: int,
    num_stories: int,
    cfg: FrameConfig = FrameConfig(),
    load_scale=(0.5, 1.5),
    mesh: Optional[jax.sharding.Mesh] = None,
    data_axis: str = "data",
):
    """Optimize ``batch_size`` load scenarios of one frame topology in a
    single program.  Returns (FrameStructure, FrameBatch)."""
    structure, fn = _make_frame_batch_fn(
        num_bays, num_stories, cfg, mesh, data_axis
    )
    udl, lateral = sample_frame_loads(key, batch_size, cfg, load_scale)
    if mesh is not None:
        from openpystruct_tpu.parallel import make_global_batch

        udl = make_global_batch(np.asarray(udl), mesh, data_axis)
        lateral = make_global_batch(np.asarray(lateral), mesh, data_axis)
    return structure, fn(udl, lateral)


def frame_batch_to_columnar(structure: FrameStructure,
                            batch: FrameBatch) -> dict:
    """Columnar host dict (valid rows only), beam-schema spirit: one row
    per scenario with the optimized I field, global end-force components
    the loss reads, and nodal displacements."""
    valid = np.asarray(batch.valid)
    ef = np.asarray(batch.result.solution.end_forces)
    xy = np.asarray(structure.node_xy)
    out = {
        "num_bays": len(np.unique(xy[:, 0].round(9))) - 1,
        "num_stories": len(np.unique(xy[:, 1].round(9))) - 1,
        "I_values": np.asarray(batch.result.I)[valid].tolist(),
        "axial_forces": ef[valid][:, :, 1].tolist(),
        "bending_moments": ef[valid][:, :, 2].tolist(),
        "displacements": np.asarray(
            batch.result.solution.displacements
        )[valid].tolist(),
        "udl": np.asarray(batch.udl)[valid].tolist(),
        "lateral_load": np.asarray(batch.lateral_load)[valid].tolist(),
        "n_epochs": np.asarray(batch.result.n_epochs)[valid].tolist(),
    }
    return out

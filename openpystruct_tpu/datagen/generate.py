"""Vmapped, mesh-sharded training-data generation.

The reference's MultiCore driver farms independent ``generate_sample`` calls
to 22 loky worker processes in batches of 500
(OpenPyStruct_BeamOpt_training_MultiCore.py:242-274).  Here one XLA program
optimizes thousands of scenarios at once: ``vmap`` across scenarios within a
chip, batch sharding across the device mesh between chips.

Failure handling: the reference drops a sample when ``ops.analyze`` returns
nonzero (MultiCore.py:184-186).  A singular system here yields finite
garbage rather than an error code, so validity is determined by a
Schur-pivot singularity check on the final system plus finiteness — the
TPU-native analog of the analyze-failure filter.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from openpystruct_tpu.config import (
    DATAGEN_OPT,
    BeamConfig,
    OptimizerConfig,
    ScenarioConfig,
)
from openpystruct_tpu.fem.beam import BeamScenario, beam_min_pivot
from openpystruct_tpu.opt.beam_opt import BeamOptResult, optimize_beam
from openpystruct_tpu.datagen.sampler import sample_scenario


@struct.dataclass
class DatagenBatch:
    scenario: BeamScenario   # batched (B, ...)
    result: BeamOptResult    # batched
    valid: jax.Array         # (B,) bool
    residual: jax.Array      # (B,) min Schur pivot of the final system


def _make_batch_fn(
    scen_cfg: ScenarioConfig,
    beam_cfg: BeamConfig,
    opt_cfg: OptimizerConfig,
    refine: int,
    pivot_tol: float,
):
    def one_sample(key):
        scenario = sample_scenario(key, scen_cfg)
        res = optimize_beam(scenario, beam_cfg, opt_cfg, refine=refine)
        pivot = beam_min_pivot(res.I_solved, scenario, beam_cfg.E, beam_cfg.A)
        finite = (
            jnp.all(jnp.isfinite(res.I))
            & jnp.all(jnp.isfinite(res.solution.displacements))
        )
        valid = finite & (pivot > pivot_tol)
        return DatagenBatch(
            scenario=scenario, result=res, valid=valid, residual=pivot
        )

    return jax.vmap(one_sample)


def generate_batch(
    key,
    batch_size: int,
    scen_cfg: ScenarioConfig = ScenarioConfig(),
    beam_cfg: Optional[BeamConfig] = None,
    opt_cfg: OptimizerConfig = DATAGEN_OPT,
    refine: int = 1,
    pivot_tol: float = 1e-9,
    mesh: Optional[jax.sharding.Mesh] = None,
    data_axis: str = "data",
) -> DatagenBatch:
    """Generate and optimize ``batch_size`` random scenarios in one program.

    With ``mesh`` given, the key batch (and hence all work) is sharded over
    ``data_axis`` — the TPU-native replacement for the reference's 22-process
    loky pool, with XLA inserting the (tiny) collectives over ICI.
    """
    if beam_cfg is None:
        beam_cfg = BeamConfig(udl=scen_cfg.udl)
    keys = jax.random.split(key, batch_size)
    fn = _make_batch_fn(scen_cfg, beam_cfg, opt_cfg, refine, pivot_tol)
    if mesh is not None:
        sharding = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(data_axis)
        )
        keys = jax.device_put(keys, sharding)
        fn = jax.jit(fn, in_shardings=(sharding,))
    else:
        fn = jax.jit(fn)
    return fn(keys)


def generate_dataset(
    key,
    num_samples: int,
    batch_size: int = 1024,
    scen_cfg: ScenarioConfig = ScenarioConfig(),
    beam_cfg: Optional[BeamConfig] = None,
    opt_cfg: OptimizerConfig = DATAGEN_OPT,
    refine: int = 1,
    pivot_tol: float = 1e-9,
    mesh: Optional[jax.sharding.Mesh] = None,
    progress: bool = False,
) -> dict:
    """Generate ``num_samples`` scenarios in fixed-size batches and return a
    columnar host-side dict in the reference's 13-key dataset schema
    (OpenPyStruct_BeamOpt_training_SingleCore.py:73-87).  Invalid samples are
    dropped, as in the reference (MultiCore.py:264-265).
    """
    from openpystruct_tpu.datagen.io import batch_to_columnar, merge_columnar

    chunks = []
    done = 0
    while done < num_samples:
        b = min(batch_size, num_samples - done)
        key, sub = jax.random.split(key)
        batch = generate_batch(
            sub, b, scen_cfg, beam_cfg, opt_cfg, refine, pivot_tol, mesh
        )
        chunks.append(batch_to_columnar(batch))
        done += b
        if progress:
            print(f"{done} samples processed.")
    return merge_columnar(chunks)

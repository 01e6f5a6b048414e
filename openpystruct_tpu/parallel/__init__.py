"""Device-mesh and sharding utilities (the framework's distributed backend).

The reference has no distributed communication at all — its only parallelism
is a share-nothing 22-process joblib pool
(OpenPyStruct_BeamOpt_training_MultiCore.py:258-262).  Here the equivalent
is JAX collectives over ICI: batch axes are sharded over a
``jax.sharding.Mesh`` and XLA inserts psum/all-gather where needed (gradient
sync under data parallelism, convergence reductions in the datagen
while_loop).  Multi-host scale-out goes through ``jax.distributed`` / DCN.
"""

from openpystruct_tpu.parallel.mesh import (
    default_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    make_global_batch,
    replicate_to_mesh,
    all_processes_min_max,
    initialize_multihost,
)

__all__ = [
    "default_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "make_global_batch",
    "replicate_to_mesh",
    "all_processes_min_max",
    "initialize_multihost",
]

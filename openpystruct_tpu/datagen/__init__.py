"""Batched scenario sampling and training-data generation.

Replaces the reference's three datagen drivers — serial
(OpenPyStruct_BeamOpt_training_SingleCore.py), 22-process joblib/loky
(OpenPyStruct_BeamOpt_training_MultiCore.py) and CUDA-tensor
(OpenPyStruct_BeamOpt_training_GPU.py) — with one program: ``vmap`` over
scenarios within a chip and batch sharding over the device mesh across
chips (ICI collectives instead of process pools).
"""

from openpystruct_tpu.datagen.sampler import sample_scenario
from openpystruct_tpu.datagen.features import batch_feature_arrays
from openpystruct_tpu.datagen.generate import (
    DatagenBatch,
    generate_batch,
    generate_dataset,
    generate_dataset_json,
    generate_to_shards,
    shards_to_json,
)
from openpystruct_tpu.datagen.frames import (
    FrameBatch,
    frame_batch_to_columnar,
    generate_frame_batch,
    generate_frame_dataset,
    sample_frame_loads,
    sample_topologies,
)
from openpystruct_tpu.datagen.io import (
    batch_to_columnar,
    write_json_dataset,
    read_json_dataset,
    write_npz_shard,
    read_npz_shards,
)

__all__ = [
    "sample_scenario",
    "batch_feature_arrays",
    "DatagenBatch",
    "generate_batch",
    "generate_dataset",
    "generate_dataset_json",
    "generate_to_shards",
    "shards_to_json",
    "FrameBatch",
    "frame_batch_to_columnar",
    "generate_frame_batch",
    "generate_frame_dataset",
    "sample_frame_loads",
    "sample_topologies",
    "batch_to_columnar",
    "write_json_dataset",
    "read_json_dataset",
    "write_npz_shard",
    "read_npz_shards",
]

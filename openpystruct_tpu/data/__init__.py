"""Shared preprocessing pipeline (the reference's L3 layer, deduplicated)."""

from openpystruct_tpu.data.persist import (
    load_preprocessing,
    save_preprocessing,
)
from openpystruct_tpu.data.device_pipeline import prepare_dataset_device
from openpystruct_tpu.data.pipeline import (
    Scaler,
    pad_sequences,
    unify_label,
    fit_transform_3d,
    transform_3d,
    merge_sub_features,
    pad_feat_dim_to_multiple_of_nheads,
    prepare_dataset,
    build_user_input,
    DatasetSplits,
)

__all__ = [
    "load_preprocessing",
    "save_preprocessing",
    "prepare_dataset_device",
    "Scaler",
    "pad_sequences",
    "unify_label",
    "fit_transform_3d",
    "transform_3d",
    "merge_sub_features",
    "pad_feat_dim_to_multiple_of_nheads",
    "prepare_dataset",
    "build_user_input",
    "DatasetSplits",
]

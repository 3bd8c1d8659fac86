"""Datasets and input pipeline: loaders, datasets, stratification, levels."""

from spine_vision_tpu.data.cache import (
    PackedDataset,
    build_packed_cache,
    packed_view,
)
from spine_vision_tpu.data.datasets import (
    ClassificationDataset,
    LocalizationDataset,
    collate_classification,
    collate_localization,
    construct_3channel,
)
from spine_vision_tpu.data.levels import (
    IDX_TO_LEVEL,
    LEVEL_NAMES,
    LEVEL_TO_IDX,
    NUM_LEVELS,
    SERIES_TYPE_TO_IDX,
)
from spine_vision_tpu.data.loader import (
    DataLoader,
    compute_inverse_frequency_weights,
    default_collate,
)
from spine_vision_tpu.data.stratification import (
    get_patient_multilabel_matrix,
    get_patient_single_label,
    iterative_multilabel_split,
    split_patients,
    split_patients_multilabel,
    split_patients_single_label,
)

__all__ = [
    "IDX_TO_LEVEL",
    "LEVEL_NAMES",
    "LEVEL_TO_IDX",
    "NUM_LEVELS",
    "SERIES_TYPE_TO_IDX",
    "ClassificationDataset",
    "DataLoader",
    "LocalizationDataset",
    "PackedDataset",
    "build_packed_cache",
    "collate_classification",
    "collate_localization",
    "compute_inverse_frequency_weights",
    "construct_3channel",
    "default_collate",
    "packed_view",
    "get_patient_multilabel_matrix",
    "get_patient_single_label",
    "iterative_multilabel_split",
    "split_patients",
    "split_patients_multilabel",
    "split_patients_single_label",
]

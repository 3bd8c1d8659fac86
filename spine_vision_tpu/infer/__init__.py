"""Fused two-stage study inference (localization -> crop -> grading)."""

from spine_vision_tpu.infer.pipeline import (
    DEFAULT_IVD_CENTERS_XY,
    SERIES_ORDER,
    SeriesCropPipeline,
    StudyInferencePipeline,
    StudyInput,
    StudyPipelineConfig,
    StudyResult,
    loc_and_crop,
    study_input_from_paths,
)

__all__ = [
    "DEFAULT_IVD_CENTERS_XY",
    "SERIES_ORDER",
    "SeriesCropPipeline",
    "StudyInferencePipeline",
    "StudyInput",
    "StudyPipelineConfig",
    "StudyResult",
    "loc_and_crop",
    "study_input_from_paths",
]

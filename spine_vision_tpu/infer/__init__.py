"""Fused two-stage study inference (localization -> crop -> grading)."""

from spine_vision_tpu.infer.pipeline import (
    SERIES_ORDER,
    StudyInferencePipeline,
    StudyInput,
    StudyPipelineConfig,
    StudyResult,
)

__all__ = [
    "SERIES_ORDER",
    "StudyInferencePipeline",
    "StudyInput",
    "StudyPipelineConfig",
    "StudyResult",
]

"""Utilities: profiling and step timing."""

from spine_vision_tpu.utils.profiling import StepTimer, trace_profile

__all__ = ["StepTimer", "trace_profile"]

"""Profiling: XLA trace capture and per-step wall-clock statistics.

The reference's only perf instrumentation is a wall-clock in test_inference
(models/base.py:152-158); SURVEY.md §5 makes tracing a first-class feature of
the rebuild. ``trace_profile`` wraps ``jax.profiler`` trace capture (viewable
in XProf/TensorBoard); ``StepTimer`` accumulates per-step latencies and
reports p50/p95/mean, used by the trainer when ``profile_steps`` is enabled.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Iterator

import numpy as np

from spine_vision_tpu.core import logger


@contextlib.contextmanager
def trace_profile(log_dir: Path | str) -> Iterator[None]:
    """Capture an XLA profiler trace for the enclosed region.

    Usage::

        with trace_profile("logs/profile"):
            train_step(state, batch)

    The trace directory can be opened with XProf / TensorBoard's profile
    plugin. Capture failures degrade to a warning (some backends, e.g.
    remote tunnels, do not support tracing).
    """
    import jax

    log_dir = str(log_dir)
    try:
        jax.profiler.start_trace(log_dir)
    except Exception as exc:
        logger.warning("Profiler trace unavailable: %s", exc)
        yield
        return
    try:
        yield
    finally:
        try:
            jax.profiler.stop_trace()
            logger.info("Profiler trace written to %s", log_dir)
        except Exception as exc:
            logger.warning("Profiler stop failed: %s", exc)


class StepTimer:
    """Accumulates step wall-times and summarizes percentiles."""

    def __init__(self) -> None:
        self._times: list[float] = []
        self._start: float | None = None

    def start(self) -> None:
        self._start = time.perf_counter()

    def stop(self) -> None:
        if self._start is not None:
            self._times.append(time.perf_counter() - self._start)
            self._start = None

    @contextlib.contextmanager
    def measure(self) -> Iterator[None]:
        self.start()
        try:
            yield
        finally:
            self.stop()

    def __len__(self) -> int:
        return len(self._times)

    def summary(self, skip_first: int = 1) -> dict[str, float]:
        """p50/p95/mean seconds (skipping warmup/compile steps)."""
        times = np.asarray(self._times[skip_first:] or self._times)
        if times.size == 0:
            return {}
        return {
            "steps": float(times.size),
            "mean_s": float(times.mean()),
            "p50_s": float(np.percentile(times, 50)),
            "p95_s": float(np.percentile(times, 95)),
        }

    def reset(self) -> None:
        self._times.clear()
        self._start = None

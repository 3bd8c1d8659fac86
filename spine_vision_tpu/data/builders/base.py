"""Shared builder result container (reference datasets/base.py:10-24)."""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path


@dataclass
class ProcessingResult:
    """Statistics and metadata of a dataset-build run."""

    num_samples: int
    output_path: Path
    summary: str = ""

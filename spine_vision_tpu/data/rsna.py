"""RSNA lumbar-spine dataset utilities (reference datasets/rsna.py:7-61).

Maps the RSNA 2024 ``train_series_descriptions.csv`` into study -> series
lookups used by the localization dataset builder.

Deviation from the reference: the reference nests the mapping as
``study_id -> {series_description: series_id}`` (rsna.py:26-33), so a study
holding two series with the SAME description — common in RSNA 2024, e.g.
repeated "Sagittal T2/STIR" acquisitions — keeps only the last CSV row;
``get_series_type`` then returns None for the shadowed series_id and every
one of its coordinate rows is silently dropped by the builder. This module
keys the inner dict by ``series_id`` (unique per study), which loses
nothing and makes the lookup O(1) instead of a linear scan.
"""

from __future__ import annotations

import csv
from pathlib import Path


def load_series_mapping(series_desc_path: Path) -> dict[int, dict[int, str]]:
    """study_id -> {series_id -> series_description} from the RSNA CSV."""
    mapping: dict[int, dict[int, str]] = {}
    with open(series_desc_path, newline="") as f:
        for row in csv.DictReader(f):
            study_id = int(row["study_id"])
            mapping.setdefault(study_id, {})[int(row["series_id"])] = row[
                "series_description"
            ]
    return mapping


def get_series_type(
    series_id: int, study_id: int, series_mapping: dict[int, dict[int, str]]
) -> str | None:
    """Series description for a series_id within a study (None if absent)."""
    study = series_mapping.get(study_id)
    if study is None:
        return None
    return study.get(series_id)

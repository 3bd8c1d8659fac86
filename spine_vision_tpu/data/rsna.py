"""RSNA lumbar-spine dataset utilities (reference datasets/rsna.py:7-61).

Maps the RSNA 2024 ``train_series_descriptions.csv`` into study -> series
lookups used by the localization dataset builder.
"""

from __future__ import annotations

import csv
from pathlib import Path


def load_series_mapping(series_desc_path: Path) -> dict[int, dict[str, int]]:
    """study_id -> {series_description -> series_id} from the RSNA CSV."""
    mapping: dict[int, dict[str, int]] = {}
    with open(series_desc_path, newline="") as f:
        for row in csv.DictReader(f):
            study_id = int(row["study_id"])
            mapping.setdefault(study_id, {})[row["series_description"]] = int(
                row["series_id"]
            )
    return mapping


def get_series_type(
    series_id: int, study_id: int, series_mapping: dict[int, dict[str, int]]
) -> str | None:
    """Reverse lookup: series description for a series_id within a study."""
    study = series_mapping.get(study_id)
    if study is None:
        return None
    for series_desc, sid in study.items():
        if sid == series_id:
            return series_desc
    return None

"""Tabular I/O: record CSV writing and Excel/CSV label-table loading.

Capability parity with reference io/tabular.py:18-105. Records may be
pydantic models, dataclasses, or plain dicts (the reference only handled
pydantic). Excel support is gated on openpyxl being importable.
"""

from __future__ import annotations

import csv
import dataclasses
from pathlib import Path
from typing import Any, Sequence

import pandas as pd

from spine_vision_tpu.core import logger

EXCEL_FORMATS = {".xlsx", ".xls", ".xlsm"}


def _record_to_dict(record: Any) -> dict[str, Any]:
    if isinstance(record, dict):
        return record
    if dataclasses.is_dataclass(record) and not isinstance(record, type):
        return dataclasses.asdict(record)
    if hasattr(record, "model_dump"):  # pydantic v2
        return record.model_dump()
    raise TypeError(f"Unsupported record type: {type(record)}")


def write_records_csv(records: Sequence[Any], csv_path: Path) -> None:
    """Write records (pydantic / dataclass / dict) to a CSV file.

    Raises:
        ValueError: If the records list is empty.
    """
    if not records:
        raise ValueError("Cannot write empty records list")
    rows = [_record_to_dict(r) for r in records]
    csv_path = Path(csv_path)
    csv_path.parent.mkdir(parents=True, exist_ok=True)
    with open(csv_path, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        writer.writeheader()
        writer.writerows(rows)
    logger.info("Wrote %d records to %s", len(rows), csv_path)


def load_tabular_data(
    table_path: Path,
    exclude_files: list[str] | None = None,
    id_col: str = "Patient ID",
    corrupted_ids: list[int] | None = None,
    one_hot_col: str | None = None,
    one_hot_sep: str = "&",
) -> pd.DataFrame:
    """Recursively load Excel/CSV label tables into one cleaned DataFrame.

    Concatenates all supported files under ``table_path``, drops duplicates
    and NA rows, filters corrupted patient IDs, and optionally expands a
    separator-joined column into one-hot indicator columns (the reference
    uses this for multi-valued Modic annotations like "1&2").
    """
    exclude_files = exclude_files or []
    corrupted_ids = corrupted_ids or []

    frames: list[pd.DataFrame] = []
    for file_path in sorted(Path(table_path).rglob("*")):
        if not file_path.is_file() or file_path.name in exclude_files:
            continue
        suffix = file_path.suffix.lower()
        if suffix == ".csv":
            frames.append(pd.read_csv(file_path))
        elif suffix in EXCEL_FORMATS:
            try:
                frames.append(pd.read_excel(file_path))
            except ImportError as exc:
                logger.warning("Skipping %s (no Excel engine: %s)", file_path, exc)
        else:
            logger.warning("Unsupported format: %s", file_path)

    if not frames:
        logger.warning("No valid data files found in %s", table_path)
        return pd.DataFrame()

    df = pd.concat(frames, ignore_index=True)
    before = len(df)
    df = df.drop_duplicates()
    logger.debug("Dropped %d duplicate rows", before - len(df))
    before = len(df)
    df = df.dropna()
    logger.debug("Dropped %d rows with NA", before - len(df))

    if corrupted_ids and id_col in df.columns:
        df = df[~df[id_col].isin(corrupted_ids)]

    if one_hot_col and one_hot_col in df.columns:
        dummies = (
            df[one_hot_col]
            .astype(str)
            .str.replace(r"\.0\b", "", regex=True)
            .str.get_dummies(sep=one_hot_sep)
            .add_prefix(f"{one_hot_col}_")
        )
        df = pd.concat([df, dummies], axis=1).drop(columns=one_hot_col)

    logger.info("Loaded %d rows from tabular data", len(df))
    return df

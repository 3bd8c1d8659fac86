"""Direct tests for tabular label-table loading and record CSV writing
(reference io/tabular.py:18-105 semantics: recursive concat, dedup, NA
drop, corrupted-ID filter, '&'-separated one-hot expansion)."""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
import pytest

from spine_vision_tpu.io.tabular import load_tabular_data, write_records_csv


def test_load_tabular_concat_dedup_dropna_filter_onehot(tmp_path):
    a = pd.DataFrame(
        {
            "Patient ID": [1, 2, 3, 3],
            "Modic": ["0", "1&2", "2", "2"],
            "Grade": [1.0, 2.0, 3.0, 3.0],
        }
    )
    b = pd.DataFrame(
        {
            "Patient ID": [4, 5],
            "Modic": ["1.0", None],  # float-formatted + NA row
            "Grade": [2.0, 1.0],
        }
    )
    a.to_csv(tmp_path / "a.csv", index=False)
    (tmp_path / "sub").mkdir()  # recursive rglob must find nested tables
    b.to_csv(tmp_path / "sub" / "b.csv", index=False)

    df = load_tabular_data(
        tmp_path,
        corrupted_ids=[4],
        one_hot_col="Modic",
        one_hot_sep="&",
    )
    # Row 3 deduplicated, NA row 5 dropped, corrupted ID 4 filtered.
    assert sorted(df["Patient ID"].tolist()) == [1, 2, 3]
    # "1&2" expands into both indicator columns; ".0" suffixes normalize.
    assert "Modic_1" in df.columns and "Modic_2" in df.columns
    row2 = df[df["Patient ID"] == 2].iloc[0]
    assert row2["Modic_1"] == 1 and row2["Modic_2"] == 1
    assert "Modic" not in df.columns


def test_load_tabular_excludes_files_and_warns_on_unknown(tmp_path):
    pd.DataFrame({"Patient ID": [1], "x": [1]}).to_csv(
        tmp_path / "keep.csv", index=False
    )
    pd.DataFrame({"Patient ID": [9], "x": [9]}).to_csv(
        tmp_path / "skip.csv", index=False
    )
    (tmp_path / "notes.txt").write_text("not a table")
    df = load_tabular_data(tmp_path, exclude_files=["skip.csv"])
    assert df["Patient ID"].tolist() == [1]


def test_load_tabular_empty_dir_returns_empty(tmp_path):
    df = load_tabular_data(tmp_path)
    assert df.empty


@dataclass
class _Rec:
    image_path: str
    grade: int


def test_write_records_csv_dataclass_and_dict(tmp_path):
    path = tmp_path / "out.csv"
    write_records_csv([_Rec("a.png", 3), {"image_path": "b.png", "grade": 1}], path)
    back = pd.read_csv(path)
    assert back["image_path"].tolist() == ["a.png", "b.png"]
    assert back["grade"].tolist() == [3, 1]


def test_write_records_csv_rejects_empty(tmp_path):
    with pytest.raises(ValueError, match="empty"):
        write_records_csv([], tmp_path / "x.csv")

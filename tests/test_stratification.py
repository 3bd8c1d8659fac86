"""Direct tests for the reimplemented stratified patient splitting.

The reference delegates to sklearn's StratifiedShuffleSplit and iterstrat's
MultilabelStratifiedShuffleSplit (reference training/datasets/
stratification.py:144-270); this framework reimplements iterative
stratification (Sechidis 2011) from scratch, so its balance and
completeness properties are pinned here directly rather than only through
the dataset-level split tests.
"""

from __future__ import annotations

import numpy as np
import pytest

from spine_vision_tpu.data.stratification import (
    get_patient_multilabel_matrix,
    get_patient_single_label,
    iterative_multilabel_split,
    split_patients,
    split_patients_single_label,
)


def _records(rng: np.random.Generator, n_patients: int) -> tuple[list[str], list[dict]]:
    patients = [f"p{i:03d}" for i in range(n_patients)]
    records = []
    for p in patients:
        for level in range(1, 6):
            records.append(
                {
                    "patient_key": p,
                    "pfirrmann": int(rng.integers(1, 6)),
                    "modic": int(rng.integers(0, 4)),
                    "herniation": int(rng.integers(0, 2)),
                }
            )
    return patients, records


def test_iterative_split_is_disjoint_and_complete():
    rng = np.random.default_rng(0)
    labels = (rng.random((120, 6)) < 0.3).astype(np.float32)
    train, test = iterative_multilabel_split(labels, 0.25, seed=1)
    assert len(set(train) & set(test)) == 0
    assert sorted(np.concatenate([train, test]).tolist()) == list(range(120))


def test_iterative_split_is_deterministic():
    rng = np.random.default_rng(3)
    labels = (rng.random((80, 4)) < 0.4).astype(np.float32)
    a = iterative_multilabel_split(labels, 0.3, seed=7)
    b = iterative_multilabel_split(labels, 0.3, seed=7)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_iterative_split_balances_every_label():
    rng = np.random.default_rng(1)
    # Mixed prevalence incl. a rare label (~5%).
    probs = np.array([0.5, 0.3, 0.2, 0.05])
    labels = (rng.random((200, 4)) < probs).astype(np.float32)
    _, test = iterative_multilabel_split(labels, 0.25, seed=0)
    test_mask = np.zeros(len(labels), bool)
    test_mask[test] = True
    for j in range(labels.shape[1]):
        total = labels[:, j].sum()
        got = labels[test_mask, j].sum()
        # Each label's positives land in the test fold at ~the fold ratio —
        # tighter than a random split would guarantee for the rare label.
        assert abs(got / total - 0.25) < 0.12, (j, got, total)


def test_iterative_split_rare_label_spreads_across_folds():
    labels = np.zeros((40, 2), np.float32)
    labels[:, 0] = 1.0
    labels[3, 1] = 1.0
    labels[27, 1] = 1.0  # exactly two positives of label 1
    train, test = iterative_multilabel_split(labels, 0.5, seed=2)
    in_test = int(labels[test, 1].sum())
    assert in_test == 1  # one on each side at a 50/50 split


def test_patient_single_label_is_max_over_levels():
    patients = ["a", "b"]
    records = [
        {"patient_key": "a", "pfirrmann": 2},
        {"patient_key": "a", "pfirrmann": 4},
        {"patient_key": "b", "pfirrmann": 1},
    ]
    out = get_patient_single_label(patients, records, "pfirrmann")
    np.testing.assert_array_equal(out, [4, 1])


def test_multilabel_matrix_indexing_conventions():
    patients = ["a"]
    records = [
        {"patient_key": "a", "pfirrmann": 3, "modic": 2, "herniation": 1},
    ]
    m = get_patient_multilabel_matrix(
        patients, records, ["pfirrmann", "modic", "herniation"]
    )
    # Columns: pfirrmann grades 1-5 (1-indexed -> one-hot at index 2),
    # modic classes 0-3 (one-hot at index 2), herniation any-level.
    assert m.shape == (1, 10)
    np.testing.assert_array_equal(
        m[0], [0, 0, 1, 0, 0, 0, 0, 1, 0, 1]
    )


def test_single_label_split_respects_ratios_and_partitions():
    rng = np.random.default_rng(5)
    patients, records = _records(rng, 60)
    train, val, test = split_patients_single_label(
        patients, records, "pfirrmann", val_ratio=0.15, test_ratio=0.10, seed=0
    )
    assert train | val | test == set(patients)
    assert not (train & val) and not (train & test) and not (val & test)
    assert len(test) == pytest.approx(6, abs=2)
    assert len(val) == pytest.approx(9, abs=2)


def test_single_label_split_tiny_class_falls_back():
    # One patient per class value: StratifiedShuffleSplit would raise; the
    # fallback shuffle must still produce a valid partition.
    patients = [f"p{i}" for i in range(5)]
    records = [
        {"patient_key": p, "pfirrmann": i + 1} for i, p in enumerate(patients)
    ]
    train, val, test = split_patients_single_label(
        patients, records, "pfirrmann", val_ratio=0.2, test_ratio=0.2, seed=0
    )
    assert train | val | test == set(patients)
    assert len(test) >= 1 and len(val) >= 1


def test_split_patients_dispatches_on_label_count():
    rng = np.random.default_rng(9)
    patients, records = _records(rng, 40)
    single = split_patients(patients, records, ["pfirrmann"], 0.15, 0.1, 0)
    multi = split_patients(
        patients, records, ["pfirrmann", "modic", "herniation"], 0.15, 0.1, 0
    )
    for train, val, test in (single, multi):
        assert train | val | test == set(patients)
        assert not (train & val) and not (train & test) and not (val & test)

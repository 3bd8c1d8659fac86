"""Patient-level stratified splitting.

Parity with reference training/datasets/stratification.py: single-label
splits use sklearn's StratifiedShuffleSplit; multilabel splits use iterative
stratification (Sechidis et al. 2011 / Szymanski & Kajdanowicz) —
re-implemented here because the iterstrat package is not a dependency of this
framework. The patient-label aggregation rules match the reference exactly:
single-label = max value across a patient's IVD levels; multilabel = binary
indicator matrix (pfirrmann one-hot 1-indexed, modic class one-hot, binary
any-level).
"""

from __future__ import annotations

import numpy as np
from sklearn.model_selection import StratifiedShuffleSplit

from spine_vision_tpu.core.tasks import get_task

# task name -> record key (the single definition; datasets re-exports it —
# the dependency is one-way, so no import cycle)
_LABEL_TO_RECORD_KEY = {
    "pfirrmann": "pfirrmann",
    "modic": "modic",
    "herniation": "herniation",
    "bulging": "bulging",
    "upper_endplate": "upper_endplate",
    "lower_endplate": "lower_endplate",
    "spondy": "spondylolisthesis",
    "narrowing": "narrowing",
}


def get_patient_single_label(
    patients: list[str], records: list[dict], label: str
) -> np.ndarray:
    """Stratification label per patient: max across their IVD levels."""
    record_key = _LABEL_TO_RECORD_KEY.get(label, label)
    patient_set = set(patients)
    patient_to_labels: dict[str, list[int]] = {p: [] for p in patients}
    for record in records:
        pk = record["patient_key"]
        if pk in patient_set:
            patient_to_labels[pk].append(record[record_key])
    return np.asarray(
        [max(patient_to_labels.get(p) or [0]) for p in patients]
    )


def get_patient_multilabel_matrix(
    patients: list[str], records: list[dict], target_labels: list[str]
) -> np.ndarray:
    """[n_patients, n_columns] binary indicator matrix for stratification."""
    patient_set = set(patients)
    patient_idx = {p: i for i, p in enumerate(patients)}

    columns: list[tuple[str, int | None]] = []
    for label in target_labels:
        task = get_task(label)
        if task.is_multiclass:
            columns.extend((label, c) for c in range(task.num_classes))
        else:
            columns.append((label, None))

    matrix = np.zeros((len(patients), len(columns)), dtype=np.float32)
    for record in records:
        pk = record["patient_key"]
        if pk not in patient_set:
            continue
        row = patient_idx[pk]
        for col, (label, cls_idx) in enumerate(columns):
            value = record[_LABEL_TO_RECORD_KEY.get(label, label)]
            if cls_idx is not None:
                if label == "pfirrmann":
                    if value == cls_idx + 1:  # pfirrmann is 1-indexed
                        matrix[row, col] = 1.0
                elif value == cls_idx:
                    matrix[row, col] = 1.0
            elif value > 0:
                matrix[row, col] = 1.0
    return matrix


def iterative_multilabel_split(
    labels: np.ndarray,
    test_fraction: float,
    seed: int,
) -> tuple[np.ndarray, np.ndarray]:
    """One iterative-stratification split into (train_idx, test_idx).

    Greedy algorithm: repeatedly take the rarest remaining label, and assign
    each sample carrying it to the fold whose desired count for that label is
    largest (ties -> fold with most remaining capacity, then random).

    Args:
        labels: [n, m] binary matrix.
        test_fraction: Fraction of samples in the test fold.
        seed: RNG seed.

    Returns:
        (train_indices, test_indices).
    """
    rng = np.random.RandomState(seed)
    n = labels.shape[0]
    ratios = np.asarray([1.0 - test_fraction, test_fraction])

    desired_samples = ratios * n
    desired_labels = ratios[None, :] * labels.sum(axis=0)[:, None]  # [m, 2]

    remaining = np.ones(n, dtype=bool)
    fold_of = np.full(n, -1, dtype=np.int64)

    while remaining.any():
        remaining_label_counts = labels[remaining].sum(axis=0)
        active = np.where(remaining_label_counts > 0)[0]
        if active.size == 0:
            # No labels left: distribute by remaining capacity.
            for i in np.where(remaining)[0]:
                fold = int(np.argmax(desired_samples))
                fold_of[i] = fold
                desired_samples[fold] -= 1
                remaining[i] = False
            break

        # Rarest label among remaining samples.
        label = active[np.argmin(remaining_label_counts[active])]
        sample_ids = np.where(remaining & (labels[:, label] > 0))[0]
        rng.shuffle(sample_ids)
        for i in sample_ids:
            want = desired_labels[label]
            best = np.where(want == want.max())[0]
            if best.size > 1:
                cap = desired_samples[best]
                best = best[np.where(cap == cap.max())[0]]
                fold = int(rng.choice(best))
            else:
                fold = int(best[0])
            fold_of[i] = fold
            desired_samples[fold] -= 1
            desired_labels[labels[i] > 0, fold] -= 1
            remaining[i] = False

    return np.where(fold_of == 0)[0], np.where(fold_of == 1)[0]


def split_patients_single_label(
    patients: list[str],
    records: list[dict],
    target_label: str,
    val_ratio: float,
    test_ratio: float,
    seed: int,
) -> tuple[set[str], set[str], set[str]]:
    """Two-stage single-label stratified split (test first, then val)."""
    patients_arr = np.asarray(patients)
    stratify = get_patient_single_label(patients, records, target_label)

    def _safe_split(arr, labels, fraction):
        """StratifiedShuffleSplit with fallback to plain shuffle when class
        counts are too small for stratification."""
        try:
            splitter = StratifiedShuffleSplit(
                n_splits=1, test_size=fraction, random_state=seed
            )
            return next(splitter.split(arr, labels))
        except ValueError:
            rng = np.random.RandomState(seed)
            indices = rng.permutation(len(arr))
            n_test = max(int(round(len(arr) * fraction)), 1)
            return indices[n_test:], indices[:n_test]

    if test_ratio > 0 and len(patients_arr) > 1:
        train_val_idx, test_idx = _safe_split(patients_arr, stratify, test_ratio)
        test_patients = set(patients_arr[test_idx])
        remaining = patients_arr[train_val_idx]
        remaining_labels = stratify[train_val_idx]
    else:
        test_patients = set()
        remaining = patients_arr
        remaining_labels = stratify

    if val_ratio > 0 and len(remaining) > 1:
        adjusted = val_ratio / (1 - test_ratio)
        train_idx, val_idx = _safe_split(remaining, remaining_labels, adjusted)
        return set(remaining[train_idx]), set(remaining[val_idx]), test_patients
    return set(remaining), set(), test_patients


def split_patients_multilabel(
    patients: list[str],
    records: list[dict],
    target_labels: list[str],
    val_ratio: float,
    test_ratio: float,
    seed: int,
) -> tuple[set[str], set[str], set[str]]:
    """Two-stage multilabel iterative-stratification split."""
    patients_arr = np.asarray(patients)
    matrix = get_patient_multilabel_matrix(patients, records, target_labels)

    if test_ratio > 0 and len(patients_arr) > 1:
        train_val_idx, test_idx = iterative_multilabel_split(
            matrix, test_ratio, seed
        )
        test_patients = set(patients_arr[test_idx])
        remaining = patients_arr[train_val_idx]
        remaining_matrix = matrix[train_val_idx]
    else:
        test_patients = set()
        remaining = patients_arr
        remaining_matrix = matrix

    if val_ratio > 0 and len(remaining) > 1:
        adjusted = val_ratio / (1 - test_ratio)
        train_idx, val_idx = iterative_multilabel_split(
            remaining_matrix, adjusted, seed
        )
        return set(remaining[train_idx]), set(remaining[val_idx]), test_patients
    return set(remaining), set(), test_patients


def split_patients(
    patients: list[str],
    records: list[dict],
    target_labels: list[str],
    val_ratio: float,
    test_ratio: float,
    seed: int,
) -> tuple[set[str], set[str], set[str]]:
    """Stratified train/val/test patient split (strategy by label count)."""
    if len(target_labels) > 1:
        return split_patients_multilabel(
            patients, records, target_labels, val_ratio, test_ratio, seed
        )
    return split_patients_single_label(
        patients, records, target_labels[0], val_ratio, test_ratio, seed
    )

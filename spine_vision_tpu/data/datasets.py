"""Training datasets: localization (coordinates) and classification (crops).

Capability parity with the reference torch datasets
(training/datasets/localization.py, training/datasets/classification.py),
restructured for the TPU input pipeline: samples come back as *uint8* HWC
images plus numpy targets; ImageNet normalization and augmentation run on
device inside the jitted train step (see ops.augment), which both shrinks
host->device transfers 4x and fixes the reference's label-inconsistent
geometric augs.

Splitting parity:
- Localization: seeded permutation split by unique image
  (reference localization.py:172-194).
- Classification: patient-level stratified split (single-label sklearn-style
  or multilabel iterative stratification; see data.stratification).
"""

from __future__ import annotations

import csv
from collections import Counter, defaultdict
from pathlib import Path
from typing import Any, Literal, Sequence

import cv2
import numpy as np

from spine_vision_tpu import native
from spine_vision_tpu.core import logger
from spine_vision_tpu.core.tasks import AVAILABLE_TASK_NAMES, get_task
from spine_vision_tpu.data.levels import (
    IDX_TO_LEVEL,
    LEVEL_TO_IDX,
    NUM_LEVELS,
    SERIES_TYPE_TO_IDX,
)
from spine_vision_tpu.data.stratification import (
    _LABEL_TO_RECORD_KEY,
    split_patients,
)


def _resize_rgb(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Resize HWC uint8 via the native host-ops library (channels as batch)."""
    if img.shape[:2] == (h, w):
        return img
    planes = np.ascontiguousarray(img.transpose(2, 0, 1))
    return native.resize_bilinear_u8(planes, h, w).transpose(1, 2, 0)


def _resize_gray(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Resize a HW uint8 plane via the native host-ops library."""
    if img.shape == (h, w):
        return img
    return native.resize_bilinear_u8(np.ascontiguousarray(img[None]), h, w)[0]


def _load_image_rgb(path: Path, size: tuple[int, int]) -> np.ndarray:
    """Load an image file as uint8 RGB resized to (H, W)."""
    img = cv2.imread(str(path), cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(f"Could not read image: {path}")
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    h, w = size
    return _resize_rgb(img, h, w)


def _load_image_gray(path: Path) -> np.ndarray:
    """Load an image file as uint8 grayscale (native resolution)."""
    img = cv2.imread(str(path), cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise FileNotFoundError(f"Could not read image: {path}")
    return img


class LocalizationDataset:
    """Coordinate localization dataset: one sample = image + [5, 2] coords.

    Annotations CSV columns:
        image_path, level, relative_x, relative_y, series_type, source

    Sample dict:
        image: uint8 [H, W, 3]
        coords: float32 [5, 2]; mask: float32 [5] (1=valid)
        series_type_idx: int
        metadata: {image_path, source, series_type}
    """

    def __init__(
        self,
        data_path: Path,
        split: Literal["train", "val", "test", "all"] = "all",
        val_ratio: float = 0.15,
        test_ratio: float = 0.05,
        series_types: list[str] | None = None,
        sources: list[str] | None = None,
        image_size: tuple[int, int] = (512, 512),
        augment: bool = True,
        seed: int = 42,
    ) -> None:
        self.data_path = Path(data_path)
        self.split = split
        self.image_size = image_size
        self.augment = augment and split == "train"

        annotations_path = self.data_path / "annotations.csv"
        if not annotations_path.exists():
            raise FileNotFoundError(f"Annotations not found: {annotations_path}")

        raw_records = self._load_annotations(annotations_path)
        # Validate filters against what the data actually contains: a typo
        # ('sag-t2', 'Spider') would otherwise silently empty the dataset
        # and train zero batches per epoch.
        if series_types:
            present = {r["series_type"] for r in raw_records}
            unknown = set(series_types) - present
            if unknown:
                raise ValueError(
                    f"series_types {sorted(unknown)} not present in "
                    f"{annotations_path} (has {sorted(present)})"
                )
            raw_records = [r for r in raw_records if r["series_type"] in series_types]
        if sources:
            present = {r["source"] for r in raw_records}
            unknown = set(sources) - present
            if unknown:
                raise ValueError(
                    f"sources {sorted(unknown)} not present in "
                    f"{annotations_path} (has {sorted(present)})"
                )
            raw_records = [r for r in raw_records if r["source"] in sources]

        self.image_records = self._group_by_image(raw_records)

        unique_images = list(self.image_records.keys())
        train_set, val_set, test_set = self._split_images(
            unique_images, val_ratio, test_ratio, seed
        )
        if split == "train":
            self.image_list = [i for i in unique_images if i in train_set]
        elif split == "val":
            self.image_list = [i for i in unique_images if i in val_set]
        elif split == "test":
            self.image_list = [i for i in unique_images if i in test_set]
        else:
            self.image_list = unique_images

    @staticmethod
    def _load_annotations(path: Path) -> list[dict[str, Any]]:
        records = []
        with open(path, newline="") as f:
            for row in csv.DictReader(f):
                records.append(
                    {
                        "image_path": row["image_path"],
                        "level": row["level"],
                        "relative_x": float(row["relative_x"]),
                        "relative_y": float(row["relative_y"]),
                        "series_type": row["series_type"],
                        "source": row["source"],
                    }
                )
        return records

    @staticmethod
    def _group_by_image(records: list[dict[str, Any]]) -> dict[str, dict[str, Any]]:
        grouped: dict[str, dict[str, Any]] = defaultdict(
            lambda: {"coords": {}, "series_type": "", "source": ""}
        )
        for record in records:
            level_idx = LEVEL_TO_IDX.get(record["level"])
            if level_idx is None:
                continue
            entry = grouped[record["image_path"]]
            entry["coords"][level_idx] = (
                record["relative_x"],
                record["relative_y"],
            )
            entry["series_type"] = record["series_type"]
            entry["source"] = record["source"]
        return dict(grouped)

    @staticmethod
    def _split_images(
        images: list[str], val_ratio: float, test_ratio: float, seed: int
    ) -> tuple[set[str], set[str], set[str]]:
        rng = np.random.RandomState(seed)
        indices = rng.permutation(len(images))
        n_test = int(len(images) * test_ratio)
        n_val = int(len(images) * val_ratio)
        test_idx = indices[:n_test]
        val_idx = indices[n_test : n_test + n_val]
        train_idx = indices[n_test + n_val :]
        return (
            {images[i] for i in train_idx},
            {images[i] for i in val_idx},
            {images[i] for i in test_idx},
        )

    def __len__(self) -> int:
        return len(self.image_list)

    def __getitem__(self, idx: int) -> dict[str, Any]:
        image_path = self.image_list[idx]
        record = self.image_records[image_path]
        image = _load_image_rgb(self.data_path / image_path, self.image_size)

        coords = np.zeros((NUM_LEVELS, 2), dtype=np.float32)
        mask = np.zeros((NUM_LEVELS,), dtype=np.float32)
        for level_idx, (x, y) in record["coords"].items():
            coords[level_idx] = (x, y)
            mask[level_idx] = 1.0

        return {
            "image": image,
            "coords": coords,
            "mask": mask,
            "series_type_idx": SERIES_TYPE_TO_IDX.get(record["series_type"], 0),
            "metadata": {
                "image_path": image_path,
                "source": record["source"],
                "series_type": record["series_type"],
            },
        }

    def get_stats(self) -> dict[str, Any]:
        """Dataset statistics (parity with reference get_stats)."""
        series_types: list[str] = []
        sources: list[str] = []
        level_counts: dict[int, int] = defaultdict(int)
        total = 0
        for image_path in self.image_list:
            record = self.image_records[image_path]
            series_types.append(record["series_type"])
            sources.append(record["source"])
            for level_idx in record["coords"]:
                level_counts[level_idx] += 1
                total += 1
        return {
            "num_images": len(self.image_list),
            "num_annotations": total,
            "levels": {
                IDX_TO_LEVEL[i]: c for i, c in sorted(level_counts.items())
            },
            "series_types": dict(Counter(series_types)),
            "sources": dict(Counter(sources)),
            "split": self.split,
        }


def construct_3channel(
    t2_crop: np.ndarray | None, t1_crop: np.ndarray | None
) -> np.ndarray:
    """[T2, T1, T2] channel stacking (reference classification.py:40-68)."""
    if t2_crop is not None and t1_crop is not None:
        return np.stack([t2_crop, t1_crop, t2_crop], axis=-1)
    if t2_crop is not None:
        return np.stack([t2_crop, t2_crop, t2_crop], axis=-1)
    if t1_crop is not None:
        return np.stack([t1_crop, t1_crop, t1_crop], axis=-1)
    raise ValueError("At least one of t2_crop or t1_crop must be provided")


# Maps task name -> annotation record key (several reference modules carry
# this table, e.g. stratification.py:37-47). Single definition shared with
# the stratifier — two copies could drift silently when tasks change.
LABEL_TO_RECORD_KEY = _LABEL_TO_RECORD_KEY


class ClassificationDataset:
    """Multi-task IVD crop dataset with T1/T2 pairing.

    Annotations CSV columns (reference classification dataset builder):
        image_path, patient_id, ivd_level, series_type, source,
        pfirrmann_grade, disc_herniation, disc_narrowing, disc_bulging,
        spondylolisthesis, modic, up_endplate, low_endplate

    Sample dict:
        image: uint8 [H, W, 3] ([T2, T1, T2] channels)
        targets: {task: scalar or [1] float}
        level_idx: int
        metadata: {source, patient_id, level, ivd}
    """

    def __init__(
        self,
        data_path: Path,
        split: Literal["train", "val", "test", "all"] = "all",
        val_ratio: float = 0.10,
        test_ratio: float = 0.10,
        levels: list[str] | None = None,
        series_types: list[str] | None = None,
        target_labels: list[str] | None = None,
        output_size: tuple[int, int] = (256, 256),
        augment: bool = True,
        seed: int = 42,
    ) -> None:
        self.data_path = Path(data_path)
        self.split = split
        self.output_size = output_size
        self.augment = augment and split == "train"

        valid_series = {"sag_t1", "sag_t2"}
        if series_types is not None:
            invalid = set(series_types) - valid_series
            if invalid:
                raise ValueError(
                    f"Invalid series types: {invalid}. Valid: {valid_series}"
                )
            self.series_types = set(series_types)
        else:
            self.series_types = valid_series

        if target_labels is not None:
            if not target_labels:
                raise ValueError("target_labels must not be empty")
            invalid = set(target_labels) - set(AVAILABLE_TASK_NAMES)
            if invalid:
                raise ValueError(
                    f"Invalid target labels: {invalid}. "
                    f"Available: {AVAILABLE_TASK_NAMES}"
                )
            self.target_labels = list(target_labels)
        else:
            self.target_labels = list(AVAILABLE_TASK_NAMES)

        self.records = self._load_and_pair_annotations()

        if levels:
            valid_levels = set(IDX_TO_LEVEL.values())
            invalid = set(levels) - valid_levels
            if invalid:
                raise ValueError(
                    f"Invalid levels: {invalid}. Valid: {sorted(valid_levels)}"
                )
            level_set = set(levels)
            self.records = [
                r
                for r in self.records
                if IDX_TO_LEVEL.get(r["level_idx"]) in level_set
            ]

        if split != "all":
            unique_patients = self._get_unique_patients()
            train_p, val_p, test_p = split_patients(
                unique_patients,
                self.records,
                self.target_labels,
                val_ratio,
                test_ratio,
                seed,
            )
            if split == "train":
                self.records = [
                    r for r in self.records if r["patient_key"] in train_p
                ]
            elif split == "val":
                self.records = [
                    r for r in self.records if r["patient_key"] in val_p
                ]
            elif split == "test":
                self.records = [
                    r for r in self.records if r["patient_key"] in test_p
                ]

    def _load_and_pair_annotations(self) -> list[dict[str, Any]]:
        csv_path = self.data_path / "annotations.csv"
        if not csv_path.exists():
            raise FileNotFoundError(f"Annotations not found: {csv_path}")

        groups: dict[tuple[str, str, int], dict[str, Any]] = {}
        with open(csv_path, newline="") as f:
            for row in csv.DictReader(f):
                source = row["source"]
                patient_id = row["patient_id"]
                ivd_level = int(row["ivd_level"])
                series_type = row["series_type"]
                key = (source, patient_id, ivd_level)
                pfirrmann = int(row["pfirrmann_grade"])
                modic = int(row["modic"])
                if not 1 <= pfirrmann <= 5 or not 0 <= modic <= 3:
                    # An out-of-range grade becomes an invalid class index
                    # that one_hot silently zeroes — fail loudly instead.
                    raise ValueError(
                        f"Out-of-range label for {key}: pfirrmann_grade="
                        f"{pfirrmann} (1-5), modic={modic} (0-3)"
                    )
                labels = {
                    "pfirrmann": pfirrmann,
                    "modic": modic,
                    "herniation": int(row["disc_herniation"]),
                    "bulging": int(row["disc_bulging"]),
                    "upper_endplate": int(row["up_endplate"]),
                    "lower_endplate": int(row["low_endplate"]),
                    "spondylolisthesis": int(row["spondylolisthesis"]),
                    "narrowing": int(row["disc_narrowing"]),
                }
                if key not in groups:
                    groups[key] = {
                        "source": source,
                        "patient_id": patient_id,
                        "patient_key": f"{source}_{patient_id}",
                        "ivd_level": ivd_level,
                        "level_idx": ivd_level - 1,
                        **labels,
                        "t1_path": None,
                        "t2_path": None,
                    }
                else:
                    conflicts = {
                        k: (groups[key][k], v)
                        for k, v in labels.items()
                        if groups[key][k] != v
                    }
                    if conflicts:
                        # T1/T2 rows of one IVD disagreeing on grades is
                        # annotation drift — surface it (first row wins,
                        # matching the reference).
                        logger.warning(
                            "Conflicting labels for %s: %s (keeping first)",
                            key, conflicts,
                        )
                image_path = self.data_path / row["image_path"]
                if series_type == "sag_t1":
                    groups[key]["t1_path"] = image_path
                elif series_type == "sag_t2":
                    groups[key]["t2_path"] = image_path

        require_t1 = "sag_t1" in self.series_types
        require_t2 = "sag_t2" in self.series_types
        records = []
        for group in groups.values():
            has_t1 = group["t1_path"] is not None
            has_t2 = group["t2_path"] is not None
            if require_t1 and require_t2:
                if has_t1 and has_t2:
                    records.append(group)
            elif require_t1 and has_t1:
                records.append(group)
            elif require_t2 and has_t2:
                records.append(group)
        return records

    def _get_unique_patients(self) -> list[str]:
        # Sorted: set order depends on PYTHONHASHSEED, and split_patients is
        # order-sensitive — an unsorted list silently reshuffles the
        # train/val/test membership across processes (test-set leakage on
        # resume/evaluate, inconsistent multi-host splits).
        return sorted({r["patient_key"] for r in self.records})

    def __len__(self) -> int:
        return len(self.records)

    def __getitem__(self, idx: int) -> dict[str, Any]:
        record = self.records[idx]
        # Load ONLY the requested modalities: with series_types=["sag_t2"] a
        # record that happens to have a T1 sibling must still produce a
        # T2-only [T2,T2,T2] image, not a mixed [T2,T1,T2] (the reference
        # loads whatever exists, silently contaminating single-modality
        # training — see MIGRATION.md).
        h, w = self.output_size
        t1_arr = (
            _resize_gray(_load_image_gray(record["t1_path"]), h, w)
            if record["t1_path"] and "sag_t1" in self.series_types
            else None
        )
        t2_arr = (
            _resize_gray(_load_image_gray(record["t2_path"]), h, w)
            if record["t2_path"] and "sag_t2" in self.series_types
            else None
        )
        # Per-plane resize BEFORE stacking: a resumed builder run with a
        # changed crop_size can leave mixed-size crops on disk, which would
        # crash np.stack.
        rgb = construct_3channel(t2_arr, t1_arr)

        all_targets: dict[str, Any] = {
            "pfirrmann": np.int32(record["pfirrmann"] - 1),
            "modic": np.int32(record["modic"]),
            "herniation": np.asarray([record["herniation"]], np.float32),
            "bulging": np.asarray([record["bulging"]], np.float32),
            "upper_endplate": np.asarray([record["upper_endplate"]], np.float32),
            "lower_endplate": np.asarray([record["lower_endplate"]], np.float32),
            "spondy": np.asarray([record["spondylolisthesis"]], np.float32),
            "narrowing": np.asarray([record["narrowing"]], np.float32),
        }
        targets = {k: v for k, v in all_targets.items() if k in self.target_labels}

        return {
            "image": rgb,
            "targets": targets,
            "level_idx": record["level_idx"],
            "metadata": {
                "source": record["source"],
                "patient_id": record["patient_id"],
                "level": IDX_TO_LEVEL.get(record["level_idx"], ""),
                "ivd": record["ivd_level"],
            },
        }

    def get_stats(self) -> dict[str, Any]:
        """Dataset statistics."""
        return {
            "num_samples": len(self.records),
            "num_patients": len(self._get_unique_patients()),
            "levels": dict(
                Counter(IDX_TO_LEVEL.get(r["level_idx"], "") for r in self.records)
            ),
            "pfirrmann": dict(Counter(r["pfirrmann"] for r in self.records)),
            "modic": dict(Counter(r["modic"] for r in self.records)),
            "sources": dict(Counter(r["source"] for r in self.records)),
            "series_types": list(self.series_types),
            "target_labels": self.target_labels,
            "split": self.split,
        }

    def get_label_distribution(self) -> dict[str, dict[Any, int]]:
        """Distribution of each target label."""
        out: dict[str, dict[Any, int]] = {}
        for label in self.target_labels:
            key = LABEL_TO_RECORD_KEY.get(label, label)
            out[label] = dict(Counter(r[key] for r in self.records))
        return out

    def compute_class_weights(self) -> dict[str, np.ndarray]:
        """Class weights for imbalanced tasks (reference :374-413)."""
        n = len(self.records)
        weights: dict[str, np.ndarray] = {}

        if "pfirrmann" in self.target_labels:
            counts = Counter(r["pfirrmann"] - 1 for r in self.records)
            weights["pfirrmann"] = np.asarray(
                [n / (5 * counts.get(i, 1)) for i in range(5)], np.float32
            )
        if "modic" in self.target_labels:
            counts = Counter(r["modic"] for r in self.records)
            weights["modic"] = np.asarray(
                [n / (4 * counts.get(i, 1)) for i in range(4)], np.float32
            )
        for label in (
            "herniation",
            "bulging",
            "upper_endplate",
            "lower_endplate",
            "spondy",
            "narrowing",
        ):
            if label in self.target_labels:
                key = LABEL_TO_RECORD_KEY[label]
                n_pos = sum(r[key] for r in self.records)
                weights[label] = np.asarray(
                    [(n - n_pos) / max(n_pos, 1)], np.float32
                )
        return weights

    def sample_label_values(self, target_label: str) -> list[int]:
        """Per-sample label values for weighted sampling
        (pfirrmann converted to 0-indexed; reference sampling.py:63-68)."""
        key = LABEL_TO_RECORD_KEY.get(target_label)
        if key is None:
            raise ValueError(
                f"Invalid target_label: {target_label}. "
                f"Valid: {list(LABEL_TO_RECORD_KEY)}"
            )
        if target_label == "pfirrmann":
            return [r[key] - 1 for r in self.records]
        return [r[key] for r in self.records]


def collate_localization(samples: Sequence[dict[str, Any]]) -> dict[str, Any]:
    """Batch localization samples (reference LocalizationCollator)."""
    return {
        "image": np.stack([s["image"] for s in samples]),
        "coords": np.stack([s["coords"] for s in samples]),
        "mask": np.stack([s["mask"] for s in samples]),
        "series_type_idx": np.asarray(
            [s["series_type_idx"] for s in samples], np.int32
        ),
        "metadata": [s["metadata"] for s in samples],
    }


def collate_classification(samples: Sequence[dict[str, Any]]) -> dict[str, Any]:
    """Batch classification samples; dtype-aware per task
    (reference ClassificationCollator:453-493)."""
    target_labels = list(samples[0]["targets"].keys())
    targets: dict[str, np.ndarray] = {}
    for label in target_labels:
        task = get_task(label)
        dtype = np.int32 if task.is_multiclass else np.float32
        targets[label] = np.asarray(
            [s["targets"][label] for s in samples], dtype=dtype
        )
    return {
        "image": np.stack([s["image"] for s in samples]),
        "targets": targets,
        "level_idx": np.asarray([s["level_idx"] for s in samples], np.int32),
        "metadata": [s["metadata"] for s in samples],
    }

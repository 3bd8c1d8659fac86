"""Quality-parity harness: a reproducible synthetic end-to-end quality run.

The north-star quality target (BASELINE.json) is coordinate-error / grading
parity with the reference on real data; until real data exists, this module
is the stand-in (VERDICT r1 item 9): a deterministic synthetic task where
ground truth is known exactly, driven through the REAL training and fused
inference stacks:

1. Localization: trains CoordinateRegressor on rendered spine slices (5
   textured disc sites per image), reports MED / PCK via the standard
   evaluator (metric formulas parity-tested against reference
   training/metrics.py:158-185).
2. Classification: trains the multi-task Classifier on bar-coded IVD crops
   (Pfirrmann grade = bar count, herniation = corner block), reports F1.
3. Fused inference: held-out studies rendered the same way run through
   StudyInferencePipeline (localization -> crop -> grading in one jit);
   reports end-to-end localization MED and grading accuracy — the full
   two-stage system quality, not just per-model numbers.

Outputs a JSON record (thresholds + pass/fail) for BASELINE.md. Runs on the
8-device virtual CPU mesh in a few minutes; no TPU or real data needed.
"""

from __future__ import annotations

import csv
import json
import math
from pathlib import Path
from typing import Any

import numpy as np

from spine_vision_tpu.core import logger
from spine_vision_tpu.metrics import macro_ovr_auc, roc_auc

LEVELS = ["L1/L2", "L2/L3", "L3/L4", "L4/L5", "L5/S1"]
LEVEL_YS = (0.22, 0.35, 0.48, 0.61, 0.74)  # normalized disc-center rows
SLICE_HW = (192, 192)
DISC_HALF = 14  # px half-extent of the textured disc site
CROP_SIZE = (48, 48)
LOC_SIZE = (128, 128)
# 1 mm/px spacing and 24 mm deltas -> a 48x48 px crop region around each
# 28x28 disc site (scale 1:1 into CROP_SIZE). The 10 px margin keeps every
# grade bar inside the crop under the localization model's residual center
# error (~7 px MED on this task); the reference sizes its mm deltas with
# the same margin logic, crop_delta_mm=(55,15,17.5,20) around ~30 mm
# discs, datasets/classification/config.py:12-83.
CROP_DELTA_MM = (24.0, 24.0, 24.0, 24.0)


def _draw_disc(img: np.ndarray, cx: int, cy: int, grade: int, herniation: int) -> None:
    """Texture-code one disc site: ``grade`` vertical bars; herniation = a
    block in the upper-left corner of the site. Texture (not brightness)
    survives the crop kernel's per-crop min-max normalization."""
    h = DISC_HALF
    img[cy - h : cy + h, cx - h : cx + h] = 40.0
    # 3-px bars on a 5-px pitch: wide enough to survive the rotated crop
    # mode's bilinear resampling (2-px bars vanished under interpolation,
    # which tested texture fragility instead of the pipeline — round-3
    # parity attempts 2/3).
    for bar in range(grade):
        x = cx - h + 2 + bar * 5
        img[cy - h + 2 : cy + h - 2, x : x + 3] = 230.0
    if herniation:
        img[cy - h : cy - h + 6, cx - h : cx - h + 6] = 255.0


def _render_slice(
    rng: np.random.Generator, grades: np.ndarray, herniations: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """One synthetic sagittal slice; returns (image [H,W], coords [5,2])."""
    h, w = SLICE_HW
    img = rng.normal(90.0, 10.0, (h, w)).clip(0, 255)
    coords = np.zeros((5, 2), np.float32)
    for i, y_norm in enumerate(LEVEL_YS):
        x_norm = 0.5 + float(rng.uniform(-0.06, 0.06))
        cx, cy = int(x_norm * w), int(y_norm * h)
        _draw_disc(img, cx, cy, int(grades[i]), int(herniations[i]))
        coords[i] = (x_norm, y_norm)
    return img.astype(np.float32), coords


# NOTE (round-3 parity history): hand-modeled training-crop distributions
# all under-performed at least one pipeline mode — PIL rotate-pair and blur
# augmentations regressed both modes; GT-center + uniform-jitter crops
# through the real crop kernel left a train/test mismatch against the loc
# model's actual (correlated, non-uniform) error. The durable fix below is
# the reference's own recipe: build the training crops WITH THE TRAINED
# LOCALIZATION MODEL through the real pipeline crop stage
# (SeriesCropPipeline = the same loc->angles->crop_ivd_regions graph
# inference runs), in both crop modes (reference
# datasets/classification/spider.py:114-178 + cropping.py:444-483).


def _write_loc_dataset(root: Path, rng: np.random.Generator, n_images: int) -> None:
    from PIL import Image

    (root / "images").mkdir(parents=True, exist_ok=True)
    rows = []
    for i in range(n_images):
        grades = rng.integers(1, 6, size=5)
        herns = rng.integers(0, 2, size=5)
        img, coords = _render_slice(rng, grades, herns)
        name = f"images/slice_{i}.png"
        # Dataset-build convention (reference datasets/localization.py:
        # npy -> normalize_to_uint8 -> PNG): training PNGs are min-max
        # stretched, exactly like the fused pipeline stretches raw slices
        # before its loc forward — train/infer inputs must match.
        lo, hi = float(img.min()), float(img.max())
        img = (img - lo) / max(hi - lo, 1e-6) * 255.0
        Image.fromarray(img.astype(np.uint8)).convert("RGB").save(root / name)
        for level, (x, y) in zip(LEVELS, coords):
            rows.append(
                {
                    "image_path": name,
                    "level": level,
                    "relative_x": float(x),
                    "relative_y": float(y),
                    "series_type": "sag_t2",
                    "source": "parity",
                }
            )
    with open(root / "annotations.csv", "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        writer.writeheader()
        writer.writerows(rows)


def _write_cls_dataset(
    root: Path,
    rng: np.random.Generator,
    n_patients: int,
    crop_pipelines: dict[str, Any],
) -> None:
    """Build the classification training set the way the reference does:
    render full slices, then run them through the REAL loc->crop pipeline
    stage (``SeriesCropPipeline`` with the just-trained localization model)
    so training crops carry the loc model's true error distribution and the
    crop kernel's exact resampling. Crop modes alternate per patient
    (both series of a patient share a mode, as at inference) so one
    classifier covers both pipeline distributions 50/50."""
    from PIL import Image

    (root / "images").mkdir(parents=True, exist_ok=True)
    slices: dict[str, list[np.ndarray]] = {m: [] for m in crop_pipelines}
    meta: dict[str, list[tuple[str, str, np.ndarray, np.ndarray]]] = {
        m: [] for m in crop_pipelines
    }
    modes = sorted(crop_pipelines)
    for p in range(n_patients):
        pid = f"pp{p:03d}"
        grades = rng.integers(1, 6, size=5)
        herns = rng.integers(0, 2, size=5)
        mode = modes[p % len(modes)]
        for series in ("sag_t1", "sag_t2"):
            img, _coords = _render_slice(rng, grades, herns)
            slices[mode].append(img)
            meta[mode].append((pid, series, grades, herns))

    rows = []
    for mode, pipeline in crop_pipelines.items():
        if not slices[mode]:
            continue
        _coords, _angles, crops = pipeline.run(
            slices[mode], [(1.0, 1.0)] * len(slices[mode])
        )
        for (pid, series, grades, herns), crop_set in zip(meta[mode], crops):
            for lvl in (1, 2, 3, 4, 5):
                name = f"images/{pid}_L{lvl}_{series}.png"
                Image.fromarray(crop_set[lvl - 1]).save(root / name)
                rows.append(
                    {
                        "image_path": name,
                        "patient_id": pid,
                        "ivd_level": lvl,
                        "series_type": series,
                        "source": "parity",
                        "pfirrmann_grade": int(grades[lvl - 1]),
                        "disc_herniation": int(herns[lvl - 1]),
                        "disc_narrowing": 0,
                        "disc_bulging": 0,
                        "spondylolisthesis": 0,
                        "modic": 0,
                        "up_endplate": 0,
                        "low_endplate": 0,
                    }
                )
    with open(root / "annotations.csv", "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        writer.writeheader()
        writer.writerows(rows)


def run_parity(
    output_dir: Path,
    seed: int = 0,
    loc_epochs: int = 14,
    cls_epochs: int = 16,
    n_loc_images: int = 96,
    n_cls_patients: int = 120,
    n_heldout_studies: int = 24,
    norm_impl: str = "tpu",
    pool_impl: str = "flax",
) -> dict[str, Any]:
    """Run the full parity suite; returns (and writes) the metric record."""
    if n_heldout_studies <= 0:
        raise ValueError("n_heldout_studies must be positive")

    from spine_vision_tpu.infer import (
        SeriesCropPipeline,
        StudyInferencePipeline,
        StudyInput,
        StudyPipelineConfig,
    )
    from spine_vision_tpu.core.tasks import get_tasks
    from spine_vision_tpu.train.classification import (
        ClassificationConfig,
        ClassificationTrainer,
    )
    from spine_vision_tpu.train.localization import (
        LocalizationConfig,
        LocalizationTrainer,
    )

    output_dir = Path(output_dir)
    rng = np.random.default_rng(seed)
    # norm_impl/pool_impl: ResNet BN + stem-pool implementation under test
    # (round-5 seed-panel attribution of the round-4 0.825 -> 0.767 drop).
    record: dict[str, Any] = {
        "seed": seed,
        "norm_impl": norm_impl,
        "pool_impl": pool_impl,
    }

    # ------------------------------------------------------------------ loc
    loc_root = output_dir / "loc_data"
    _write_loc_dataset(loc_root, rng, n_loc_images)
    loc_config = LocalizationConfig(
        data_path=loc_root,
        output_path=output_dir / "loc_run",
        backbone="resnet18",
        pretrained=False,
        image_size=LOC_SIZE,
        batch_size=8,
        num_epochs=loc_epochs,
        learning_rate=2e-3,
        scheduler_type="cosine",
        early_stopping=False,
        mixed_precision=False,
        visualize_predictions=False,
        num_workers=0,
        val_split=0.2,
        # The held-out e2e studies come from the same clean rendering
        # distribution; augmentation only costs localization precision here.
        augment=False,
        seed=seed,
        norm_impl=norm_impl,
        pool_impl=pool_impl,
    )
    loc_trainer = LocalizationTrainer(loc_config)
    loc_trainer.train()
    loc_metrics = loc_trainer.evaluate()
    record["loc_med"] = float(loc_metrics.get("med", float("nan")))
    record["loc_pck_0.10"] = float(loc_metrics.get("pck@0.10", float("nan")))
    record["loc_med_threshold"] = 0.06
    record["loc_pass"] = record["loc_med"] < record["loc_med_threshold"]
    logger.info("parity loc: MED %.4f (threshold 0.06)", record["loc_med"])

    # ------------------------------------------------------------------ cls

    def _crop_cfg(mode: str) -> "StudyPipelineConfig":
        return StudyPipelineConfig(
            loc_image_size=LOC_SIZE,
            crop_size=CROP_SIZE,
            crop_delta_mm=CROP_DELTA_MM,
            padded_hw=SLICE_HW,
            crop_mode=mode,
        )

    crop_pipelines = {
        mode: SeriesCropPipeline(
            loc_trainer.model, loc_trainer.state.variables(), config=_crop_cfg(mode)
        )
        for mode in ("horizontal", "rotated")
    }
    cls_root = output_dir / "cls_data"
    _write_cls_dataset(cls_root, rng, n_cls_patients, crop_pipelines)
    cls_config = ClassificationConfig(
        data_path=cls_root,
        output_path=output_dir / "cls_run",
        backbone="resnet18",
        pretrained=False,
        target_labels=["pfirrmann", "herniation"],
        output_size=CROP_SIZE,
        batch_size=8,
        num_epochs=cls_epochs,
        learning_rate=2e-3,
        scheduler_type="cosine",
        early_stopping=False,
        augment=False,
        mixed_precision=False,
        visualize_predictions=False,
        num_workers=0,
        val_split=0.15,
        seed=seed,
        norm_impl=norm_impl,
        pool_impl=pool_impl,
    )
    cls_trainer = ClassificationTrainer(cls_config)
    cls_trainer.train()
    cls_metrics = cls_trainer.evaluate()
    record["cls_f1"] = float(
        cls_metrics.get("f1", cls_metrics.get("macro_f1", float("nan")))
    )
    # Grading-AUC parity (BASELINE.json north star): mean of the defined
    # per-task ROC-AUCs on the held-out split.
    record["cls_macro_auc"] = float(cls_metrics.get("macro_auc", float("nan")))
    # _pct suffix: ClassifierMetrics accuracies are 0-100 while every
    # other accuracy in this record is a 0-1 fraction.
    record["cls_pfirrmann_accuracy_pct"] = float(
        cls_metrics.get("pfirrmann_accuracy", float("nan"))
    )
    # Round-3 tightening: round 2 achieved 0.916 — hold the bar at 0.85.
    record["cls_f1_threshold"] = 0.85
    record["cls_pass"] = record["cls_f1"] > record["cls_f1_threshold"]
    logger.info("parity cls: F1 %.4f (threshold 0.85)", record["cls_f1"])

    # ---------------------------------------------------------- fused infer
    pipeline_config = _crop_cfg("horizontal")
    tasks = get_tasks(["pfirrmann", "herniation"])
    pipeline = StudyInferencePipeline(
        loc_trainer.model,
        loc_trainer.state.variables(),
        cls_trainer.model,
        cls_trainer.state.variables(),
        config=pipeline_config,
        tasks=tasks,
    )

    studies = []
    gt_coords = []
    gt_grades = []
    gt_herns = []
    for i in range(n_heldout_studies):
        grades = rng.integers(1, 6, size=5)
        herns = rng.integers(0, 2, size=5)
        t2, coords = _render_slice(rng, grades, herns)
        t1, _ = _render_slice(rng, grades, herns)
        studies.append(
            StudyInput(
                t1_slice=t1,
                t2_slice=t2,
                t1_spacing=(1.0, 1.0),
                t2_spacing=(1.0, 1.0),
                study_id=f"parity{i}",
            )
        )
        gt_coords.append(coords)
        gt_grades.append(grades)
        gt_herns.append(herns)

    # fetch_crops=True: the crop tensors feed the rotated-vs-horizontal
    # material-difference evidence below (round-3 VERDICT: a silent
    # fall-through to horizontal cropping must fail, not coast).
    results = pipeline.run(studies, fetch_crops=True)
    med_norm = []
    grade_hits = 0
    hern_hits = 0
    total = 0
    pf_probs_all: list[np.ndarray] = []
    hern_probs_all: list[np.ndarray] = []
    for res, coords, grades, herns in zip(results, gt_coords, gt_grades, gt_herns):
        pred_xy = res.coords[1]  # T2-series predictions [L, 2]
        med_norm.extend(np.linalg.norm(pred_xy - coords, axis=-1).tolist())
        # The pipeline's own decoded predictions (task-strategy code the
        # serving path uses) — re-deriving from logits here could silently
        # measure a different decision rule than production.
        pf_pred = np.asarray(res.predictions["pfirrmann"]) + 1  # [L]
        hern_pred = np.asarray(res.predictions["herniation"]).astype(int).ravel()
        grade_hits += int((pf_pred == grades).sum())
        hern_hits += int((hern_pred == herns).sum())
        total += len(grades)
        pf_probs_all.append(np.asarray(res.probabilities["pfirrmann"]))
        hern_probs_all.append(np.asarray(res.probabilities["herniation"]).ravel())
    record["e2e_loc_med"] = float(np.mean(med_norm))
    record["e2e_grade_accuracy"] = grade_hits / total
    record["e2e_herniation_accuracy"] = hern_hits / total
    # Threshold-free ranking quality through the full fused pipeline
    # (BASELINE.json: "grading AUC parity").
    record["e2e_pfirrmann_macro_auc"] = macro_ovr_auc(
        np.concatenate(pf_probs_all, axis=0),
        np.concatenate([g - 1 for g in gt_grades]),
    )
    record["e2e_herniation_auc"] = roc_auc(
        np.concatenate(hern_probs_all), np.concatenate(gt_herns)
    )
    record["e2e_loc_med_threshold"] = 0.06
    # Round-3 tightening: the suite achieved 0.80 in round 2 — hold the
    # bar at 0.75 so regressions fail instead of coasting under 0.7.
    record["e2e_grade_accuracy_threshold"] = 0.75
    # AUC floors (round 4): ranking quality must clear chance (0.5) by a
    # wide margin through the FULL fused pipeline — initial conservative
    # bars, to be tightened once a few runs establish the achieved band.
    record["e2e_pfirrmann_macro_auc_threshold"] = 0.70
    record["e2e_herniation_auc_threshold"] = 0.75
    # Advisor (round 4): a NaN AUC (degenerate label draw) fails the gate
    # indistinguishably from a below-threshold AUC — record definedness
    # explicitly and warn so the failure mode is diagnosable at a glance.
    record["e2e_auc_defined"] = bool(
        not math.isnan(record["e2e_pfirrmann_macro_auc"])
        and not math.isnan(record["e2e_herniation_auc"])
    )
    if not record["e2e_auc_defined"]:
        logger.warning(
            "parity e2e: an AUC is undefined (NaN — degenerate held-out "
            "label draw, seed %d); e2e_pass will fail on definedness, not "
            "on ranking quality",
            seed,
        )
    record["e2e_pass"] = (
        record["e2e_loc_med"] < record["e2e_loc_med_threshold"]
        and record["e2e_grade_accuracy"] > record["e2e_grade_accuracy_threshold"]
        and record["e2e_pfirrmann_macro_auc"]
        > record["e2e_pfirrmann_macro_auc_threshold"]
        and record["e2e_herniation_auc"] > record["e2e_herniation_auc_threshold"]
    )
    logger.info(
        "parity e2e: MED %.4f grade-acc %.3f herniation-acc %.3f "
        "pfirrmann-AUC %.3f herniation-AUC %.3f",
        record["e2e_loc_med"],
        record["e2e_grade_accuracy"],
        record["e2e_herniation_accuracy"],
        record["e2e_pfirrmann_macro_auc"],
        record["e2e_herniation_auc"],
    )

    # -------------------------------------------- rotated-crop-mode e2e
    # Round-2 gap: the rotated path's QUALITY (3-shear gather-free
    # rotation, ops/crop.py) never ran through a trained end-to-end pass —
    # only its geometry goldens. Same studies, same trained weights,
    # rotated crop mode; grades must hold up.
    rotated_pipeline = StudyInferencePipeline(
        loc_trainer.model,
        loc_trainer.state.variables(),
        cls_trainer.model,
        cls_trainer.state.variables(),
        config=_crop_cfg("rotated"),
        tasks=tasks,
    )
    rot_results = rotated_pipeline.run(studies, fetch_crops=True)
    rot_med = []
    rot_grade_hits = 0
    rot_total = 0
    abs_angles = []
    crop_deltas = []
    disagreements = 0
    for res, hres, coords, grades in zip(
        rot_results, results, gt_coords, gt_grades
    ):
        rot_med.extend(
            np.linalg.norm(res.coords[1] - coords, axis=-1).tolist()
        )
        pf_pred = np.asarray(res.predictions["pfirrmann"]) + 1
        rot_grade_hits += int((pf_pred == grades).sum())
        rot_total += len(grades)
        # Material-difference evidence (round-3 VERDICT item 4): the
        # rotated branch must demonstrably change the crops it feeds the
        # classifier, otherwise a silent fall-through to horizontal
        # cropping would sail through on identical accuracies.
        abs_angles.extend(np.abs(res.angles).ravel().tolist())
        crop_deltas.append(
            np.abs(
                res.crops.astype(np.float32) - hres.crops.astype(np.float32)
            ).mean()
        )
        h_pf = np.asarray(hres.predictions["pfirrmann"]) + 1
        disagreements += int((pf_pred != h_pf).sum())
    record["e2e_rotated_loc_med"] = float(np.mean(rot_med))
    record["e2e_rotated_grade_accuracy"] = rot_grade_hits / rot_total
    record["e2e_rotated_loc_med_threshold"] = record["e2e_loc_med_threshold"]
    record["e2e_rotated_grade_accuracy_threshold"] = 0.75
    # Evidence fields: mean |rotation angle| the rotated branch actually
    # applied, mean per-pixel uint8 delta between the two modes' crop
    # tensors, and how many study x level grade predictions changed.
    record["e2e_rotated_mean_abs_angle_deg"] = float(np.mean(abs_angles))
    record["e2e_crop_mode_mean_abs_pixel_delta"] = float(np.mean(crop_deltas))
    record["e2e_crop_mode_grade_disagreements"] = int(disagreements)
    record["e2e_crop_mode_comparisons"] = int(rot_total)
    # A real rotated pass on these spines (per-level x jitter gives
    # multi-degree tangents) must rotate by degrees, not milli-degrees,
    # and the resampled crops must differ by whole gray levels on
    # average. Calibration: see PARITY_RESULTS.json history.
    record["e2e_rotated_materially_differs"] = bool(
        record["e2e_rotated_mean_abs_angle_deg"] > 1.0
        and record["e2e_crop_mode_mean_abs_pixel_delta"] > 1.0
    )
    record["e2e_rotated_pass"] = (
        record["e2e_rotated_loc_med"] < record["e2e_loc_med_threshold"]
        and record["e2e_rotated_grade_accuracy"]
        > record["e2e_rotated_grade_accuracy_threshold"]
        and record["e2e_rotated_materially_differs"]
    )
    logger.info(
        "parity e2e rotated: MED %.4f grade-acc %.3f mean|angle| %.2f deg "
        "crop-delta %.2f gray levels, %d/%d grade predictions changed",
        record["e2e_rotated_loc_med"],
        record["e2e_rotated_grade_accuracy"],
        record["e2e_rotated_mean_abs_angle_deg"],
        record["e2e_crop_mode_mean_abs_pixel_delta"],
        disagreements,
        rot_total,
    )

    record["all_pass"] = bool(
        record["loc_pass"]
        and record["cls_pass"]
        and record["e2e_pass"]
        and record["e2e_rotated_pass"]
    )
    with open(output_dir / "parity_results.json", "w") as f:
        json.dump(record, f, indent=2)
    return record

"""Visualizer classes, experiment tracker, and logging setup.

Covers the run-artifact plumbing the figure tests (test_viz.py) skip:
``TrainingVisualizer``/``DatasetVisualizer`` save+mirror behavior
(reference visualization/visualizer.py:45-700), the JSONL experiment
tracker standing in for trackio (reference trainers/base.py:296-349),
and the tqdm-routed logger (reference core/logging.py:10-49).
"""

import json
import logging

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
import pytest

from spine_vision_tpu.core.logging import (
    _TqdmHandler,
    add_file_log,
    logger,
    setup_logger,
)
from spine_vision_tpu.viz.tracker import ExperimentTracker
from spine_vision_tpu.viz.visualizer import DatasetVisualizer, TrainingVisualizer

RNG = np.random.default_rng(7)
LEVELS = ["L1/L2", "L2/L3", "L3/L4", "L4/L5", "L5/S1"]


@pytest.fixture(autouse=True)
def _close_figures():
    yield
    plt.close("all")


# ---------------------------------------------------------------- tracker


def test_tracker_metrics_jsonl(tmp_path):
    tracker = ExperimentTracker("proj", "run1", tmp_path / "run")
    tracker.log_metrics({"loss": 1.5, "acc": 0.25}, step=0)
    tracker.log_metrics({"loss": 1.0}, step=1)
    tracker.finish()

    lines = (tmp_path / "run" / "metrics.jsonl").read_text().splitlines()
    records = [json.loads(line) for line in lines]
    assert len(records) == 3
    assert records[0]["step"] == 0 and records[0]["loss"] == 1.5
    assert records[1]["step"] == 1
    assert records[2]["_finished"] == 1.0
    assert all(r["time"] >= 0 for r in records)


def test_tracker_config_snapshot_jsonable(tmp_path):
    tracker = ExperimentTracker("proj", "run1", tmp_path)
    tracker.log_config({"lr": 1e-3, "path": tmp_path})  # Path is not jsonable
    payload = json.loads((tmp_path / "tracker_config.json").read_text())
    assert payload["project"] == "proj"
    assert payload["run_name"] == "run1"
    assert payload["config"]["lr"] == 1e-3
    assert payload["config"]["path"] == str(tmp_path)


def test_tracker_figure_mirror(tmp_path):
    tracker = ExperimentTracker("proj", "run1", tmp_path / "run")
    src = tmp_path / "fig.png"
    src.write_bytes(b"pngbytes")
    tracker.log_figure(src)
    assert (tmp_path / "run" / "media" / "fig.png").read_bytes() == b"pngbytes"
    tracker.log_figure(src, name="renamed.png")
    assert (tmp_path / "run" / "media" / "renamed.png").exists()
    # Missing source is a silent no-op (trainer may pass a skipped figure).
    tracker.log_figure(tmp_path / "does_not_exist.png")


# ------------------------------------------------------------ visualizers


def _images(n, size=16):
    return [RNG.integers(0, 255, (size, size), dtype=np.uint8) for _ in range(n)]


def test_training_visualizer_saves_and_mirrors(tmp_path):
    tracker = ExperimentTracker("proj", "run1", tmp_path / "run")
    viz = TrainingVisualizer(tmp_path / "figs", tracker=tracker)
    history = {"train_loss": [1.0, 0.5], "val_loss": [0.8, 0.6], "lr": [1e-3, 5e-4]}
    path = viz.plot_training_curves(history)
    assert path.exists() and path.suffix == ".png"
    assert (tmp_path / "run" / "media" / path.name).exists()


def test_training_visualizer_html_mode(tmp_path):
    viz = TrainingVisualizer(tmp_path, output_mode="html")
    n = 4
    preds = RNG.uniform(0.2, 0.8, (n, 2))
    path = viz.plot_localization_predictions(_images(n), preds, preds)
    assert path.exists()
    assert (path.parent / (path.stem + ".html")).exists()


def test_confusion_matrices_skip_missing_labels(tmp_path):
    viz = TrainingVisualizer(tmp_path)
    n = 8
    images = _images(n)
    preds = {"herniation": RNG.uniform(0, 1, (n, 1))}
    targets = {"herniation": RNG.integers(0, 2, (n, 1)).astype(np.float32)}
    paths = viz.plot_confusion_matrices_with_samples(
        images, preds, targets, target_labels=["herniation", "bulging"]
    )
    # bulging has no predictions -> only one figure produced
    assert len(paths) == 1
    assert paths[0].exists()
    assert "herniation" in paths[0].name


class _StubDataset:
    records = [
        {
            "level_idx": i % 5,
            "pfirrmann": (i % 5) + 1,
            "herniation": i % 2,
            "bulging": (i // 2) % 2,
            "upper_endplate": 0,
            "lower_endplate": 1,
            "spondylolisthesis": i % 2,
            "narrowing": 0,
        }
        for i in range(20)
    ]

    def get_stats(self):
        return {
            "levels": {name: 4 for name in LEVELS},
            "sources": {"spider": 12, "phenikaa": 8},
            "series_types": {"sag_t1": 10, "sag_t2": 10},
        }

    def get_label_distribution(self):
        return {
            "pfirrmann": {g: 4 for g in range(1, 6)},
            "herniation": {0: 10, 1: 10},
        }


def test_dataset_visualizer_generate_all(tmp_path):
    viz = DatasetVisualizer(tmp_path)
    paths = viz.generate_all(_StubDataset(), prefix="ds")
    names = {p.name for p in paths}
    assert "ds_stats.png" in names
    assert "ds_samples_per_class.png" in names
    assert "ds_binary_labels.png" in names  # herniation counts are {0,1}
    assert "ds_cooccurrence.png" in names
    assert "ds_pfirrmann_by_level.png" in names
    assert all(p.exists() for p in paths)


# ---------------------------------------------------------------- logging


def test_setup_logger_idempotent():
    setup_logger(verbose=False)
    before = sum(isinstance(h, _TqdmHandler) for h in logger.handlers)
    setup_logger(verbose=True)
    after = [h for h in logger.handlers if isinstance(h, _TqdmHandler)]
    assert len(after) == before == 1
    assert after[0].level == logging.DEBUG


def test_add_file_log_writes(tmp_path):
    added_before = len(logger.handlers)
    try:
        add_file_log(tmp_path, log_filename="t.log")
        logger.info("hello file sink")
        for h in logger.handlers:
            h.flush()
        text = (tmp_path / "t.log").read_text()
        assert "hello file sink" in text
        # file format carries logger name + line number
        assert "spine_vision_tpu" in text
    finally:
        for h in logger.handlers[added_before:]:
            logger.removeHandler(h)
            h.close()


def test_tqdm_handler_emits_without_bars(capsys):
    setup_logger(verbose=False)
    logger.info("console line %d", 42)
    err = capsys.readouterr().err
    assert "console line 42" in err

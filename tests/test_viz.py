"""Smoke-render every plot function once (matplotlib Agg).

Protects the whole figure inventory (SURVEY C37-C42) against API breakage —
the reference's visualizations are its de-facto runtime verification, so
ours must at least render.
"""

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
import pytest

from spine_vision_tpu.viz import (
    plot_binary_label_distributions,
    plot_classification_metrics,
    plot_classification_predictions,
    plot_confusion_examples,
    plot_confusion_matrix_with_samples,
    plot_confusion_summary,
    plot_dataset_statistics,
    plot_error_distribution,
    plot_label_cooccurrence,
    plot_label_distribution,
    plot_localization_predictions,
    plot_per_level_metrics,
    plot_pfirrmann_by_level,
    plot_samples_per_class,
    plot_test_samples_with_labels,
    plot_training_curves,
    visualize_sample,
)

RNG = np.random.default_rng(0)
LEVELS = ["L1/L2", "L2/L3", "L3/L4", "L4/L5", "L5/S1"]
BINARY = ["herniation", "bulging", "narrowing"]


def _images(n, size=24):
    return [RNG.integers(0, 255, (size, size), dtype=np.uint8) for _ in range(n)]


@pytest.fixture(autouse=True)
def _close_figures():
    yield
    plt.close("all")


def test_training_curves():
    history = {
        "train_loss": [1.0, 0.5, 0.3],
        "val_loss": [0.9, 0.6, 0.4],
        "lr": [1e-3, 8e-4, 5e-4],
        "med": [0.2, 0.15, 0.12],
    }
    assert plot_training_curves(history) is not None


def test_localization_plots():
    n = 6
    preds = RNG.uniform(0.2, 0.8, (n, 2))
    targets = RNG.uniform(0.2, 0.8, (n, 2))
    levels = RNG.integers(0, 5, n)
    assert plot_localization_predictions(_images(n), preds, targets) is not None
    assert plot_error_distribution(preds, targets, levels, LEVELS) is not None
    assert plot_error_distribution(preds, targets) is not None
    metrics = {f"med_{name}": 0.1 for name in LEVELS}
    assert plot_per_level_metrics(metrics, LEVELS) is not None
    coords = RNG.uniform(0.2, 0.8, (5, 2))
    assert visualize_sample(_images(1)[0], coords, np.ones(5), LEVELS) is not None


def test_classification_plots():
    n = 8
    images = _images(n)
    preds = {
        "pfirrmann": RNG.integers(0, 5, n),
        "herniation": RNG.uniform(0, 1, (n, 1)),
    }
    targets = {
        "pfirrmann": RNG.integers(0, 5, n),
        "herniation": RNG.integers(0, 2, (n, 1)).astype(np.float32),
    }
    labels = ["pfirrmann", "herniation"]
    assert plot_classification_predictions(images, preds, targets) is not None
    metrics = {
        "pfirrmann_accuracy": 70.0,
        "pfirrmann_balanced_acc": 65.0,
        "herniation_accuracy": 80.0,
        "herniation_f1": 0.7,
    }
    assert plot_classification_metrics(metrics, labels) is not None
    assert (
        plot_confusion_matrix_with_samples(
            "herniation", images, preds["herniation"], targets["herniation"]
        )
        is not None
    )
    assert (
        plot_test_samples_with_labels(images, preds, targets, labels) is not None
    )
    assert (
        plot_confusion_examples(
            "herniation", images, preds["herniation"], targets["herniation"]
        )
        is not None
    )
    assert plot_confusion_summary(preds, targets, labels) is not None
    distributions = {
        split: {
            "pfirrmann": {g: int(RNG.integers(1, 9)) for g in range(5)},
            "herniation": {0: 10, 1: 3},
        }
        for split in ("train", "val")
    }
    assert plot_label_distribution(distributions, labels) is not None


def test_dataset_plots():
    stats = {
        "levels": {name: 10 for name in LEVELS},
        "sources": {"spider": 30, "phenikaa": 20},
        "series_types": {"sag_t1": 25, "sag_t2": 25},
    }
    assert plot_dataset_statistics(stats) is not None
    distribution = {lab: {0: 20, 1: 5} for lab in BINARY}
    distribution["pfirrmann"] = {g: 10 for g in range(5)}
    assert plot_binary_label_distributions(distribution, BINARY) is not None
    records = [
        {
            "level_idx": int(RNG.integers(0, 5)),
            "pfirrmann": int(RNG.integers(1, 6)),
            **{lab: int(RNG.integers(0, 2)) for lab in BINARY},
        }
        for _ in range(40)
    ]
    assert plot_label_cooccurrence(records, BINARY) is not None
    assert plot_pfirrmann_by_level(records) is not None
    assert plot_samples_per_class(distribution, BINARY + ["pfirrmann"]) is not None

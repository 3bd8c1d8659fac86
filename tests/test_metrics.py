"""Tests for the metrics package (parity with reference numpy formulas)."""

import numpy as np

from spine_vision_tpu.metrics import (
    ClassificationMetrics,
    ClassifierMetrics,
    LocalizationMetrics,
)


def test_localization_metrics_basic():
    m = LocalizationMetrics()
    preds = np.array([[0.5, 0.5], [0.2, 0.2]])
    targets = np.array([[0.5, 0.5], [0.2, 0.45]])
    out = m.compute(preds, targets)
    assert abs(out["med"] - 0.125) < 1e-9  # distances: 0 and 0.25
    assert abs(out["mae_y"] - 0.125) < 1e-9
    assert out["pck@0.02"] == 50.0  # only the exact match is below 0.02
    assert out["pck@0.05"] == 50.0
    assert out["pck@0.10"] == 50.0


def test_localization_metrics_per_level_and_accumulate():
    m = LocalizationMetrics()
    m.update(np.array([[0.0, 0.0]]), np.array([[0.0, 0.1]]), np.array([0]))
    m.update(np.array([[0.0, 0.0]]), np.array([[0.0, 0.3]]), np.array([4]))
    out = m.compute()
    assert abs(out["med_L1/L2"] - 0.1) < 1e-9
    assert abs(out["med_L5/S1"] - 0.3) < 1e-9
    m.reset()
    assert m.compute() == {}


def test_classification_metrics_perfect():
    m = ClassificationMetrics(num_classes=3)
    preds = np.array([0, 1, 2, 0])
    out = m.compute(preds, preds.copy())
    assert out["accuracy"] == 100.0
    assert out["balanced_accuracy"] == 100.0
    assert out["macro_f1"] == 1.0


def test_classification_metrics_partial():
    m = ClassificationMetrics(num_classes=2, class_names=["neg", "pos"])
    preds = np.array([0, 0, 1, 1])
    targets = np.array([0, 1, 1, 1])
    out = m.compute(preds, targets)
    assert out["accuracy"] == 75.0
    # pos: tp=2 fp=0 fn=1 -> precision 1.0, recall 2/3
    assert abs(out["precision_pos"] - 1.0) < 1e-9
    assert abs(out["recall_pos"] - 2 / 3) < 1e-9


def test_classifier_metrics_multi_task():
    m = ClassifierMetrics(target_labels=["pfirrmann", "herniation"])
    predictions = {
        "pfirrmann": np.eye(5)[[0, 1, 2, 3]] * 10.0,  # logits -> argmax 0..3
        "herniation": np.array([[5.0], [-5.0], [5.0], [-5.0]]),
    }
    targets = {
        "pfirrmann": np.array([0, 1, 2, 3]),
        "herniation": np.array([1.0, 0.0, 1.0, 0.0]),
    }
    m.update(predictions, targets)
    out = m.compute()
    assert out["pfirrmann_accuracy"] == 100.0
    assert out["herniation_f1"] == 1.0
    assert out["overall_accuracy"] == 100.0
    assert "macro_f1" in out  # multi-task aggregate
    assert "f1" not in out


def test_classifier_metrics_single_task_uses_f1_key():
    m = ClassifierMetrics(target_labels=["herniation"])
    m.update(
        {"herniation": np.array([[3.0], [-3.0]])},
        {"herniation": np.array([1.0, 0.0])},
    )
    out = m.compute()
    assert out["f1"] == 1.0
    assert "macro_f1" not in out


def test_localization_metrics_empty_after_masking():
    """All-masked splits return {} instead of NaN metrics (NaN would
    silently freeze best-checkpoint tracking: NaN < best is never True)."""
    from spine_vision_tpu.metrics import LocalizationMetrics

    m = LocalizationMetrics()
    assert m.compute(np.zeros((0, 2)), np.zeros((0, 2))) == {}


def test_localization_metrics_mixed_levels_updates():
    """update() with levels on one batch and without on another must not
    crash compute (the breakdown is skipped when rows misalign)."""
    from spine_vision_tpu.metrics import LocalizationMetrics

    m = LocalizationMetrics()
    m.update(np.zeros((3, 2)), np.ones((3, 2)), levels=np.arange(3))
    m.update(np.zeros((2, 2)), np.ones((2, 2)))
    metrics = m.compute()
    assert metrics["med"] > 0
    assert not any(k.startswith("med_L") for k in metrics)


def test_stable_sigmoid_extreme_logits():
    import warnings

    from spine_vision_tpu.metrics import _stable_sigmoid

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any overflow warning -> failure
        probs = _stable_sigmoid(np.asarray([-1000.0, -1.0, 0.0, 1.0, 1000.0]))
    np.testing.assert_allclose(probs[[1, 2, 3]], [0.26894142, 0.5, 0.73105858])
    assert probs[0] == 0.0 and probs[4] == 1.0


def test_empty_pck_thresholds_disable_pck():
    from spine_vision_tpu.metrics import LocalizationMetrics

    m = LocalizationMetrics(pck_thresholds=[], level_names=[])
    metrics = m.compute(np.zeros((2, 2)), np.ones((2, 2)), levels=np.arange(2))
    assert not any(k.startswith("pck@") for k in metrics)


# ----------------------------------------------------------------- ROC-AUC
# (BASELINE.json north star requires grading-AUC parity; the reference has
# no AUC metric, so these are golden-value tests against hand-counted
# Mann-Whitney pair statistics.)


def test_roc_auc_hand_counted():
    from spine_vision_tpu.metrics import roc_auc

    # sklearn's doc example: pos {0.35, 0.8} vs neg {0.1, 0.4} -> 3/4 pairs won
    assert roc_auc([0.1, 0.4, 0.35, 0.8], [0, 0, 1, 1]) == 0.75
    # perfect / inverted separation
    assert roc_auc([0.1, 0.2, 0.8, 0.9], [0, 0, 1, 1]) == 1.0
    assert roc_auc([0.9, 0.8, 0.2, 0.1], [0, 0, 1, 1]) == 0.0


def test_roc_auc_ties_count_half():
    from spine_vision_tpu.metrics import roc_auc

    # all scores equal -> every pair is a tie -> 0.5
    assert roc_auc([0.5, 0.5, 0.5, 0.5], [0, 1, 0, 1]) == 0.5
    # pairs: (0.5 pos vs 0.5 neg)=0.5, (0.5 pos vs 0.3 neg)=1 -> 1.5/2
    assert roc_auc([0.5, 0.5, 0.3], [1, 0, 0]) == 0.75


def test_roc_auc_degenerate_is_nan():
    from spine_vision_tpu.metrics import roc_auc

    assert np.isnan(roc_auc([0.2, 0.8], [1, 1]))
    assert np.isnan(roc_auc([0.2, 0.8], [0, 0]))


def test_macro_ovr_auc_skips_absent_classes():
    from spine_vision_tpu.metrics import macro_ovr_auc

    probs = np.array(
        [[0.8, 0.1, 0.1], [0.1, 0.8, 0.1], [0.1, 0.1, 0.8], [0.7, 0.2, 0.1]]
    )
    targets = np.array([0, 1, 2, 0])
    assert macro_ovr_auc(probs, targets) == 1.0
    # class 2 never appears: its OvR AUC is skipped, not averaged as 0
    targets_no2 = np.array([0, 1, 1, 0])
    out = macro_ovr_auc(probs[:, :], targets_no2)
    assert 0.0 <= out <= 1.0 and not np.isnan(out)
    # single-class targets -> nothing scoreable
    assert np.isnan(macro_ovr_auc(probs, np.zeros(4, dtype=int)))


def test_classifier_metrics_auc_keys():
    m = ClassifierMetrics(target_labels=["pfirrmann", "herniation"])
    predictions = {
        "pfirrmann": np.eye(5)[[0, 1, 2, 3]] * 10.0,
        "herniation": np.array([[5.0], [-5.0], [5.0], [-5.0]]),
    }
    targets = {
        "pfirrmann": np.array([0, 1, 2, 3]),
        "herniation": np.array([1.0, 0.0, 1.0, 0.0]),
    }
    m.update(predictions, targets)
    out = m.compute()
    assert out["pfirrmann_auc"] == 1.0
    assert out["herniation_auc"] == 1.0
    assert out["macro_auc"] == 1.0


def test_classifier_metrics_auc_omitted_when_degenerate():
    m = ClassifierMetrics(target_labels=["herniation"])
    m.update(
        {"herniation": np.array([[3.0], [2.0]])},
        {"herniation": np.array([1.0, 1.0])},  # one class only
    )
    out = m.compute()
    assert "herniation_auc" not in out
    assert "macro_auc" not in out
    assert "f1" in out  # the rest of the metrics still compute

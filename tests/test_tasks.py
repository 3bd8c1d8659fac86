"""Tests for the core task system (registry + strategies)."""

import numpy as np
import pytest

from spine_vision_tpu.core.tasks import (
    AVAILABLE_TASK_NAMES,
    TASK_REGISTRY,
    TaskConfig,
    compute_predictions_for_tasks,
    compute_probabilities_for_tasks,
    create_loss_functions,
    get_strategy,
    get_task,
    get_tasks,
)


def test_registry_has_eight_lumbar_tasks():
    assert len(TASK_REGISTRY) >= 8
    assert set(AVAILABLE_TASK_NAMES) >= {
        "pfirrmann",
        "modic",
        "herniation",
        "bulging",
        "upper_endplate",
        "lower_endplate",
        "spondy",
        "narrowing",
    }
    assert get_task("pfirrmann").num_classes == 5
    assert get_task("modic").num_classes == 4
    for name in ("herniation", "bulging", "spondy", "narrowing"):
        t = get_task(name)
        assert t.num_classes == 1
        assert t.task_type == "binary"


def test_task_display_name_auto_derived():
    t = TaskConfig(name="some_new_task", num_classes=3, task_type="multiclass")
    assert t.display_name == "Some New Task"
    assert t.class_names == ("Class 0", "Class 1", "Class 2")


def test_with_overrides_is_immutable_copy():
    t = get_task("pfirrmann")
    t2 = t.with_overrides(label_smoothing=0.1, loss_weight=2.0)
    assert t.label_smoothing == 0.0
    assert t2.label_smoothing == 0.1
    assert t2.loss_weight == 2.0
    assert t2.name == t.name


def test_unknown_task_raises():
    with pytest.raises(KeyError):
        get_task("nonexistent")


def test_binary_strategy_predictions_and_probs():
    strategy = get_strategy("binary")
    logits = np.array([[2.0], [-2.0], [0.1]])
    preds = strategy.compute_predictions(logits)
    np.testing.assert_array_equal(preds, [1, 0, 1])
    probs = strategy.compute_probabilities(logits)
    assert probs.shape == (3, 1)
    assert 0.8 < probs[0, 0] < 1.0


def test_multiclass_strategy_predictions():
    strategy = get_strategy("multiclass")
    logits = np.array([[1.0, 3.0, 0.0], [5.0, 1.0, 1.0]])
    preds = strategy.compute_predictions(logits)
    np.testing.assert_array_equal(preds, [1, 0])
    probs = strategy.compute_probabilities(logits)
    np.testing.assert_allclose(probs.sum(axis=1), [1.0, 1.0], atol=1e-6)


def test_loss_functions_created_for_all_tasks():
    tasks = get_tasks()
    loss_fns, weights = create_loss_functions(tasks)
    assert set(loss_fns) == set(t.name for t in tasks)
    assert all(w == 1.0 for w in weights.values())

    # Each loss fn is callable on plausible shapes and returns a finite scalar.
    import jax.numpy as jnp

    for task in tasks:
        strategy = get_strategy(task)
        if task.is_multiclass:
            logits = jnp.zeros((4, task.num_classes))
            targets = strategy.format_target(np.array([0, 1, 2, 3]) % task.num_classes)
        else:
            logits = jnp.zeros((4, 1))
            targets = strategy.format_target(np.array([0.0, 1.0, 0.0, 1.0]))
        loss = loss_fns[task.name](logits, targets)
        assert np.isfinite(float(loss))


def test_compute_predictions_for_tasks_skips_missing():
    tasks = get_tasks(["pfirrmann", "herniation"])
    outputs = {"pfirrmann": np.zeros((2, 5))}
    preds = compute_predictions_for_tasks(outputs, tasks)
    assert "pfirrmann" in preds and "herniation" not in preds
    probs = compute_probabilities_for_tasks(outputs, tasks)
    assert "pfirrmann" in probs and "herniation" not in probs


def test_binary_format_target_adds_trailing_dim():
    strategy = get_strategy("binary")
    t = strategy.format_target(np.array([0.0, 1.0]))
    assert t.shape == (2, 1)

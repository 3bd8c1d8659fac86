"""Registry system: registration, lookup, config-keyed trainer creation."""

import pytest

from spine_vision_tpu.core import (
    METRICS_REGISTRY,
    MODEL_REGISTRY,
    TRAINER_REGISTRY,
    Registry,
    get_trainer_config_class,
)


def test_builtin_registrations():
    import spine_vision_tpu.metrics  # noqa: F401
    import spine_vision_tpu.models  # noqa: F401
    import spine_vision_tpu.train.classification  # noqa: F401
    import spine_vision_tpu.train.localization  # noqa: F401

    assert "classifier" in MODEL_REGISTRY
    assert "coordinate_regressor" in MODEL_REGISTRY
    assert "text_detection" in MODEL_REGISTRY
    assert "text_recognition" in MODEL_REGISTRY
    assert "localization" in TRAINER_REGISTRY
    assert "classification" in TRAINER_REGISTRY
    assert "localization" in METRICS_REGISTRY
    assert "classifier" in METRICS_REGISTRY


def test_trainer_config_class():
    import spine_vision_tpu.train.localization as loc

    assert get_trainer_config_class("localization") is loc.LocalizationConfig


def test_unknown_name_lists_available():
    registry = Registry("widget")

    @registry.register("a")
    class A:
        pass

    with pytest.raises(KeyError, match="Available: a"):
        registry.get("zzz")
    assert registry.create("a").__class__ is A
    assert registry.names() == ["a"]


def test_metrics_create():
    import spine_vision_tpu.metrics  # noqa: F401

    metrics = METRICS_REGISTRY.create("classifier", target_labels=["pfirrmann"])
    assert hasattr(metrics, "update") and hasattr(metrics, "compute")

"""End-to-end training regression: the loop must actually learn.

Guards against silent training bugs (wrong loss wiring, dead gradients,
frozen params): a localization model trained on a synthetic bright-dot
dataset must reduce its loss substantially within a few epochs.
"""

import csv

import numpy as np
import pytest
from PIL import Image

from spine_vision_tpu.train.localization import (
    LocalizationConfig,
    LocalizationTrainer,
)

LEVELS = ["L1/L2", "L2/L3", "L3/L4", "L4/L5", "L5/S1"]


@pytest.fixture
def dot_dataset(tmp_path):
    data = tmp_path / "loc"
    (data / "images").mkdir(parents=True)
    rng = np.random.default_rng(0)
    rows = []
    for i in range(32):
        img = rng.normal(20, 5, (48, 48)).clip(0, 255).astype(np.uint8)
        for li, level in enumerate(LEVELS):
            x = 0.25 + 0.5 * rng.random()
            y = 0.1 + 0.15 * li
            px, py = int(x * 48), int(y * 48)
            img[max(0, py - 2) : py + 3, max(0, px - 2) : px + 3] = 255
            rows.append(
                {
                    "image_path": f"images/img_{i}.png",
                    "level": level,
                    "relative_x": x,
                    "relative_y": y,
                    "series_type": "sag_t2",
                    "source": "synthetic",
                }
            )
        Image.fromarray(img).convert("RGB").save(data / "images" / f"img_{i}.png")
    with open(data / "annotations.csv", "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        writer.writeheader()
        writer.writerows(rows)
    return data


@pytest.fixture
def graded_crop_dataset(tmp_path):
    """Synthetic classification crops: pfirrmann grade encoded as image
    brightness, herniation as a bright corner block — trivially learnable.
    Both sag_t1 and sag_t2 rows exist per (patient, level) (records without
    the full pair are dropped, data/datasets.py:368-380)."""
    data = tmp_path / "cls"
    (data / "images").mkdir(parents=True)
    rng = np.random.default_rng(0)
    rows = []
    for p in range(24):
        pid = f"pat{p:03d}"
        for lvl in (3, 4):
            grade = int(rng.integers(1, 6))
            herniation = int(rng.integers(0, 2))
            for series in ("sag_t1", "sag_t2"):
                img = rng.normal(grade * 40, 8, (48, 48)).clip(0, 255)
                if herniation:
                    img[:12, :12] = 255
                name = f"images/{pid}_L{lvl}_{series}.png"
                Image.fromarray(img.astype(np.uint8)).save(data / name)
                rows.append(
                    {
                        "image_path": name,
                        "patient_id": pid,
                        "ivd_level": lvl,
                        "series_type": series,
                        "source": "synthetic",
                        "pfirrmann_grade": grade,
                        "disc_herniation": herniation,
                        "disc_narrowing": 0,
                        "disc_bulging": 0,
                        "spondylolisthesis": 0,
                        "modic": 0,
                        "up_endplate": 0,
                        "low_endplate": 0,
                    }
                )
    with open(data / "annotations.csv", "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        writer.writeheader()
        writer.writerows(rows)
    return data


def test_classification_training_learns(graded_crop_dataset, tmp_path):
    """Full ClassificationTrainer flow (reference classification.py:456-559):
    weighted sampling engaged, loss decreases, F1 checkpoint gating fires,
    evaluate() emits confusion figures."""
    from spine_vision_tpu.train.classification import (
        ClassificationConfig,
        ClassificationTrainer,
    )

    config = ClassificationConfig(
        data_path=graded_crop_dataset,
        output_path=tmp_path / "cls_run",
        backbone="resnet18",
        pretrained=False,
        target_labels=["pfirrmann", "herniation"],
        output_size=(48, 48),
        batch_size=8,
        num_epochs=5,
        learning_rate=3e-3,
        scheduler_type="none",
        early_stopping=False,
        augment=False,
        mixed_precision=False,
        visualize_predictions=False,
        num_workers=0,
        val_split=0.15,
    )
    trainer = ClassificationTrainer(config)
    # Weighted sampling must actually be wired into the train loader.
    assert trainer.train_loader.sample_weights is not None
    result = trainer.train()

    losses = trainer.history["train_loss"]
    assert len(losses) == 5
    assert losses[-1] < losses[0] * 0.7, losses
    # F1-based checkpoint gating: metric is -F1 (lower-better), so it must
    # be finite and <= 0; the best checkpoint must exist on disk.
    assert np.isfinite(result.best_metric) and result.best_metric <= 0.0
    assert (tmp_path / "cls_run" / "best_model").exists()

    metrics = trainer.evaluate(visualize=True)
    assert "f1" in metrics or "macro_f1" in metrics
    assert any(k.startswith("pfirrmann") for k in metrics)
    logs = config.logs_path
    figures = list(logs.glob("confusion_summary*")) + list(
        logs.glob("confusion_matrix_samples*")
    )
    assert figures, f"no confusion figures in {logs}"


def test_localization_training_learns(dot_dataset, tmp_path):
    config = LocalizationConfig(
        data_path=dot_dataset,
        output_path=tmp_path / "run",
        backbone="resnet18",
        pretrained=False,
        image_size=(48, 48),
        batch_size=8,
        num_epochs=4,
        learning_rate=3e-3,
        scheduler_type="none",
        early_stopping=False,
        augment=False,
        mixed_precision=False,
        visualize_predictions=False,
        num_workers=0,
        val_split=0.2,
    )
    trainer = LocalizationTrainer(config)
    result = trainer.train()
    losses = trainer.history["train_loss"]
    assert len(losses) == 4
    # Loss must drop meaningfully (>30%) on this trivially-learnable task.
    assert losses[-1] < losses[0] * 0.7, losses
    # Best checkpoint exists and best metric is finite.
    assert (tmp_path / "run" / "best_model").exists()
    assert np.isfinite(result.best_metric)

    # Resume: a fresh trainer pointed at the checkpoint continues from the
    # trained weights (reference recovery story: set checkpoint_path ->
    # _load_checkpoint, trainers/base.py:439-441,721-736) instead of
    # restarting from scratch — its first-epoch loss must be far below the
    # cold run's.
    resumed_config = config.model_copy(
        update={
            "output_path": tmp_path / "resumed",
            "num_epochs": 5,  # continues from the checkpoint's epoch counter
            "checkpoint_path": tmp_path / "run" / "best_model",
        }
    )
    resumed = LocalizationTrainer(resumed_config)
    resumed.train()
    resumed_losses = resumed.history["train_loss"]
    # Restored history + at least one NEW epoch, continuing warm: the new
    # epoch's loss must sit far below the cold run's first epoch.
    assert len(resumed_losses) == 5
    assert resumed_losses[-1] < losses[0] * 0.5


def test_localization_evaluate_empty_test_split(dot_dataset, tmp_path):
    """A dataset too small for the test fraction must evaluate to {} with a
    warning, not crash on an empty concatenate (found driving a 16-image
    TPU run)."""
    config = LocalizationConfig(
        data_path=dot_dataset,
        output_path=tmp_path / "run",
        backbone="resnet18",
        pretrained=False,
        image_size=(48, 48),
        batch_size=8,
        num_epochs=1,
        early_stopping=False,
        augment=False,
        mixed_precision=False,
        visualize_predictions=False,
        num_workers=0,
        val_split=0.2,
    )
    trainer = LocalizationTrainer(config)
    trainer.train()
    from spine_vision_tpu.data.datasets import LocalizationDataset

    empty = LocalizationDataset(
        data_path=dot_dataset,
        split="test",
        val_ratio=0.0,
        test_ratio=0.0,
        image_size=(48, 48),
        augment=False,
        seed=0,
    )
    assert len(empty) == 0
    assert trainer.evaluate(empty) == {}


def test_checkpoint_restores_on_different_topology(tmp_path):
    """A checkpoint saved under the 8-device mesh must restore on a
    single-device host (train on a pod -> infer on one chip). The
    template-free load path (restore_opt_state=False) used to rebuild the
    SAVING machine's shardings and fail."""
    import subprocess
    import sys
    import textwrap

    import jax
    import jax.numpy as jnp
    import optax

    from spine_vision_tpu.models import CoordinateRegressor
    from spine_vision_tpu.train.checkpoint import save_checkpoint
    from spine_vision_tpu.train.state import TrainState

    model = CoordinateRegressor(backbone_name="resnet18", dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
    )
    # Replicate the state across all 8 devices (what the DP trainer holds).
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    mesh = Mesh(np.asarray(jax.devices()).reshape(8, 1), ("data", "model"))
    replicated = NamedSharding(mesh, PartitionSpec())
    state = TrainState.create(
        params=jax.device_put(variables["params"], replicated),
        tx=optax.adamw(1e-3),
        batch_stats=jax.device_put(variables.get("batch_stats"), replicated),
        seed=0,
    )
    ckpt = tmp_path / "best_model"
    save_checkpoint(ckpt, state, {"epoch": 1})

    worker = textwrap.dedent(
        f"""
        import os
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
        assert jax.device_count() == 1, jax.devices()
        import jax.numpy as jnp
        import optax
        from spine_vision_tpu.models import CoordinateRegressor
        from spine_vision_tpu.train.checkpoint import load_checkpoint
        from spine_vision_tpu.train.state import TrainState

        model = CoordinateRegressor(backbone_name="resnet18", dtype=jnp.float32)
        variables = model.init(
            jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)), train=False
        )
        state = TrainState.create(
            params=variables["params"],
            tx=optax.identity(),
            batch_stats=variables.get("batch_stats"),
        )
        state, meta = load_checkpoint(
            r"{ckpt}", state, restore_opt_state=False
        )
        assert meta["epoch"] == 1, meta
        out = model.apply(state.variables(), jnp.zeros((1, 32, 32, 3)), train=False)
        print("RESTORED", float(jnp.sum(out)))
        """
    )
    result = subprocess.run(
        [sys.executable, "-c", worker],
        capture_output=True,
        text=True,
        timeout=420,
        env={
            k: v
            for k, v in __import__("os").environ.items()
            if not k.startswith(("XLA_", "JAX_"))
        },
    )
    assert result.returncode == 0, result.stdout + result.stderr
    assert "RESTORED" in result.stdout

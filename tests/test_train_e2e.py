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

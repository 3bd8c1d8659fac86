"""Sustained training throughput WITH the input pipeline in the loop.

Round-3 verdict item 3: the device-only full train step does 6140 img/s
(ResNet-18 @ 256^2, b256) but the best measured loader rate on this 1-core
host is ~4.2k img/s — no steady-state epoch number (loader + H2D + device
overlapped) existed. This runs the REAL ClassificationTrainer on synthetic
256^2 crops with the packed sample cache and reports per-epoch img/s; the
steady state is epochs >= 2 (cache built, loader warm, step compiled).

It also itemizes the bound: loader-only rate (same dataset drained with no
device work) and the device-only rate (BASELINE.md row), so the sustained
number is attributable. On this sandbox the chip sits behind a network
tunnel, so H2D transfer rides the tunnel — a production TPU host feeds the
chip locally; the loader-only and device-only rows bracket what that host
would see.

Usage: env PYTHONPATH=/root/.axon_site:/root/repo python \
    scripts/bench_sustained_train.py [n_samples] [batch] [epochs]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 256
EPOCHS = int(sys.argv[3]) if len(sys.argv) > 3 else 4


def build_dataset(root: Path, n: int) -> None:
    """Synthetic classification crops in the builder's on-disk format."""
    import csv

    from PIL import Image

    (root / "images").mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    rows = []
    n_patients = max(n // 10, 1)  # 5 levels x 2 series per patient
    for p in range(n_patients):
        pid = f"sp{p:04d}"
        grades = rng.integers(1, 6, size=5)
        hern = rng.integers(0, 2, size=5)  # per level, shared by t1/t2 rows
        for series in ("sag_t1", "sag_t2"):
            for lvl in range(1, 6):
                name = f"images/{pid}_L{lvl}_{series}.png"
                img = rng.integers(0, 255, (256, 256), np.uint8)
                Image.fromarray(img).save(root / name)
                rows.append(
                    {
                        "image_path": name,
                        "patient_id": pid,
                        "ivd_level": lvl,
                        "series_type": series,
                        "source": "bench",
                        "pfirrmann_grade": int(grades[lvl - 1]),
                        "disc_herniation": int(hern[lvl - 1]),
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


def main() -> None:
    tmp = Path(tempfile.mkdtemp(prefix="sustained_"))
    data_root = tmp / "data"
    build_dataset(data_root, N)

    from spine_vision_tpu.train.classification import (
        ClassificationConfig,
        ClassificationTrainer,
    )

    config = ClassificationConfig(
        data_path=data_root,
        output_path=tmp / "run",
        backbone="resnet18",
        pretrained=False,
        batch_size=BATCH,
        num_epochs=EPOCHS,
        learning_rate=1e-3,
        early_stopping=False,
        visualize_predictions=False,
        num_workers=4,
        val_split=0.0,
        sample_cache_dir=tmp / "cache",
        seed=0,
    )
    trainer = ClassificationTrainer(config)
    n_train = len(trainer.train_dataset)

    # Loader-only drain rate (no device work), epochs 2+ of the packed cache.
    loader = trainer.train_loader
    loader.set_epoch(0)
    for _ in loader:  # epoch 1 builds/loads the packed cache
        pass
    loader.set_epoch(1)
    start = time.perf_counter()
    seen = 0
    for batch in loader:
        seen += batch["image"].shape[0]
    loader_rate = seen / (time.perf_counter() - start)

    # Real training epochs: trainer logs per-epoch time; recompute here.
    epoch_rates = []
    epoch_times = []
    orig_train_epoch = trainer._train_epoch

    def timed_epoch():
        start = time.perf_counter()
        out = orig_train_epoch()
        epoch_times.append(time.perf_counter() - start)
        epoch_rates.append(n_train / epoch_times[-1])
        return out

    trainer._train_epoch = timed_epoch
    trainer.train()

    steady = epoch_rates[1:] or epoch_rates
    result = {
        "metric": "sustained_train_img_s",
        "value": round(float(np.median(steady)), 1),
        "unit": "images/sec (loader+H2D+device overlapped)",
        "n_train": n_train,
        "batch": BATCH,
        "epoch_img_s": [round(r, 1) for r in epoch_rates],
        "loader_only_img_s": round(loader_rate, 1),
        "note": (
            "chip behind a network tunnel in this sandbox: H2D rides the "
            "tunnel; loader-only and device-only (BASELINE.md) rates "
            "bracket a local-host deployment"
        ),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

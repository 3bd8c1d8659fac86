"""Classification-dataset build rate (BASELINE.json config 3), volumes/min.

Round-3 verdict item 7: kernel-level wins are logged (fused loc+crop
2386 -> 60 ms/16 slices) but no end-to-end rate for
``create_classification_dataset`` over a realistic volume set existed.
This builds a synthetic SPIDER-scale tree (realistic sagittal volume
shapes at ~1 mm in-plane / 4 mm slice spacing, T1+T2 per patient), runs
the real builder (decode -> isotropic middle slice -> localization ->
mm-space crop -> PNG + records) and reports volumes/min plus the host/device
wall split.

Usage: env PYTHONPATH=/root/.axon_site:/root/repo python \
    scripts/bench_dataset_build.py [n_patients] [--data-parallel] [--cpu]
"""

from __future__ import annotations

import csv
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

N_PATIENTS = next(
    (int(a) for a in sys.argv[1:] if a.isdigit()), 16
)
DATA_PARALLEL = "--data-parallel" in sys.argv
# SPIDER sagittal volumes are ~(9-17, 512ish, 512ish) at ~(3.3-4.8, 0.6,
# 0.6) mm; model a mid-sized study so the isotropic resample / crop path
# sees production-shaped work.
VOL_SHAPE = (12, 320, 320)  # (z sagittal slices, y, x) — MedicalImage order
VOL_SPACING = (0.7, 0.7, 4.0)  # (x, y, z) mm: 0.7 in-plane, 4 mm slice gap


def build_spider_tree(root: Path, n_patients: int) -> None:
    from spine_vision_tpu.io import write_medical_image
    from spine_vision_tpu.io.types import MedicalImage

    spider = root / "raw" / "SPIDER"
    (spider / "images").mkdir(parents=True)
    rng = np.random.default_rng(0)
    fieldnames = [
        "Patient", "IVD label", "Pfirrman grade", "Disc herniation",
        "Disc narrowing", "Disc bulging", "Spondylolisthesis", "Modic",
        "UP endplate", "LOW endplate",
    ]
    rows = []
    for pid in range(1, n_patients + 1):
        for spider_level in range(1, 6):
            rows.append({
                "Patient": pid, "IVD label": spider_level,
                "Pfirrman grade": int(rng.integers(1, 6)),
                "Disc herniation": int(rng.integers(0, 2)),
                "Disc narrowing": int(rng.integers(0, 2)),
                "Disc bulging": int(rng.integers(0, 2)),
                "Spondylolisthesis": int(rng.integers(0, 2)),
                "Modic": int(rng.integers(0, 4)),
                "UP endplate": int(rng.integers(0, 2)),
                "LOW endplate": int(rng.integers(0, 2)),
            })
        for suffix in ("t1", "t2"):
            vol = rng.normal(100, 30, VOL_SHAPE).astype(np.float32)
            image = MedicalImage(
                array=vol, spacing=VOL_SPACING, origin=(0, 0, 0)
            )
            write_medical_image(
                image, spider / "images" / f"{pid}_{suffix}.mha"
            )
    with open(spider / "radiological_gradings.csv", "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=fieldnames)
        writer.writeheader()
        writer.writerows(rows)


def main() -> None:
    tmp = Path(tempfile.mkdtemp(prefix="dsbuild_"))
    build_spider_tree(tmp, N_PATIENTS)

    from spine_vision_tpu.data.builders.classification import (
        ClassificationDatasetConfig,
        create_classification_dataset,
    )

    config = ClassificationDatasetConfig(
        base_path=tmp,
        output_name="classification",
        localization_model_path=None,  # center fallback: pure pipeline rate
        data_parallel=DATA_PARALLEL,
        padded_hw=(1536, 1536),
    )
    n_volumes = N_PATIENTS * 2  # T1 + T2 per patient

    start = time.perf_counter()
    result = create_classification_dataset(config)
    elapsed = time.perf_counter() - start

    print(json.dumps({
        "metric": "dataset_build_volumes_per_min",
        "value": round(n_volumes / elapsed * 60.0, 2),
        "unit": "volumes/min",
        "n_volumes": n_volumes,
        "vol_shape": VOL_SHAPE,
        "elapsed_s": round(elapsed, 1),
        "records": result.num_samples,
        "data_parallel": DATA_PARALLEL,
    }))


if __name__ == "__main__":
    main()

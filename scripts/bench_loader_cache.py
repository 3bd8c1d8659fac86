"""Host input pipeline: PNG-decode path vs packed-cache path, img/s.

Round-2 verdict flagged the host loader (~0.8k img/s for 256^2 cls crops on
this 1-core sandbox). The packed sample cache (data/cache.py) removes the
per-epoch decode entirely; this measures both paths on identical synthetic
data so BASELINE.md can carry the delta.

Usage: python scripts/bench_loader_cache.py [n_samples]
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")  # host-path bench; no TPU needed

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
SIZE = 256
BATCH = 64


class SynthPngDataset:
    """Mimics ClassificationDataset cost: PNG decode + resize per sample."""

    def __init__(self, root: Path, n: int):
        import cv2

        self.root = root
        self.n = n
        self.cv2 = cv2
        rng = np.random.default_rng(0)
        for i in range(n):
            img = rng.integers(0, 255, (320, 320), np.uint8)
            cv2.imwrite(str(root / f"{i}.png"), img)

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        img = self.cv2.imread(str(self.root / f"{idx}.png"), self.cv2.IMREAD_GRAYSCALE)
        img = self.cv2.resize(img, (SIZE, SIZE), interpolation=self.cv2.INTER_LINEAR)
        rgb = np.stack([img, img, img], axis=-1)
        return {
            "image": rgb,
            "targets": {"pfirrmann": np.int32(idx % 5)},
            "level_idx": idx % 5,
            "metadata": {"patient_id": f"p{idx}"},
        }


def run_epochs(dataset, workers: int, epochs: int = 2) -> float:
    from spine_vision_tpu.data.loader import DataLoader

    loader = DataLoader(
        dataset, batch_size=BATCH, shuffle=True, seed=0, num_workers=workers
    )
    total = 0
    start = time.perf_counter()
    for epoch in range(epochs):
        loader.set_epoch(epoch)
        for batch in loader:
            total += batch["image"].shape[0]
    return total / (time.perf_counter() - start)


if __name__ == "__main__":
    from spine_vision_tpu.data.cache import packed_view

    with tempfile.TemporaryDirectory() as tmp:
        tmp = Path(tmp)
        (tmp / "png").mkdir()
        ds = SynthPngDataset(tmp / "png", N)

        for workers in (8, 16):
            rate = run_epochs(ds, workers)
            print(f"decode path  workers={workers:<3d} {rate:8.0f} img/s", flush=True)

        t0 = time.perf_counter()
        packed = packed_view(ds, tmp / "cache", num_workers=8)
        build_s = time.perf_counter() - t0
        print(f"cache build  {N} samples in {build_s:.1f}s "
              f"({N / build_s:.0f} img/s one-time)", flush=True)

        for workers in (2, 4, 8):
            rate = run_epochs(packed, workers)
            print(f"packed path  workers={workers:<3d} {rate:8.0f} img/s", flush=True)

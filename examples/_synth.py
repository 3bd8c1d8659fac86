"""Shared helpers for the runnable examples.

Every example works out of the box on synthetic data (so they double as
smoke tests of the public API) and accepts real data paths where the
reference notebooks used files from ``data/``. The synthetic sagittal
"spine" volume has a curved bright vertebral column with five dark disc
gaps, so localization targets and crop geometry are meaningful.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

# Allow running straight from a source checkout (`python examples/01_...py`)
# without installing the package.
try:  # noqa: SIM105
    import spine_vision_tpu  # noqa: F401
except ModuleNotFoundError:
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

LEVEL_NAMES = ["L1/L2", "L2/L3", "L3/L4", "L4/L5", "L5/S1"]


def add_cpu_flag(parser: argparse.ArgumentParser) -> None:
    parser.add_argument(
        "--cpu",
        action="store_true",
        help="force the JAX CPU backend (useful off-TPU; must be the first "
        "jax touch of the process)",
    )


def maybe_force_cpu(args: argparse.Namespace) -> None:
    if getattr(args, "cpu", False):
        import jax

        jax.config.update("jax_platforms", "cpu")


def spine_centers_xy(n_levels: int = 5) -> np.ndarray:
    """Normalized (x, y) disc centers along a lordotic (curved) spine path."""
    y = np.linspace(0.28, 0.78, n_levels)
    # Quadratic curve: the column bows anteriorly near the bottom.
    x = 0.45 + 0.35 * (y - 0.5) ** 2 + 0.05 * (y - 0.5)
    return np.stack([x, y], axis=-1).astype(np.float32)


def synth_spine_slice(
    h: int = 320, w: int = 256, seed: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """A sagittal-T2-looking float32 slice plus its normalized disc centers.

    Bright vertebral bodies stacked along the curved spine path with dark
    disc gaps between them (discs sit AT the returned centers).
    """
    rng = np.random.default_rng(seed)
    img = rng.normal(60.0, 12.0, (h, w)).astype(np.float32)
    centers = spine_centers_xy()

    # Vertebral bodies: bright rounded rectangles between consecutive discs.
    ys = centers[:, 1] * h
    xs = centers[:, 0] * w
    body_ys = np.concatenate([[ys[0] - (ys[1] - ys[0])], (ys[:-1] + ys[1:]) / 2,
                              [ys[-1] + (ys[-1] - ys[-2])]])
    body_xs = np.interp(body_ys, ys, xs)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    for by, bx in zip(body_ys, body_xs):
        mask = ((np.abs(yy - by) / 14.0) ** 4 + (np.abs(xx - bx) / 22.0) ** 4) < 1.0
        img[mask] += 160.0
    # Discs: slightly bright thin ellipses at the centers (T2 discs are
    # hyperintense when healthy).
    for cy, cx in zip(ys, xs):
        mask = (((yy - cy) / 5.0) ** 2 + ((xx - cx) / 18.0) ** 2) < 1.0
        img[mask] = 240.0
    # CSF stripe posterior to the column.
    stripe = np.interp(yy, ys, xs) + 34.0
    img[np.abs(xx - stripe) < 6.0] += 90.0
    return img, centers


def synth_spine_volume(out_path: Path, slices: int = 15, seed: int = 0):
    """Write a small 3D sagittal spine volume as .mha and return its path.

    Index x runs through the sagittal stack (direction=identity => +x = L),
    matching the LPI middle-slice convention the pipeline orients to.
    """
    from spine_vision_tpu.io import MedicalImage, write_medical_image

    base, _ = synth_spine_slice(seed=seed)
    h, w = base.shape
    rng = np.random.default_rng(seed + 1)
    vol = np.empty((h, w, slices), np.float32)  # (z=rows, y=cols, x=stack)
    for i in range(slices):
        fade = 1.0 - 0.8 * abs(i - slices // 2) / max(slices // 2, 1)
        vol[:, :, i] = base * fade + rng.normal(0, 6.0, (h, w))
    image = MedicalImage(
        array=vol,
        spacing=(4.0, 0.6, 0.6),  # (x, y, z) mm — anisotropic like real MR
        origin=(0.0, 0.0, 0.0),
        # +z must point INFERIOR so the LPI-oriented middle slice keeps rows
        # top-down and spine_centers_xy() marks the rendered discs (identity
        # direction would make the orientation pass mirror the rows).
        direction=np.diag([1.0, 1.0, -1.0]),
    )
    write_medical_image(image, out_path)
    return out_path


def load_regressor(backbone: str, checkpoint: Path | None, image_size):
    """A CoordinateRegressor + variables, restored from an orbax run dir
    when ``checkpoint`` is given (random init otherwise — API demo only)."""
    import jax
    import jax.numpy as jnp
    import optax

    from spine_vision_tpu.models import CoordinateRegressor

    model = CoordinateRegressor(backbone_name=backbone)
    h, w = image_size
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)), train=False
    )
    if checkpoint is not None:
        from spine_vision_tpu.train.checkpoint import load_checkpoint
        from spine_vision_tpu.train.state import TrainState

        state = TrainState.create(
            params=variables["params"],
            tx=optax.identity(),
            batch_stats=variables.get("batch_stats"),
        )
        state, _ = load_checkpoint(checkpoint, state, restore_opt_state=False)
        variables = state.variables()
        print(f"loaded checkpoint: {checkpoint}")
    else:
        print("NOTE: no --checkpoint given — using random weights (API demo only)")
    return model, variables


def synth_classification_annotations(out_csv: Path, n_patients: int = 120) -> Path:
    """annotations.csv with the reference classification dataset schema."""
    import csv

    rng = np.random.default_rng(0)
    rows = []
    for p in range(n_patients):
        for level in range(1, 6):
            grade = int(np.clip(rng.poisson(1.1 + 0.45 * level) + 1, 1, 5))
            severe = grade >= 4
            for series in ("sag_t1", "sag_t2"):
                rows.append(
                    {
                        "image_path": f"images/p{p:04d}_l{level}_{series}.png",
                        "patient_id": f"p{p:04d}",
                        "ivd_level": level,
                        "series_type": series,
                        "source": "synth",
                        "pfirrmann_grade": grade,
                        "disc_herniation": int(rng.random() < (0.25 if severe else 0.06)),
                        "disc_narrowing": int(rng.random() < (0.45 if severe else 0.10)),
                        "disc_bulging": int(rng.random() < (0.35 if severe else 0.12)),
                        "spondylolisthesis": int(rng.random() < 0.05),
                        "modic": int(rng.choice(4, p=[0.75, 0.1, 0.1, 0.05])),
                        "up_endplate": int(rng.random() < 0.15),
                        "low_endplate": int(rng.random() < 0.15),
                    }
                )
    out_csv.parent.mkdir(parents=True, exist_ok=True)
    with open(out_csv, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        writer.writeheader()
        writer.writerows(rows)
    return out_csv

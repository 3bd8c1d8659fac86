"""Horizontal vs rotated IVD crops, side by side
(reference notebooks/compare_crop_modes.ipynb).

Computes per-level rotation angles from the disc centers (finite
differences + quadratic extrapolation at L5/S1 — ``get_rotation_angles``),
converts the mm crop deltas to pixels with the slice spacing, runs the
fused device crop kernel (``crop_ivd_regions``: rotation + asymmetric crop
+ normalize + letterbox in one pass, the framework's replacement for the
reference's cv2 ``crop_region_rotated``/``crop_region_horizontal`` chain,
cropping.py:104-354) in BOTH modes, and saves:

- a 5x2 grid of horizontal vs rotated crops per level
- the crop rectangles (inverse-rotated corners) overlaid on the slice

Disc centers come from ``--checkpoint`` when given, otherwise from the
synthetic volume's ground-truth path.

Usage:
    python examples/03_compare_crop_modes.py [IMAGE] [--checkpoint ...] [--cpu]
"""

from __future__ import annotations

import argparse
import tempfile
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from _synth import (
    LEVEL_NAMES,
    add_cpu_flag,
    load_regressor,
    maybe_force_cpu,
    spine_centers_xy,
    synth_spine_volume,
)

CROP_SIZE = (128, 128)
CROP_DELTA_MM = (35.0, 5.0, 20.0, 20.0)  # left, right, top, bottom (reference)


def crop_corners(center, delta_px, angle_deg):
    """Crop rectangle corners on the ORIGINAL image: the crop is axis-aligned
    in the rotated frame, so inverse-rotate its corners about the center."""
    cx, cy = center
    left, right, top, bottom = delta_px
    corners = np.array(
        [
            [cx - left, cy - top],
            [cx + right, cy - top],
            [cx + right, cy + bottom],
            [cx - left, cy + bottom],
        ]
    )
    theta = np.radians(-angle_deg)  # inverse of the crop's rotation
    rot = np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
    )
    return (corners - [cx, cy]) @ rot.T + [cx, cy]


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("path", nargs="?", type=Path)
    parser.add_argument("--checkpoint", type=Path, default=None)
    parser.add_argument("--backbone", default="convnext_base")
    parser.add_argument("--out-dir", type=Path, default=Path("output/crop"))
    parser.add_argument("--last-disc-angle-boost", type=float, default=2.0)
    add_cpu_flag(parser)
    args = parser.parse_args()
    maybe_force_cpu(args)

    import jax.numpy as jnp

    from spine_vision_tpu.io import read_medical_image
    from spine_vision_tpu.io.series import extract_isotropic_middle_slice
    from spine_vision_tpu.ops import normalize_to_uint8
    from spine_vision_tpu.ops.crop import crop_ivd_regions
    from spine_vision_tpu.ops.geometry import get_rotation_angles, mm_to_pixels

    tmp = None
    path = args.path
    if path is None:
        tmp = tempfile.TemporaryDirectory()
        path = synth_spine_volume(Path(tmp.name) / "synth_spine.mha")
        print(f"no input given — synthesized {path}")

    image = read_medical_image(path)
    middle, spacing = extract_isotropic_middle_slice(image, iso=0.3)
    h, w = middle.shape
    print(f"slice {middle.shape} @ {spacing} mm/px")

    if args.checkpoint is not None:
        from spine_vision_tpu.models.inference import regressor_test_inference

        model, variables = load_regressor(args.backbone, args.checkpoint, (512, 512))
        # Min-max to uint8 first — the model trains on normalized slices and
        # raw MR intensities would saturate the preprocessing.
        result = regressor_test_inference(
            model, variables, [np.asarray(normalize_to_uint8(middle))]
        )
        centers = np.asarray(result["coordinates"][0])
    else:
        centers = spine_centers_xy()
        print("no --checkpoint — using the synthetic volume's true disc path")

    locations = {i: (float(x), float(y)) for i, (x, y) in enumerate(centers)}
    angles = get_rotation_angles(
        locations, (h, w), last_disc_angle_boost=args.last_disc_angle_boost
    )
    for i, name in enumerate(LEVEL_NAMES):
        method = "quadratic" if i == len(LEVEL_NAMES) - 1 else "finite diff"
        print(f"  {name}: {angles[i]:7.2f} deg ({method})")

    delta_px = mm_to_pixels(CROP_DELTA_MM, spacing)
    print(f"crop deltas (px): {delta_px}")

    ch, cw = CROP_SIZE
    angle_arr = np.asarray([angles[i] for i in range(len(LEVEL_NAMES))], np.float32)
    common = dict(
        image=jnp.asarray(middle),
        centers_xy=jnp.asarray(centers),
        crop_delta_px=jnp.asarray(delta_px, jnp.float32),
        crop_h=ch,
        crop_w=cw,
    )
    crops_h = np.asarray(
        crop_ivd_regions(angles_deg=jnp.zeros(len(LEVEL_NAMES)), separable=True, **common)
    )
    crops_r = np.asarray(crop_ivd_regions(angles_deg=jnp.asarray(angle_arr), **common))

    args.out_dir.mkdir(parents=True, exist_ok=True)

    fig, axes = plt.subplots(5, 2, figsize=(8, 20))
    fig.suptitle("Horizontal vs Rotated Crops", fontsize=14, fontweight="bold")
    for i, name in enumerate(LEVEL_NAMES):
        axes[i, 0].imshow(crops_h[i], cmap="gray")
        axes[i, 0].set_title(f"{name} — horizontal (0°)", fontsize=10)
        axes[i, 1].imshow(crops_r[i], cmap="gray")
        axes[i, 1].set_title(f"{name} — rotated ({angle_arr[i]:.1f}°)", fontsize=10)
        for ax in axes[i]:
            ax.axis("off")
    grid_out = args.out_dir / "crop_modes_grid.png"
    fig.savefig(grid_out, bbox_inches="tight", dpi=110)
    plt.close(fig)

    display = np.asarray(normalize_to_uint8(middle))
    fig, axes = plt.subplots(1, 2, figsize=(16, 10))
    for ax, mode, angs, color in (
        (axes[0], "Horizontal", np.zeros_like(angle_arr), "cyan"),
        (axes[1], "Rotated", angle_arr, "red"),
    ):
        ax.imshow(display, cmap="gray")
        ax.set_title(f"{mode} crop regions", fontsize=12, fontweight="bold")
        for i, (x, y) in enumerate(centers):
            cx, cy = x * w, y * h
            poly = crop_corners((cx, cy), delta_px, angs[i])
            ax.plot(*np.vstack([poly, poly[:1]]).T, color=color, lw=2)
            ax.scatter([cx], [cy], c="yellow", s=50, marker="x")
        ax.axis("off")
    overlay_out = args.out_dir / "crop_regions_overlay.png"
    fig.savefig(overlay_out, bbox_inches="tight", dpi=110)
    plt.close(fig)

    print(f"saved {grid_out} and {overlay_out}")
    if tmp is not None:
        tmp.cleanup()


if __name__ == "__main__":
    main()

"""Load a localization model and overlay predicted IVD centers
(reference notebooks/test_localization_model.ipynb).

Given a trained run directory (``weights/localization/<run_id>``, as
produced by ``spine-vision-tpu train localization``), this loads the
checkpoint, predicts the five disc centers on the isotropic middle slice
of an input image (or a synthesized spine volume), prints the normalized
coordinates, and saves a scatter overlay — the notebook's
``load_localization_model`` → ``predict_ivd_locations`` → seaborn overlay
flow (reference datasets/classification/localization.py) on this
framework's ``CoordinateRegressor`` + ``regressor_test_inference``.

Without ``--checkpoint`` the model is randomly initialized: the plot then
only demonstrates the API, not a meaningful prediction.

Usage:
    python examples/02_localization_predict.py [IMAGE ...] \
        [--checkpoint RUN_DIR/best_model] [--backbone convnext_base] [--cpu]
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
    synth_spine_volume,
)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("paths", nargs="*", type=Path)
    parser.add_argument("--checkpoint", type=Path, default=None)
    parser.add_argument("--backbone", default="convnext_base")
    parser.add_argument("--image-size", type=int, nargs=2, default=(512, 512))
    parser.add_argument("--out-dir", type=Path, default=Path("output/localization"))
    add_cpu_flag(parser)
    args = parser.parse_args()
    maybe_force_cpu(args)

    from spine_vision_tpu.io import read_medical_image
    from spine_vision_tpu.io.series import extract_isotropic_middle_slice
    from spine_vision_tpu.models.inference import regressor_test_inference
    from spine_vision_tpu.ops import normalize_to_uint8

    paths = list(args.paths)
    tmp = None
    if not paths:
        tmp = tempfile.TemporaryDirectory()
        paths = [synth_spine_volume(Path(tmp.name) / "synth_spine.mha")]
        print(f"no input given — synthesized {paths[0]}")

    model, variables = load_regressor(
        args.backbone, args.checkpoint, tuple(args.image_size)
    )

    args.out_dir.mkdir(parents=True, exist_ok=True)
    for path in paths:
        image = read_medical_image(path)
        middle, _spacing = extract_isotropic_middle_slice(image)
        # Match the training input distribution: per-slice min-max to uint8
        # (raw MR intensities would saturate the uint8 conversion inside
        # the preprocessing).
        display = np.asarray(normalize_to_uint8(middle))
        result = regressor_test_inference(
            model, variables, [display], image_size=tuple(args.image_size)
        )
        coords = result["coordinates"][0]  # [5, 2] normalized (x, y)
        print(f"{path.name} ({result['inference_time_ms']:.1f} ms):")
        for name, (x, y) in zip(LEVEL_NAMES, coords):
            print(f"  {name}: ({x:.4f}, {y:.4f})")

        h, w = display.shape
        fig, ax = plt.subplots(figsize=(8, 10))
        ax.imshow(display, cmap="gray")
        cmap = plt.get_cmap("tab10")
        for i, (name, (x, y)) in enumerate(zip(LEVEL_NAMES, coords)):
            ax.scatter([x * w], [y * h], marker="x", s=200, linewidth=3,
                       color=cmap(i), label=name)
        ax.legend(bbox_to_anchor=(1.05, 1), loc="upper left", title="Locations")
        ax.axis("off")
        out = args.out_dir / f"{path.stem or path.name}_localization.png"
        fig.savefig(out, bbox_inches="tight", dpi=120)
        plt.close(fig)
        print(f"  overlay -> {out}")

    if tmp is not None:
        tmp.cleanup()


if __name__ == "__main__":
    main()

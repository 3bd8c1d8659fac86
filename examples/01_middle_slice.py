"""Middle-slice extraction sanity check (reference notebooks/test_middle_slice.ipynb).

Reads a medical image (DICOM series dir, .mha, .nii[.gz], .nrrd — or a
synthesized volume when no path is given), extracts the isotropic middle
sagittal slice, normalizes to uint8, and writes a PNG. Mirrors the
reference's ``read_medical_image`` → ``resample_to_isotropic`` →
``extract_middle_slice`` → ``normalize_to_uint8`` chain
(reference datasets/classification/cropping.py:63-101, io/__init__.py:15-31)
via this framework's single-pass ``extract_isotropic_middle_slice``.

Usage:
    python examples/01_middle_slice.py [IMAGE_PATH ...] [--out-dir DIR] [--cpu]
"""

from __future__ import annotations

import argparse
import tempfile
from pathlib import Path

import numpy as np

from _synth import add_cpu_flag, maybe_force_cpu, synth_spine_volume


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("paths", nargs="*", type=Path, help="images or series dirs")
    parser.add_argument("--out-dir", type=Path, default=Path("output/slice"))
    parser.add_argument("--iso", type=float, default=0.5, help="isotropic mm")
    add_cpu_flag(parser)
    args = parser.parse_args()
    maybe_force_cpu(args)

    from spine_vision_tpu.io import read_medical_image
    from spine_vision_tpu.io.series import extract_isotropic_middle_slice
    from spine_vision_tpu.ops import normalize_to_uint8

    paths = list(args.paths)
    tmp = None
    if not paths:
        tmp = tempfile.TemporaryDirectory()
        paths = [synth_spine_volume(Path(tmp.name) / "synth_spine.mha")]
        print(f"no input given — synthesized {paths[0]}")

    args.out_dir.mkdir(parents=True, exist_ok=True)
    for path in paths:
        image = read_medical_image(path)
        middle, spacing = extract_isotropic_middle_slice(image, iso=args.iso)
        png = np.asarray(normalize_to_uint8(middle))
        out = args.out_dir / f"{path.stem or path.name}_middle.png"
        try:
            import cv2

            cv2.imwrite(str(out), png)
        except ImportError:  # PIL fallback
            from PIL import Image

            Image.fromarray(png).save(out)
        print(
            f"{path.name}: volume size={image.size} spacing={image.spacing} -> "
            f"middle slice {middle.shape} @ {spacing} mm/px -> {out}"
        )

    if tmp is not None:
        tmp.cleanup()


if __name__ == "__main__":
    main()

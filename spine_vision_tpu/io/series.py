"""Series preparation: decode -> isotropic middle sagittal slice + spacing.

The reference prepares each series by resampling the ENTIRE 3D volume to
0.3 mm isotropic and then keeping one middle sagittal slice
(cropping.py:37-79) — for a typical sagittal MRI that materializes ~200x
more voxels than are used. :func:`extract_isotropic_middle_slice` computes
the identical slice directly: separable linear interpolation commutes, so
the middle slice of ``orient(resample(volume))`` equals blending the two
native slices bracketing the target sagittal position, 2D-resampling the
remaining axes (corner-aligned, on device via hat-matrix matmuls), and
applying the orientation's in-plane permute/flip afterwards — exactly the
reference's operation order (resample, then orient, then slice).

Used by both the classification dataset builder and study inference, so
training-time and inference-time crops cannot diverge.
"""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from spine_vision_tpu.io.readers import read_medical_image
from spine_vision_tpu.io.types import MedicalImage

ISOTROPIC_MM = 0.3


def _corner_aligned_resize_2d(
    plane: np.ndarray, out_shape: tuple[int, int], scales: tuple[float, float]
) -> np.ndarray:
    """Bilinear 2D resize with ``src = out_index * scale`` coordinate mapping
    (the ITK/trilinear_resample convention), as two hat-matrix matmuls."""
    plane_j = jnp.asarray(plane, dtype=jnp.float32)
    mats = []
    for axis in range(2):
        n = plane.shape[axis]
        positions = jnp.clip(
            jnp.arange(out_shape[axis], dtype=jnp.float32) * scales[axis],
            0.0,
            n - 1.0,
        )
        grid = jnp.arange(n, dtype=jnp.float32)
        mats.append(
            jnp.maximum(0.0, 1.0 - jnp.abs(positions[:, None] - grid[None, :]))
        )
    return np.asarray(mats[0] @ plane_j @ mats[1].T)


def extract_isotropic_middle_slice(
    image: MedicalImage, iso: float = ISOTROPIC_MM
) -> tuple[np.ndarray, tuple[float, float]]:
    """Middle sagittal slice of the isotropically-resampled, LPI-oriented
    volume — without resampling the whole volume.

    Returns (slice [rows, cols] float32, (row, col) spacing in mm) — the
    same values as ``resample_to_isotropic`` + ``extract_middle_slice`` +
    ``slice_spacing``.
    """
    if image.metadata.get("is_2d"):
        # 2D inputs are still resampled in-plane to iso (the reference's
        # full resample applies to them too); rows are the y axis, cols x.
        # (_corner_aligned_resize_2d casts to float32 itself — no host copy.)
        plane = image.array[0]
        sx, sy = float(image.spacing[0]), float(image.spacing[1])
        out_shape = (
            int(round(plane.shape[0] * sy / iso)),
            int(round(plane.shape[1] * sx / iso)),
        )
        return _corner_aligned_resize_2d(
            plane, out_shape, (iso / sy, iso / sx)
        ), (iso, iso)

    arr = np.asarray(image.array)
    spacing = [float(s) for s in image.spacing]  # (x, y, z)
    sizes = image.size  # (x, y, z)
    out_size = [
        int(round(sizes[k] * spacing[k] / iso)) for k in range(3)
    ]
    scale = [iso / spacing[k] for k in range(3)]

    perm, flips = image.orientation_plan("LPI")

    # Middle index along the oriented x (L) axis, mapped back through the
    # post-resample flip to a resampled-native index, then to a source
    # coordinate (corner-aligned: src = idx * scale).
    slice_xyz_axis = perm[0]
    out_w = out_size[slice_xyz_axis]
    mid = out_w // 2
    native_idx = (out_w - 1 - mid) if flips[0] else mid
    x_src = float(
        np.clip(native_idx * scale[slice_xyz_axis], 0, sizes[slice_xyz_axis] - 1)
    )

    # Blend the two bracketing native slices (array is (z, y, x): xyz axis k
    # lives on array axis 2 - k).
    slice_arr_axis = 2 - slice_xyz_axis
    x0 = int(np.floor(x_src))
    x1 = min(x0 + 1, sizes[slice_xyz_axis] - 1)
    w = x_src - x0
    lo = np.take(arr, x0, axis=slice_arr_axis).astype(np.float32)
    hi = np.take(arr, x1, axis=slice_arr_axis).astype(np.float32)
    blended = (1.0 - w) * lo + w * hi

    # Remaining array axes, in order, and their xyz identities.
    remaining_arr_axes = [a for a in (0, 1, 2) if a != slice_arr_axis]
    remaining_xyz = [2 - a for a in remaining_arr_axes]
    plane = _corner_aligned_resize_2d(
        blended,
        (out_size[remaining_xyz[0]], out_size[remaining_xyz[1]]),
        (scale[remaining_xyz[0]], scale[remaining_xyz[1]]),
    )

    # Orientation's in-plane action (applied after resampling, matching the
    # reference order): rows = oriented z (xyz axis perm[2]), cols = oriented
    # y (perm[1]).
    row_xyz, col_xyz = perm[2], perm[1]
    if remaining_xyz[0] == row_xyz:
        out = plane
    else:
        out = plane.T
    if flips[2]:
        out = out[::-1, :]
    if flips[1]:
        out = out[:, ::-1]
    return np.ascontiguousarray(out), (iso, iso)


def prepare_series_slice(
    path: Path, iso: float = ISOTROPIC_MM
) -> tuple[np.ndarray, tuple[float, float]]:
    """Decode a series (DICOM dir / .mha / .nii / .nrrd) and return its
    isotropic middle sagittal slice + (row, col) spacing."""
    return extract_isotropic_middle_slice(read_medical_image(Path(path)), iso)

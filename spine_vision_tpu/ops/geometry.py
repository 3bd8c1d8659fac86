"""Geometry helpers: mm↔pixel conversion and spine-tangent rotation angles.

Pure-function ports of the reference crop geometry
(datasets/classification/cropping.py:149-255), vectorized so they can run
either on host numpy (dataset building) or inside jit (fused inference graph).
"""

from __future__ import annotations

import numpy as np


def mm_to_pixels(
    delta_mm: tuple[float, float, float, float],
    spacing: tuple[float, float],
) -> tuple[int, int, int, int]:
    """Convert crop deltas from millimeters to pixels.

    Args:
        delta_mm: Crop deltas (left, right, top, bottom) in mm.
        spacing: (row_spacing, col_spacing) in mm/pixel. Horizontal deltas
            (left/right) divide by column spacing, vertical by row spacing.

    Returns:
        (left, right, top, bottom) in integer pixels (round-half-away like
        python round on .5 banker's rounding — we use np.round to match the
        reference's int(round(...))).
    """
    row_spacing, col_spacing = spacing
    left_mm, right_mm, top_mm, bottom_mm = delta_mm
    return (
        int(round(left_mm / col_spacing)),
        int(round(right_mm / col_spacing)),
        int(round(top_mm / row_spacing)),
        int(round(bottom_mm / row_spacing)),
    )


def get_rotation_angles(
    ivd_locations: dict[int, tuple[float, float]],
    image_shape: tuple[int, int],
    last_disc_angle_boost: float = 1.0,
) -> dict[int, float]:
    """Rotation angle (degrees) per IVD level from the local spine tangent.

    The spine curve x(y) through the predicted disc centers gives a tangent
    dx/dy at each disc; the crop is rotated by ``-atan(dx/dy)`` to flatten the
    local tilt. Finite differences are used (forward at the top point, central
    in the middle, and a quadratic fit through the last three points for the
    bottom point, since lordosis curves sharply at L5/S1). The bottom angle is
    scaled by ``last_disc_angle_boost``.

    Parity with reference cropping.py:172-255.

    Args:
        ivd_locations: level index -> (x, y) normalized coordinates.
        image_shape: (H, W) used to denormalize.
        last_disc_angle_boost: Multiplier for the last (lowest) disc's angle.

    Returns:
        level index -> rotation angle in degrees (negated tangent angle).
    """
    if len(ivd_locations) < 2:
        return {level: 0.0 for level in ivd_locations}

    h, w = image_shape

    points = sorted(
        ((lvl, x * w, y * h) for lvl, (x, y) in ivd_locations.items()),
        key=lambda p: p[2],
    )
    n = len(points)
    angles: dict[int, float] = {}

    for i, (level_idx, px, py) in enumerate(points):
        if i == 0:
            _, nx, ny = points[i + 1]
            dy = ny - py
            dxdy = (nx - px) / dy if dy != 0 else 0.0
        elif i == n - 1:
            if n >= 3:
                last3 = points[-3:]
                y_vals = np.array([p[2] for p in last3])
                x_vals = np.array([p[1] for p in last3])
                a, b, _c = np.polyfit(y_vals, x_vals, deg=2)
                dxdy = 2.0 * a * py + b
            else:
                _, ppx, ppy = points[i - 1]
                dy = py - ppy
                dxdy = (px - ppx) / dy if dy != 0 else 0.0
        else:
            _, ppx, ppy = points[i - 1]
            _, nx, ny = points[i + 1]
            dy = ny - ppy
            dxdy = (nx - ppx) / dy if dy != 0 else 0.0

        angle_deg = float(np.degrees(np.arctan(dxdy)))
        if i == n - 1:
            angle_deg *= last_disc_angle_boost
        angles[level_idx] = -angle_deg

    return angles


def rotation_angles_array(
    centers_xy: np.ndarray,
    image_shape: tuple[int, int],
    last_disc_angle_boost: float = 1.0,
) -> np.ndarray:
    """Vectorized rotation angles for an ordered [L, 2] array of centers.

    Assumes centers are already ordered top-to-bottom (L1/L2 .. L5/S1), which
    holds for model predictions; equivalent to :func:`get_rotation_angles`
    when the y-sort is the identity.

    Args:
        centers_xy: [L, 2] normalized (x, y) coordinates, ordered by level.
        image_shape: (H, W).
        last_disc_angle_boost: Multiplier for the last disc's angle.

    Returns:
        [L] rotation angles in degrees.
    """
    locations = {
        i: (float(x), float(y)) for i, (x, y) in enumerate(np.asarray(centers_xy))
    }
    angle_map = get_rotation_angles(locations, image_shape, last_disc_angle_boost)
    return np.array([angle_map[i] for i in range(len(locations))], dtype=np.float32)

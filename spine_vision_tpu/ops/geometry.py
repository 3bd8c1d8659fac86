"""Geometry helpers: mm↔pixel conversion and spine-tangent rotation angles.

Pure-function ports of the reference crop geometry
(datasets/classification/cropping.py:149-255), vectorized so they can run
either on host numpy (dataset building) or inside jit (fused inference graph).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import Array


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


def mm_to_pixels_jax(delta_mm: Array, spacing_rc: Array) -> Array:
    """Traced mm->pixel crop deltas (left, right, top, bottom).

    Args:
        delta_mm: [4] (left, right, top, bottom) in mm.
        spacing_rc: [2] (row_spacing, col_spacing) mm/pixel.

    Returns:
        [4] float deltas in pixels (rounded, matching :func:`mm_to_pixels`).
    """
    delta_mm = jnp.asarray(delta_mm, dtype=jnp.float32)
    divisor = jnp.stack(
        [spacing_rc[1], spacing_rc[1], spacing_rc[0], spacing_rc[0]]
    ).astype(jnp.float32)
    return jnp.round(delta_mm / divisor)


def rotation_angles_jax(
    centers_xy: Array,
    image_hw: Array,
    last_disc_angle_boost: float | Array = 1.0,
) -> Array:
    """Traced spine-tangent rotation angles for ordered [L, 2] centers.

    Jit-compatible equivalent of :func:`rotation_angles_array` (L >= 3,
    centers ordered top-to-bottom as the model emits them): forward
    difference at the first disc, central differences in the middle, and the
    derivative of the quadratic through the last three discs at the last disc
    (Newton divided differences replace np.polyfit). Angle is negated to
    flatten the local tilt; the last angle is scaled by the boost
    (reference cropping.py:172-255).

    Args:
        centers_xy: [L, 2] normalized (x, y), ordered by level.
        image_hw: [2] (H, W) used to denormalize.
        last_disc_angle_boost: Multiplier for the last disc's angle.

    Returns:
        [L] rotation angles in degrees (float32).
    """
    centers_xy = jnp.asarray(centers_xy, dtype=jnp.float32)
    hw = jnp.asarray(image_hw, dtype=jnp.float32)
    x = centers_xy[:, 0] * hw[1]
    y = centers_xy[:, 1] * hw[0]
    num = x.shape[0]

    def safe_div(a: Array, b: Array) -> Array:
        return jnp.where(b != 0, a / jnp.where(b != 0, b, 1.0), 0.0)

    # Central differences for interior points; forward difference at index 0.
    dxdy = jnp.zeros((num,), dtype=jnp.float32)
    dxdy = dxdy.at[0].set(safe_div(x[1] - x[0], y[1] - y[0]))
    if num > 2:
        interior = safe_div(x[2:] - x[:-2], y[2:] - y[:-2])
        dxdy = dxdy.at[1:-1].set(interior)
        # Quadratic through the last three points, derivative at the last.
        y0, y1, y2 = y[-3], y[-2], y[-1]
        x0, x1, x2 = x[-3], x[-2], x[-1]
        f01 = safe_div(x1 - x0, y1 - y0)
        f12 = safe_div(x2 - x1, y2 - y1)
        a = safe_div(f12 - f01, y2 - y0)
        dxdy = dxdy.at[-1].set(f01 + a * (2.0 * y2 - y0 - y1))
    else:
        dxdy = dxdy.at[-1].set(safe_div(x[-1] - x[-2], y[-1] - y[-2]))

    angles = -jnp.degrees(jnp.arctan(dxdy))
    return angles.at[-1].multiply(jnp.float32(last_disc_angle_boost))

"""Fused IVD crop kernel: rotate + crop + normalize + letterbox in one pass.

The reference implements this as a host-side cv2 chain per level
(datasets/classification/cropping.py:258-354): warpAffine of the *entire*
image around the disc center, an axis-aligned clipped crop, min-max uint8
normalization of the crop, cv2 bilinear resize, and zero-padded letterboxing.

TPU-native formulation: for each of the L levels, directly sample the final
(crop_h, crop_w) letterboxed output from the source image through the
composed inverse transform

    output pixel -> letterbox window -> crop window -> inverse rotation
    around the disc center -> bilinear sample of the source image,

so no rotated intermediate is ever materialized. The crop's min/max (needed
for normalization parity) comes from a gather-free masked reduce over source
pixels whose forward-rotated position lands inside the crop rect (exact in
horizontal mode; see pass-A comment). Both passes are vmapped over levels and
fused by XLA; the whole thing runs inside one jit.

Dynamic quantities (disc centers, crop extents from per-study mm spacing,
clipping at image borders) are traced scalars; only the output size is
static, keeping one compiled program per image shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array


def _inverse_rotation_coords(
    xr: Array, yr: Array, cx: Array, cy: Array, angle_deg: Array
) -> tuple[Array, Array]:
    """Map rotated-image coords to source coords (cv2.getRotationMatrix2D^-1).

    cv2's rotation matrix about center (cx, cy) with angle θ maps source→
    rotated; sampling the rotated image at (xr, yr) therefore reads the source
    at the rotation by -θ about the same center.
    """
    theta = jnp.deg2rad(angle_deg)
    a = jnp.cos(theta)
    b = jnp.sin(theta)
    xs = a * xr - b * yr + (1.0 - a) * cx + b * cy
    ys = b * xr + a * yr - b * cx + (1.0 - a) * cy
    return xs, ys


def _bilinear(image: Array, ys: Array, xs: Array, h: Array, w: Array) -> Array:
    """Bilinear sample with border replication against *actual* extent (h, w).

    ``image`` may be padded beyond (h, w); clamping against the actual extent
    reproduces cv2 BORDER_REPLICATE on the real image.
    """
    ys = jnp.clip(ys, 0.0, h.astype(jnp.float32) - 1.0)
    xs = jnp.clip(xs, 0.0, w.astype(jnp.float32) - 1.0)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = ys - y0
    wx = xs - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, h - 1)
    x1i = jnp.minimum(x0i + 1, w - 1)

    v00 = image[y0i, x0i]
    v01 = image[y0i, x1i]
    v10 = image[y1i, x0i]
    v11 = image[y1i, x1i]
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


def _forward_rotation_coords(
    xs: Array, ys: Array, cx: Array, cy: Array, angle_deg: Array
) -> tuple[Array, Array]:
    """Map source coords to rotated-image coords (inverse of
    :func:`_inverse_rotation_coords`)."""
    theta = jnp.deg2rad(angle_deg)
    a = jnp.cos(theta)
    b = jnp.sin(theta)
    u = xs - ((1.0 - a) * cx + b * cy)
    v = ys - (-b * cx + (1.0 - a) * cy)
    return a * u + b * v, -b * u + a * v


def _crop_one_level(
    image: Array,
    h: Array,
    w: Array,
    center_xy: Array,
    angle_deg: Array,
    delta_px: Array,
    crop_h: int,
    crop_w: int,
    separable: bool = False,
) -> Array:
    """Produce one letterboxed uint8 crop for a single level (see module doc)."""
    image = image.astype(jnp.float32)
    hf = h.astype(jnp.float32)
    wf = w.astype(jnp.float32)

    cx = jnp.floor(center_xy[0] * wf)  # int(center_x * w) truncation
    cy = jnp.floor(center_xy[1] * hf)

    left, right, top, bottom = delta_px[0], delta_px[1], delta_px[2], delta_px[3]
    x1 = jnp.maximum(0.0, cx - left)
    x2 = jnp.minimum(wf, cx + right)
    y1 = jnp.maximum(0.0, cy - top)
    y2 = jnp.minimum(hf, cy + bottom)
    ch = jnp.maximum(y2 - y1, 1.0)
    cw = jnp.maximum(x2 - x1, 1.0)

    # ---- Pass A: crop min/max via a masked reduce over source pixels ----
    # Gather-free (TPU gathers serialize): a source pixel contributes when
    # its forward-rotated position lands in the crop rect. For horizontal
    # mode this is EXACTLY the reference's min/max (the crop samples are
    # integer source pixels); for rotated mode extremes of the bilinear
    # samples are bounded by these source extremes, so the normalization
    # differs by at most the local interpolation error.
    hp, wp = image.shape
    gy = jnp.arange(hp, dtype=jnp.float32)[:, None]
    gx = jnp.arange(wp, dtype=jnp.float32)[None, :]
    xr_f, yr_f = _forward_rotation_coords(gx, gy, cx, cy, angle_deg)
    inside = (
        (xr_f >= x1)
        & (xr_f <= x2 - 1.0)
        & (yr_f >= y1)
        & (yr_f <= y2 - 1.0)
        & (gy < hf)
        & (gx < wf)
    )
    big = jnp.float32(3.4e38)
    crop_min = jnp.min(jnp.where(inside, image, big))
    crop_max = jnp.max(jnp.where(inside, image, -big))
    inv_range = jnp.where(
        crop_max - crop_min > 0, 1.0 / jnp.maximum(crop_max - crop_min, 1e-12), 0.0
    )

    # ---- Pass B: fused letterbox sampling of the final output grid ----
    scale = jnp.minimum(crop_h / ch, crop_w / cw)
    new_h = jnp.round(ch * scale)
    new_w = jnp.round(cw * scale)
    y_off = jnp.floor((crop_h - new_h) / 2.0)
    x_off = jnp.floor((crop_w - new_w) / 2.0)

    oy = jnp.arange(crop_h, dtype=jnp.float32)[:, None]
    ox = jnp.arange(crop_w, dtype=jnp.float32)[None, :]
    out_valid = (
        (oy >= y_off) & (oy < y_off + new_h) & (ox >= x_off) & (ox < x_off + new_w)
    )
    # Half-pixel-center resize mapping from output pixel to crop coords,
    # clamped to the crop window so resize border handling replicates the
    # crop's own edge pixels (cv2.resize of the subarray), not source pixels
    # beyond the crop boundary.
    ycr = (oy - y_off + 0.5) * (ch / jnp.maximum(new_h, 1.0)) - 0.5
    xcr = (ox - x_off + 0.5) * (cw / jnp.maximum(new_w, 1.0)) - 0.5
    ycr = jnp.clip(ycr, 0.0, ch - 1.0)
    xcr = jnp.clip(xcr, 0.0, cw - 1.0)
    if separable:
        # Horizontal mode: row/col sampling coordinates are independent, so
        # the bilinear resample is two hat-matrix matmuls on the MXU instead
        # of XLA gathers (which serialize on TPU; see ops.image.resize_dynamic).
        hp, wp = image.shape
        ys_o = jnp.clip(y1 + ycr[:, 0], 0.0, hf - 1.0)  # [crop_h]
        xs_o = jnp.clip(x1 + xcr[0, :], 0.0, wf - 1.0)  # [crop_w]
        rows = jnp.arange(hp, dtype=jnp.float32)
        cols = jnp.arange(wp, dtype=jnp.float32)
        r_mat = jnp.maximum(0.0, 1.0 - jnp.abs(ys_o[:, None] - rows[None, :]))
        c_mat = jnp.maximum(0.0, 1.0 - jnp.abs(xs_o[:, None] - cols[None, :]))
        vals = r_mat @ image @ c_mat.T
    else:
        yr_o = y1 + jnp.broadcast_to(ycr, (crop_h, crop_w))
        xr_o = x1 + jnp.broadcast_to(xcr, (crop_h, crop_w))
        xs_o, ys_o = _inverse_rotation_coords(xr_o, yr_o, cx, cy, angle_deg)
        vals = _bilinear(image, ys_o, xs_o, h, w)

    norm = (vals - crop_min) * inv_range * 255.0
    out = jnp.where(out_valid, norm, 0.0)
    return jnp.clip(out, 0.0, 255.0).astype(jnp.uint8)


def crop_ivd_regions_impl(
    image: Array,
    centers_xy: Array,
    angles_deg: Array,
    crop_delta_px: Array,
    crop_h: int = 256,
    crop_w: int = 256,
    image_hw: Array | None = None,
    separable: bool = False,
) -> Array:
    """Crop all IVD levels from one image in a single fused device pass.

    Subsumes the reference's ``crop_region_rotated`` / ``crop_region_horizontal``
    + ``normalize_to_uint8`` + ``resize_with_padding`` chain
    (cropping.py:104-354): pass ``angles_deg = zeros`` for horizontal mode.

    Args:
        image: [H, W] source image (any numeric dtype; may be padded).
        centers_xy: [L, 2] normalized (x, y) disc centers.
        angles_deg: [L] rotation angles in degrees (0 = horizontal mode).
        crop_delta_px: [4] crop deltas (left, right, top, bottom) in pixels
            (traced; computed from per-study mm spacing).
        crop_h, crop_w: Static output crop size.
        image_hw: Optional [2] actual (h, w) when ``image`` is padded.
        separable: Static fast path for horizontal mode (angles all zero):
            the letterbox resample runs as MXU matmuls instead of gathers.

    Returns:
        [L, crop_h, crop_w] uint8 letterboxed crops.
    """
    if image_hw is None:
        h = jnp.int32(image.shape[0])
        w = jnp.int32(image.shape[1])
    else:
        h = image_hw[0].astype(jnp.int32)
        w = image_hw[1].astype(jnp.int32)

    delta = crop_delta_px.astype(jnp.float32)
    fn = functools.partial(
        _crop_one_level,
        image,
        h,
        w,
        crop_h=crop_h,
        crop_w=crop_w,
        separable=separable,
    )
    return jax.vmap(lambda c, a: fn(c, a, delta))(
        centers_xy.astype(jnp.float32), angles_deg.astype(jnp.float32)
    )


crop_ivd_regions = functools.partial(
    jax.jit, static_argnames=("crop_h", "crop_w", "separable")
)(crop_ivd_regions_impl)
"""Jitted entry point for :func:`crop_ivd_regions_impl` (one image).

The unjitted ``_impl`` is exposed for composition (vmap over studies inside
the fused inference graph, infer/pipeline.py)."""

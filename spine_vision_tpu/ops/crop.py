"""Fused IVD crop kernel: rotate + crop + normalize + letterbox in one pass.

The reference implements this as a host-side cv2 chain per level
(datasets/classification/cropping.py:258-354): warpAffine of the *entire*
image around the disc center, an axis-aligned clipped crop, min-max uint8
normalization of the crop, cv2 bilinear resize, and zero-padded letterboxing.

TPU-native formulation — entirely gather-free (per-element XLA gathers
serialize ~50x off roofline on TPU, see AGENTS.md perf lore):

1. Rotated mode pre-rotates the source with a 3-shear decomposition
   (Paeth/Catmull-Smith: ``R(-θ) = Sx(-tan(θ/2)) · Sy(sinθ) · Sx(-tan(θ/2))``,
   exact in coordinates). Each shear is a 1-D resample whose shift varies
   linearly across lines; lines are processed in blocks of 64 around a
   per-block integer base shift fetched with one *contiguous* dynamic slice,
   and the residual sub-block shift is a small static band of weighted taps.
   No per-element indexing ever occurs.
2. The crop's min/max (normalization parity) is a masked reduce over the
   (pre-rotated) work image inside the axis-aligned crop rect — exactly the
   pixel set the reference normalizes over, in both modes.
3. The letterboxed output grid is sampled from the work image with
   separable hat-function (triangle-kernel) matmuls on the MXU.

Dynamic quantities (disc centers, crop extents from per-study mm spacing,
rotation angles, clipping at image borders) are traced scalars; only the
output size and the maximum rotation magnitude are static, keeping one
compiled program per image shape.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import Array

_SHEAR_BLOCK = 64


def _replicate_extend(image: Array, h: Array, w: Array) -> Array:
    """Fill the padding region beyond the actual (h, w) extent with edge
    values, so later whole-array ops see cv2 BORDER_REPLICATE semantics."""
    hp, wp = image.shape
    edge_row = jax.lax.dynamic_slice_in_dim(
        image, jnp.maximum(h - 1, 0), 1, axis=0
    )
    image = jnp.where(jnp.arange(hp)[:, None] < h, image, edge_row)
    edge_col = jax.lax.dynamic_slice_in_dim(
        image, jnp.maximum(w - 1, 0), 1, axis=1
    )
    return jnp.where(jnp.arange(wp)[None, :] < w, image, edge_col)


def _shear_cols(
    img: Array,
    slope: Array,
    line_center: Array,
    max_slope: float,
    max_shift: float,
) -> Array:
    """Horizontal shear ``out[y, x] = img[y, x + slope * (y - line_center)]``
    with bilinear interpolation and edge replication, correct for rows whose
    shift magnitude stays within ``max_shift`` (shifts are clamped there, so
    rows further out produce bounded garbage the rotation's reach analysis
    guarantees is never read).

    Gather-free realization: rows are processed in blocks of ``_SHEAR_BLOCK``;
    each block reads one contiguous dynamic slice at its integer base shift,
    then accumulates a static band of ``2*T+1`` shifted-window taps weighted
    by per-row hat functions. ``max_slope`` (static) bounds the band size;
    the caller guarantees ``|slope| <= max_slope``. ``max_shift`` (static)
    bounds the horizontal padding instead of ``max_slope * height``, keeping
    HBM traffic proportional to the image, not to worst-case shear travel.
    """
    hp, wp = img.shape
    g = _SHEAR_BLOCK
    nb = -(-hp // g)
    hpad = nb * g
    t_band = int(math.ceil(max_slope * g / 2.0)) + 2
    pmax = int(math.ceil(max_shift)) + t_band + 2
    img_p = jnp.pad(img, ((0, hpad - hp), (pmax, pmax)), mode="edge")
    ys = jnp.arange(hpad, dtype=jnp.float32)
    shift = jnp.clip(slope * (ys - line_center), -max_shift, max_shift)

    def block(b: Array) -> Array:
        y0 = b * g
        sh = jax.lax.dynamic_slice_in_dim(shift, y0, g)
        base = jnp.floor(
            jnp.clip(
                slope * (y0.astype(jnp.float32) + g / 2.0 - line_center),
                -max_shift,
                max_shift,
            )
        )
        start_col = (pmax - t_band) + base.astype(jnp.int32)
        win = jax.lax.dynamic_slice(img_p, (y0, start_col), (g, wp + 2 * t_band))
        rel = sh - base + t_band  # [g]; in-reach taps live in [1, 2*t_band]
        acc = jnp.zeros((g, wp), jnp.float32)
        for t in range(2 * t_band + 1):
            wgt = jnp.maximum(0.0, 1.0 - jnp.abs(rel - t))
            acc = acc + win[:, t : t + wp] * wgt[:, None]
        return acc

    out = jax.lax.map(block, jnp.arange(nb))
    return out.reshape(hpad, wp)[:hp]


def _rotate_about_replicate(
    image: Array,
    h: Array,
    w: Array,
    cx: Array,
    cy: Array,
    angle_deg: Array,
    max_angle_deg: float,
    reach_px: float,
) -> Array:
    """cv2.warpAffine(getRotationMatrix2D((cx, cy), angle, 1.0)) with
    BORDER_REPLICATE, as three gather-free shears — correct within
    ``reach_px`` of the center, arbitrary elsewhere.

    Sampling map is ``src = c + R_inv @ (dest - c)`` with
    ``R_inv = [[cosθ, -sinθ], [sinθ, cosθ]]`` (cv2 angle convention, y-down),
    decomposed exactly as ``Sx(α) · Sy(β) · Sx(α)`` for ``α = -tan(θ/2)``,
    ``β = sinθ``. Angles are clamped to ±max_angle_deg (static), which sizes
    the shear tap bands. Only the axis-aligned crop rect around the center is
    ever read downstream, so each pass's shift is clamped at the statically
    backward-propagated reach of that rect (region R3 = rect; pass 3 needs
    pass-2 content out to R2x = R + α·R rows/cols; pass 2 needs pass-1 out to
    R1y = R + β·R2x; shifts beyond each pass's reach are clamped, bounding
    padding and HBM traffic by ``reach_px`` instead of the image diagonal).
    Interpolation differs from the single-pass cv2 warp only by the extra
    bilinear smoothing of the multi-pass resampling.
    """
    angle = jnp.clip(angle_deg, -max_angle_deg, max_angle_deg)
    theta = jnp.deg2rad(angle)
    alpha = -jnp.tan(theta / 2.0)
    beta = jnp.sin(theta)
    max_alpha = math.tan(math.radians(max_angle_deg) / 2.0)
    max_beta = math.sin(math.radians(max_angle_deg))
    r = float(reach_px)
    s3_max = max_alpha * r
    r2x = r + s3_max
    s2_max = max_beta * r2x
    r1y = r + s2_max
    s1_max = max_alpha * r1y
    work = _replicate_extend(image, h, w)
    work = _shear_cols(work, alpha, cy, max_alpha, s1_max)
    work = _shear_cols(work.T, beta, cx, max_beta, s2_max).T
    return _shear_cols(work, alpha, cy, max_alpha, s3_max)


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
    max_angle_deg: float = 40.0,
    max_crop_px: int = 384,
) -> Array:
    """Produce one letterboxed uint8 crop for a single level (see module doc)."""
    image = image.astype(jnp.float32)
    hf = h.astype(jnp.float32)
    wf = w.astype(jnp.float32)

    cx = jnp.floor(center_xy[0] * wf)  # int(center_x * w) truncation
    cy = jnp.floor(center_xy[1] * hf)

    if not separable:
        # The rotation's correctness reach is static; keep the crop rect
        # inside it (default 384 px is ~2x the largest reference mm delta at
        # the 0.3 mm isotropic spacing the pipeline standardizes on).
        delta_px = jnp.minimum(delta_px, float(max_crop_px))
    left, right, top, bottom = delta_px[0], delta_px[1], delta_px[2], delta_px[3]
    x1 = jnp.maximum(0.0, cx - left)
    x2 = jnp.minimum(wf, cx + right)
    y1 = jnp.maximum(0.0, cy - top)
    y2 = jnp.minimum(hf, cy + bottom)
    ch = jnp.maximum(y2 - y1, 1.0)
    cw = jnp.maximum(x2 - x1, 1.0)

    if not separable:
        # Rotated mode (also exact identity when angle == 0): pre-rotate the
        # whole image about the disc center, mirroring the reference's
        # warpAffine-then-axis-aligned-crop (cropping.py:258-313). Everything
        # downstream is then identical to horizontal mode.
        image = _rotate_about_replicate(
            image, h, w, cx, cy, angle_deg, max_angle_deg, float(max_crop_px)
        )

    # ---- Pass A: crop min/max over the work image inside the crop rect ----
    # Exactly the pixel set the reference's normalize_to_uint8 reduces over
    # (the clipped crop of the (possibly warped) image), via a gather-free
    # masked reduce.
    hp, wp = image.shape
    gy = jnp.arange(hp, dtype=jnp.float32)[:, None]
    gx = jnp.arange(wp, dtype=jnp.float32)[None, :]
    inside = (
        (gx >= x1)
        & (gx <= x2 - 1.0)
        & (gy >= y1)
        & (gy <= y2 - 1.0)
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
    # Row/col sampling coordinates are independent (the work image is
    # axis-aligned in both modes now), so the bilinear resample is two
    # hat-matrix matmuls on the MXU instead of XLA gathers.
    ys_o = jnp.clip(y1 + ycr[:, 0], 0.0, hf - 1.0)  # [crop_h]
    xs_o = jnp.clip(x1 + xcr[0, :], 0.0, wf - 1.0)  # [crop_w]
    rows = jnp.arange(hp, dtype=jnp.float32)
    cols = jnp.arange(wp, dtype=jnp.float32)
    r_mat = jnp.maximum(0.0, 1.0 - jnp.abs(ys_o[:, None] - rows[None, :]))
    c_mat = jnp.maximum(0.0, 1.0 - jnp.abs(xs_o[:, None] - cols[None, :]))
    vals = r_mat @ image @ c_mat.T

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
    max_angle_deg: float = 40.0,
    max_crop_px: int = 384,
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
            skips the (identity) pre-rotation entirely.
        max_angle_deg: Static clamp on rotation magnitude; sizes the shear
            tap bands of the gather-free rotation.
        max_crop_px: Static bound on crop deltas in rotated mode; sizes the
            rotation's correctness reach (deltas are clamped to it).

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
        max_angle_deg=max_angle_deg,
        max_crop_px=max_crop_px,
    )
    return jax.vmap(lambda c, a: fn(c, a, delta))(
        centers_xy.astype(jnp.float32), angles_deg.astype(jnp.float32)
    )


crop_ivd_regions = functools.partial(
    jax.jit, static_argnames=("crop_h", "crop_w", "separable", "max_angle_deg", "max_crop_px")
)(crop_ivd_regions_impl)
"""Jitted entry point for :func:`crop_ivd_regions_impl` (one image).

The unjitted ``_impl`` is exposed for composition (vmap over studies inside
the fused inference graph, infer/pipeline.py)."""

"""Perspective rectification of text polygons on device.

Replaces the reference's cv2.getPerspectiveTransform + warpPerspective chain
(datasets/phenikaa/ocr.py:148-186): the 3x3 homography mapping the output
rectangle onto an arbitrary quadrilateral is solved as an 8x8 linear system,
and the output grid is bilinearly sampled through it. Batched over polygons
with a static output size so a page's worth of text boxes rectifies in one
fused device pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array

from spine_vision_tpu.ops.image import bilinear_sample


def perspective_matrix(src_quad: Array, dst_quad: Array) -> Array:
    """Homography H (3x3) with H @ [dst, 1] ~ [src, 1] for 4 correspondences.

    Args:
        src_quad: [4, 2] source (x, y) corners (quadrilateral in the image).
        dst_quad: [4, 2] destination corners (output rectangle).

    Returns:
        [3, 3] float32 matrix mapping destination -> source coordinates.
    """
    src = jnp.asarray(src_quad, dtype=jnp.float32)
    dst = jnp.asarray(dst_quad, dtype=jnp.float32)

    def row_pair(d, s):
        dx, dy = d[0], d[1]
        sx, sy = s[0], s[1]
        r1 = jnp.array([dx, dy, 1.0, 0.0, 0.0, 0.0, -dx * sx, -dy * sx])
        r2 = jnp.array([0.0, 0.0, 0.0, dx, dy, 1.0, -dx * sy, -dy * sy])
        return jnp.stack([r1, r2]), jnp.stack([sx, sy])

    rows, rhs = jax.vmap(row_pair)(dst, src)
    a = rows.reshape(8, 8)
    b = rhs.reshape(8)
    h8 = jnp.linalg.solve(a, b)
    return jnp.concatenate([h8, jnp.ones((1,))]).reshape(3, 3)


def _warp_one(
    image: Array, quad: Array, out_h: int, out_w: int,
    bounds: Array | None = None, offset: Array | None = None,
) -> Array:
    dst = jnp.array(
        [[0.0, 0.0], [out_w - 1.0, 0.0], [out_w - 1.0, out_h - 1.0], [0.0, out_h - 1.0]],
        dtype=jnp.float32,
    )
    h = perspective_matrix(quad, dst)
    ys = jnp.arange(out_h, dtype=jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)
    ones = jnp.ones_like(gx)
    pts = jnp.stack([gx, gy, ones], axis=0).reshape(3, -1)  # [3, HW]
    mapped = h @ pts
    sx = mapped[0] / mapped[2]
    sy = mapped[1] / mapped[2]
    if bounds is not None:
        # Per-quad local clamp (bounds = [y_hi, x_hi], lows are 0): makes an
        # edge-hanging quad replicate its OWN region's border exactly like a
        # standalone bilinear_sample clamp would.
        sy = jnp.clip(sy, 0.0, bounds[0])
        sx = jnp.clip(sx, 0.0, bounds[1])
    if offset is not None:
        # Translation applied AFTER the solve and clamp: the homography is
        # solved in local coordinates (numerically identical to a
        # single-region call — baking a large offset into the corners
        # degrades the f32 8x8 solve's conditioning), then shifted by an
        # exact integer.
        sy = sy + offset[0]
        sx = sx + offset[1]
    return bilinear_sample(image, sy.reshape(out_h, out_w), sx.reshape(out_h, out_w))


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def rectify_polygons(
    image: Array,
    quads: Array,
    out_h: int,
    out_w: int,
    bounds: Array | None = None,
    offsets: Array | None = None,
) -> Array:
    """Rectify a batch of quadrilaterals from one image.

    Args:
        image: [H, W] source image.
        quads: [N, 4, 2] polygon corners ordered TL, TR, BR, BL (x, y) —
            in LOCAL region coordinates when ``offsets`` is given.
        out_h, out_w: Static rectified patch size.
        bounds: Optional [N, 2] per-quad (y_hi, x_hi) local clamp for the
            sample coordinates (lows are 0). Used when several pages stack
            into one tall image (data/phenikaa/ocr.py batched
            rectification): a detector box hanging past its page edge must
            replicate THAT page's border, not bleed into the neighbor page.
        offsets: Optional [N, 2] per-quad (dy, dx) translation applied to
            the sample coordinates AFTER the homography solve and clamp —
            exact page placement without perturbing the solve.

    Returns:
        [N, out_h, out_w] float32 patches.
    """
    quads = quads.astype(jnp.float32)
    if bounds is None and offsets is None:
        return jax.vmap(lambda q: _warp_one(image, q, out_h, out_w))(quads)
    n = quads.shape[0]
    if bounds is None:
        bounds = jnp.tile(
            jnp.asarray(
                [image.shape[0] - 1.0, image.shape[1] - 1.0], jnp.float32
            ),
            (n, 1),
        )
    if offsets is None:
        offsets = jnp.zeros((n, 2), jnp.float32)
    return jax.vmap(
        lambda q, b, o: _warp_one(image, q, out_h, out_w, b, o)
    )(quads, bounds.astype(jnp.float32), offsets.astype(jnp.float32))

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
    image: Array, quad: Array, out_h: int, out_w: int
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
    return bilinear_sample(image, sy.reshape(out_h, out_w), sx.reshape(out_h, out_w))


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def rectify_polygons(
    image: Array, quads: Array, out_h: int, out_w: int
) -> Array:
    """Rectify a batch of quadrilaterals from one image.

    Args:
        image: [H, W] source image.
        quads: [N, 4, 2] polygon corners ordered TL, TR, BR, BL (x, y).
        out_h, out_w: Static rectified patch size.

    Returns:
        [N, out_h, out_w] float32 patches.
    """
    return jax.vmap(lambda q: _warp_one(image, q, out_h, out_w))(
        quads.astype(jnp.float32)
    )

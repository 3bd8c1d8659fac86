"""Isotropic volume resampling (trilinear) on device.

Replaces SimpleITK's ResampleImageFilter usage in the reference
(datasets/classification/cropping.py:37-60): identity transform, same
origin/direction, new spacing, linear interpolation. Under those conditions
the physical-space mapping reduces to a per-axis index scale

    src_index[k] = out_index[k] * new_spacing[k] / old_spacing[k]

(ITK indexes address voxel centers with index 0 at the origin, so the mapping
is corner-aligned with zero offset). The output extent is
``round(size * old_spacing / new_spacing)`` per axis, matching the reference.

The jitted kernel takes a static output shape; the host wrapper computes the
shape from spacings and dispatches (one compiled program per distinct shape —
callers that stream many studies should bucket shapes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array


@functools.partial(jax.jit, static_argnames=("out_shape",))
def trilinear_resample(
    volume: Array,
    scale_zyx: Array,
    out_shape: tuple[int, int, int],
) -> Array:
    """Trilinear-resample a 3D volume by per-axis index scaling.

    Args:
        volume: [D, H, W] input volume.
        scale_zyx: [3] per-axis ratio new_spacing/old_spacing in (z, y, x)
            index order (traced).
        out_shape: Static output shape (D', H', W').

    Returns:
        [D', H', W'] float32 volume.
    """
    volume = volume.astype(jnp.float32)
    d, h, w = volume.shape
    od, oh, ow = out_shape

    zc = jnp.arange(od, dtype=jnp.float32) * scale_zyx[0]
    yc = jnp.arange(oh, dtype=jnp.float32) * scale_zyx[1]
    xc = jnp.arange(ow, dtype=jnp.float32) * scale_zyx[2]

    zc = jnp.clip(zc, 0.0, d - 1.0)
    yc = jnp.clip(yc, 0.0, h - 1.0)
    xc = jnp.clip(xc, 0.0, w - 1.0)

    z0 = jnp.floor(zc).astype(jnp.int32)
    y0 = jnp.floor(yc).astype(jnp.int32)
    x0 = jnp.floor(xc).astype(jnp.int32)
    z1 = jnp.minimum(z0 + 1, d - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wz = (zc - z0)[:, None, None]
    wy = (yc - y0)[None, :, None]
    wx = (xc - x0)[None, None, :]

    # Gather the 8 corner lattices via advanced indexing (XLA gathers).
    def gather(zi: Array, yi: Array, xi: Array) -> Array:
        return volume[zi[:, None, None], yi[None, :, None], xi[None, None, :]]

    v000 = gather(z0, y0, x0)
    v001 = gather(z0, y0, x1)
    v010 = gather(z0, y1, x0)
    v011 = gather(z0, y1, x1)
    v100 = gather(z1, y0, x0)
    v101 = gather(z1, y0, x1)
    v110 = gather(z1, y1, x0)
    v111 = gather(z1, y1, x1)

    c00 = v000 * (1 - wx) + v001 * wx
    c01 = v010 * (1 - wx) + v011 * wx
    c10 = v100 * (1 - wx) + v101 * wx
    c11 = v110 * (1 - wx) + v111 * wx
    c0 = c00 * (1 - wy) + c01 * wy
    c1 = c10 * (1 - wy) + c11 * wy
    return c0 * (1 - wz) + c1 * wz


def resample_to_isotropic(
    volume: np.ndarray | Array,
    spacing_zyx: tuple[float, float, float],
    new_spacing_zyx: tuple[float, float, float] = (0.3, 0.3, 0.3),
) -> tuple[Array, tuple[float, float, float]]:
    """Resample a volume to uniform spacing (host wrapper).

    Args:
        volume: [D, H, W] array.
        spacing_zyx: Current voxel spacing (z, y, x) in mm.
        new_spacing_zyx: Target spacing (default 0.3 mm isotropic, matching
            reference ISOTROPIC_SPACING).

    Returns:
        (resampled [D', H', W'] float32 device array, new spacing tuple).
    """
    vol = jnp.asarray(volume)
    out_shape = tuple(
        int(round(sz * osp / nsp))
        for sz, osp, nsp in zip(vol.shape, spacing_zyx, new_spacing_zyx)
    )
    scale = jnp.asarray(
        [nsp / osp for osp, nsp in zip(spacing_zyx, new_spacing_zyx)],
        dtype=jnp.float32,
    )
    return trilinear_resample(vol, scale, out_shape), tuple(new_spacing_zyx)

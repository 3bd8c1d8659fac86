"""Jitted device kernels: losses, image ops, geometry, resampling, fused crops."""

from spine_vision_tpu.ops.crop import crop_ivd_regions, crop_ivd_regions_impl
from spine_vision_tpu.ops.geometry import (
    get_rotation_angles,
    mm_to_pixels,
    mm_to_pixels_jax,
    rotation_angles_array,
    rotation_angles_jax,
)
from spine_vision_tpu.ops.image import (
    bilinear_resize,
    bilinear_sample,
    grayscale_to_rgb01,
    imagenet_normalize,
    normalize_minmax,
    normalize_to_uint8,
    resize_dynamic,
    resize_with_padding,
)
from spine_vision_tpu.ops.resample import resample_to_isotropic, trilinear_resample
from spine_vision_tpu.ops.warp import perspective_matrix, rectify_polygons

__all__ = [
    "bilinear_resize",
    "bilinear_sample",
    "crop_ivd_regions",
    "crop_ivd_regions_impl",
    "get_rotation_angles",
    "grayscale_to_rgb01",
    "imagenet_normalize",
    "mm_to_pixels",
    "mm_to_pixels_jax",
    "normalize_minmax",
    "normalize_to_uint8",
    "perspective_matrix",
    "rectify_polygons",
    "resample_to_isotropic",
    "resize_dynamic",
    "resize_with_padding",
    "rotation_angles_array",
    "rotation_angles_jax",
    "trilinear_resample",
]

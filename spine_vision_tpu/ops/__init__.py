"""Jitted device kernels: losses, image ops, geometry, resampling, fused crops."""

from spine_vision_tpu.ops.crop import crop_ivd_regions
from spine_vision_tpu.ops.geometry import (
    get_rotation_angles,
    mm_to_pixels,
    rotation_angles_array,
)
from spine_vision_tpu.ops.image import (
    bilinear_resize,
    bilinear_sample,
    grayscale_to_rgb01,
    imagenet_normalize,
    normalize_minmax,
    normalize_to_uint8,
    resize_with_padding,
)
from spine_vision_tpu.ops.resample import resample_to_isotropic, trilinear_resample

__all__ = [
    "bilinear_resize",
    "bilinear_sample",
    "crop_ivd_regions",
    "get_rotation_angles",
    "grayscale_to_rgb01",
    "imagenet_normalize",
    "mm_to_pixels",
    "normalize_minmax",
    "normalize_to_uint8",
    "resample_to_isotropic",
    "resize_with_padding",
    "rotation_angles_array",
    "trilinear_resample",
]

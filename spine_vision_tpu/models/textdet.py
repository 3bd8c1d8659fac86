"""Text detection network (DB-style segmentation) for report OCR.

TPU-native replacement for the reference's PaddleOCR ``PP-OCRv5_server_det``
wrapper (datasets/phenikaa/ocr.py:24-80): a fully-convolutional
encoder/decoder predicts a shrunk-text probability map (Differentiable
Binarization formulation); box extraction from the bitmap is host-side
numpy (connected components + min-area quads). Runs batched under jit —
the reference detects one page at a time.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from jax import Array

from spine_vision_tpu.core.registry import register_model


class _ConvBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = nn.Conv(
            self.features,
            (3, 3),
            strides=(self.stride, self.stride),
            padding="SAME",
            use_bias=False,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(x)
        return nn.relu(x)


@register_model("text_detection")
class TextDetectionNet(nn.Module):
    """FCN text detector: [B, H, W, 1] -> probability map [B, H/2, W/2, 1].

    Encoder strides 2/2/2/2 with widths (32, 64, 128, 256); FPN-style top-down
    merge back to 1/2 resolution; 1x1 head + sigmoid. H and W must be
    multiples of 16.
    """

    width: int = 32
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        w = self.width
        x = x.astype(self.dtype)
        c1 = _ConvBlock(w, stride=2, dtype=self.dtype)(x, train)  # 1/2
        c1 = _ConvBlock(w, dtype=self.dtype)(c1, train)
        c2 = _ConvBlock(w * 2, stride=2, dtype=self.dtype)(c1, train)  # 1/4
        c2 = _ConvBlock(w * 2, dtype=self.dtype)(c2, train)
        c3 = _ConvBlock(w * 4, stride=2, dtype=self.dtype)(c2, train)  # 1/8
        c3 = _ConvBlock(w * 4, dtype=self.dtype)(c3, train)
        c4 = _ConvBlock(w * 8, stride=2, dtype=self.dtype)(c3, train)  # 1/16
        c4 = _ConvBlock(w * 8, dtype=self.dtype)(c4, train)

        def up(t: Array, like: Array) -> Array:
            b, h, win, c = like.shape
            return jnp.repeat(jnp.repeat(t, 2, axis=1), 2, axis=2)[:, :h, :win]

        p4 = _ConvBlock(w * 2, dtype=self.dtype)(c4, train)
        p3 = _ConvBlock(w * 2, dtype=self.dtype)(c3, train) + up(p4, c3)
        p2 = _ConvBlock(w * 2, dtype=self.dtype)(c2, train) + up(p3, c2)
        p1 = _ConvBlock(w * 2, dtype=self.dtype)(c1, train) + up(p2, c1)

        head = _ConvBlock(w, dtype=self.dtype)(p1, train)
        logits = nn.Conv(1, (1, 1), dtype=jnp.float32)(head)
        return nn.sigmoid(logits)


def extract_boxes_from_probmap(
    prob_map: np.ndarray,
    threshold: float = 0.3,
    min_area: int = 16,
    unclip_ratio: float = 1.3,
    scale: float = 2.0,
) -> np.ndarray:
    """Connected components of the binarized map -> axis-aligned quads.

    DB post-processing (host numpy): each component's bounding box is
    dilated by ``unclip_ratio`` (the prob map marks shrunk text kernels)
    and scaled back to input coordinates.

    The default ratio is tuned empirically against the trained detector:
    the shrink-0.3 target implies a geometric inverse of ~1.43, but the
    net predicts kernels slightly wider than the ideal target, so 1.3
    lands boxes closest to ground truth (1.8 over-expanded wide lines by
    ~100 px per side, wrecking downstream recognition — rectification
    squeezes the line and neighboring-row ink bleeds into the patch).

    Args:
        prob_map: [h, w] probabilities (model output, 1/scale resolution).
        threshold: Binarization threshold.
        min_area: Minimum component area in map pixels.
        unclip_ratio: Box dilation factor.
        scale: Upscale factor back to input-image coordinates.

    Returns:
        [N, 4, 2] float32 quads ordered TL, TR, BR, BL in image coordinates.
    """
    binary = prob_map >= threshold
    h, w = binary.shape
    try:
        import cv2

        current, labels, stats, _ = cv2.connectedComponentsWithStats(
            binary.astype(np.uint8), connectivity=4
        )
        current -= 1  # component 0 is background
        boxes = [
            (
                stats[label, cv2.CC_STAT_LEFT],
                stats[label, cv2.CC_STAT_LEFT] + stats[label, cv2.CC_STAT_WIDTH],
                stats[label, cv2.CC_STAT_TOP],
                stats[label, cv2.CC_STAT_TOP] + stats[label, cv2.CC_STAT_HEIGHT],
                stats[label, cv2.CC_STAT_AREA],
            )
            for label in range(1, current + 1)
        ]
    except ImportError:  # pure-Python fallback (slow on full pages)
        labels = np.zeros((h, w), dtype=np.int32)
        current = 0
        for sy in range(h):
            for sx in range(w):
                if binary[sy, sx] and labels[sy, sx] == 0:
                    current += 1
                    stack = [(sy, sx)]
                    labels[sy, sx] = current
                    while stack:
                        cy, cx = stack.pop()
                        for ny, nx in (
                            (cy - 1, cx),
                            (cy + 1, cx),
                            (cy, cx - 1),
                            (cy, cx + 1),
                        ):
                            if (
                                0 <= ny < h
                                and 0 <= nx < w
                                and binary[ny, nx]
                                and labels[ny, nx] == 0
                            ):
                                labels[ny, nx] = current
                                stack.append((ny, nx))
        boxes = []
        for label in range(1, current + 1):
            ys, xs = np.nonzero(labels == label)
            boxes.append(
                (xs.min(), xs.max() + 1, ys.min(), ys.max() + 1, ys.size)
            )

    quads = []
    for x1, x2, y1, y2, area in boxes:
        if area < min_area:
            continue
        cx, cy = (x1 + x2) / 2.0, (y1 + y2) / 2.0
        half_w = (x2 - x1) / 2.0 * unclip_ratio
        half_h = (y2 - y1) / 2.0 * unclip_ratio
        quad = np.array(
            [
                [cx - half_w, cy - half_h],
                [cx + half_w, cy - half_h],
                [cx + half_w, cy + half_h],
                [cx - half_w, cy + half_h],
            ],
            dtype=np.float32,
        )
        quads.append(quad * scale)
    if not quads:
        return np.zeros((0, 4, 2), dtype=np.float32)
    # Reading order: top-to-bottom, then left-to-right.
    arr = np.stack(quads)
    order = np.lexsort((arr[:, 0, 0], arr[:, 0, 1]))
    return arr[order]

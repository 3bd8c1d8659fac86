"""Text recognition network (conv + transformer encoder + CTC) for report OCR.

TPU-native replacement for the reference's VietOCR ``vgg_transformer`` wrapper
(datasets/phenikaa/ocr.py:83-145). Two deliberate departures:

- Genuinely batched: the reference loops boxes one-by-one through the
  recognizer (ocr.py:136-145); here a page's rectified patches run as one
  [N, H, W, 1] batch.
- CTC greedy decoding instead of autoregressive seq2seq: the whole forward
  is a single static-shape program (no dynamic decode loop), which is the
  XLA-friendly formulation.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from jax import Array

from spine_vision_tpu.core.registry import register_model

# Vietnamese charset: digits, ASCII letters, accented vowels + đ, punctuation.
_VIETNAMESE_EXTRA = (
    "àáảãạăằắẳẵặâầấẩẫậèéẻẽẹêềếểễệìíỉĩịòóỏõọôồốổỗộơờớởỡợ"
    "ùúủũụưừứửữựỳýỷỹỵđ"
)
VIETNAMESE_CHARSET = (
    "0123456789"
    "abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    + _VIETNAMESE_EXTRA
    + _VIETNAMESE_EXTRA.upper()
    + " .,:;/-()%&+*'\"!?#@_="
)
BLANK_ID = 0  # CTC blank; character i maps to logit index i + 1.


def charset_size() -> int:
    return len(VIETNAMESE_CHARSET) + 1


@register_model("text_recognition")
class TextRecognitionNet(nn.Module):
    """CRNN-style recognizer: [B, 32, W, 1] -> CTC logits [B, W/4, C].

    Conv stack pools height 32 -> 1 and width by 4; a small transformer
    encoder contextualizes the sequence; a dense head emits per-step
    charset+blank logits.
    """

    width: int = 64
    num_layers: int = 2
    num_heads: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        w = self.width
        x = x.astype(self.dtype)

        def conv_bn(t: Array, features: int, strides: tuple[int, int]) -> Array:
            t = nn.Conv(
                features,
                (3, 3),
                strides=strides,
                padding="SAME",
                use_bias=False,
                dtype=self.dtype,
            )(t)
            t = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(t)
            return nn.relu(t)

        x = conv_bn(x, w, (2, 2))  # 16 x W/2
        x = conv_bn(x, w * 2, (2, 2))  # 8 x W/4
        x = conv_bn(x, w * 4, (2, 1))  # 4 x W/4
        x = conv_bn(x, w * 4, (2, 1))  # 2 x W/4
        x = conv_bn(x, w * 4, (2, 1))  # 1 x W/4
        seq = x[:, 0]  # [B, T, C] with T = W/4

        # Learned positional embedding + transformer encoder.
        t = seq.shape[1]
        pos = self.param(
            "pos_embedding",
            nn.initializers.normal(0.02),
            (1, t, seq.shape[-1]),
            jnp.float32,
        )
        seq = seq + pos.astype(self.dtype)
        for _ in range(self.num_layers):
            attn_in = nn.LayerNorm(dtype=jnp.float32)(seq)
            attn = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, dtype=self.dtype
            )(attn_in, attn_in)
            seq = seq + attn
            mlp_in = nn.LayerNorm(dtype=jnp.float32)(seq)
            mlp = nn.Dense(seq.shape[-1] * 2, dtype=self.dtype)(mlp_in)
            mlp = nn.gelu(mlp)
            mlp = nn.Dense(seq.shape[-1], dtype=self.dtype)(mlp)
            seq = seq + mlp

        seq = nn.LayerNorm(dtype=jnp.float32)(seq)
        return nn.Dense(charset_size(), dtype=jnp.float32)(seq)


def ctc_greedy_decode(logits: np.ndarray) -> list[str]:
    """Greedy CTC decode: argmax, collapse repeats, drop blanks.

    Args:
        logits: [B, T, C] CTC logits (host numpy).

    Returns:
        One decoded string per batch row.
    """
    ids = np.argmax(logits, axis=-1)  # [B, T]
    texts = []
    for row in ids:
        chars = []
        previous = -1
        for token in row:
            if token != previous and token != BLANK_ID:
                chars.append(VIETNAMESE_CHARSET[token - 1])
            previous = token
        texts.append("".join(chars))
    return texts

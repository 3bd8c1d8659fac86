"""Native host-ops library: build, load, and ctypes wrappers.

The reference's host preprocessing rides torchvision/PIL/cv2 native code;
this framework owns that layer (SURVEY.md §2.2): an OpenMP C++ library
(src/host_ops.cpp) compiled on first use and bound through ctypes. Every
wrapper has a pure-numpy fallback, so the package works without a compiler —
``is_available()`` reports which path is active.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

from spine_vision_tpu.core import logger

_SRC = Path(__file__).parent / "src" / "host_ops.cpp"
_LIB_PATH = Path(__file__).parent / "libhost_ops.so"
_lib: ctypes.CDLL | None = None
_build_failed = False


def build(force: bool = False) -> bool:
    """Compile the shared library with g++ (-O3 -fopenmp). Returns success."""
    global _build_failed
    stale = (
        _LIB_PATH.exists()
        and _SRC.exists()
        and _SRC.stat().st_mtime > _LIB_PATH.stat().st_mtime
    )
    if _LIB_PATH.exists() and not force and not stale:
        return True
    cmd = [
        "g++",
        "-O3",
        "-shared",
        "-fPIC",
        "-fopenmp",
        "-std=c++17",
        str(_SRC),
        "-o",
        str(_LIB_PATH),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        logger.info("Built native host ops: %s", _LIB_PATH)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as exc:
        detail = getattr(exc, "stderr", "") or str(exc)
        logger.warning("Native host-ops build failed: %s", detail[:500])
        _build_failed = True
        return False


def _load() -> ctypes.CDLL | None:
    global _lib
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not _LIB_PATH.exists() and not build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError as exc:
        logger.warning("Could not load %s: %s", _LIB_PATH, exc)
        return None

    u8 = ctypes.POINTER(ctypes.c_uint8)
    f32 = ctypes.POINTER(ctypes.c_float)
    i64 = ctypes.c_int64
    lib.resize_bilinear_u8_batch.argtypes = [u8, u8, i64, i64, i64, i64, i64]
    lib.resize_bilinear_u8_batch.restype = None
    lib.normalize_minmax_u8.argtypes = [f32, u8, i64]
    lib.normalize_minmax_u8.restype = None
    lib.assemble_t2t1t2_batch.argtypes = [u8, u8, u8, i64, i64, i64]
    lib.assemble_t2t1t2_batch.restype = ctypes.c_int
    if hasattr(lib, "jpegls_decode_diffs"):
        lib.jpegls_decode_diffs.argtypes = [
            u8,
            ctypes.POINTER(ctypes.c_int64),
            i64,
            ctypes.POINTER(ctypes.c_uint16),
            i64,
            i64,
            i64,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.jpegls_decode_diffs.restype = i64
    if hasattr(lib, "jpegls_unstuff_split"):
        lib.jpegls_unstuff_split.argtypes = [
            u8,
            i64,
            u8,
            ctypes.POINTER(ctypes.c_int64),
            i64,
        ]
        lib.jpegls_unstuff_split.restype = i64
    _lib = lib
    return lib


def is_available() -> bool:
    """Whether the compiled library is (or can be made) loadable."""
    return _load() is not None


def _u8ptr(arr: np.ndarray | None):
    if arr is None:
        return None
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def resize_bilinear_u8(images: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Batched bilinear resize of [N, H, W] (or [H, W]) uint8 images."""
    arr = np.ascontiguousarray(images, dtype=np.uint8)
    squeeze = arr.ndim == 2
    if squeeze:
        arr = arr[None]
    n, in_h, in_w = arr.shape
    lib = _load()
    if lib is None:
        out = _resize_fallback(arr, out_h, out_w)
    else:
        out = np.empty((n, out_h, out_w), dtype=np.uint8)
        lib.resize_bilinear_u8_batch(
            _u8ptr(arr), _u8ptr(out), n, in_h, in_w, out_h, out_w
        )
    return out[0] if squeeze else out


def _resize_fallback(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Vectorized numpy bilinear resize (same convention as the C++)."""
    n, in_h, in_w = arr.shape
    sy = np.clip((np.arange(out_h) + 0.5) * in_h / out_h - 0.5, 0, in_h - 1)
    sx = np.clip((np.arange(out_w) + 0.5) * in_w / out_w - 0.5, 0, in_w - 1)
    y0 = sy.astype(np.int64)
    x0 = sx.astype(np.int64)
    y1 = np.minimum(y0 + 1, in_h - 1)
    x1 = np.minimum(x0 + 1, in_w - 1)
    wy = (sy - y0)[None, :, None].astype(np.float32)
    wx = (sx - x0)[None, None, :].astype(np.float32)
    a = arr[:, y0[:, None], x0[None, :]].astype(np.float32)
    b = arr[:, y0[:, None], x1[None, :]].astype(np.float32)
    c = arr[:, y1[:, None], x0[None, :]].astype(np.float32)
    d = arr[:, y1[:, None], x1[None, :]].astype(np.float32)
    top = a * (1 - wx) + b * wx
    bot = c * (1 - wx) + d * wx
    return (top * (1 - wy) + bot * wy + 0.5).astype(np.uint8)


def jpegls_unstuff_split(entropy: bytes) -> tuple[np.ndarray, np.ndarray] | None:
    """Native 0xFF00-unstuff + RSTn split of a JPEG entropy segment.

    Returns (data uint8 [n_unstuffed], offsets int64 [n_chunks + 1]) or
    None when the native library is unavailable.
    """
    lib = _load()
    if lib is None or not hasattr(lib, "jpegls_unstuff_split"):
        return None
    raw = np.frombuffer(entropy, dtype=np.uint8)
    out = np.empty(max(1, raw.size), dtype=np.uint8)
    max_chunks = raw.size // 2 + 3
    offsets = np.zeros(max_chunks + 1, dtype=np.int64)
    n_chunks = lib.jpegls_unstuff_split(
        _u8ptr(raw),
        raw.size,
        _u8ptr(out),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        max_chunks,
    )
    if n_chunks < 0:  # cannot happen with the sizing above; defensive
        return None
    return out[: offsets[n_chunks]], offsets[: n_chunks + 1]


def jpegls_decode_diffs_raw(
    data: np.ndarray,
    offsets: np.ndarray,
    luts: list[np.ndarray],
    counts_per_interval: int,
    total: int,
    ncomp: int,
) -> np.ndarray | None:
    """Native JPEG-Lossless entropy decode over pre-split chunk data.

    ``data``/``offsets`` as returned by :func:`jpegls_unstuff_split`.
    Returns int32 [total, ncomp], or None when the library is unavailable.
    Raises ValueError on an invalid/truncated stream, mirroring the Python
    decoder's errors.
    """
    lib = _load()
    if lib is None or not hasattr(lib, "jpegls_decode_diffs"):
        return None
    data = np.ascontiguousarray(data, dtype=np.uint8)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    luts_arr = np.ascontiguousarray(np.stack(luts), dtype=np.uint16)
    out = np.empty((total, ncomp), dtype=np.int32)
    got = lib.jpegls_decode_diffs(
        _u8ptr(data),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(offsets) - 1,
        luts_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        ncomp,
        counts_per_interval,
        total,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if got == -2:
        raise ValueError("Corrupt entropy tail")
    if got < 0:
        raise ValueError("Invalid Huffman code")
    if got < total:
        raise ValueError(f"Truncated scan: {got}/{total} samples")
    return out


def jpegls_decode_diffs(
    chunks: list[bytes],
    luts: list[np.ndarray],
    counts_per_interval: int,
    total: int,
    ncomp: int,
) -> np.ndarray | None:
    """Native JPEG-Lossless entropy decode over already-split chunks."""
    data = np.frombuffer(b"".join(chunks), dtype=np.uint8)
    offsets = np.zeros(len(chunks) + 1, dtype=np.int64)
    np.cumsum([len(c) for c in chunks], out=offsets[1:])
    return jpegls_decode_diffs_raw(
        data, offsets, luts, counts_per_interval, total, ncomp
    )


def normalize_minmax_u8(array: np.ndarray) -> np.ndarray:
    """Min-max normalize any float array to uint8 (host path)."""
    arr = np.ascontiguousarray(array, dtype=np.float32)
    lib = _load()
    if lib is None:
        lo, hi = float(arr.min()), float(arr.max())
        if hi <= lo:
            return np.zeros(arr.shape, dtype=np.uint8)
        return ((arr - lo) * (255.0 / (hi - lo))).astype(np.uint8)
    out = np.empty(arr.shape, dtype=np.uint8)
    lib.normalize_minmax_u8(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        _u8ptr(out),
        arr.size,
    )
    return out


def assemble_t2t1t2(
    t1: np.ndarray | None, t2: np.ndarray | None
) -> np.ndarray:
    """[T2, T1, T2] channel assembly for [N, H, W] pairs (either may be None)."""
    ref = t2 if t2 is not None else t1
    if ref is None:
        raise ValueError("At least one of t1/t2 must be given")
    arr_t1 = (
        np.ascontiguousarray(t1, dtype=np.uint8) if t1 is not None else None
    )
    arr_t2 = (
        np.ascontiguousarray(t2, dtype=np.uint8) if t2 is not None else None
    )
    n, h, w = np.ascontiguousarray(ref).shape
    lib = _load()
    if lib is None:
        a = arr_t2 if arr_t2 is not None else arr_t1
        b = arr_t1 if arr_t1 is not None else arr_t2
        return np.stack([a, b, a], axis=-1)
    out = np.empty((n, h, w, 3), dtype=np.uint8)
    status = lib.assemble_t2t1t2_batch(
        _u8ptr(arr_t1), _u8ptr(arr_t2), _u8ptr(out), n, h, w
    )
    if status != 0:
        raise ValueError("assemble_t2t1t2_batch failed")
    return out


__all__ = [
    "assemble_t2t1t2",
    "build",
    "is_available",
    "normalize_minmax_u8",
    "resize_bilinear_u8",
]

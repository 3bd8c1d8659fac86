// Host-side preprocessing kernels for the input pipeline.
//
// The reference delegates this work to torchvision/PIL/cv2 native code
// (training/datasets/*.py transforms, io/__init__.py normalize_to_uint8);
// this framework owns it: OpenMP-parallel bilinear resize, min-max uint8
// normalization, and [T2, T1, T2] channel assembly, callable from the
// Python DataLoader through ctypes (spine_vision_tpu/native/__init__.py).
// Device-side equivalents live in spine_vision_tpu/ops; these host kernels
// feed the loader when images must be decoded/resized before batching.
//
// Build: see spine_vision_tpu/native/__init__.py (g++ -O3 -shared -fopenmp).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// Bilinear resize of a batch of single-channel uint8 images.
// in:  [n, in_h, in_w] contiguous uint8
// out: [n, out_h, out_w] contiguous uint8
// Half-pixel-center sampling (cv2.INTER_LINEAR convention), edge clamped.
void resize_bilinear_u8_batch(const uint8_t* in, uint8_t* out, int64_t n,
                              int64_t in_h, int64_t in_w, int64_t out_h,
                              int64_t out_w) {
  const float scale_y = static_cast<float>(in_h) / static_cast<float>(out_h);
  const float scale_x = static_cast<float>(in_w) / static_cast<float>(out_w);

#pragma omp parallel for schedule(static)
  for (int64_t img = 0; img < n; ++img) {
    const uint8_t* src = in + img * in_h * in_w;
    uint8_t* dst = out + img * out_h * out_w;
    for (int64_t oy = 0; oy < out_h; ++oy) {
      float sy = (static_cast<float>(oy) + 0.5f) * scale_y - 0.5f;
      sy = std::min(std::max(sy, 0.0f), static_cast<float>(in_h - 1));
      const int64_t y0 = static_cast<int64_t>(sy);
      const int64_t y1 = std::min(y0 + 1, in_h - 1);
      const float wy = sy - static_cast<float>(y0);
      for (int64_t ox = 0; ox < out_w; ++ox) {
        float sx = (static_cast<float>(ox) + 0.5f) * scale_x - 0.5f;
        sx = std::min(std::max(sx, 0.0f), static_cast<float>(in_w - 1));
        const int64_t x0 = static_cast<int64_t>(sx);
        const int64_t x1 = std::min(x0 + 1, in_w - 1);
        const float wx = sx - static_cast<float>(x0);
        const float top = static_cast<float>(src[y0 * in_w + x0]) * (1.0f - wx) +
                          static_cast<float>(src[y0 * in_w + x1]) * wx;
        const float bot = static_cast<float>(src[y1 * in_w + x0]) * (1.0f - wx) +
                          static_cast<float>(src[y1 * in_w + x1]) * wx;
        const float value = top * (1.0f - wy) + bot * wy;
        dst[oy * out_w + ox] = static_cast<uint8_t>(value + 0.5f);
      }
    }
  }
}

// Min-max normalize a float32 array to uint8 [0, 255].
// Matches ops/image.py normalize_to_uint8 (reference io/__init__.py:15-31):
// constant arrays map to 0.
void normalize_minmax_u8(const float* in, uint8_t* out, int64_t size) {
  if (size <= 0) return;
  float lo = in[0], hi = in[0];
#pragma omp parallel for reduction(min : lo) reduction(max : hi) \
    schedule(static)
  for (int64_t i = 0; i < size; ++i) {
    lo = std::min(lo, in[i]);
    hi = std::max(hi, in[i]);
  }
  const float range = hi - lo;
  if (range <= 0.0f) {
    std::memset(out, 0, static_cast<size_t>(size));
    return;
  }
  const float inv = 255.0f / range;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < size; ++i) {
    out[i] = static_cast<uint8_t>((in[i] - lo) * inv);
  }
}

// Assemble [T2, T1, T2] 3-channel crops from paired single-channel images.
// t1, t2: [n, h, w] uint8 (either may be null -> triplicate the other;
// reference construct_3channel, training/datasets/classification.py:40-68).
// out: [n, h, w, 3] uint8.
int assemble_t2t1t2_batch(const uint8_t* t1, const uint8_t* t2, uint8_t* out,
                          int64_t n, int64_t h, int64_t w) {
  if (t1 == nullptr && t2 == nullptr) return 1;
  const int64_t hw = h * w;
#pragma omp parallel for schedule(static)
  for (int64_t img = 0; img < n; ++img) {
    const uint8_t* a = t2 ? t2 + img * hw : t1 + img * hw;  // channels 0, 2
    const uint8_t* b = t1 ? t1 + img * hw : t2 + img * hw;  // channel 1
    uint8_t* dst = out + img * hw * 3;
    for (int64_t p = 0; p < hw; ++p) {
      dst[p * 3 + 0] = a[p];
      dst[p * 3 + 1] = b[p];
      dst[p * 3 + 2] = a[p];
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// JPEG-Lossless (SOF3) entropy decode — the hot loop of io/jpeg_lossless.py.
// The Python fallback decodes one Huffman symbol per interpreter iteration
// (~seconds per 512x512x16-bit slice); this does the same work in ~ms.
// ---------------------------------------------------------------------------

// Peek `count` (<= 16) bits at bit position `pos`; bits beyond the chunk end
// read as 1s (JPEG pads entropy data with 1-bits), matching the Python
// decoder's np.ones padding.
static inline uint32_t jpegls_peek_bits(const uint8_t* p, int64_t nbytes,
                                        int64_t pos, int count) {
  const int64_t byte = pos >> 3;
  const int shift = static_cast<int>(pos & 7);
  uint64_t window = 0;
  for (int i = 0; i < 5; ++i) {
    const uint64_t b = (byte + i < nbytes) ? p[byte + i] : 0xFFull;
    window = (window << 8) | b;
  }
  return static_cast<uint32_t>((window >> (40 - shift - count)) &
                               ((1ull << count) - 1));
}

// Unstuff 0xFF00 byte pairs and split at RSTn (0xFFD0..0xFFD7) markers.
// out: buffer of at least n bytes; offsets: int64 [max_chunks + 1].
// Returns the number of chunks written (offsets[0..n_chunks] filled), or
// -1 if more than max_chunks intervals are present.
int64_t jpegls_unstuff_split(const uint8_t* in, int64_t n, uint8_t* out,
                             int64_t* offsets, int64_t max_chunks) {
  int64_t n_chunks = 0;
  int64_t w = 0;
  offsets[0] = 0;
  int64_t i = 0;
  while (i < n) {
    const uint8_t b = in[i];
    if (b == 0xFF && i + 1 < n) {
      const uint8_t nxt = in[i + 1];
      if (nxt == 0x00) {
        out[w++] = 0xFF;
        i += 2;
        continue;
      }
      if (nxt >= 0xD0 && nxt <= 0xD7) {  // RST0..RST7
        if (n_chunks + 1 >= max_chunks) return -1;
        offsets[++n_chunks] = w;
        i += 2;
        continue;
      }
    }
    out[w++] = b;
    i += 1;
  }
  offsets[++n_chunks] = w;
  return n_chunks;
}

// data: concatenated unstuffed restart-interval chunks.
// offsets: int64 [n_chunks + 1] byte offsets into data.
// luts: uint16 [ncomp, 65536]; entry = (code_length << 8) | ssss.
// out: int32 [total, ncomp] difference values in MCU order.
// Returns the number of decoded MCUs (== total on success); -1 on an
// invalid Huffman code.
int64_t jpegls_decode_diffs(const uint8_t* data, const int64_t* offsets,
                            int64_t n_chunks, const uint16_t* luts,
                            int64_t ncomp, int64_t counts_per_interval,
                            int64_t total, int32_t* out) {
  int64_t mcu = 0;
  for (int64_t ch = 0; ch < n_chunks && mcu < total; ++ch) {
    const uint8_t* p = data + offsets[ch];
    const int64_t nbytes = offsets[ch + 1] - offsets[ch];
    const int64_t nbits = nbytes * 8;
    int64_t pos = 0;
    const int64_t limit =
        counts_per_interval == 0
            ? total
            : std::min(total, mcu + counts_per_interval);
    while (mcu < limit && pos < nbits) {
      for (int64_t c = 0; c < ncomp; ++c) {
        const uint32_t peek = jpegls_peek_bits(p, nbytes, pos, 16);
        const uint16_t entry = luts[c * 65536 + peek];
        const int len = entry >> 8;
        if (len == 0) return -1;
        const int ssss = entry & 0xFF;
        pos += len;
        int32_t diff;
        if (ssss == 0) {
          diff = 0;
        } else if (ssss == 16) {
          diff = 32768;
        } else {
          const uint32_t mag = jpegls_peek_bits(p, nbytes, pos, ssss);
          pos += ssss;
          diff = (mag >= (1u << (ssss - 1)))
                     ? static_cast<int32_t>(mag)
                     : static_cast<int32_t>(mag) - (1 << ssss) + 1;
        }
        out[mcu * ncomp + c] = diff;
      }
      ++mcu;
    }
    // A completed restart interval must end cleanly: fewer than 8 unread
    // bits, all of them 1s (T.81 byte-align padding). Anything else means
    // the stream is corrupt and the decoded tail pixels are garbage.
    if (mcu == limit) {
      if (pos > nbits || nbits - pos >= 8) return -2;
      for (int64_t b = pos; b < nbits; ++b) {
        if (((p[b >> 3] >> (7 - (b & 7))) & 1) == 0) return -2;
      }
    }
  }
  return mcu;
}

}  // extern "C"

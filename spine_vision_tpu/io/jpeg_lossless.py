"""JPEG Lossless (ITU-T T.81 process 14, SOF3) codec.

Covers the DICOM transfer syntaxes 1.2.840.10008.1.2.4.57 (JPEG Lossless,
Non-Hierarchical, Process 14) and 1.2.840.10008.1.2.4.70 (Process 14,
Selection Value 1) — the most common lossless syntaxes in clinical MRI
exports and present in RSNA data. The reference gets these for free from
GDCM inside SimpleITK (reference io/readers.py:52-73); PIL does not decode
SOF3, so this is a from-scratch implementation.

Decode strategy: the Huffman entropy decode is inherently sequential (a
table-driven Python loop over samples); the prediction/reconstruction step
is vectorized with numpy cumulative sums for the predictors that admit it
(PSV 1 — the SV1 syntax — and PSV 2), with a plain per-pixel fallback for
the rare PSV 3-7 scans.

An encoder (predictor-general, single/multi component) lives here too, used
by the round-trip tests; real modalities' output decodes through the same
marker/entropy path.
"""

from __future__ import annotations

import struct

import numpy as np

# Marker bytes (second byte after 0xFF).
_SOI = 0xD8
_EOI = 0xD9
_SOS = 0xDA
_DHT = 0xC4
_SOF3 = 0xC3
_DRI = 0xDD
_RST0, _RST7 = 0xD0, 0xD7


class JpegLosslessError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Huffman tables
# ---------------------------------------------------------------------------


def _build_decode_lut(bits: list[int], values: list[int]) -> np.ndarray:
    """Canonical Huffman table -> 16-bit peek LUT.

    LUT[peek16] = (code_length << 8) | symbol. One array lookup decodes any
    symbol, keeping the per-sample Python work minimal.
    """
    lut = np.zeros(1 << 16, dtype=np.uint16)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            symbol = values[k]
            k += 1
            prefix = code << (16 - length)
            span = 1 << (16 - length)
            lut[prefix : prefix + span] = (length << 8) | symbol
            code += 1
        code <<= 1
    return lut


def _build_encode_table(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman table -> {symbol: (code, length)}."""
    table: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[values[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return table


# A fixed table covering all 17 difference categories (0..16), used by the
# encoder; decoders always read tables from the DHT segment. Kraft-exact:
# 3 codes of length 2, one each of lengths 3..14, two of length 15.
_ENC_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 0]
_ENC_VALUES = list(range(17))
assert sum(_ENC_BITS) == 17


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class _Frame:
    precision: int
    rows: int
    cols: int
    ncomp: int
    comp_ids: list[int]


def _parse_markers(data: bytes):
    """Walk the marker stream; return (frame, scans).

    Each scan is (comp_selectors, dc_table_ids, psv, al, entropy_bytes).
    """
    if data[:2] != b"\xff\xd8":
        raise JpegLosslessError("Missing SOI")
    pos = 2
    tables: dict[int, np.ndarray] = {}
    frame: _Frame | None = None
    restart_interval = 0
    scans = []
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise JpegLosslessError(f"Expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == _EOI:
            break
        length = struct.unpack_from(">H", data, pos)[0]
        seg = data[pos + 2 : pos + length]
        if marker == _SOF3:
            frame = _Frame()
            frame.precision = seg[0]
            frame.rows, frame.cols = struct.unpack_from(">HH", seg, 1)
            frame.ncomp = seg[5]
            frame.comp_ids = [seg[6 + 3 * i] for i in range(frame.ncomp)]
        elif marker in (0xC0, 0xC1, 0xC2, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise JpegLosslessError(
                f"Not a lossless (SOF3) JPEG: SOF marker 0x{marker:02x}"
            )
        elif marker == _DHT:
            off = 0
            while off < len(seg):
                tc_th = seg[off]
                bits = list(seg[off + 1 : off + 17])
                nval = sum(bits)
                values = list(seg[off + 17 : off + 17 + nval])
                tables[tc_th & 0x0F] = _build_decode_lut(bits, values)
                off += 17 + nval
        elif marker == _DRI:
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == _SOS:
            ns = seg[0]
            selectors = [seg[1 + 2 * i] for i in range(ns)]
            table_ids = [seg[2 + 2 * i] >> 4 for i in range(ns)]
            psv = seg[1 + 2 * ns]  # Ss = predictor selection value
            al = seg[3 + 2 * ns] & 0x0F  # point transform
            # Entropy-coded data runs to the next non-RST marker
            # (vectorized: the per-byte Python scan cost ~120 ms/slice).
            start = pos + length
            arr = np.frombuffer(data, dtype=np.uint8)
            ff = np.flatnonzero(arr[start : n - 1] == 0xFF)
            nxt = arr[start + 1 :][ff]
            real = ff[(nxt != 0x00) & ((nxt < _RST0) | (nxt > _RST7))]
            ep = start + int(real[0]) if real.size else max(start, n - 1)
            scans.append(
                (selectors, table_ids, psv, al, data[pos + length : ep],
                 [tables[t] for t in table_ids], restart_interval)
            )
            pos = ep
            continue
        pos += length
    if frame is None or not scans:
        raise JpegLosslessError("Missing SOF3/SOS")
    return frame, scans


def _split_restart_intervals(entropy: bytes) -> list[bytes]:
    """Split entropy data at RSTn markers, unstuffing 0xFF00 within each."""
    intervals: list[bytes] = []
    cur = bytearray()
    i = 0
    n = len(entropy)
    while i < n:
        b = entropy[i]
        if b == 0xFF and i + 1 < n:
            nxt = entropy[i + 1]
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if _RST0 <= nxt <= _RST7:
                intervals.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
        cur.append(b)
        i += 1
    intervals.append(bytes(cur))
    return intervals


def _decode_diffs(
    chunks: list[bytes],
    luts: list[np.ndarray],
    counts_per_interval: int,
    total: int,
    ncomp: int,
) -> np.ndarray:
    """Sequential entropy decode of all difference values.

    Returns int32 [total, ncomp] (component-interleaved MCU order).
    """
    out = np.empty((total, ncomp), dtype=np.int32)
    mcu = 0
    for chunk in chunks:
        if mcu >= total:
            break
        bits = np.unpackbits(np.frombuffer(chunk, dtype=np.uint8))
        # Pad so 16-bit peeks never run off the end.
        bits = np.concatenate([bits, np.ones(32, dtype=np.uint8)])
        weights = 1 << np.arange(15, -1, -1)
        limit = total if counts_per_interval == 0 else min(
            total, mcu + counts_per_interval
        )
        p = 0
        nbits = len(bits) - 32
        while mcu < limit and p < nbits:
            for c in range(ncomp):
                peek = int(bits[p : p + 16] @ weights)
                entry = int(luts[c][peek])
                length = entry >> 8
                if length == 0:
                    raise JpegLosslessError("Invalid Huffman code")
                ssss = entry & 0xFF
                p += length
                if ssss == 0:
                    diff = 0
                elif ssss == 16:
                    diff = 32768
                else:
                    mag = int(bits[p : p + ssss] @ weights[16 - ssss :])
                    p += ssss
                    diff = mag if mag >= (1 << (ssss - 1)) else mag - (1 << ssss) + 1
                out[mcu, c] = diff
            mcu += 1
        # A completed restart interval must end cleanly: fewer than 8
        # unread bits, all 1s (T.81 byte-align padding). Otherwise the
        # stream is corrupt and the tail pixels would be silent garbage.
        if mcu == limit and (
            p > nbits
            or nbits - p >= 8
            or (p < nbits and not bits[p:nbits].all())
        ):
            raise JpegLosslessError("Corrupt entropy tail")
    if mcu < total:
        raise JpegLosslessError(f"Truncated scan: {mcu}/{total} samples")
    return out


def _reconstruct(
    diffs: np.ndarray, rows: int, cols: int, psv: int, precision: int, al: int
) -> np.ndarray:
    """Prediction + modulo-2^16 reconstruction for one component."""
    d = diffs.reshape(rows, cols).astype(np.int64)
    default = 1 << (precision - 1 - al)
    out = np.empty((rows, cols), dtype=np.int64)
    if psv == 1:
        # SV1 (TS .70): Px = Ra; first column predicts from Rb — every row
        # is a cumulative sum seeded by a vertical cumulative first column.
        first_col = (default + np.cumsum(d[:, 0])) % 65536
        out = (np.cumsum(d, axis=1) - d[:, :1] + first_col[:, None]) % 65536
    elif psv == 2:
        # Px = Rb; row 0 predicts from Ra.
        row0 = (default + np.cumsum(d[0])) % 65536
        out = (np.cumsum(d, axis=0) - d[:1, :] + row0[None, :]) % 65536
    else:
        for r in range(rows):
            for c in range(cols):
                if r == 0 and c == 0:
                    px = default
                elif r == 0:
                    px = out[0, c - 1]
                elif c == 0:
                    px = out[r - 1, 0]
                else:
                    a, b, cc = out[r, c - 1], out[r - 1, c], out[r - 1, c - 1]
                    if psv == 3:
                        px = cc
                    elif psv == 4:
                        px = a + b - cc
                    elif psv == 5:
                        px = a + ((b - cc) >> 1)
                    elif psv == 6:
                        px = b + ((a - cc) >> 1)
                    elif psv == 7:
                        px = (a + b) >> 1
                    else:
                        raise JpegLosslessError(f"Bad predictor {psv}")
                out[r, c] = (px + d[r, c]) % 65536
    return (out << al).astype(np.uint16)


def decode_jpeg_lossless(data: bytes) -> np.ndarray:
    """Decode an SOF3 lossless JPEG stream.

    Returns uint16 [rows, cols] (single component) or [rows, cols, ncomp].
    """
    frame, scans = _parse_markers(data)
    rows, cols = frame.rows, frame.cols
    planes: dict[int, np.ndarray] = {}
    for selectors, _tids, psv, al, entropy, luts, ri in scans:
        ncomp = len(selectors)
        diffs = None
        try:  # C++ hot loops (native/src/host_ops.cpp); None if unavailable
            from spine_vision_tpu import native

            unstuffed = native.jpegls_unstuff_split(entropy)
            if unstuffed is not None:
                diffs = native.jpegls_decode_diffs_raw(
                    *unstuffed, luts, ri, rows * cols, ncomp
                )
        except ValueError as exc:
            raise JpegLosslessError(str(exc)) from exc
        if diffs is None:
            chunks = _split_restart_intervals(entropy)
            diffs = _decode_diffs(chunks, luts, ri, rows * cols, ncomp)
        for ci, sel in enumerate(selectors):
            comp = diffs[:, ci]
            if ri and ri < rows * cols:
                # T.81 H.2.2: prediction resets at every restart interval —
                # each interval decodes like a fresh scan. Clinical encoders
                # emit row-aligned intervals; reject anything else loudly
                # rather than reconstruct garbage.
                if ri % cols != 0:
                    raise JpegLosslessError(
                        f"Restart interval {ri} not a multiple of row "
                        f"width {cols}; unsupported"
                    )
                slab = ri // cols
                planes[sel] = np.concatenate(
                    [
                        _reconstruct(
                            comp[r0 * cols : min(r0 + slab, rows) * cols],
                            min(slab, rows - r0),
                            cols,
                            psv,
                            frame.precision,
                            al,
                        )
                        for r0 in range(0, rows, slab)
                    ],
                    axis=0,
                )
            else:
                planes[sel] = _reconstruct(
                    comp, rows, cols, psv, frame.precision, al
                )
    ordered = [planes[cid] for cid in frame.comp_ids if cid in planes]
    if len(ordered) != frame.ncomp:
        raise JpegLosslessError("Missing component scan")
    if frame.ncomp == 1:
        return ordered[0]
    return np.stack(ordered, axis=-1)


# ---------------------------------------------------------------------------
# Encoder (round-trip tests; predictor-general, no restart markers)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.write(0x7F, 8 - self.n)  # pad with 1s? use 1-bits per T.81
        return bytes(self.out)


def _predict(out: np.ndarray, r: int, c: int, psv: int, default: int) -> int:
    if r == 0 and c == 0:
        return default
    if r == 0:
        return int(out[0, c - 1])
    if c == 0:
        return int(out[r - 1, 0])
    a, b, cc = int(out[r, c - 1]), int(out[r - 1, c]), int(out[r - 1, c - 1])
    return {
        1: a,
        2: b,
        3: cc,
        4: a + b - cc,
        5: a + ((b - cc) >> 1),
        6: b + ((a - cc) >> 1),
        7: (a + b) >> 1,
    }[psv]


def encode_jpeg_lossless(
    image: np.ndarray, precision: int = 16, psv: int = 1
) -> bytes:
    """Encode uint16 [rows, cols] as SOF3 lossless JPEG (test encoder)."""
    image = np.asarray(image, dtype=np.uint16)
    rows, cols = image.shape
    default = 1 << (precision - 1)
    enc = _build_encode_table(_ENC_BITS, _ENC_VALUES)
    writer = _BitWriter()
    for r in range(rows):
        for c in range(cols):
            px = _predict(image, r, c, psv, default)
            diff = (int(image[r, c]) - px) % 65536
            if diff >= 32768:
                diff -= 65536
            if diff == 32768 or diff == -32768:
                ssss, extra = 16, None
            else:
                mag = abs(diff)
                ssss = int(mag).bit_length()
                extra = diff if diff >= 0 else diff + (1 << ssss) - 1
            code, length = enc[ssss]
            writer.write(code, length)
            if ssss and ssss != 16:
                writer.write(extra, ssss)
    entropy = writer.flush()

    parts = [b"\xff\xd8"]
    # DHT
    dht = bytes([0x00]) + bytes(_ENC_BITS) + bytes(_ENC_VALUES)
    parts.append(b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht)
    # SOF3: precision, rows, cols, 1 component (id 1, sampling 0x11, qt 0)
    sof = struct.pack(">BHHB", precision, rows, cols, 1) + bytes([1, 0x11, 0])
    parts.append(b"\xff\xc3" + struct.pack(">H", 2 + len(sof)) + sof)
    # SOS: 1 component, selector 1, DC table 0; Ss=psv, Se=0, AhAl=0
    sos = bytes([1, 1, 0x00, psv, 0, 0x00])
    parts.append(b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos)
    parts.append(entropy)
    parts.append(b"\xff\xd9")
    return b"".join(parts)

"""Baseline JPEG codec (SOF0, Huffman, 4:4:4) in pure numpy + stdlib.

Implements the public ITU-T T.81 baseline process with the spec's own
Annex K reference tables: 8×8 DCT blocks, standard luminance /
chrominance quantization scaled libjpeg-style to a fixed quality,
canonical Huffman coding (DC difference categories + AC run/size with
ZRL and EOB), JFIF YCbCr color transform, 0xFF byte stuffing. No
chroma subsampling (4:4:4) and no restart markers — the simplest legal
baseline stream, which any JPEG decoder (and this one) reads.

This exists so the multimodal pipeline (operators/multimodal.py)
decodes the dominant lossy image format with no external codec
library; the encoder exists to round-trip-test the decoder on genuine
JFIF bytes and to generate deterministic fixtures. Lossy means decode
statistics are *approximate* — tests bound reconstruction error, and
the quantization is fixed so outputs stay bit-deterministic.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Reference tables (ITU-T T.81 Annex K — public specification values)
# ---------------------------------------------------------------------------

_QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)

_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

#: zigzag scan order: index i of the scan → (row, col) flat index.
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K canonical Huffman table definitions: (bits[1..16], values)
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

#: fixed encode quality (libjpeg scaling); decode reads DQT from the stream.
QUALITY = 75


def _scaled_quant(table: np.ndarray, quality: int = QUALITY) -> np.ndarray:
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (table * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _dct_matrix() -> np.ndarray:
    n = np.arange(8)
    d = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16) / 2.0
    d[0, :] /= np.sqrt(2.0)
    return d


_DCT = _dct_matrix()


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) per the canonical JPEG code assignment."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol — the decoder-side view."""
    return {(l, c): s for s, (c, l) in _canonical_codes(bits, vals).items()}


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:          # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG: truncated entropy stream")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                # stuffed zero must follow inside entropy data
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1
                else:
                    raise ValueError("JPEG: unexpected marker in scan")
            self._acc = byte
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("JPEG: invalid Huffman code")


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length() if v < 0 else 0


def _amplitude_bits(v: int, size: int) -> int:
    # negative amplitudes are stored as v - 1 in `size` bits (one's compl.)
    return v if v >= 0 else v + (1 << size) - 1


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[..., i] for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255
                   ).astype(np.uint8)


def _segment(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def encode_jpeg(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a baseline JFIF JPEG
    (4:4:4, fixed quality, Annex K Huffman tables)."""
    h, w, _ = pixels.shape
    qt_l = _scaled_quant(_QUANT_LUM)
    qt_c = _scaled_quant(_QUANT_CHROMA)
    ycc = _rgb_to_ycbcr(pixels) - 128.0  # level shift

    # pad to 8×8 multiples by edge replication
    ph, pw = (h + 7) & ~7, (w + 7) & ~7
    padded = np.pad(ycc, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")

    enc_dc = [_canonical_codes(_DC_LUM_BITS, _DC_LUM_VALS),
              _canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)]
    enc_ac = [_canonical_codes(_AC_LUM_BITS, _AC_LUM_VALS),
              _canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)]
    quants = [qt_l, qt_c, qt_c]
    tsel = [0, 1, 1]

    bw = _BitWriter()
    prev_dc = [0, 0, 0]
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for comp in range(3):
                block = padded[by:by + 8, bx:bx + 8, comp]
                coef = _DCT @ block @ _DCT.T
                q = np.round(coef / quants[comp]).astype(np.int64)
                zz = q.reshape(-1)[_ZIGZAG]
                t = tsel[comp]
                # DC difference
                diff = int(zz[0]) - prev_dc[comp]
                prev_dc[comp] = int(zz[0])
                size = _category(diff)
                code, ln = enc_dc[t][size]
                bw.write(code, ln)
                if size:
                    bw.write(_amplitude_bits(diff, size), size)
                # AC run/size
                run = 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = enc_ac[t][0xF0]  # ZRL
                        bw.write(code, ln)
                        run -= 16
                    size = _category(v)
                    code, ln = enc_ac[t][(run << 4) | size]
                    bw.write(code, ln)
                    bw.write(_amplitude_bits(v, size), size)
                    run = 0
                if run:
                    code, ln = enc_ac[t][0x00]  # EOB
                    bw.write(code, ln)
    bw.flush()

    def _dqt(tid: int, q: np.ndarray) -> bytes:
        return _segment(0xDB, bytes([tid]) + bytes(
            int(x) for x in q.reshape(-1)[_ZIGZAG]))

    def _dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return _segment(0xC4, bytes([(cls << 4) | tid]) + bytes(bits)
                        + bytes(vals))

    sof = _segment(0xC0, struct.pack(">BHHB", 8, h, w, 3)
                   + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]))
    sos = _segment(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    jfif = _segment(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    return (b"\xFF\xD8" + jfif + _dqt(0, qt_l) + _dqt(1, qt_c)
            + _dht(0, 0, _DC_LUM_BITS, _DC_LUM_VALS)
            + _dht(1, 0, _AC_LUM_BITS, _AC_LUM_VALS)
            + _dht(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
            + _dht(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)
            + sof + sos + bytes(bw.out) + b"\xFF\xD9")


def jpeg_pixels(payload: bytes) -> np.ndarray:
    """Decode a baseline (SOF0) Huffman JPEG without chroma subsampling
    to an (h, w, 3) uint8 RGB array. Quant + Huffman tables are read
    from the stream, so any 4:4:4 baseline file decodes — not just this
    module's encoder output."""
    if payload[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    h = w = None
    comps: list[tuple[int, int, int]] = []  # (comp_id, sampling, quant_tid)
    scan: list[tuple[int, int, int]] = []   # (comp_id, dc_tid, ac_tid)
    data = b""
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG: bad marker alignment")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        length = struct.unpack_from(">H", payload, pos + 2)[0]
        seg = payload[pos + 4:pos + 2 + length]
        if marker == 0xDB:
            p = 0
            while p < len(seg):
                prec_id = seg[p]
                if prec_id >> 4:
                    raise NotImplementedError("16-bit quant table")
                zz = np.frombuffer(seg, np.uint8, 64, p + 1).astype(np.int32)
                tbl = np.zeros(64, np.int32)
                tbl[_ZIGZAG] = zz
                quant[prec_id & 0xF] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC4:
            p = 0
            while p < len(seg):
                cls_id = seg[p]
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                vals = list(seg[p + 17:p + 17 + n])
                huff[(cls_id >> 4, cls_id & 0xF)] = _decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xC0:
            _prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            comps = [(seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i])
                     for i in range(nc)]
            if any(s != 0x11 for _, s, _q in comps):
                raise NotImplementedError("chroma subsampling")
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("non-baseline JPEG process")
        elif marker == 0xDA:
            ns = seg[0]
            scan = [(seg[1 + 2 * i], seg[2 + 2 * i] >> 4,
                     seg[2 + 2 * i] & 0xF) for i in range(ns)]
            data = payload[pos + 2 + length:]
            end = data.rfind(b"\xFF\xD9")
            if end >= 0:
                data = data[:end]
            pos = len(payload)
            break
        pos += 2 + length
    if h is None or not scan:
        raise ValueError("JPEG: missing SOF/SOS")

    br = _BitReader(data)
    ph, pw = (h + 7) & ~7, (w + 7) & ~7
    out = np.zeros((ph, pw, len(comps)), dtype=np.float64)
    prev_dc = [0] * len(comps)
    comp_q = {cid: quant[qid] for cid, _s, qid in comps}
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for ci, (cid, dc_t, ac_t) in enumerate(scan):
                dc_tbl, ac_tbl = huff[(0, dc_t)], huff[(1, ac_t)]
                zz = np.zeros(64, dtype=np.int64)
                size = br.read_symbol(dc_tbl)
                diff = _extend(br.read_bits(size), size) if size else 0
                prev_dc[ci] += diff
                zz[0] = prev_dc[ci]
                k = 1
                while k < 64:
                    rs = br.read_symbol(ac_tbl)
                    run, size = rs >> 4, rs & 0xF
                    if rs == 0x00:      # EOB
                        break
                    if rs == 0xF0:      # ZRL
                        k += 16
                        continue
                    k += run
                    if k > 63:
                        raise ValueError("JPEG: AC index overflow")
                    zz[k] = _extend(br.read_bits(size), size)
                    k += 1
                coef = np.zeros(64, dtype=np.float64)
                coef[_ZIGZAG] = zz
                block = coef.reshape(8, 8) * comp_q[cid]
                out[by:by + 8, bx:bx + 8, ci] = _DCT.T @ block @ _DCT
    ycc = out[:h, :w, :] + 128.0
    if len(comps) == 3:
        return _ycbcr_to_rgb(ycc)
    return np.clip(np.round(ycc[..., 0]), 0, 255).astype(np.uint8)[..., None]


def decode_jpeg(payload: bytes) -> dict:
    """Decode a baseline JPEG to per-pixel statistics (lossy codec —
    statistics reflect the reconstruction, as with any JPEG reader)."""
    pixels = jpeg_pixels(payload)
    h, w, ch = pixels.shape
    return {
        "width": int(w), "height": int(h), "n_channels": int(ch),
        "feat_mean": float(pixels.mean()),
    }

"""GIF87a codec in pure numpy/stdlib — palette-indexed images with
real variable-width LZW compression (the one mainstream lossless
format class the BMP/PPM/PNG/JPEG family didn't cover: dictionary
coding over an indexed palette).

Decoder reads GIF87a/GIF89a: logical screen descriptor, global/local
color tables, 0x21 extension blocks (skipped), image descriptor, and
the LZW-compressed index stream (LSB-first variable-width codes,
CLEAR/EOI handling, 12-bit dictionary cap). Interlaced images raise —
the synthetic corpus never produces them, and real ones would need the
four-pass row shuffle.

Encoder writes GIF87a with a global color table built from the image's
unique colors (≤ 256 required — palette formats quantize by
definition; the synthetic GIF class generates grayscale so the palette
is exact) and a standard LZW compressor (dict reset on overflow).
"""

from __future__ import annotations

import struct

import numpy as np


# -- LZW ---------------------------------------------------------------------

def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader, LSB first
    acc = 0
    nbits = 0
    pos = 0
    code_size = min_code_size + 1
    dictionary: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None

    while True:
        while nbits < code_size:
            if pos >= len(data):
                return bytes(out)  # truncated stream: emit what we have
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size

        if code == clear:
            dictionary = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            entry = dictionary[code]
        elif code < len(dictionary):
            entry = dictionary[code]
            dictionary.append(prev + entry[:1])
        elif code == len(dictionary):
            entry = prev + prev[:1]
            dictionary.append(entry)
        else:
            raise ValueError(f"corrupt LZW stream: code {code}")
        out += entry
        prev = entry
        if len(dictionary) == (1 << code_size) and code_size < 12:
            code_size += 1


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, code_size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    code_size = min_code_size + 1
    emit(clear, code_size)
    w = b""
    for b in indices:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w], code_size)
        if next_code < 4096:
            table[wc] = next_code
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
            next_code += 1
        else:
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w], code_size)
    emit(eoi, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# -- container ---------------------------------------------------------------

def encode_gif(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as GIF87a. The image must
    use ≤ 256 distinct colors (palette formats quantize by definition;
    callers wanting arbitrary RGB should quantize first)."""
    h, w, _ = pixels.shape
    flat = pixels.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"GIF needs <=256 colors, image has {len(palette)}")
    # pad palette to a power of two >= 2
    bits = max(1, int(np.ceil(np.log2(max(len(palette), 2)))))
    padded = np.zeros((1 << bits, 3), dtype=np.uint8)
    padded[: len(palette)] = palette
    indices = inverse.astype(np.uint8).tobytes()

    out = bytearray(b"GIF87a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0])
    out += padded.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    min_code_size = max(2, bits)
    out.append(min_code_size)
    comp = _lzw_encode(indices, min_code_size)
    for i in range(0, len(comp), 255):
        chunk = comp[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def gif_pixels(payload: bytes) -> np.ndarray:
    """Decode a non-interlaced GIF87a/89a first frame to (h, w, 3)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        block = payload[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += payload[pos] + 1
            pos += 1
        elif block == 0x2C:
            left, top, w, h, ipacked = struct.unpack_from("<HHHHB", payload,
                                                          pos + 1)
            pos += 10
            if ipacked & 0x40:
                raise NotImplementedError("interlaced GIF")
            table = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                table = np.frombuffer(payload, np.uint8, n * 3, pos) \
                    .reshape(n, 3)
                pos += n * 3
            if table is None:
                raise ValueError("GIF image with no color table")
            min_code_size = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                data += payload[pos + 1: pos + 1 + ln]
                pos += ln + 1
            idx = np.frombuffer(
                _lzw_decode(bytes(data), min_code_size), np.uint8)
            if len(idx) < w * h:
                raise ValueError("GIF index stream too short")
            return table[idx[: w * h]].reshape(h, w, 3)
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image data")


def decode_gif(payload: bytes) -> dict:
    """Decode a GIF to per-pixel statistics."""
    pixels = gif_pixels(payload)
    h, w, _ = pixels.shape
    return {
        "width": int(w), "height": int(h), "n_channels": 3,
        "feat_mean": float(pixels.mean()),
    }

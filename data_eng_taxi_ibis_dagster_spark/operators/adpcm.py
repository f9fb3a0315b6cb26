"""IMA ADPCM WAV codec (format tag 0x11) in pure Python/numpy — real
COMPRESSED audio for the multimodal family (4 bits/sample predictive
coding, 4:1 vs PCM16), complementing the PNG/JPEG/GIF compressed-image
codecs so both media families exercise a genuine decompression path.

Single-block layout (one block per clip — fixture clips are short;
multi-block streams would just repeat the per-block header): the
4-byte block header carries the initial predictor (sample 0) and step
index, then each remaining sample is one 4-bit code, low nibble first.
Encode and decode share the same reconstruction arithmetic, so the
encoder tracks exactly what the decoder will rebuild (the standard
IMA feedback loop).
"""

from __future__ import annotations

import struct

import numpy as np

STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]


def _reconstruct(code: int, pred: int, index: int) -> tuple[int, int]:
    """Shared decoder arithmetic: next (pred, index) for a 4-bit code."""
    step = STEP_TABLE[index]
    diffq = step >> 3
    if code & 4:
        diffq += step
    if code & 2:
        diffq += step >> 1
    if code & 1:
        diffq += step >> 2
    pred = pred - diffq if code & 8 else pred + diffq
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + INDEX_TABLE[code & 7]))
    return pred, index


def _encode_codes(samples: np.ndarray, pred: int, index: int) -> bytes:
    codes = bytearray()
    for s in samples.tolist():
        step = STEP_TABLE[index]
        diff = s - pred
        code = 0
        if diff < 0:
            code = 8
            diff = -diff
        if diff >= step:
            code |= 4
            diff -= step
        if diff >= step >> 1:
            code |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            code |= 1
        pred, index = _reconstruct(code, pred, index)
        codes.append(code)
    packed = bytearray()
    for i in range(0, len(codes), 2):
        lo = codes[i]
        hi = codes[i + 1] if i + 1 < len(codes) else 0
        packed.append(lo | (hi << 4))
    return bytes(packed)


def encode_wav_adpcm(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode an int16 mono array as a single-block IMA ADPCM WAV."""
    s = np.asarray(samples, dtype=np.int16).reshape(-1)
    n = len(s)
    pred0 = int(s[0]) if n else 0
    block = struct.pack("<hBB", pred0, 0, 0) + _encode_codes(s[1:], pred0, 0)
    block_align = len(block)
    byte_rate = (sample_rate * block_align + n - 1) // max(n, 1)
    fmt = struct.pack("<HHIIHHHH", 0x11, 1, sample_rate, byte_rate,
                      block_align, 4, 2, n)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"fact" + struct.pack("<II", 4, n)
              + b"data" + struct.pack("<I", len(block)) + block
              + (b"\x00" if len(block) % 2 else b""))
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def wav_chunks(payload: bytes) -> dict[bytes, bytes]:
    """Walk a RIFF/WAVE container into {chunk_id: data}."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    out: dict[bytes, bytes] = {}
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        ln = struct.unpack_from("<I", payload, pos + 4)[0]
        out[cid] = payload[pos + 8: pos + 8 + ln]
        pos += 8 + ln + (ln & 1)
    return out


def adpcm_samples(payload: bytes) -> np.ndarray:
    """Decode a mono single-block IMA ADPCM WAV to int16 samples."""
    chunks = wav_chunks(payload)
    fmt = chunks[b"fmt "]
    tag, channels, _rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", fmt)
    if tag != 0x11 or channels != 1 or bits != 4:
        raise NotImplementedError(
            f"ADPCM decoder handles mono 4-bit fmt 0x11, got tag={tag} "
            f"ch={channels} bits={bits}")
    n = struct.unpack_from("<I", chunks[b"fact"])[0] if b"fact" in chunks \
        else None
    data = chunks[b"data"]
    pred, index = struct.unpack_from("<hB", data)
    index = max(0, min(88, index))
    out = [pred]
    for byte in data[4:]:
        for code in (byte & 0x0F, byte >> 4):
            pred, index = _reconstruct(code, pred, index)
            out.append(pred)
    if n is not None:
        out = out[:n]
    return np.array(out, dtype=np.int16)


def wav_format_tag(payload: bytes) -> int:
    """The WAVE format tag (1 = PCM, 0x11 = IMA ADPCM, ...)."""
    return struct.unpack_from("<H", wav_chunks(payload)[b"fmt "])[0]


def decode_wav_adpcm(payload: bytes) -> dict:
    """Decode an IMA ADPCM WAV to the standard per-sample statistics."""
    chunks = wav_chunks(payload)
    rate = struct.unpack_from("<HHI", chunks[b"fmt "])[2]
    samples = adpcm_samples(payload)
    return {
        "n_channels": 1, "sample_rate": int(rate),
        "duration_ms": int(len(samples) * 1000 // rate),
        "feat_mean": float(np.sqrt(np.mean((samples / 32768.0) ** 2)))
        if len(samples) else 0.0,
    }

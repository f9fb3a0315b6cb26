"""Baseline JPEG codec: stream structure, round-trip reconstruction
bounds (lossy — bounded error, not equality), determinism, and decoder
strictness on unsupported processes."""

import struct

import numpy as np
import pytest

from data_eng_taxi_ibis_dagster_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
    jpeg_pixels,
)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([
        yy * 255 // max(h - 1, 1),
        xx * 255 // max(w - 1, 1),
        (yy + xx) * 127 // max(h + w - 2, 1),
    ], axis=-1).astype(np.uint8)


def test_jpeg_roundtrip_bounded_error():
    for h, w in [(16, 16), (8, 8), (24, 17), (7, 5), (1, 1)]:
        px = _gradient(h, w)
        got = jpeg_pixels(encode_jpeg(px))
        assert got.shape == (h, w, 3)
        err = np.abs(got.astype(int) - px.astype(int))
        # quality-75 baseline on smooth content: small bounded error
        assert err.max() <= 20, (h, w, err.max())
        assert err.mean() <= 5.0


def test_jpeg_stats_and_determinism():
    px = _gradient(16, 16)
    a, b = encode_jpeg(px), encode_jpeg(px)
    assert a == b  # fixed tables, no RNG
    d = decode_jpeg(a)
    assert (d["width"], d["height"], d["n_channels"]) == (16, 16, 3)
    assert abs(d["feat_mean"] - float(px.mean())) < 3.0


def test_jpeg_stream_structure():
    """SOI/JFIF/DQT/DHT/SOF0/SOS/EOI markers present, well-formed
    lengths, and a stuffed entropy stream (no bare 0xFF before EOI)."""
    payload = encode_jpeg(_gradient(9, 13))
    assert payload[:2] == b"\xFF\xD8" and payload[-2:] == b"\xFF\xD9"
    pos, seen = 2, []
    while pos < len(payload) - 2:
        assert payload[pos] == 0xFF
        marker = payload[pos + 1]
        seen.append(marker)
        length = struct.unpack_from(">H", payload, pos + 2)[0]
        if marker == 0xDA:
            scan = payload[pos + 2 + length:-2]
            i = 0
            while i < len(scan):
                if scan[i] == 0xFF:
                    assert scan[i + 1] == 0x00, "unstuffed 0xFF in scan"
                    i += 1
                i += 1
            break
        pos += 2 + length
    assert 0xE0 in seen and 0xC0 in seen and 0xDB in seen and 0xC4 in seen


def test_jpeg_rejects_unsupported():
    with pytest.raises(ValueError):
        jpeg_pixels(b"not a jpeg")
    # progressive (SOF2) must raise NotImplementedError, not mis-decode
    payload = bytearray(encode_jpeg(_gradient(8, 8)))
    idx = bytes(payload).find(b"\xFF\xC0")
    payload[idx + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        jpeg_pixels(bytes(payload))


def test_jpeg_grayscale_single_component():
    """A 1-component stream decodes through the same MCU loop."""
    # build gray by re-encoding the Y plane via a 3-channel gray image
    g = np.repeat(np.arange(0, 64, 4, dtype=np.uint8).reshape(4, 4)[..., None]
                  * 4, 3, axis=-1)
    got = jpeg_pixels(encode_jpeg(g))
    # gray input → equal channels out (chroma ≈ 128 → r≈g≈b)
    spread = np.abs(got.astype(int).max(axis=-1) - got.astype(int).min(axis=-1))
    assert spread.max() <= 4

"""PNG codec tests: roundtrip fidelity per filter type, CRC/gate
behavior — the byte-level properties the corpus-level oracle can't
isolate."""

from __future__ import annotations

import struct
import zlib

import pytest

from kamiyo_hive_spark.functions.png import _paeth, decode_png, encode_png


def test_roundtrip_exercises_all_filters():
    w, h = 17, 11  # odd sizes catch off-by-one in stride math
    payload = encode_png(w, h, lambda x, y: (x * x + 3 * y) % 256)
    d = decode_png(payload)
    assert (d["width"], d["height"]) == (w, h)
    assert d["filters_seen"] == [0, 1, 2, 3, 4]
    want = sum((x * x + 3 * y) % 256 for x in range(w) for y in range(h)) / (w * h)
    assert d["mean_luma"] == pytest.approx(want, abs=1e-12)


def test_paeth_predictor_spec_cases():
    # ties break left, then up (PNG spec 6.6)
    assert _paeth(1, 1, 1) == 1
    assert _paeth(5, 5, 0) == 5      # pa == pb -> left
    assert _paeth(0, 10, 5) == 5     # pc strictly smallest -> up-left
    assert _paeth(10, 0, 9) == 0     # up closest to p
    assert _paeth(3, 7, 9) == 3


def test_crc_corruption_rejected():
    payload = bytearray(encode_png(8, 8, lambda x, y: x * y % 256))
    payload[40] ^= 0xFF  # flip a byte inside IDAT
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(payload))


def test_unsupported_formats_gate():
    payload = bytearray(encode_png(8, 8, lambda x, y: 0))
    # rewrite IHDR: color type 2 (RGB) with fixed CRC
    ihdr = struct.pack(">IIBBBBB", 8, 8, 8, 2, 0, 0, 0)
    chunk = (
        struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    doctored = bytes(payload[:8]) + chunk + bytes(payload[8 + len(chunk):])
    with pytest.raises(NotImplementedError, match="grayscale"):
        decode_png(doctored)


def test_truncation_rejected():
    payload = encode_png(8, 8, lambda x, y: x)
    with pytest.raises(ValueError):
        decode_png(payload[: len(payload) // 2])

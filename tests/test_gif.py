"""GIF codec tests: LZW boundary behavior, sub-block frame skipping,
and the format gates — byte-level properties the oracle can't name."""

from __future__ import annotations

import random

import pytest

from kamiyo_hive_spark.functions.gif import (
    _lzw_decode,
    _lzw_encode,
    encode_gif,
    sample_gif_frames,
)


def test_lzw_roundtrip_boundaries():
    rnd = random.Random(7)
    cases = [
        bytes([5]) * 10,
        bytes(range(256)) * 3,
        bytes(rnd.randrange(256) for _ in range(20000)),  # crosses 4096 clear
        bytes([1, 1, 1, 1, 2] * 100),  # KwKwK runs
        bytes(rnd.choice([0, 1]) for _ in range(30000)),  # slow dict growth
    ]
    for d in cases:
        assert _lzw_decode(_lzw_encode(d, 8), 8, len(d)) == d


def test_frame_stride_skips_decode():
    frames = [(lambda f: lambda x, y: (x + y + f) % 256)(i) for i in range(6)]
    payload = encode_gif(16, 8, frames)
    d = sample_gif_frames(payload, stride=2)
    assert d["n_frames"] == 6 and d["n_sampled"] == 3
    assert 0 < d["decoded_bytes"] < d["total_image_bytes"]
    # sampled means match a pure-python replay of frames 0, 2, 4
    for i, f in enumerate((0, 2, 4)):
        want = sum((x + y + f) % 256 for x in range(16) for y in range(8)) / 128
        assert d["sampled_means"][i] == pytest.approx(want)


def test_stride_one_decodes_everything():
    frames = [(lambda f: lambda x, y: (3 * x + f) % 256)(i) for i in range(3)]
    d = sample_gif_frames(encode_gif(8, 8, frames), stride=1)
    assert d["n_sampled"] == 3
    assert d["decoded_bytes"] == d["total_image_bytes"]


def test_gates():
    payload = bytearray(encode_gif(8, 8, [lambda x, y: 0]))
    payload[6 + 4] &= 0x7F  # clear the global-color-table flag
    with pytest.raises(NotImplementedError, match="global color table"):
        sample_gif_frames(bytes(payload), stride=1)
    with pytest.raises(ValueError, match="signature"):
        sample_gif_frames(b"NOTGIF" + bytes(20), stride=1)

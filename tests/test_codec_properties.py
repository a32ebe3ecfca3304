"""Property-based hardening for the dependency-free codecs (pure
Python, no Spark): the existing codec tests pin fixed examples; these
drive randomized inputs through the encode→decode loops so packing
edges (variable LZW widths, dictionary resets, odd nibble counts, all
five PNG filters on arbitrary data) are exercised systematically."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from kamiyo_hive_spark.functions.adpcm import (
    _step,
    decode_adpcm_wav,
    encode_adpcm_wav,
)
from kamiyo_hive_spark.functions.gif import _lzw_decode, _lzw_encode
from kamiyo_hive_spark.functions.png import decode_png, encode_png

# ---------------------------------------------------------------- GIF LZW


@settings(max_examples=60, deadline=None)
@given(
    min_code=st.integers(2, 8),
    data=st.binary(min_size=0, max_size=400),
)
def test_lzw_roundtrip_random(min_code, data):
    # clamp symbols into the alphabet the code size allows
    alpha = (1 << min_code) - 1
    clamped = bytes(b & alpha for b in data)
    enc = _lzw_encode(clamped, min_code)
    assert _lzw_decode(enc, min_code, len(clamped)) == clamped


@settings(max_examples=25, deadline=None)
@given(
    runs=st.lists(
        st.tuples(st.integers(0, 3), st.integers(1, 600)),
        min_size=1,
        max_size=40,
    )
)
def test_lzw_roundtrip_long_runs_hit_width_growth_and_reset(runs):
    """Run-heavy inputs grow the dictionary fast: code width must step
    3→12 bits and the encoder must emit a CLEAR at 4096 entries — the
    two packing edges fixed examples rarely reach."""
    data = b"".join(bytes([sym]) * n for sym, n in runs)
    enc = _lzw_encode(data, 2)
    assert _lzw_decode(enc, 2, len(data)) == data


def test_lzw_kwkwk_edge():
    """cScSc pattern forces the decoder's code == len(table) branch."""
    data = b"\x01\x02\x01\x02\x01\x02\x01"
    enc = _lzw_encode(data, 2)
    assert _lzw_decode(enc, 2, len(data)) == data


# ---------------------------------------------------------------- PNG


@settings(max_examples=40, deadline=None)
@given(
    width=st.integers(1, 16),
    height=st.integers(1, 16),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_exact_mean_all_filters(width, height, seed):
    """encode_png cycles all five scanline filters (row % 5); the
    decoded mean must equal the source mean EXACTLY (same int sum,
    same division) for arbitrary pixel data — any unfilter bug on any
    row shifts the sum."""
    import random

    rng = random.Random(seed)
    pixels = [[rng.randrange(256) for _ in range(width)] for _ in range(height)]
    data = encode_png(width, height, lambda x, y: pixels[y][x])
    got = decode_png(data)
    assert got["width"] == width and got["height"] == height
    assert got["n_pixels"] == width * height
    want_mean = sum(map(sum, pixels)) / (width * height)
    assert got["mean_luma"] == want_mean
    if height >= 5:
        assert set(got["filters_seen"]) == {0, 1, 2, 3, 4}


def test_png_tampered_idat_crc_rejected():
    data = bytearray(encode_png(4, 4, lambda x, y: (x * 16 + y) & 0xFF))
    idat = data.index(b"IDAT")
    data[idat + 6] ^= 0x01  # flip a bit inside the IDAT body
    import pytest

    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))


# ---------------------------------------------------------------- ADPCM


def _reference_block_stats(blocks):
    """Test-local fold straight over the nibble triples — independent
    of the container layer (byte packing, header layout) that
    encode/decode must agree on."""
    total = n = 0
    vmin, vmax = 32767, -32768
    for p0, i0, nibs in blocks:
        pred, idx = p0, i0
        total += pred
        n += 1
        vmin, vmax = min(vmin, pred), max(vmax, pred)
        for nib in nibs:
            pred, idx = _step(pred, idx, nib)
            total += pred
            n += 1
            vmin, vmax = min(vmin, pred), max(vmax, pred)
    return {"n_samples": n, "sum_samples": total, "min_sample": vmin, "max_sample": vmax}


@settings(max_examples=40, deadline=None)
@given(
    block_align=st.sampled_from([8, 12, 36, 256]),
    n_blocks=st.integers(1, 4),
    seed=st.integers(0, 2**31 - 1),
)
def test_adpcm_container_roundtrip_matches_state_machine(block_align, n_blocks, seed):
    """The container layer (nibble order low-first, 4-byte block
    headers, header predictor IS sample 0) must reproduce the plain
    state-machine fold exactly for random predictors/indexes/nibbles."""
    import random

    rng = random.Random(seed)
    n_nib = (block_align - 4) * 2
    blocks = [
        (
            rng.randrange(-32768, 32768),
            rng.randrange(0, 89),
            [rng.randrange(16) for _ in range(n_nib)],
        )
        for _ in range(n_blocks)
    ]
    got = decode_adpcm_wav(encode_adpcm_wav(blocks, block_align))
    want = _reference_block_stats(blocks)
    assert got["n_blocks"] == n_blocks
    for k, v in want.items():
        assert got[k] == v, k


def test_adpcm_non_ima_tag_refuses():
    import struct

    import pytest

    wav = bytearray(encode_adpcm_wav([(0, 0, [0] * 8)], 8))
    fmt_at = wav.index(b"fmt ") + 8
    struct.pack_into("<H", wav, fmt_at, 0x01)  # claim plain PCM
    with pytest.raises(NotImplementedError, match="format tag"):
        decode_adpcm_wav(bytes(wav))


# ------------------------------------------------------- BMP / WAV kits

from kamiyo_hive_spark.operators.multimodal import _afeat_kit, _phash_kit


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 16),
    data=st.data(),
)
def test_bmp_roundtrip_random_grids(w, h, data):
    _, encode_bmp, decode_bmp, _ = _phash_kit()
    rows = [
        [data.draw(st.integers(0, 255)) for _ in range(w)] for _ in range(h)
    ]
    assert decode_bmp(encode_bmp(rows)) == rows


@settings(max_examples=40, deadline=None)
@given(
    rate=st.sampled_from([8000, 16000, 44100]),
    samples=st.lists(st.integers(-32768, 32767), min_size=0, max_size=600),
)
def test_wav_roundtrip_random_samples(rate, samples):
    _, encode_wav, decode_wav = _afeat_kit()
    r, back = decode_wav(encode_wav(rate, samples))
    assert r == rate and back == samples

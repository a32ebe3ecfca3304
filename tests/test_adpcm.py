"""IMA ADPCM codec tests: clamp edges and format gates the corpus
oracle may not hit."""

from __future__ import annotations

import struct

import pytest

from kamiyo_hive_spark.functions.adpcm import (
    STEP_TABLE,
    _step,
    decode_adpcm_wav,
    encode_adpcm_wav,
)


def test_predictor_clamps():
    # max positive step from the top of the table must clamp at 32767
    pred, idx = _step(32000, 88, 0b0111)  # +step*(1+1/2+1/4)+step/8
    assert pred == 32767 and idx == 88  # index clamped at 88 too
    pred, idx = _step(-32000, 88, 0b1111)
    assert pred == -32768
    # index clamp at 0: small nibbles decrement
    _, idx = _step(0, 0, 0b0000)
    assert idx == 0


def test_roundtrip_stats_match_pure_python():
    blocks = []
    for blk in range(3):
        p0, i0 = (blk * 1000 - 500), blk * 30
        nibs = [(5 * k + blk) % 16 for k in range(64)]
        blocks.append((p0, i0, nibs))
    payload = encode_adpcm_wav(blocks, 36)
    d = decode_adpcm_wav(payload)
    # pure-python replay
    total, n, vmin, vmax = 0, 0, 32767, -32768
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
    assert (d["n_samples"], d["sum_samples"], d["min_sample"], d["max_sample"]) == (
        n, total, vmin, vmax
    )
    assert d["n_blocks"] == 3


def test_pcm_rejected():
    # a PCM wav (tag 1) must raise, not silently misdecode
    frames = struct.pack("<4h", 1, 2, 3, 4)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    wav = (
        struct.pack("<4sI4s", b"RIFF", 36 + len(frames), b"WAVE")
        + struct.pack("<4sI", b"fmt ", 16) + fmt
        + struct.pack("<4sI", b"data", len(frames)) + frames
    )
    with pytest.raises(NotImplementedError, match="IMA"):
        decode_adpcm_wav(wav)


def test_step_table_is_spec():
    assert len(STEP_TABLE) == 89
    assert STEP_TABLE[0] == 7 and STEP_TABLE[88] == 32767
    assert all(a < b for a, b in zip(STEP_TABLE, STEP_TABLE[1:]))

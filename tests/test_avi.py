"""AVI/MJPEG container tests: the properties the oracle can't see —
honest codec gates, padding rules, index cross-checks, and the
selective-decode guarantee (sampling must not decode unsampled frames).
"""

from __future__ import annotations

import struct

import pytest

from kamiyo_hive_spark.functions.avi import _avi_kit


def _kit():
    return _avi_kit()


def _mk(frames_luma, w=32, h=16):
    enc, parse, sample, ejpeg = _kit()
    frames = [ejpeg(w, h, lambda b, a=a: a) for a in frames_luma]
    return enc(frames, w, h), parse, sample


def test_roundtrip_all_frames():
    avi, parse, sample = _mk([10, 20, 30, 40])
    s = sample(avi, stride=1)
    assert (s["width"], s["height"], s["n_frames"]) == (32, 16, 4)
    assert [f["mean_luma"] for f in s["sampled"]] == [10.0, 20.0, 30.0, 40.0]


def test_stride_sampling_decodes_only_sampled():
    avi, parse, sample = _mk([10, 20, 30, 40, 50])
    s = sample(avi, stride=2)
    assert [f["frame_idx"] for f in s["sampled"]] == [0, 2, 4]
    # corrupt an UNSAMPLED frame's JPEG body: stride-2 decode must not
    # touch it (the whole point of sampling), stride-1 must blow up
    meta = parse(avi)
    pos, size = meta["frame_pos"][1]
    broken = bytearray(avi)
    broken[pos + 2 : pos + size] = b"\xff" * (size - 2)
    broken = bytes(broken)
    s2 = sample(broken, stride=2)
    assert [f["mean_luma"] for f in s2["sampled"]] == [10.0, 30.0, 50.0]
    with pytest.raises(Exception):
        sample(broken, stride=1)


def test_odd_sized_frames_respect_padding():
    """RIFF pads odd-sized chunks to even; frame positions after an
    odd-length JPEG must still parse."""
    enc, parse, sample, ejpeg = _kit()
    frames = [ejpeg(16, 16, lambda b: 77)]
    # force odd length by appending a comment-free odd tail? JPEG ends
    # at EOI; append nothing — instead check both parities by building
    # two frames where the first happens to be odd OR even, then assert
    # parse sees both regardless.
    f0 = frames[0]
    if len(f0) % 2 == 0:
        # make an odd-length valid JPEG by inserting a COM segment of
        # odd payload before EOI
        com = b"\xff\xfe" + struct.pack(">H", 3) + b"x"
        f0 = f0[:2] + com + f0[2:]
        assert len(f0) % 2 == 1
    avi = enc([f0, frames[0]], 16, 16)
    s = sample(avi, stride=1)
    assert s["n_frames"] == 2
    assert [f["mean_luma"] for f in s["sampled"]] == [77.0, 77.0]


def test_non_mjpeg_codec_raises_not_implemented():
    avi, parse, _ = _mk([5])
    mutated = avi.replace(b"vidsMJPG", b"vidsH264")
    with pytest.raises(NotImplementedError, match="H264"):
        parse(mutated)


def test_not_an_avi_raises():
    _, parse, _ = _mk([5])
    with pytest.raises(NotImplementedError):
        parse(b"\x00" * 64)
    with pytest.raises(NotImplementedError):
        parse(b"RIFF" + struct.pack("<I", 4) + b"WAVE")


def test_idx1_frame_count_mismatch_detected():
    avi, parse, _ = _mk([5, 6, 7])
    # truncate the idx1 chunk to 2 entries: the cross-check must fire
    idx_at = avi.rindex(b"idx1")
    (size,) = struct.unpack("<I", avi[idx_at + 4 : idx_at + 8])
    assert size == 3 * 16
    broken = (
        avi[:idx_at + 4] + struct.pack("<I", 2 * 16) + avi[idx_at + 8 : idx_at + 8 + 32]
    )
    with pytest.raises(ValueError, match="idx1"):
        parse(broken)


def test_truncated_movi_chunk_raises():
    avi, parse, _ = _mk([5, 6])
    meta = parse(avi)
    pos, size = meta["frame_pos"][1]
    with pytest.raises(ValueError, match="overruns"):
        parse(avi[: pos + size // 2])

"""MP4/ISO-BMFF container tests: the properties the oracle can't see —
sample-table consistency cross-checks, stss 1-based indexing, stsc
chunk-run expansion, honest codec gates, and the selective-decode
guarantee (keyframe sampling must never read unsampled mdat bytes).
"""

from __future__ import annotations

import struct

import pytest

from kamiyo_hive_spark.functions.mp4 import _mp4_kit


def _kit():
    return _mp4_kit()


def _mk(frames_luma, w=32, h=16, k=1):
    enc, parse, sample, ejpeg = _kit()
    frames = [ejpeg(w, h, lambda b, a=a: a) for a in frames_luma]
    return enc(frames, w, h, keyframe_every=k), parse, sample


def test_roundtrip_all_frames():
    mp4, parse, sample = _mk([10, 20, 30, 40])
    s = sample(mp4, stride=1)
    assert (s["width"], s["height"], s["n_frames"]) == (32, 16, 4)
    assert s["n_keyframes"] == 4  # keyframe_every=1
    assert [f["mean_luma"] for f in s["sampled"]] == [10.0, 20.0, 30.0, 40.0]


def test_sync_table_and_pts():
    mp4, parse, _ = _mk([1, 2, 3, 4, 5, 6, 7], k=3)
    m = parse(mp4)
    assert [s["is_sync"] for s in m["samples"]] == [
        True, False, False, True, False, False, True,
    ]
    # stts: uniform delta run → monotone pts
    assert [s["pts"] for s in m["samples"]] == [0, 100, 200, 300, 400, 500, 600]


def test_keyframe_stride_decodes_only_sampled():
    mp4, parse, sample = _mk([10, 20, 30, 40, 50, 60, 70], k=3)
    s = sample(mp4, stride=2)  # syncs 0,3,6 → sampled 0,6
    assert [f["frame_idx"] for f in s["sampled"]] == [0, 6]
    assert s["decoded_bytes"] < s["total_sample_bytes"]
    # corrupt every NON-sampled sample's body: stride-2 keyframe decode
    # must not touch them; full decode must blow up
    m = parse(mp4)
    broken = bytearray(mp4)
    for i, smp in enumerate(m["samples"]):
        if i not in (0, 6):
            broken[smp["offset"] + 2 : smp["offset"] + smp["size"]] = b"\xff" * (
                smp["size"] - 2
            )
    broken = bytes(broken)
    s2 = sample(broken, stride=2)
    assert [f["mean_luma"] for f in s2["sampled"]] == [10.0, 70.0]
    with pytest.raises(Exception):
        sample(broken, stride=1)


def test_non_jpeg_codec_indexes_but_does_not_decode():
    """Range planning works for any codec; decode is honestly gated."""
    mp4, parse, sample = _mk([5, 6])
    stsd_at = mp4.rindex(b"stsd")
    entry_type_at = stsd_at + 4 + 8 + 4  # fourcc + fullbox + count + size
    assert mp4[entry_type_at : entry_type_at + 4] == b"jpeg"
    mutated = mp4[:entry_type_at] + b"avc1" + mp4[entry_type_at + 4 :]
    m = parse(mutated)
    assert m["codec"] == "avc1" and m["n_samples"] == 2
    assert [s["offset"] for s in m["samples"]] == [
        s["offset"] for s in parse(mp4)["samples"]
    ]
    with pytest.raises(NotImplementedError, match="avc1"):
        sample(mutated)


def test_not_isobmff_raises():
    _, parse, _ = _mk([5])
    with pytest.raises(NotImplementedError):
        parse(b"\x00" * 64)
    with pytest.raises(NotImplementedError):
        parse(b"RIFF" + struct.pack("<I", 4) + b"AVI ")


def test_table_disagreement_detected():
    """stts claiming a different sample count than stsz must fire."""
    mp4, parse, _ = _mk([5, 6, 7])
    stts_at = mp4.rindex(b"stts")
    body = stts_at + 4 + 4  # fourcc + fullbox
    (n_runs,) = struct.unpack(">I", mp4[body : body + 4])
    assert n_runs == 1
    cnt_at = body + 4
    broken = (
        mp4[:cnt_at] + struct.pack(">I", 2) + mp4[cnt_at + 4 :]
    )  # run says 2 samples, stsz says 3
    with pytest.raises(ValueError, match="stts"):
        parse(broken)


def test_truncated_container_raises():
    mp4, parse, _ = _mk([5, 6])
    with pytest.raises(ValueError, match="overruns|moov"):
        parse(mp4[: len(mp4) // 2])


def test_stsc_multi_chunk_expansion():
    """Hand-build a 2-chunk layout (2+1 samples) and check offsets
    follow stco+stsc, not the single-chunk fast path."""
    enc, parse, sample, ejpeg = _kit()
    frames = [ejpeg(16, 16, lambda b, a=a: a) for a in (11, 22, 33)]
    mp4 = enc(frames, 16, 16)
    sizes = [len(f) for f in frames]
    # rewrite stsc to two runs: chunk1 holds 2 samples, chunk2 holds 1;
    # rewrite stco to two offsets (mdat start, mdat start + first two)
    ftyp_len = struct.unpack(">I", mp4[0:4])[0]
    mdat_payload = ftyp_len + 8
    stsc_at = mp4.rindex(b"stsc")
    old_stsc = mp4[stsc_at - 4 : stsc_at - 4 + struct.unpack(">I", mp4[stsc_at - 4 : stsc_at])[0]]
    new_stsc_payload = struct.pack(">I", 0) + struct.pack(
        ">I", 2
    ) + struct.pack(">III", 1, 2, 1) + struct.pack(">III", 2, 1, 1)
    new_stsc = struct.pack(">I", 8 + len(new_stsc_payload)) + b"stsc" + new_stsc_payload
    stco_at = mp4.rindex(b"stco")
    old_stco = mp4[stco_at - 4 : stco_at - 4 + struct.unpack(">I", mp4[stco_at - 4 : stco_at])[0]]
    new_stco_payload = struct.pack(">I", 0) + struct.pack(">I", 2) + struct.pack(
        ">II", mdat_payload, mdat_payload + sizes[0] + sizes[1]
    )
    new_stco = struct.pack(">I", 8 + len(new_stco_payload)) + b"stco" + new_stco_payload
    mutated = mp4.replace(old_stsc, new_stsc).replace(old_stco, new_stco)
    # fix enclosing box sizes: walk from moov down, adjusting lengths
    delta = (len(new_stsc) - len(old_stsc)) + (len(new_stco) - len(old_stco))
    if delta:
        # adjust moov/trak/mdia/minf/stbl sizes in place
        for four in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
            at = mutated.rindex(four)
            (sz,) = struct.unpack(">I", mutated[at - 4 : at])
            mutated = mutated[: at - 4] + struct.pack(">I", sz + delta) + mutated[at:]
    m = parse(mutated)
    offs = [s["offset"] for s in m["samples"]]
    assert offs == [
        mdat_payload,
        mdat_payload + sizes[0],
        mdat_payload + sizes[0] + sizes[1],
    ]
    s = sample(mutated, stride=1)
    assert [f["mean_luma"] for f in s["sampled"]] == [11.0, 22.0, 33.0]

"""Unit + invariant tests for the r5 pipeline additions: span cut-list,
PQ codebook training, perceptual-hash image dedup, audio frame features.

DuckDB parity for each registered query is covered generically by
tests/test_parity.py; these tests pin the codec kits' edge behavior
(tamper detection, padding math) and the operators' structural
invariants.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kamiyo_hive_spark.operators.clustering import (
    PQ_K,
    PQ_M,
    pq_train_codebooks,
)
from kamiyo_hive_spark.operators.dedup import span_dedup_cutlist
from kamiyo_hive_spark.operators.multimodal import (
    AFEAT_FRAME,
    PHASH_H,
    PHASH_HAM_T,
    PHASH_W,
    _afeat_kit,
    _phash_kit,
    audio_frame_features,
    image_phash_neardup,
)


# ---------------------------------------------------------------------------
# BMP kit (perceptual hash)
# ---------------------------------------------------------------------------


def test_bmp_roundtrip_identity():
    pixel, encode_bmp, decode_bmp, _ = _phash_kit()
    rows = [[(x * 7 + y * 31) % 256 for x in range(PHASH_W)] for y in range(PHASH_H)]
    assert decode_bmp(encode_bmp(rows)) == rows


def test_bmp_row_padding_exercised():
    # w=9 -> 27 data bytes/row -> 1 pad byte/row: total must reflect it
    _, encode_bmp, _, _ = _phash_kit()
    rows = [[0] * PHASH_W for _ in range(PHASH_H)]
    payload = encode_bmp(rows)
    assert len(payload) == 54 + PHASH_H * (3 * PHASH_W + ((-3 * PHASH_W) % 4))
    assert ((-3 * PHASH_W) % 4) == 1  # the chosen width really has padding


def test_bmp_tamper_detection():
    _, encode_bmp, decode_bmp, _ = _phash_kit()
    rows = [[10] * PHASH_W for _ in range(PHASH_H)]
    payload = bytearray(encode_bmp(rows))
    payload[0] = ord(b"X")  # break magic
    with pytest.raises(ValueError):
        decode_bmp(bytes(payload))
    payload = bytearray(encode_bmp(rows))
    payload[54] = 99  # blue != green/red -> not grayscale
    with pytest.raises(ValueError):
        decode_bmp(bytes(payload))


def test_dhash_bit_semantics():
    _, _, _, dhash = _phash_kit()
    flat = [[5] * PHASH_W for _ in range(PHASH_H)]
    assert dhash(flat) == 0
    rising = [list(range(PHASH_W)) for _ in range(PHASH_H)]
    assert dhash(rising) == sum(
        1 << (y * 8 + x) for y in range(PHASH_H) for x in range(PHASH_W - 1)
    )
    # flipping one local gradient flips exactly that bit
    one = [row[:] for row in flat]
    one[2][4] = 9  # p(4,2) > p(3,2) sets bit (2*8+3); p(5,2) < p(4,2) stays 0
    assert dhash(one) == 1 << (2 * 8 + 3)


def test_phash_neardup_recall_and_symmetry(spark, sf_dir):
    out = image_phash_neardup(spark, sf_dir).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in out}
    assert all(a < b for a, b in pairs)
    assert all(r["hamming"] <= PHASH_HAM_T for r in out)
    # every intra-group pair (variants of the same base image) is found
    import duckdb  # count the docs present at this scale factor

    n_docs = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/documents.parquet') "
        "WHERE doc_id < 360"
    ).fetchone()[0]
    groups = n_docs // 3
    expected = {
        (3 * g + i, 3 * g + j)
        for g in range(groups)
        for i, j in ((0, 1), (0, 2), (1, 2))
    }
    assert expected <= pairs


# ---------------------------------------------------------------------------
# WAV kit (audio features)
# ---------------------------------------------------------------------------


def test_wav_roundtrip_negative_samples():
    synth, encode_wav, decode_wav = _afeat_kit()
    samples = [-100, -1, 0, 1, 99, -32768, 32767]
    rate, back = decode_wav(encode_wav(16000, samples))
    assert rate == 16000 and back == samples


def test_wav_chunk_walk_skips_odd_length_junk():
    import struct

    synth, encode_wav, decode_wav = _afeat_kit()
    payload = encode_wav(8000, [1, -2, 3])
    # splice an odd-length junk chunk between fmt and data: the walker
    # must skip it including the pad byte
    fmt_end = 12 + 8 + 16
    junk = b"JUNK" + struct.pack("<I", 3) + b"abc" + b"\x00"
    spliced = payload[:fmt_end] + junk + payload[fmt_end:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    rate, back = decode_wav(spliced)
    assert rate == 8000 and back == [1, -2, 3]


def test_wav_tamper_detection():
    synth, encode_wav, decode_wav = _afeat_kit()
    payload = bytearray(encode_wav(8000, [5]))
    payload[0] = ord(b"X")
    with pytest.raises(ValueError):
        decode_wav(bytes(payload))


def test_audio_features_invariants(spark, sf_dir):
    out = audio_frame_features(spark, sf_dir).collect()
    assert out
    for r in out:
        assert r["n_frames"] >= 1  # n >= 120 > one frame
        assert r["max_frame_energy"] <= r["total_energy"]
        assert 0 <= r["total_zcr"] < r["n_frames"] * AFEAT_FRAME


# ---------------------------------------------------------------------------
# PQ codebook training
# ---------------------------------------------------------------------------


def test_pq_partitions_all_vectors(spark, sf_dir):
    import duckdb

    out = pq_train_codebooks(spark, sf_dir).collect()
    n_vecs = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchone()[0]
    per_sub: dict[int, int] = {}
    for r in out:
        assert 0 <= r["sub_id"] < PQ_M
        assert 0 <= r["cluster_id"] < PQ_K
        assert r["min_member"] <= r["max_member"]
        per_sub[r["sub_id"]] = per_sub.get(r["sub_id"], 0) + r["n_vecs"]
    # every subspace partitions the full corpus
    assert set(per_sub) == set(range(PQ_M))
    assert all(v == n_vecs for v in per_sub.values())


# ---------------------------------------------------------------------------
# Span cut-list
# ---------------------------------------------------------------------------


def test_span_cutlist_invariants(spark, sf_dir):
    out = span_dedup_cutlist(spark, sf_dir).collect()
    for r in out:
        # each merged range covers at least one full 32-token span
        assert r["tokens_cut"] >= 32 * 1
        assert r["n_dup_spans"] >= r["n_cut_ranges"]
        assert r["first_cut_start"] >= 1


def test_span_cutlist_never_cuts_first_occurrence(spark, sf_dir):
    """The globally-first occurrence of every duplicated span hash must
    survive: total cut occurrences == total occurrences - distinct
    duplicated hashes."""
    from kamiyo_hive_spark.catalog import parallel_table

    d = parallel_table(spark, sf_dir, "documents", "doc_id")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    n = F.size(toks)
    spans = F.when(
        n >= 32,
        F.transform(
            F.sequence(F.lit(1), n - 31, F.lit(16)),
            lambda p: F.md5(
                F.encode(F.concat_ws(" ", F.slice(toks, p, 32)), "UTF-8")
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    occ = d.select(F.explode(spans).alias("h"))
    dup_stats = (
        occ.groupBy("h")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
        .agg(
            F.sum(F.col("n") - 1).alias("expected_cuts"),
        )
        .collect()[0]
    )
    expected_cuts = dup_stats["expected_cuts"] or 0
    out = span_dedup_cutlist(spark, sf_dir).agg(F.sum("n_dup_spans")).collect()[0][0]
    assert (out or 0) == expected_cuts


def test_pq_literal_and_broadcast_paths_agree(spark, sf_dir):
    """The gated literal-argmin assignment and the broadcast-join
    fallback must produce identical codebooks (same argmin, same
    lowest-cid tie-break)."""
    import kamiyo_hive_spark.operators.clustering as cl

    def rows():
        return sorted(
            tuple(r) for r in pq_train_codebooks(spark, sf_dir).collect()
        )

    saved = cl.LITERAL_ARGMIN_MAX_CELLS
    try:
        cl.LITERAL_ARGMIN_MAX_CELLS = 4096
        literal = rows()
        cl.LITERAL_ARGMIN_MAX_CELLS = 0
        broadcast = rows()
    finally:
        cl.LITERAL_ARGMIN_MAX_CELLS = saved
    assert literal == broadcast


# ---------------------------------------------------------------------------
# Image resize + multimodal capstone
# ---------------------------------------------------------------------------


def test_resize_box_filter_is_exact_integer():
    from kamiyo_hive_spark.operators.multimodal import RESIZE_K

    # a block of identical pixels must resize to exactly that value
    block = [[7] * RESIZE_K for _ in range(RESIZE_K)]
    total = sum(sum(r) for r in block)
    assert total // (RESIZE_K * RESIZE_K) == 7
    # floor semantics: 15 ones in a 16-block -> 0
    assert (RESIZE_K * RESIZE_K - 1) // (RESIZE_K * RESIZE_K) == 0


def test_resize_stats_bounds(spark, sf_dir):
    from kamiyo_hive_spark.operators.multimodal import image_resize_stats

    out = image_resize_stats(spark, sf_dir).collect()
    assert out
    for r in out:
        assert (r["out_w"], r["out_h"]) == (4, 3)
        n = r["out_w"] * r["out_h"]
        assert r["min_px"] * n <= r["resized_checksum"] <= r["max_px"] * n
        assert 0 <= r["min_px"] <= r["max_px"] <= 255


def test_multimodal_prep_conservation(spark, sf_dir):
    """kept + dropped == slice size per language, and the dropped total
    equals the distinct doc_b set of the phash pair stage."""
    from kamiyo_hive_spark.operators.multimodal import image_phash_neardup
    from kamiyo_hive_spark.operators.pipelines import multimodal_corpus_prep

    out = multimodal_corpus_prep(spark, sf_dir).collect()
    assert out
    for r in out:
        assert r["n_kept"] + r["n_dropped"] == r["n_docs_slice"]
        assert r["chars_kept"] >= 0
    n_dropped_total = sum(r["n_dropped"] for r in out)
    n_drop_set = (
        image_phash_neardup(spark, sf_dir).select("doc_b").distinct().count()
    )
    assert n_dropped_total == n_drop_set


# ---------------------------------------------------------------------------
# VAD segmentation + scene cuts
# ---------------------------------------------------------------------------


def test_vad_segments_invariants(spark, sf_dir):
    from kamiyo_hive_spark.operators.multimodal import audio_vad_segments

    out = audio_vad_segments(spark, sf_dir).collect()
    assert out
    saw_silence = False
    for r in out:
        assert 0 <= r["active_frames"] <= r["n_frames"]
        assert r["longest_segment"] <= r["active_frames"]
        assert (r["n_segments"] == 0) == (r["active_frames"] == 0)
        assert (r["active_energy"] > 0) == (r["active_frames"] > 0)
        saw_silence |= r["active_frames"] < r["n_frames"]
    assert saw_silence  # the gate really silences frames somewhere


def test_scene_cuts_invariants(spark, sf_dir):
    from kamiyo_hive_spark.operators.multimodal import video_scene_cuts

    out = video_scene_cuts(spark, sf_dir).collect()
    assert out
    saw_cut = False
    for r in out:
        assert 6 <= r["n_frames"] <= 11
        assert 0 <= r["n_cuts"] < r["n_frames"]
        if r["n_cuts"] > 0:
            assert 1 <= r["first_cut_frame"] < r["n_frames"]
            saw_cut = True
        else:
            assert r["first_cut_frame"] == -1
        assert 0.0 <= r["mean_luma"] <= 255.0
    assert saw_cut


def test_seasonal_decompose_profile(spark, sf_dir):
    """Seasonal indices of the detrended series must (a) cover at most
    7 weekdays and (b) the centered-MA construction forces the
    detrended totals to nearly cancel across the week (each y
    contributes +7 once and -1 to its 7 neighbors)."""
    from kamiyo_hive_spark.operators.timeseries import seasonal_decompose_daily

    out = seasonal_decompose_daily(spark, sf_dir).collect()
    assert 1 <= len(out) <= 7
    assert all(0 <= r["dow"] <= 6 for r in out)
    total_days = sum(r["n_days"] for r in out)
    grand = sum(r["detrended_sum"] for r in out)
    # cancellation up to boundary effects: bound by 7*max_daily*6 edge days
    assert abs(grand) < 7 * total_days * 50

"""Behavioral tests for ANN: the LSH-bucketed search must agree with the
brute-force twin on exact scores and keep useful recall."""

from __future__ import annotations

from kamiyo_hive_spark.operators.similarity import cosine_topk, knn_lsh


def test_lsh_scores_match_bruteforce_exactly(spark, sf_dir):
    brute = {r.vec_id: r.cosine_sim for r in cosine_topk(spark, sf_dir, k=100).collect()}
    approx = knn_lsh(spark, sf_dir, k=10).collect()
    assert approx, "bucketed search returned nothing"
    for r in approx:
        if r.vec_id in brute:
            assert brute[r.vec_id] == r.cosine_sim, "same vector must score identically"


def test_lsh_recall_floor(spark, sf_dir):
    brute_top = [r.vec_id for r in cosine_topk(spark, sf_dir, k=10).collect()]
    approx_top = {r.vec_id for r in knn_lsh(spark, sf_dir, k=10).collect()}
    recall = len(set(brute_top) & approx_top) / len(brute_top)
    # Random 64-d gaussian corpus: hamming-1 multiprobe over 8-bit SRP
    # keeps a modest but real recall; the floor guards regressions.
    assert recall >= 0.2, f"recall@10 collapsed: {recall}"


def test_ivf_scores_match_bruteforce_exactly(spark, sf_dir):
    from kamiyo_hive_spark.operators.similarity import knn_ivf

    brute = {r.vec_id: r.cosine_sim for r in cosine_topk(spark, sf_dir, k=100).collect()}
    approx = knn_ivf(spark, sf_dir, k=10).collect()
    assert approx, "IVF probe returned nothing"
    for r in approx:
        if r.vec_id in brute:
            assert brute[r.vec_id] == r.cosine_sim


def test_ivf_recall_floor(spark, sf_dir):
    from kamiyo_hive_spark.operators.similarity import knn_ivf

    brute_top = [r.vec_id for r in cosine_topk(spark, sf_dir, k=10).collect()]
    approx_top = {r.vec_id for r in knn_ivf(spark, sf_dir, k=10).collect()}
    recall = len(set(brute_top) & approx_top) / len(brute_top)
    assert recall >= 0.2, f"IVF recall@10 collapsed: {recall}"


def test_lsh_partitioned_probe_prunes_and_agrees(spark, sf_dir):
    """The bucket-partitioned index must (a) return exactly the
    expression-filter variant's rows and (b) carry the probe set as
    PartitionFilters — the scan lists only probed bucket dirs."""
    from kamiyo_hive_spark.operators.similarity import (
        knn_lsh_cosine,
        knn_lsh_partitioned,
    )

    part = knn_lsh_partitioned(spark, sf_dir)
    expr = knn_lsh_cosine(spark, sf_dir)
    assert sorted(map(tuple, part.collect())) == sorted(map(tuple, expr.collect()))

    plan = part._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # the filter must actually name the bucket column (not be empty)
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "bucket" in pf, pf


def test_lsh_index_df_cache_invalidates_on_fingerprint_change(
    spark, sf_dir, tmp_path, monkeypatch
):
    """The cached index DataFrame is keyed by the staged dir's recorded
    source fingerprint: same fingerprint -> same object (no re-listing);
    a regenerated staging (new fingerprint) -> fresh DataFrame, and the
    superseded same-dir entry is evicted (bounded cache)."""
    import os

    from kamiyo_hive_spark.operators import similarity as sim

    staged = tmp_path / "fake_lsh_index"
    staged.mkdir()
    # one real parquet file so spark.read.parquet succeeds
    spark.range(3).write.mode("overwrite").parquet(str(staged))
    marker = staged / "_SOURCE_FINGERPRINT"
    marker.write_text("1:1")
    monkeypatch.setattr(sim, "lsh_index_dir", lambda s, d: str(staged))

    d1 = sim.lsh_index_df(spark, sf_dir)
    assert sim.lsh_index_df(spark, sf_dir) is d1  # cache hit
    marker.write_text("2:2")  # a regenerated staging records a new print
    d2 = sim.lsh_index_df(spark, sf_dir)
    assert d2 is not d1
    # superseded same-dir entries were evicted: exactly one remains
    dir_keys = [k for k in sim._IDX_DF_CACHE if k[1] == str(staged)]
    assert len(dir_keys) == 1
    # drop the fake entry so later tests see a clean cache
    for k in dir_keys:
        del sim._IDX_DF_CACHE[k]

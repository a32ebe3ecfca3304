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


def test_ann_upsert_touches_only_delta_buckets(spark, sf_dir):
    """The incremental upsert's contract: bucket directories the delta
    does NOT land in are byte-identical after the upsert (same files,
    sizes, mtimes — never rewritten), touched buckets ARE rewritten,
    and the upserted index holds exactly the full corpus."""
    import os

    from pyspark.sql import functions as F

    from kamiyo_hive_spark.operators.similarity import (
        ANN_UPSERT_MOD,
        ANN_UPSERT_RES,
        _hyperplanes,
        ann_base_index_dir,
        ann_index_upsert_probe,
        srp_bucket,
    )
    from kamiyo_hive_spark.catalog import table
    from kamiyo_hive_spark.sources.sinks import SCRATCH

    e = table(spark, sf_dir, "embeddings")
    delta = e.filter(
        F.pmod(F.col("vec_id"), F.lit(ANN_UPSERT_MOD)) == ANN_UPSERT_RES
    ).withColumn(
        "bucket", srp_bucket("CAST(embedding AS ARRAY<DOUBLE>)", _hyperplanes())
    )
    touched = {int(r["bucket"]) for r in delta.select("bucket").distinct().collect()}
    n_delta = delta.count()
    assert 0 < n_delta and 0 < len(touched) < 200, (n_delta, len(touched))

    working = f"{SCRATCH}/embeddings_lsh_upsert_{os.path.basename(sf_dir)}"

    def snapshot(root):
        out = {}
        for dirpath, _dirs, files in os.walk(root):
            d = os.path.basename(dirpath)
            if not d.startswith("bucket="):
                continue
            b = int(d.split("=", 1)[1])
            for f in files:
                p = os.path.join(dirpath, f)
                st = os.stat(p)
                out[(b, f)] = (st.st_size, st.st_mtime_ns)
        return out

    ann_index_upsert_probe(spark, sf_dir).collect()  # run the upsert
    after = snapshot(working)
    base = snapshot(ann_base_index_dir(spark, sf_dir))

    untouched_base = {k: v for k, v in base.items() if k[0] not in touched}
    untouched_after = {
        k: v for k, v in after.items() if k[0] not in touched
    }
    # untouched buckets: exactly the base's files, same sizes (mtimes
    # differ from the copy — compare name+size, the copytree contract)
    assert {k: v[0] for k, v in untouched_after.items()} == {
        k: v[0] for k, v in untouched_base.items()
    }
    # every touched bucket was rewritten: its files differ from base's
    for b in touched:
        base_files = {k[1] for k in base if k[0] == b}
        after_files = {k[1] for k in after if k[0] == b}
        assert after_files and after_files != base_files, b

    # completeness: the upserted index holds exactly the corpus ids
    got = {
        r["vec_id"]
        for r in spark.read.parquet(working).select("vec_id").collect()
    }
    want = {r["vec_id"] for r in e.select("vec_id").collect()}
    assert got == want


def test_ann_upsert_probe_prunes_partitions(spark, sf_dir):
    """The probe against the upserted index must carry PartitionFilters
    (the bucket probe reaches the directory listing, same as
    knn_lsh_partitioned) and agree with the expression-filter variant."""
    from kamiyo_hive_spark.operators.similarity import (
        ann_index_upsert_probe,
        knn_lsh,
    )

    df = ann_index_upsert_probe(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert pf.strip(), "probe did not reach the scan as a partition filter"
    a = [tuple(r) for r in df.collect()]
    b = [tuple(r) for r in knn_lsh(spark, sf_dir).collect()]
    assert a == b


def test_ann_upsert_empty_delta_is_a_noop(spark, sf_dir, monkeypatch):
    """An EMPTY delta batch (no vec_id matches the residue) must leave
    the working index exactly equal to the base — dynamic overwrite
    with zero partitions present replaces nothing — and the probe must
    still run. Guards the degenerate-batch path a real feed hits."""
    import os

    from kamiyo_hive_spark.operators import similarity as sim

    # a residue no vec_id can match -> empty delta; base still holds
    # every row (vec_id % MOD != RES is all-true)
    monkeypatch.setattr(sim, "ANN_UPSERT_RES", sim.ANN_UPSERT_MOD + 1)
    rows = sim.ann_index_upsert_probe(spark, sf_dir).collect()
    assert len(rows) > 0
    from kamiyo_hive_spark.sources.sinks import SCRATCH

    working = f"{SCRATCH}/embeddings_lsh_upsert_{os.path.basename(sf_dir)}"
    # no-op contract: the working index is EXACTLY the base (the cached
    # base staging was built under the real residue, so it is the
    # "existing production index" the empty batch must not disturb)
    base = sim.ann_base_index_dir(spark, sf_dir)
    got = sorted(
        r["vec_id"] for r in spark.read.parquet(working).select("vec_id").collect()
    )
    want = sorted(
        r["vec_id"] for r in spark.read.parquet(base).select("vec_id").collect()
    )
    assert got == want

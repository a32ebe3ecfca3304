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


def _upsert_log(spark, sf_dir):
    from kamiyo_hive_spark.operators.similarity import ann_upsert_table
    from kamiyo_hive_spark.sources.txlog import TxLog

    return TxLog(ann_upsert_table(spark, sf_dir))


def _bucket_of(rel_path: str) -> int:
    import os

    for p in rel_path.split(os.sep):
        k, _, v = p.partition("=")
        if k == "bucket":
            return int(v)
    raise AssertionError(f"no bucket component in {rel_path}")


def test_ann_upsert_touches_only_delta_buckets(spark, sf_dir):
    """The txlog MERGE's contract: the merge commit removes exactly the
    touched buckets' version-0 files and adds files only under touched
    buckets; every untouched-bucket file survives as the SAME file —
    same path, same inode, same mtime (zero copy, not merely equal
    bytes) — and the post-merge snapshot holds exactly the corpus."""
    import os

    from pyspark.sql import functions as F

    from kamiyo_hive_spark.operators.similarity import (
        ANN_UPSERT_MOD,
        ANN_UPSERT_RES,
        ANN_UPSERT_WRITER,
        _hyperplanes,
        ann_index_upsert_probe,
        srp_bucket,
    )
    from kamiyo_hive_spark.catalog import table

    e = table(spark, sf_dir, "embeddings")
    delta = e.filter(
        F.pmod(F.col("vec_id"), F.lit(ANN_UPSERT_MOD)) == ANN_UPSERT_RES
    ).withColumn(
        "bucket", srp_bucket("CAST(embedding AS ARRAY<DOUBLE>)", _hyperplanes())
    )
    touched = {int(r["bucket"]) for r in delta.select("bucket").distinct().collect()}
    n_delta = delta.count()
    assert 0 < n_delta and 0 < len(touched) < 200, (n_delta, len(touched))

    ann_index_upsert_probe(spark, sf_dir).collect()  # ensure the merge landed
    log = _upsert_log(spark, sf_dir)
    merges = [c for c in log.history() if c.writer == ANN_UPSERT_WRITER]
    assert len(merges) == 1, [c.writer for c in log.history()]
    m = merges[0]

    v0 = set(log.snapshot_files(0))
    vN = set(log.snapshot_files())
    # the merge removed exactly v0's touched-bucket files...
    assert set(m.removes) == {f for f in v0 if _bucket_of(f) in touched}
    # ...and added files only under touched buckets
    assert m.adds and all(_bucket_of(f) in touched for f in m.adds)
    # untouched files survive IN PLACE: the post-merge snapshot
    # references the very same root-relative paths version 0 committed
    # (no copy, no rewrite — at most one file ever exists per path, so
    # path identity IS byte/inode identity here), and nothing else
    # from v0 leaks through
    untouched = {f for f in v0 if _bucket_of(f) not in touched}
    assert untouched <= vN
    assert vN == untouched | set(m.adds)
    # the REMOVED files are dereferenced, not deleted: time travel to
    # version 0 still reads the exact base corpus (vacuum's job, later)
    for f in m.removes:
        assert os.path.exists(os.path.join(log.root, f)), f
    base_ids = {r["vec_id"] for r in log.read(spark, 0).select("vec_id").collect()}
    delta_ids = {r["vec_id"] for r in delta.select("vec_id").collect()}
    assert base_ids.isdisjoint(delta_ids)

    # completeness: the post-merge snapshot holds exactly the corpus ids
    got = {r["vec_id"] for r in log.read(spark).select("vec_id").collect()}
    want = {r["vec_id"] for r in e.select("vec_id").collect()}
    assert got == want


def test_ann_upsert_probe_prunes_file_list(spark, sf_dir):
    """The probe is a file-list-pruned snapshot read: every file the
    scan opens belongs to a probe bucket, the scan reads a strict
    subset of the snapshot, and the rows agree with the expression-
    filter variant over the full (non-incremental) index."""
    import os

    from kamiyo_hive_spark.operators.similarity import (
        _query_probe,
        ann_index_upsert_probe,
        knn_lsh,
    )

    df = ann_index_upsert_probe(spark, sf_dir)
    _, probes = _query_probe(spark, sf_dir)
    log = _upsert_log(spark, sf_dir)
    root = os.path.realpath(log.root)
    read = {
        os.path.relpath(os.path.realpath(f.replace("file://", "")), root)
        for f in df.inputFiles()
    }
    assert read, "probe read no files"
    assert all(_bucket_of(f) in set(probes) for f in read), read
    assert len(read) < len(log.snapshot_files())
    a = [tuple(r) for r in df.collect()]
    b = [tuple(r) for r in knn_lsh(spark, sf_dir).collect()]
    assert a == b


def test_ann_upsert_is_idempotent(spark, sf_dir):
    """Re-running the registered query must NOT re-merge: the writer
    tag gates the merge, so the version history stays fixed and the
    second run is a pure snapshot read."""
    from kamiyo_hive_spark.operators.similarity import ann_index_upsert_probe

    first = [tuple(r) for r in ann_index_upsert_probe(spark, sf_dir).collect()]
    log = _upsert_log(spark, sf_dir)
    v_before = log.version()
    second = [tuple(r) for r in ann_index_upsert_probe(spark, sf_dir).collect()]
    assert second == first
    assert log.version() == v_before


def _ann_race_worker(args):
    """Spawned-process body for the two-session race test: point the
    staging pool at the SHARED tmp scratch, run the registered upsert
    query end-to-end in a fresh SparkSession, return (rows, writers)."""
    scratch, sf_dir = args
    import kamiyo_hive_spark.sources.sinks as sinks

    sinks.SCRATCH = scratch
    from kamiyo_hive_spark.session import get_spark

    spark = get_spark(
        app_name="ann-race",
        master="local[2]",
        shuffle_partitions=4,
        extra_conf={"spark.ui.enabled": "false"},
    )
    try:
        from kamiyo_hive_spark.operators.similarity import (
            ann_index_upsert_probe,
            ann_upsert_table,
        )
        from kamiyo_hive_spark.sources.txlog import TxLog

        rows = [tuple(r) for r in ann_index_upsert_probe(spark, sf_dir).collect()]
        log = TxLog(ann_upsert_table(spark, sf_dir))
        return rows, [c.writer for c in log.history()]
    finally:
        spark.stop()


def test_ann_upsert_two_session_race(tmp_path, sf_dir):
    """The r7 probe-read race, exercised for real: two OS processes run
    the full upsert+probe concurrently against one shared scratch.
    Both must succeed with identical rows, and the table must end with
    EXACTLY one base load and one merge commit — the staging lock +
    writer-tag gate serialize the merge, and the losing session serves
    its probe from the immutable committed snapshot (nothing is ever
    rewritten in place, so there is no window to crash in)."""
    import multiprocessing as mp

    scratch = str(tmp_path / "scratch")
    with mp.get_context("spawn").Pool(2) as pool:
        (rows_a, hist_a), (rows_b, hist_b) = pool.map(
            _ann_race_worker, [(scratch, sf_dir)] * 2
        )
    assert rows_a and rows_a == rows_b
    # final history: exactly one base load + one merge, in order
    final = max(hist_a, hist_b, key=len)
    assert final == ["ann_base_load", "ann_delta_merge"], (hist_a, hist_b)


def test_ann_upsert_empty_delta_is_a_noop(spark, sf_dir, monkeypatch):
    """An EMPTY delta batch (no vec_id matches the residue) must not
    burn a commit — the table stays at version 0 — and the probe must
    still run and see the full corpus (the all-true base filter).
    The overridden residue is encoded in the table root, so this test
    can never poison the real residue's staged table (ADVICE r7)."""
    from kamiyo_hive_spark.operators import similarity as sim

    monkeypatch.setattr(sim, "ANN_UPSERT_RES", sim.ANN_UPSERT_MOD + 1)
    rows = sim.ann_index_upsert_probe(spark, sf_dir).collect()
    assert len(rows) > 0
    log = _upsert_log(spark, sf_dir)
    assert f"_{sim.ANN_UPSERT_MOD}_{sim.ANN_UPSERT_MOD + 1}_" in log.root
    assert log.version() == 0, [c.writer for c in log.history()]
    from kamiyo_hive_spark.catalog import table

    got = sorted(r["vec_id"] for r in log.read(spark).select("vec_id").collect())
    want = sorted(
        r["vec_id"]
        for r in table(spark, sf_dir, "embeddings").select("vec_id").collect()
    )
    assert got == want


def test_streaming_ann_index_merge_protocol(spark, sf_dir):
    """The streaming MERGE pipeline: version history = 1 base load +
    one merge commit per non-empty micro-batch, each under its own
    batch-keyed writer tag (exactly-once), removes always bucket-
    scoped, and the post-stream probe equals the full-index variant.
    (The in-protocol replay/version asserts run inside the operator —
    a double-merge raises before this test ever sees rows.)"""
    from kamiyo_hive_spark.operators import similarity as sim
    from kamiyo_hive_spark.sources.sinks import SCRATCH
    from kamiyo_hive_spark.sources.txlog import TxLog

    rows = [tuple(r) for r in sim.streaming_ann_index_merge(spark, sf_dir).collect()]
    assert rows and all(r[-1] == sim.ANN_STREAM_BATCHES + 1 for r in rows)

    import os

    log = TxLog(
        f"{SCRATCH}/ann_stream_tx_{sim.ANN_UPSERT_MOD}_{sim.ANN_UPSERT_RES}_"
        f"{os.path.basename(sf_dir)}"
    )
    hist = log.history()
    assert [c.writer for c in hist] == ["ann_base_load"] + [
        f"{sim.ANN_STREAM_WRITER}-b{i}" for i in range(sim.ANN_STREAM_BATCHES)
    ]
    assert all(c.op == "rewrite" for c in hist[1:])
    for c in hist[1:]:
        assert all(_bucket_of(f) >= 0 for f in c.adds)  # bucket-scoped adds
    # probe rows (minus the pinned version column) match the plain
    # expression-filter variant over the full corpus
    knn = [tuple(r) for r in sim.knn_lsh(spark, sf_dir).collect()]
    assert [r[:-1] for r in rows] == knn


def test_ann_version_diff_reconciles_with_delta(spark, sf_dir):
    """The CDF audit's net change per bucket must equal the delta's
    bucket histogram computed independently on the Spark side (the
    oracle re-derives it in DuckDB; this pins the same identity
    in-suite), and deletes must equal the base's rows in touched
    buckets."""
    from pyspark.sql import functions as F

    from kamiyo_hive_spark.catalog import table
    from kamiyo_hive_spark.operators import similarity as sim

    rows = {
        r["bucket"]: (r["n_inserted"], r["n_deleted"], r["n_net"])
        for r in sim.ann_index_version_diff(spark, sf_dir).collect()
    }
    assert rows
    e = table(spark, sf_dir, "embeddings").withColumn(
        "bucket",
        sim.srp_bucket("CAST(embedding AS ARRAY<DOUBLE>)", sim._hyperplanes()),
    )
    hist = {
        int(r["bucket"]): (int(r["nd"]), int(r["nb"]))
        for r in e.groupBy("bucket")
        .agg(
            F.sum(
                F.when(
                    F.pmod("vec_id", F.lit(sim.ANN_UPSERT_MOD))
                    == sim.ANN_UPSERT_RES,
                    1,
                ).otherwise(0)
            ).alias("nd"),
            F.sum(
                F.when(
                    F.pmod("vec_id", F.lit(sim.ANN_UPSERT_MOD))
                    == sim.ANN_UPSERT_RES,
                    0,
                ).otherwise(1)
            ).alias("nb"),
        )
        .collect()
    }
    touched = {b: v for b, v in hist.items() if v[0] > 0}
    assert set(rows) == set(touched)
    for b, (nd, nb) in touched.items():
        assert rows[b] == (nb + nd, nb, nd), (b, rows[b], (nb + nd, nb, nd))


def test_ann_compaction_protocol(spark, sf_dir):
    """The maintenance-loop closer (r9): after the staged build the
    compaction table's history is 1 base + N ingest slices + 1 rewrite,
    the rewrite's adds/removes are bucket-scoped, every bucket holds
    exactly one live file, and the probe equals the plain full-corpus
    variant. (Fragmentation, healthy-bucket inode pinning, and vacuum
    are asserted INSIDE the build — a violation raises before this test
    sees rows.)"""
    import os

    from kamiyo_hive_spark.operators import similarity as sim
    from kamiyo_hive_spark.sources.sinks import SCRATCH
    from kamiyo_hive_spark.sources.txlog import TxLog

    rows = [tuple(r) for r in sim.ann_index_compaction(spark, sf_dir).collect()]
    assert rows and all(r[-2] == sim.ANN_COMPACT_SLICES + 2 for r in rows)
    assert all(r[-1] == 1 for r in rows)  # max files per bucket

    log = TxLog(
        f"{SCRATCH}/ann_compact_tx_{sim.ANN_UPSERT_MOD}_{sim.ANN_UPSERT_RES}_"
        f"{os.path.basename(sf_dir)}"
    )
    hist = log.history()
    assert [c.writer for c in hist] == (
        ["ann_base_load"]
        + [f"ann_ingest_slice_{i}" for i in range(sim.ANN_COMPACT_SLICES)]
        + ["optimize"]
    )
    assert hist[-1].op == "rewrite"
    assert all(_bucket_of(f) >= 0 for f in hist[-1].adds)
    per_bucket: dict[int, int] = {}
    for f in log.snapshot_files():
        b = _bucket_of(f)
        per_bucket[b] = per_bucket.get(b, 0) + 1
    assert per_bucket and all(n == 1 for n in per_bucket.values())
    knn = [tuple(r) for r in sim.knn_lsh(spark, sf_dir).collect()]
    assert [r[:-2] for r in rows] == knn


def test_staged_index_cache_eviction_is_session_scoped(spark, sf_dir):
    """VERDICT r8 nit 4: a cache miss must evict only THIS session's
    superseded entries for the dir plus provably-dead sessions' entries
    — never a LIVE sibling session's — so two concurrent SparkSessions
    can't thrash each other's cached relations."""
    import os
    import weakref

    from kamiyo_hive_spark.operators import similarity as sim

    d = sim.lsh_index_dir(spark, sf_dir)
    with open(os.path.join(d, "_SOURCE_FINGERPRINT")) as fh:
        fp = fh.read()
    appid = spark.sparkContext.applicationId

    sim._IDX_DF_CACHE.clear()
    df = sim._staged_index_df(spark, d)  # populate own entry

    class FakeLiveSC:  # a sibling session whose context is "running"
        _jsc = object()

    live_sc = FakeLiveSC()
    sim._IDX_SESSIONS["sibling-live"] = weakref.ref(live_sc)
    sim._IDX_DF_CACHE[("sibling-live", d, fp)] = df
    sim._IDX_SESSIONS["sibling-dead"] = weakref.ref(FakeLiveSC())  # collected
    sim._IDX_DF_CACHE[("sibling-dead", d, fp)] = df

    # force a miss for THIS session: stale-fingerprint entry + drop the
    # current one (a testdata regeneration in miniature)
    sim._IDX_DF_CACHE[(appid, d, "stale-fp")] = df
    del sim._IDX_DF_CACHE[(appid, d, fp)]
    sim._staged_index_df(spark, d)

    assert ("sibling-live", d, fp) in sim._IDX_DF_CACHE   # live survives
    assert ("sibling-dead", d, fp) not in sim._IDX_DF_CACHE  # dead swept
    assert (appid, d, "stale-fp") not in sim._IDX_DF_CACHE  # own stale gone
    assert (appid, d, fp) in sim._IDX_DF_CACHE            # fresh entry cached
    # cleanup: leave only real entries
    del sim._IDX_DF_CACHE[("sibling-live", d, fp)]
    sim._IDX_SESSIONS.pop("sibling-live", None)
    sim._IDX_SESSIONS.pop("sibling-dead", None)


def test_pq_adc_table_driver_side_bit_identity(spark, sf_dir):
    """The driver-side ADC lookup table (pyarrow reads + python fold +
    HALF_UP 9-dp) must equal the engine-computed explode-join form
    BIT FOR BIT — the r9 rewrite's correctness claim."""
    from decimal import ROUND_HALF_UP, Decimal

    from pyspark.sql import functions as F

    from kamiyo_hive_spark.operators import similarity as sim
    from kamiyo_hive_spark.catalog import table

    e = table(spark, sf_dir, "embeddings")
    emb = F.col("embedding").cast("array<double>")
    seeds_df = e.filter(F.col("vec_id") < sim.PQ_C).select("vec_id", emb.alias("v"))
    cents = seeds_df.select(
        F.col("vec_id").alias("cid"),
        F.posexplode(
            F.array(*[sim._pq_sub("v", m) for m in range(sim.PQ_M)])
        ).alias("m", "cs"),
    )
    qsub = e.filter(F.col("vec_id") == sim.QUERY_VEC_ID).select(
        F.posexplode(
            F.array(*[sim._pq_sub_from(emb, m) for m in range(sim.PQ_M)])
        ).alias("m", "sv")
    )
    engine = {
        (r["m"], r["cid"]): r["d"]
        for r in qsub.join(F.broadcast(cents), "m")
        .select("m", "cid", sim._pq_d2(F.col("sv"), F.col("cs")).alias("d"))
        .collect()
    }

    seeds = sim.query_vecs(sf_dir, sim.PQ_C)
    qv = sim.query_vec(sf_dir, sim.QUERY_VEC_ID)

    def d2(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + (x - y) * (x - y)
        return float(
            Decimal(repr(acc)).quantize(Decimal("1e-9"), rounding=ROUND_HALF_UP)
        )

    driver = {
        (m, cid): d2(
            qv[m * sim.PQ_SUB : (m + 1) * sim.PQ_SUB],
            v[m * sim.PQ_SUB : (m + 1) * sim.PQ_SUB],
        )
        for cid, v in seeds
        for m in range(sim.PQ_M)
    }
    assert len(driver) == len(engine) == sim.PQ_M * sim.PQ_C
    for k in engine:
        assert driver[k] == engine[k], (k, driver[k], engine[k])

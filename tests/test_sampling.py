"""Deterministic sampling invariants: membership is a pure function of
the row id — stable under repartitioning and across reruns."""

from __future__ import annotations

from pyspark.sql import functions as F

from kamiyo_hive_spark.catalog import table
from kamiyo_hive_spark.operators.sampling import stratified_sample


def test_stratified_sample_stable_under_repartition(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    base = {r.doc_id for r in stratified_sample(docs).select("doc_id").collect()}
    assert base, "empty sample"
    shuffled = {
        r.doc_id
        for r in stratified_sample(docs.repartition(17)).select("doc_id").collect()
    }
    assert base == shuffled


def test_stratified_sample_respects_stratum_rates(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    n = docs.filter(F.col("lang") == "en").count()
    kept = stratified_sample(docs).filter(F.col("lang") == "en").count()
    # en rate is 300/1000; hash buckets are near-uniform
    assert 0.15 * n <= kept <= 0.45 * n, (kept, n)


def test_mixture_plan_not_vacuous(spark, sf_dir):
    """Guards the hardcoded src0..src3 weight table: if the generator's
    source labels ever diverge from it, the inner join would make both
    the Spark query AND its oracle return 0 rows — a vacuous parity
    pass. Assert the plan is non-empty and actually downsamples at
    least one oversubscribed source."""
    from kamiyo_hive_spark.plans.registry import load_registry

    rows = load_registry()["mixture_sampling_plan"].builder(spark, sf_dir).collect()
    observed = {
        r.source for r in table(spark, sf_dir, "documents").select("source").distinct().collect()
    }
    assert {r.source for r in rows} == observed, (
        "weight table no longer matches generator sources"
    )
    assert any(r.keep_rate < 1.0 for r in rows), "no source is downsampled"


def test_split_is_total_and_disjoint(spark, sf_dir):
    from kamiyo_hive_spark.plans.registry import load_registry

    q = load_registry()["train_test_split_counts"].builder
    counts = {(r.split, r.lang): r.n_docs for r in q(spark, sf_dir).collect()}
    total = sum(counts.values())
    assert total == table(spark, sf_dir, "documents").count()
    assert {s for s, _ in counts} == {"train", "valid", "test"}


def test_epoch_shuffle_shard_invariance(spark, sf_dir):
    """The epoch permutation must be a pure function of the data — the
    resumability contract: identical positions at any shard count, and
    a real permutation (0..n-1, no fixed points ordering by doc_id)."""
    from kamiyo_hive_spark.functions.ranks import global_sorted_index
    from kamiyo_hive_spark.operators.sampling import epoch_shuffle_order

    out = epoch_shuffle_order(spark, sf_dir)
    rows = {r.doc_id: r.epoch_pos for r in out.collect()}
    n = len(rows)
    assert sorted(rows.values()) == list(range(n))  # a true permutation
    ordered_ids = sorted(rows)
    assert [rows[i] for i in ordered_ids] != sorted(rows.values())  # shuffled
    # shard-count invariance of the underlying rank
    keyed = out.sparkSession.createDataFrame(
        [(k, v) for k, v in rows.items()], "doc_id long, pos long"
    )
    for shards in (2, 8):
        idx = {
            r.doc_id: r.idx
            for r in global_sorted_index(keyed, "pos", num_shards=shards).collect()
        }
        assert idx == rows  # pos IS the rank; any shard count agrees


def test_mixture_epochs_algebra(spark, sf_dir):
    """Epoch planning invariants: repeats bounded by the cap, the
    partial-epoch fraction in [0,1), and planned tokens consistent
    with epochs*n_tokens (within the floor)."""
    from kamiyo_hive_spark.operators.sampling import (
        MIX_BUDGET_EPOCHS,
        MIX_MAX_EPOCHS,
        dataset_mixture_epochs,
    )

    rows = dataset_mixture_epochs(spark, sf_dir).collect()
    assert rows
    total = sum(r["n_tokens"] for r in rows)
    planned = sum(r["planned_tokens"] for r in rows)
    for r in rows:
        assert 0 <= r["epochs_full"] <= MIX_MAX_EPOCHS
        assert 0.0 <= r["final_epoch_keep"] < 1.0
        expect = (r["epochs_full"] + r["final_epoch_keep"]) * r["n_tokens"]
        assert abs(r["planned_tokens"] - expect) <= r["n_tokens"] * 1e-5 + 1
    # caps only ever REDUCE the plan below the raw budget
    assert planned <= total * MIX_BUDGET_EPOCHS + len(rows)
    # at least one source is upsampled (trains >1 epoch) — non-vacuous
    assert any(r["epochs_full"] >= 1 for r in rows)


def test_epoch_cap_binds_on_skewed_frame(spark):
    """The MIX_MAX_EPOCHS cap never binds on the fixture corpus (max
    raw epochs ~3.6), so exercise it on a synthetic weight table where
    a tiny source's uncapped share demands far more than 4 epochs."""
    from kamiyo_hive_spark.operators.sampling import (
        MIX_MAX_EPOCHS,
        epoch_plan,
    )

    # two sources: 'big' holds almost all tokens, 'tiny' gets an equal
    # weight -> tiny's desired = 0.5 * total * 2 = total, i.e. ~100
    # epochs of itself uncapped
    w = spark.createDataFrame(
        [("src_big", 99_000, 100_000, 1, 2), ("src_tiny", 1_000, 100_000, 1, 2)],
        "source string, n_tokens long, total_tokens long, w_raw long, w_sum long",
    )
    rows = {r["source"]: r for r in epoch_plan(w).collect()}
    tiny = rows["src_tiny"]
    assert tiny["epochs_full"] == int(MIX_MAX_EPOCHS)  # the cap bound
    assert tiny["final_epoch_keep"] == 0.0
    assert tiny["planned_tokens"] == int(MIX_MAX_EPOCHS) * 1_000
    big = rows["src_big"]
    assert big["epochs_full"] < MIX_MAX_EPOCHS  # uncapped branch taken


def test_epoch_keep_boundary_clamped(spark):
    """A fractional part within 5e-7 of a full epoch must clamp to
    0.999999, never round to 1.0 (the [0,1) contract)."""
    from kamiyo_hive_spark.operators.sampling import epoch_plan

    # desired/n_tokens = 2*0.49999995*... engineer frac ~0.9999996:
    # weight*total*2/n = (1/2)*99999960*2/49999999 = 1.99999922...
    w = spark.createDataFrame(
        [("s", 49_999_999, 99_999_960, 1, 2)],
        "source string, n_tokens long, total_tokens long, w_raw long, w_sum long",
    )
    r = epoch_plan(w).collect()[0]
    assert 0.0 <= r["final_epoch_keep"] < 1.0

"""Behavioral tests for the corpus-curation family and the late TPC-H
decorrelation shapes: plant documents/rows with KNOWN repetition,
contamination, and tie structure, and assert the operators measure
exactly it (the parity drive proves Spark==DuckDB; these prove both
are computing the right thing)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kamiyo_hive_spark.operators.corpus import _grams


@pytest.fixture(scope="module")
def planted_docs(spark):
    rows = [
        # 0: fully degenerate — one token repeated; every 2-gram identical.
        (0, "spam spam spam spam spam spam"),
        # 1: all-distinct tokens — no repeated 2- or 3-grams.
        (1, "alpha bravo charlie delta echo foxtrot"),
        # 2: half-repetitive — "a b" appears 3x in 5 2-grams.
        (2, "a b a b a b"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _rep_stats(spark, docs):
    """Inline twin of doc_repetition_stats over an arbitrary docs frame."""
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    d = docs.select("doc_id", toks.alias("t"))
    g2 = d.select("doc_id", F.explode(_grams(F.col("t"), 2)).alias("g"))
    g3 = d.select("doc_id", F.explode(_grams(F.col("t"), 3)).alias("g"))
    s2 = (
        g2.groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg((F.max("c").cast("double") / F.sum("c").cast("double")).alias("top2"))
    )
    s3 = g3.groupBy("doc_id").agg(
        (
            F.lit(1.0)
            - F.count_distinct("g").cast("double") / F.count("*").cast("double")
        ).alias("dup3")
    )
    return {r["doc_id"]: (r["top2"], r["dup3"]) for r in s2.join(s3, "doc_id").collect()}


def test_repetition_extremes(spark, planted_docs):
    stats = _rep_stats(spark, planted_docs)
    top2_0, dup3_0 = stats[0]
    assert top2_0 == 1.0  # one 2-gram owns all the mass
    assert dup3_0 == pytest.approx(1.0 - 1.0 / 4.0)  # 4 3-grams, 1 distinct
    top2_1, dup3_1 = stats[1]
    assert top2_1 == pytest.approx(1.0 / 5.0)  # 5 distinct 2-grams, max count 1
    assert dup3_1 == 0.0
    top2_2, dup3_2 = stats[2]
    assert top2_2 == pytest.approx(3.0 / 5.0)  # "a b" 3x of 5


def test_gram_construction_edges(spark):
    """Docs shorter than the gram order yield empty gram arrays, not
    nulls or 1-token degenerates."""
    d = spark.createDataFrame([(0, "one"), (1, "one two"), (2, "")],
                              "doc_id long, text string")
    t = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    out = d.select(
        "doc_id",
        F.size(_grams(t, 2)).alias("n2"),
        F.size(_grams(t, 3)).alias("n3"),
    ).collect()
    by_id = {r["doc_id"]: (r["n2"], r["n3"]) for r in out}
    assert by_id[0] == (0, 0)
    assert by_id[1] == (1, 0)
    # empty text splits to [""] — a single empty token, still no grams
    assert by_id[2] == (0, 0)


def test_decontaminate_planted_overlap(spark):
    """A doc sharing exactly one 3-gram window with the benchmark doc
    counts 1; an identical doc counts every gram; unrelated counts 0."""
    bench_text = "w1 w2 w3 w4 w5 w6 w7 w8"  # doc_id 0 (% 97 == 0) = benchmark
    rows = [
        (0, bench_text),
        (1, bench_text),                         # fully contaminated: 6 shared
        (2, "x1 x2 w3 w4 w5 y1 y2"),             # shares exactly "w3 w4 w5"
        (3, "z1 z2 z3 z4 z5 z6"),                # disjoint
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    t = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    g3 = d.select("doc_id", F.explode(F.array_distinct(_grams(t, 3))).alias("g"))
    is_bench = F.col("doc_id") % 97 == 0
    bench = g3.filter(is_bench).select("g").distinct()
    overlap = (
        g3.filter(~is_bench)
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
    )
    got = {r["doc_id"]: r["n_shared"] for r in overlap.collect()}
    assert got[1] == 6  # 8 tokens -> 6 3-grams, all shared
    assert got[2] == 1
    assert 3 not in got  # disjoint doc never reaches the overlap count


def test_pii_scrub_redacts_and_counts(spark, sf_dir):
    from kamiyo_hive_spark.operators.corpus import doc_pii_scrub

    out = doc_pii_scrub(spark, sf_dir).limit(50).collect()
    assert len(out) > 0
    for r in out:
        assert r["n_emails"] == 1 and r["n_phones"] == 1  # exactly the staged PII
        assert len(r["clean_hash"]) == 32


def test_q15_argmax_includes_all_ties(spark):
    """top_revenue_supplier keeps EVERY supplier at the max (decimal-
    exact revenue makes ties real), mirrored here on a planted frame."""
    rows = [(1, 10.0), (1, 5.0), (2, 15.0), (3, 12.0)]
    df = spark.createDataFrame(rows, "supp long, rev double")
    from kamiyo_hive_spark.functions.money import dec

    revenue = df.groupBy("supp").agg(F.sum(dec("rev")).cast("double").alias("r"))
    mx = revenue.agg(F.max("r").alias("m"))
    kept = revenue.join(F.broadcast(mx)).filter(F.col("r") == F.col("m"))
    got = sorted(r["supp"] for r in kept.collect())
    assert got == [1, 2]  # 10+5 == 15 exact tie both kept


def test_q2_min_cost_keeps_per_part_minimum(spark, sf_dir):
    from kamiyo_hive_spark.operators.tpch_extra import min_cost_supplier

    out = min_cost_supplier(spark, sf_dir)
    pdf = out.toPandas()
    assert len(pdf) > 0
    # within each part, every surviving row carries the part's min cost
    g = pdf.groupby("p_partkey")["unit_cost"]
    assert (g.transform("min") == pdf["unit_cost"]).all()

"""Bloom file-skipping tests: the index must actually prune files,
never lose rows (no false negatives), and the pruned plan must read
exactly the candidate files."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kamiyo_hive_spark.catalog import table
from kamiyo_hive_spark.sources.skipping import (
    SKIP_CUSTKEY,
    _bloom_dir,
    bloom_candidate_years,
    bloom_skip_scan,
)


def test_bloom_prunes_files_and_loses_nothing(spark, sf_dir):
    staged = _bloom_dir(spark, sf_dir)
    all_years = sorted(
        int(d.split("=")[1])
        for d in os.listdir(staged)
        if d.startswith("o_year=")
    )
    cand = bloom_candidate_years(staged, SKIP_CUSTKEY)
    true_years = sorted(
        r["y"]
        for r in table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") == SKIP_CUSTKEY)
        .select(F.year("o_orderdate").alias("y"))
        .distinct()
        .collect()
    )
    # no false negatives: every year that truly contains the key is a
    # candidate
    assert set(true_years) <= set(cand)
    # the index actually prunes at this SF
    assert len(cand) < len(all_years), (cand, all_years)
    # the executed scan reads only candidate files
    files = bloom_skip_scan(spark, sf_dir).inputFiles()
    got_years = {int(f.split("o_year=")[1].split("/")[0]) for f in files}
    assert got_years <= set(cand)


def test_bloom_result_matches_full_scan(spark, sf_dir):
    got = {
        r["o_year"]: (r["n_orders"], round(r["total_price"], 2))
        for r in bloom_skip_scan(spark, sf_dir).collect()
    }
    want = {
        r["o_year"]: (r["n_orders"], round(r["total"], 2))
        for r in table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") == SKIP_CUSTKEY)
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
            .cast("double")
            .alias("total"),
        )
        .collect()
    }
    assert got == want


def test_bloom_empty_candidate_set_returns_empty_frame(spark, sf_dir, monkeypatch):
    """A key absent from every Bloom (no false positive) must return
    the legitimate empty result with the query's schema — not crash on
    spark.read.parquet() with zero paths."""
    import kamiyo_hive_spark.sources.skipping as sk

    staged = _bloom_dir(spark, sf_dir)
    absent = None
    for k in range(10_000_000, 10_000_400):
        if not bloom_candidate_years(staged, k):
            absent = k
            break
    assert absent is not None, "no bloom-negative key found in probe range"
    monkeypatch.setattr(sk, "SKIP_CUSTKEY", absent)
    out = sk.bloom_skip_scan(spark, sf_dir)
    assert out.columns == ["o_year", "n_orders", "total_price"]
    assert [str(f.dataType) for f in out.schema.fields] == [
        "LongType()", "LongType()", "DoubleType()",
    ]
    assert out.count() == 0


def test_probe_recipe_matches_spark(spark):
    """The Python planner probe and the distributed builder probe must
    be the same function of the key."""
    from kamiyo_hive_spark.sources.skipping import (
        BLOOM_K,
        BLOOM_M,
        _spark_probe_positions,
    )

    keys = [0, 1, 2, 37, 999_983]
    df = spark.createDataFrame([(k,) for k in keys], ["o_custkey"])
    pos_expr = F.array(
        *[
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws(":", F.col("o_custkey"), F.lit(str(i)))),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long")
                % BLOOM_M
            )
            for i in range(BLOOM_K)
        ]
    )
    got = {r["o_custkey"]: r["p"] for r in df.select("o_custkey", pos_expr.alias("p")).collect()}
    for k in keys:
        assert got[k] == _spark_probe_positions(k)

"""Sketch-family tests: the properties the DuckDB replay can't see —
Count-Min mergeability across arbitrary data splits, collision
behavior under load, and the two-pass quantile algorithm's handling of
shared candidate buckets and degenerate distributions.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from kamiyo_hive_spark.operators.sketches import (
    CMS_D,
    CMS_W,
    QH_TARGETS,
    _cms_cell,
    quantile_twopass_exact,
)


def _counters(spark, tokens):
    df = spark.createDataFrame([(t,) for t in tokens], ["token"])
    out = (
        df.select(
            F.posexplode(
                F.array(*[_cms_cell(F.col("token"), r) for r in range(CMS_D)])
            ).alias("r", "cell")
        )
        .groupBy("r", "cell")
        .agg(F.count("*").alias("counter"))
        .collect()
    )
    return {(row["r"], row["cell"]): row["counter"] for row in out}


def test_cms_merge_is_elementwise_sum(spark):
    """The defining sketch property: counters over any partition of the
    data sum cell-wise to the counters over the whole — this is what
    makes per-shard/per-day sketch state combinable at 100 TB."""
    tokens = [f"tok{i % 37}" for i in range(300)]
    whole = _counters(spark, tokens)
    left = _counters(spark, tokens[:113])
    right = _counters(spark, tokens[113:])
    merged: dict = {}
    for part in (left, right):
        for k, v in part.items():
            merged[k] = merged.get(k, 0) + v
    assert merged == whole


def test_cms_estimates_never_undercount(spark):
    """2000 distinct tokens into 512 cells guarantees collisions in
    every row; min-over-rows must still never undercount (CM's
    one-sided error), and the sketch stays ≤ d·w cells."""
    tokens = [f"t{i}" for i in range(2000)] + ["hot"] * 50
    counters = _counters(spark, tokens)
    assert len(counters) <= CMS_D * CMS_W
    df = spark.createDataFrame([(t,) for t in set(tokens)], ["token"])
    probes = df.select(
        "token",
        F.posexplode(
            F.array(*[_cms_cell(F.col("token"), r) for r in range(CMS_D)])
        ).alias("r", "cell"),
    ).collect()
    import collections

    true = collections.Counter(tokens)
    est: dict = {}
    for row in probes:
        c = counters[(row["r"], row["cell"])]
        est[row["token"]] = min(est.get(row["token"], c), c)
    assert all(est[t] >= n for t, n in true.items())
    assert est["hot"] >= 50
    # with 2050 occurrences in 512 cells, at least one token collides
    assert any(est[t] > n for t, n in true.items())


def _write_orders(spark, tmp_path, prices):
    sf_dir = str(tmp_path)
    rows = [
        (i + 1, 1, "O", float(p), None, "1-URGENT") for i, p in enumerate(prices)
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "orders.parquet")
    )
    return sf_dir


def test_quantile_twopass_shared_bucket_degenerate(spark, tmp_path):
    """All prices equal → every target lands in the SAME candidate
    bucket (the explode must tag one row for several labels) and every
    exact quantile is the constant."""
    sf_dir = _write_orders(spark, tmp_path, [42.00] * 10)
    out = {
        r["pct"]: r for r in quantile_twopass_exact(spark, sf_dir).collect()
    }
    assert set(out) == {label for label, _, _ in QH_TARGETS}
    for r in out.values():
        assert r["exact_cents"] == 4200
        assert r["sketch_bound_holds"]


def test_quantile_twopass_matches_sorted_ranks(spark, tmp_path):
    """Exact order statistics at rank ceil(q·N) against a hand sort,
    including duplicate values spanning a rank boundary."""
    prices = [1.00, 1.00, 2.50, 2.50, 2.50, 7.00, 7.25, 9.99, 100.00, 100.00]
    sf_dir = _write_orders(spark, tmp_path, prices)
    cents = sorted(round(p * 100) for p in prices)
    n = len(cents)
    out = {
        r["pct"]: r for r in quantile_twopass_exact(spark, sf_dir).collect()
    }
    for label, num, den in QH_TARGETS:
        target = (num * n + den - 1) // den
        assert out[label]["target_rank"] == target
        assert out[label]["exact_cents"] == cents[target - 1], label
        assert out[label]["sketch_bound_holds"]
        assert (
            out[label]["est_upper_cents"] - out[label]["width_cents"]
            < out[label]["exact_cents"]
            <= out[label]["est_upper_cents"]
        )


def test_quantile_twopass_wide_range_bound(spark, tmp_path):
    """A range wider than the bucket count forces width > 1; the
    histogram estimate must still bracket the exact value within one
    bucket width."""
    prices = [float(i * i % 9973) + 0.25 for i in range(500)]
    sf_dir = _write_orders(spark, tmp_path, prices)
    cents = sorted(round(p * 100) for p in prices)
    n = len(cents)
    for r in quantile_twopass_exact(spark, sf_dir).collect():
        assert r["width_cents"] > 1
        label = r["pct"]
        num, den = {l: (a, b) for l, a, b in QH_TARGETS}[label]
        target = (num * n + den - 1) // den
        assert r["exact_cents"] == cents[target - 1]
        assert r["sketch_bound_holds"]

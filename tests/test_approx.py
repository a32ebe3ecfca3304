"""Invariant tests for sketch-based approximate aggregates.

`approx_distinct_dashboard` self-audits: it computes the HLL /
approx-quantile sketches AND the exact answers in one pass and emits
booleans asserting the sketches landed inside their error bounds (the
oracle pins those to TRUE). These tests independently recompute the
exact side and assert every audit flag holds.
"""

from __future__ import annotations


def test_approx_distinct_audit_flags_hold(spark, sf_dir):
    from kamiyo_hive_spark.catalog import table
    from kamiyo_hive_spark.operators.semistructured import approx_distinct_dashboard
    import pyspark.sql.functions as F

    rows = approx_distinct_dashboard(spark, sf_dir).collect()
    assert rows
    exact = {r.o_orderpriority: r.n
             for r in table(spark, sf_dir, "orders")
             .groupBy("o_orderpriority")
             .agg(F.countDistinct("o_custkey").alias("n"))
             .collect()}
    for r in rows:
        assert r.exact_customers == exact[r.o_orderpriority]
        assert r.hll_within_3rsd, (r.o_orderpriority, "HLL outside 3*rsd")
        assert r.quantiles_within_band, (r.o_orderpriority, "quantile outside band")


def test_approx_quantiles_ordered(spark, sf_dir):
    """The raw sketch invariant the dashboard relies on: approx
    quantiles are monotone in the probability vector."""
    import pyspark.sql.functions as F

    from kamiyo_hive_spark.catalog import table

    rows = (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.percentile_approx(
                "o_totalprice", [0.5, 0.95, 0.99], 2000
            ).alias("pq")
        )
        .collect()
    )
    for r in rows:
        q50, q95, q99 = r.pq
        assert q50 <= q95 <= q99
        assert q50 > 0

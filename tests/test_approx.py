"""Invariant tests for sketch-based approximate aggregates."""

from __future__ import annotations


def test_approx_distinct_within_rsd(spark, sf_dir):
    from kamiyo_hive_spark.catalog import table
    from kamiyo_hive_spark.operators.semistructured import approx_distinct_dashboard
    import pyspark.sql.functions as F

    approx = {r.o_orderpriority: r.approx_customers
              for r in approx_distinct_dashboard(spark, sf_dir).collect()}
    exact = {r.o_orderpriority: r.n
             for r in table(spark, sf_dir, "orders")
             .groupBy("o_orderpriority")
             .agg(F.countDistinct("o_custkey").alias("n"))
             .collect()}
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(5, 0.1 * n), (k, approx[k], n)


def test_quantiles_ordered_and_bounded(spark, sf_dir):
    from kamiyo_hive_spark.operators.semistructured import approx_distinct_dashboard

    for r in approx_distinct_dashboard(spark, sf_dir).collect():
        q50, q95, q99 = r.price_quantiles
        assert q50 <= q95 <= q99
        assert q50 > 0

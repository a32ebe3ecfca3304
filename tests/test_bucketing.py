"""Bucketing: pre-shuffled table layout makes key joins exchange-free.

The 100 TB claim behind `bucketBy` is testable locally: write both
fact tables bucketed by the join key, join them, and assert the
physical plan contains NO shuffle Exchange — the join runs bucket-to-
bucket. This is the co-located-join layout the engine prescribes for
repeated fact-fact joins (orders ⋈ lineitem at warehouse scale).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kamiyo_hive_spark.catalog import table

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    spark.sql("CREATE DATABASE IF NOT EXISTS bucketed")
    for name, key in [("orders", "o_orderkey"), ("lineitem", "l_orderkey")]:
        spark.sql(f"DROP TABLE IF EXISTS bucketed.{name}")
        (
            table(spark, sf_dir, name)
            .write.mode("overwrite")
            .bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .saveAsTable(f"bucketed.{name}")
        )
    yield
    for name in ["orders", "lineitem"]:
        spark.sql(f"DROP TABLE IF EXISTS bucketed.{name}")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    o = spark.table("bucketed.orders")
    li = spark.table("bucketed.lineitem")
    joined = o.join(li, o.o_orderkey == li.l_orderkey).groupBy("o_orderstatus").count()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the join itself must be exchange-free; the final tiny group-by
    # aggregation is allowed its one exchange
    join_section = plan.split("HashAggregate")[-1]
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    o = spark.table("bucketed.orders")
    li = spark.table("bucketed.lineitem")
    bucketed = {
        r.o_orderstatus: r.n
        for r in o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    po = table(spark, sf_dir, "orders")
    pli = table(spark, sf_dir, "lineitem")
    plain = {
        r.o_orderstatus: r.n
        for r in po.join(pli, po.o_orderkey == pli.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert bucketed == plain


def test_dpp_star_prune_plan_has_dynamic_pruning(spark, sf_dir):
    """The fact scan must carry a dynamicpruning partition filter —
    i.e. only the dimension-selected year directories are read."""
    from kamiyo_hive_spark.sources.sinks import dpp_star_prune

    df = dpp_star_prune(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()


def test_runtime_bloom_filter_semijoin_reduction(spark, sf_dir):
    """The 100 TB fact-fact path: when neither join side broadcasts,
    Spark injects a runtime bloom filter built from the selective side
    into the big side's scan (semi-join reduction). Defaults gate it on
    a >=10GB application-side scan — correctly OFF at test SF — so the
    thresholds are scaled down here to prove the same declarative join
    compiles to the reduced form at fact scale. No operator code
    changes: the engine keeps joins declarative and lets the optimizer
    inject the filter."""
    from pyspark.sql import functions as F

    from kamiyo_hive_spark.catalog import table

    scaled = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    prev = {k: spark.conf.get(k, None) for k in scaled}
    for k, v in scaled.items():
        spark.conf.set(k, v)
    try:
        o = table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = table(spark, sf_dir, "lineitem")
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, "runtime bloom filter not injected"
        # and the reduced plan still computes the right answer
        expected = (
            li.join(o.hint("broadcast"), li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
        assert sorted(map(tuple, j.collect())) == sorted(map(tuple, expected.collect()))
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_winnow_plan_is_map_only(spark, sf_dir):
    """Fingerprinting must stay a map over the (repartitioned) scan:
    exactly the parallel-spread exchange plus the output sort, no
    aggregation exchange, no join."""
    from kamiyo_hive_spark.plans.registry import load_registry

    plan = _physical(load_registry()["doc_winnow_fingerprints"].builder(spark, sf_dir))
    assert "Join" not in plan
    # hashpartitioning = parallel_table spread; rangepartitioning = final orderBy
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "HashAggregate" not in plan


def test_cohort_retention_single_fact_exchange(spark, sf_dir):
    """Both per-user aggregations must hash-partition the event scan on
    user_id; everything downstream is dimension-sized."""
    from kamiyo_hive_spark.plans.registry import load_registry

    plan = _physical(load_registry()["cohort_retention"].builder(spark, sf_dir))
    fact_exchanges = plan.count("Exchange hashpartitioning(user_id")
    assert fact_exchanges <= 2, plan  # one per agg lineage, pre-AQE-reuse


def test_funnel_conversion_one_exchange(spark, sf_dir):
    """The funnel is one user_id window pass + a scalar aggregate: a
    single hash exchange over the events scan."""
    from kamiyo_hive_spark.plans.registry import load_registry

    plan = _physical(load_registry()["funnel_conversion"].builder(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan

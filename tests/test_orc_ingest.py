"""ORC ingest: pushdown plan assertion + staging idempotence (the
value-level roundtrip proof is the registered DuckDB oracle)."""

from __future__ import annotations

from kamiyo_hive_spark.sources.layout import _orc_dir, orc_ingest_roundtrip


def test_orc_filter_pushdown(spark, sf_dir):
    """The p_size predicate must reach the ORC scan as a pushed filter
    — ORC stripes carry min/max stats like parquet row groups; a plan
    that re-filters JVM-side reads the whole table at 100 TB."""
    plan = (
        orc_ingest_roundtrip(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "GreaterThanOrEqual(p_size,10)" in plan, plan


def test_orc_staging_idempotent(spark, sf_dir):
    assert _orc_dir(spark, sf_dir) == _orc_dir(spark, sf_dir)

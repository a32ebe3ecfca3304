"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in the kamiyo_hive_spark registry
(`kamiyo_hive_spark/plans/registry.py`); this module is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kamiyo_hive_spark.plans.registry import load_registry

FLAGSHIP = "flagship_runs_listing"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    reg = load_registry()
    return reg[FLAGSHIP].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Deterministic registry (module-load) order; the harness owns its
    own sampling strategy over this dict.
    """
    reg = load_registry()
    return {name: reg[name].builder for name in reg}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible query."""
    reg = load_registry()
    return {name: reg[name].oracle for name in reg if reg[name].oracle is not None}

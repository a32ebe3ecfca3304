"""Declared-query registry.

Every operator the engine claims (SURVEY.md §2 inventory + the
LLM-data-pipeline families) registers exactly one named query here:

- ``builder(spark, sf_dir) -> DataFrame`` — the Spark-first
  implementation (declarative plan; Catalyst picks the physical
  strategy).
- ``oracle`` — equivalent ANSI SQL for DuckDB over the same parquet
  tables, or ``None`` for genuinely non-SQL-expressible operators
  (those get a weaker rows-only check).

Determinism contract (required for value-hash parity):
- Exact numerics: decimal-internal aggregation (functions.money).
- Any LIMIT/top-K is preceded by a total order with a unique tiebreak.
- Column names identical between builder output and oracle output.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None
    tags: tuple[str, ...] = ()
    doc: str = ""
    bench: bool = True  # include in bench.py headline timing


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = True,
) -> Callable[[Builder], Builder]:
    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name,
            builder=fn,
            oracle=oracle.strip() if oracle else None,
            tags=tuple(tags),
            doc=(fn.__doc__ or "").strip(),
            bench=bench,
        )
        return fn

    return deco


_LOADED = False


def load_registry() -> dict[str, QuerySpec]:
    """Import every operator module (side effect: registration)."""
    global _LOADED
    if not _LOADED:
        from kamiyo_hive_spark.operators import (  # noqa: F401
            aggregates,
            analytics,
            asof,
            clustering,
            corpus,
            dedup,
            joins,
            llm_http,
            llm_pipeline,
            merkle,
            multimodal,
            pipelines,
            profiling,
            quality,
            relational,
            retrieval,
            sampling,
            scalars,
            semistructured,
            setops,
            similarity,
            sketches,
            stateful,
            text,
            timeseries,
            tpch_extra,
            windows,
        )
        from kamiyo_hive_spark import warehouse  # noqa: F401
        from kamiyo_hive_spark.sources import (  # noqa: F401
            layout,
            maintenance,
            restds,
            reststream,
            restwrite,
            sinks,
            skipping,
            txlog,
        )
        from kamiyo_hive_spark.streaming import jobs  # noqa: F401

        _LOADED = True
    return REGISTRY

"""Scalable replacements for single-partition global windows.

`row_number()/sum() OVER (ORDER BY ...)` with no partitioning funnels
the entire input through ONE task — the canonical scale-killer (VERDICT
r1). Both helpers here compute the identical result with a two-pass
range-sharded scheme:

  1. Collect ~equi-depth shard BOUNDARIES for the leading sort column
     (one driver-side approxQuantile pass, metadata-sized result) and
     assign each row a shard id as a PURE FUNCTION of its key against
     those literal boundaries. This is deliberately NOT
     `repartitionByRange` + `spark_partition_id()`: the range
     partitioner re-SAMPLES per job execution (seeded by the fresh RDD
     id), so two passes over the same lineage can disagree about which
     partition a row lands in — observed live as a non-permutation
     index at sf0.01. A literal-boundary shard id is identical in
     every pass by construction.
  2. Rank / prefix-sum WITHIN each shard in parallel, collect the
     per-shard totals (one row per shard [× group]) and broadcast-join
     cumulative offsets back on.

The output is a pure function of the data and the sort key — invariant
to the shard count and the task layout — so reruns, backfills, and
cluster resizes assign identical ranks/prefixes (the determinism
training pipelines need). Leading sort columns must be numeric (the
boundary sketch uses approxQuantile); every current caller orders by a
numeric key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _with_shard(
    df: DataFrame, lead_col: str, nparts: int
) -> DataFrame:
    """Add `_shard` = index of `lead_col` in literal equi-depth boundary
    list. Rows with equal lead values always share a shard (pure
    function of the value), so shard assignment can never vary between
    passes; heavy ties skew shard sizes, which only costs balance."""
    probs = [i / nparts for i in range(1, nparts)]
    bounds = sorted(set(df.stat.approxQuantile(lead_col, probs, 0.001)))
    shard = F.lit(0)
    for b in bounds:
        shard = shard + (F.col(lead_col) > F.lit(b)).cast("int")
    # NULL lead values (approxQuantile ignores them; a bare comparison
    # would propagate NULL into _shard and crash the driver-side offset
    # sort) land in shard 0 — consistent with Spark's default
    # nulls-first ascending order inside the per-shard window.
    return df.withColumn(
        "_shard", F.when(F.col(lead_col).isNull(), F.lit(0)).otherwise(shard)
    )


def global_sorted_index_counted(
    df: DataFrame, id_col: str, *more_cols: str, num_shards: int | None = None
) -> tuple[DataFrame, int]:
    """(indexed df, total row count). The per-shard counts collected for
    the offset pass already sum to the total, so callers that need n
    (Merkle depth, ntile bucket sizes) get it WITHOUT their own
    `count()` — one fewer full scan per query."""
    spark = df.sparkSession
    nparts = num_shards or spark.sparkContext.defaultParallelism
    sharded = _with_shard(df, id_col, nparts).repartition(nparts, "_shard")
    counts = sorted(
        sharded.groupBy("_shard").agg(F.count("*").alias("c")).collect(),
        key=lambda r: r["_shard"],
    )
    offsets, acc = [], 0
    for r in counts:
        offsets.append((r["_shard"], acc))
        acc += r["c"]
    offset_df = spark.createDataFrame(offsets, "_shard int, _offset long")
    w = Window.partitionBy("_shard").orderBy(id_col, *more_cols)
    indexed = (
        sharded.withColumn("_local", F.row_number().over(w) - 1)
        .join(F.broadcast(offset_df), "_shard")
        .withColumn("idx", F.col("_local") + F.col("_offset"))
        .drop("_shard", "_local", "_offset")
    )
    return indexed, acc


def global_sorted_index(
    df: DataFrame, id_col: str, *more_cols: str, num_shards: int | None = None
) -> DataFrame:
    """Add a 0-based dense `idx` column = rank of the key tuple in the
    global sort order, without a single-partition window."""
    return global_sorted_index_counted(
        df, id_col, *more_cols, num_shards=num_shards
    )[0]


def global_prefix_sum(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[str],
    value_col: str,
    out_col: str = "prefix_sum",
    num_shards: int | None = None,
) -> DataFrame:
    """Add `out_col` = running (inclusive) sum of `value_col` ordered by
    `order_cols` within each `part_cols` group — WITHOUT one task per
    group. A group (e.g. one language of a mono-lingual corpus) can span
    many shards; the per-(group, shard) totals are metadata-sized and
    fold into broadcast offsets, so the heavy pass is fully parallel at
    any group-size skew."""
    spark = df.sparkSession
    nparts = num_shards or spark.sparkContext.defaultParallelism
    sharded = _with_shard(df, order_cols[0], nparts).repartition(
        nparts, "_shard", *part_cols
    )
    totals = sharded.groupBy("_shard", *part_cols).agg(
        F.sum(value_col).cast("long").alias("_t")
    ).collect()
    by_group: dict[tuple, list] = {}
    for r in totals:
        by_group.setdefault(tuple(r[c] for c in part_cols), []).append(
            (r["_shard"], r["_t"])
        )
    rows = []
    for key, lst in by_group.items():
        acc = 0
        for shard, t in sorted(lst):
            rows.append((*key, shard, acc))
            acc += t
    part_fields = [df.schema[c] for c in part_cols]
    offset_schema = T.StructType(
        part_fields
        + [
            T.StructField("_shard", T.IntegerType()),
            T.StructField("_offset", T.LongType()),
        ]
    )
    offset_df = spark.createDataFrame(rows, offset_schema)
    w = (
        Window.partitionBy("_shard", *part_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        sharded.withColumn("_local", F.sum(value_col).over(w))
        .join(F.broadcast(offset_df), ["_shard", *part_cols])
        .withColumn(out_col, F.col("_local") + F.col("_offset"))
        .drop("_shard", "_local", "_offset")
    )

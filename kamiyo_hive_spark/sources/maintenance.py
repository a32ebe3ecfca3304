"""Table-maintenance operators: targeted delete (right-to-be-forgotten)
and small-file compaction.

The two background jobs every parquet lake runs forever:

- ``targeted_delete_rewrite`` — DELETE WHERE key IN (...) over immutable
  files. You cannot edit parquet in place; the correct shape is to
  find the files that CONTAIN matching rows (file-level pruning — at
  scale via file stats/bloom indexes, here via an input_file_name
  semi-join), rewrite only those files minus the doomed rows, and keep
  every untouched file byte-identical. Touching 1% of files for a
  1%-selective delete is the entire difference between a GDPR erasure
  sweep that takes minutes and one that rewrites 100 TB.

- ``small_file_compaction`` — streaming ingest and partitioned writes
  strand thousands of KB-sized files; scans then pay per-file open
  costs and lose row-group pruning. Compaction bin-packs them into
  size-targeted files. It must be a pure re-layout: the oracle
  computes from the ORIGINAL source, so the hash proves compaction
  changed nothing but the file boundaries.
"""

from __future__ import annotations

import os
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kamiyo_hive_spark.catalog import table
from kamiyo_hive_spark.functions.money import dec, money_sum, money_sum_col
from kamiyo_hive_spark.plans.registry import register
from kamiyo_hive_spark.sources.sinks import (
    SCRATCH,
    ensure_staging,
    fresh_staging,
)

# ---------------------------------------------------------------------------
# Targeted delete
# ---------------------------------------------------------------------------

DELETE_POOL_FILES = 64       # file pool: range-partitioned by custkey.
                             # 64 (not 16) so the every-97th-custkey
                             # target set leaves files untouched at
                             # every sf — with 16 files at sf0.1 all
                             # ranges contain a target and the pruning
                             # story would be vacuous.
DELETE_KEY_MOD = 97          # forget customers with custkey % 97 == 0


def delete_pool_dir(spark: SparkSession, sf_dir: str) -> str:
    """Stage orders as a custkey-range-partitioned file pool — the
    layout under which a keyed delete is file-prunable (each custkey
    lives in exactly one file's range). Fingerprint-cached per sf_dir."""
    out = os.path.join(SCRATCH, f"orders_delete_pool_{os.path.basename(sf_dir)}")
    source = os.path.join(sf_dir, "orders.parquet")
    return ensure_staging(
        out,
        source,
        lambda tmp: table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .repartitionByRange(DELETE_POOL_FILES, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(tmp),
    )


def rewrite_matching_files(
    spark: SparkSession, pool: str, out: str, pred, rewrite
) -> tuple[int, int]:
    """The copy-on-write DML core shared by DELETE and UPDATE: find the
    files containing rows matching `pred` (file-level pruning via an
    input_file_name probe — at lake scale a file-stats / bloom-index
    lookup, not a scan), hard-link every untouched file byte-identical,
    and write `rewrite(affected_rows_df)` as the replacement for the
    affected files. Returns (n_files_total, n_files_rewritten)."""
    pooled = spark.read.parquet(pool)
    # input_file_name() yields a percent-encoded file URI; decode the
    # basename before comparing against os.listdir output or a file
    # name with encodable characters silently counts as "untouched"
    # and its doomed rows survive the rewrite (ADVICE r2).
    affected = {
        unquote(r["f"].split("/")[-1])
        for r in pooled.filter(pred)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    }
    all_files = sorted(f for f in os.listdir(pool) if f.endswith(".parquet"))

    def build(tmp: str) -> None:
        os.makedirs(tmp)
        for f in all_files:
            if f not in affected:
                os.link(os.path.join(pool, f), os.path.join(tmp, f))
        if affected:
            rows = spark.read.parquet(
                *[os.path.join(pool, f) for f in sorted(affected)]
            )
            rewrite(rows).write.mode("append").parquet(tmp)

    fresh_staging(out, build)
    return len(all_files), len(affected)


def targeted_delete(spark: SparkSession, sf_dir: str) -> tuple[str, int, int]:
    """Execute the delete: returns (result_dir, n_files_total,
    n_files_rewritten). Result dir contains hard links of untouched
    files plus rewritten survivors of affected files."""
    pool = delete_pool_dir(spark, sf_dir)
    out = os.path.join(SCRATCH, f"orders_post_delete_{os.path.basename(sf_dir)}")
    doomed = F.col("o_custkey") % DELETE_KEY_MOD == 0
    n_total, n_rewritten = rewrite_matching_files(
        spark, pool, out, doomed, lambda rows: rows.filter(~doomed)
    )
    return out, n_total, n_rewritten


_DELETE_ORACLE = f"""
SELECT o_orderstatus,
       count(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price,
       CAST(SUM(CASE WHEN o_custkey % {DELETE_KEY_MOD} = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_leftover_targets
FROM orders
WHERE o_custkey % {DELETE_KEY_MOD} <> 0
GROUP BY 1
ORDER BY o_orderstatus
"""


@register(
    "targeted_delete_rewrite",
    oracle=_DELETE_ORACLE,
    tags=("maintenance", "delete", "gdpr"),
)
def targeted_delete_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten DELETE over immutable parquet: find the
    files containing target customers (file-level pruning via an
    input_file_name probe standing in for a file-stats index), rewrite
    only those files without the doomed rows, hard-link every
    untouched file unchanged, then aggregate the post-delete table.
    The oracle computes the same aggregate as a plain anti-filter on
    the source — the hash proves the delete removed exactly the target
    rows and nothing else. `n_leftover_targets` is pinned to 0 by both
    sides (the erasure actually happened). File-touch accounting is
    unit-tested (tests/test_maintenance.py): untouched files must be
    the SAME inodes, and rewrites must touch a strict subset."""
    out, _, _ = targeted_delete(spark, sf_dir)
    post = spark.read.parquet(out)
    return (
        post.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_rows"),
            money_sum_col("o_totalprice").alias("total_price"),
            F.sum(
                F.when(F.col("o_custkey") % DELETE_KEY_MOD == 0, 1).otherwise(0)
            )
            .cast("long")
            .alias("n_leftover_targets"),
        )
    )


# ---------------------------------------------------------------------------
# Small-file compaction
# ---------------------------------------------------------------------------

FRAGMENT_FILES = 64   # the strand-of-small-files starting state
COMPACT_FILES = 4     # target after bin-packing


def fragmented_dir(spark: SparkSession, sf_dir: str) -> str:
    """Stage lineitem shattered into 64 files — the post-streaming-
    ingest pathology. Fingerprint-cached per sf_dir."""
    out = os.path.join(SCRATCH, f"lineitem_fragments_{os.path.basename(sf_dir)}")
    source = os.path.join(sf_dir, "lineitem.parquet")
    return ensure_staging(
        out,
        source,
        lambda tmp: table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .repartition(FRAGMENT_FILES)
        .write.mode("overwrite")
        .parquet(tmp),
    )


def compact(spark: SparkSession, sf_dir: str) -> str:
    """Compact the fragment pool into COMPACT_FILES range-partitioned,
    internally sorted files (bin-pack + re-cluster in one pass — real
    compactors fold a sort in since they're rewriting anyway)."""
    frags = fragmented_dir(spark, sf_dir)
    out = os.path.join(SCRATCH, f"lineitem_compacted_{os.path.basename(sf_dir)}")
    return fresh_staging(
        out,
        lambda tmp: spark.read.parquet(frags)
        .repartitionByRange(COMPACT_FILES, "l_orderkey", "l_linenumber")
        .sortWithinPartitions("l_orderkey", "l_linenumber")
        .write.mode("overwrite")
        .parquet(tmp),
    )


_COMPACT_ORACLE = """
SELECT count(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS total_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price,
       CAST(MIN(l_orderkey) AS BIGINT) AS min_key,
       CAST(MAX(l_orderkey) AS BIGINT) AS max_key
FROM lineitem
"""


@register(
    "small_file_compaction",
    oracle=_COMPACT_ORACLE,
    tags=("maintenance", "compaction"),
)
def small_file_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bin-pack 64 ingest fragments into 4 range-clustered files and
    aggregate the compacted table. The oracle computes from the
    ORIGINAL lineitem source — two layout hops away — so the hash
    proves compaction is a pure re-layout (no row lost, duplicated, or
    altered). File-count reduction and per-file ordering are
    unit-tested. At 100 TB this is the nightly OPTIMIZE job: the scan
    cost of the fragment pool is per-file opens; the compacted layout
    restores row-group pruning and sequential reads."""
    out = compact(spark, sf_dir)
    comp = spark.read.parquet(out)
    return comp.agg(
        F.count("*").alias("n_rows"),
        money_sum_col("l_quantity").alias("total_qty"),
        money_sum_col("l_extendedprice").alias("total_price"),
        F.min("l_orderkey").alias("min_key"),
        F.max("l_orderkey").alias("max_key"),
    )


# ---------------------------------------------------------------------------
# Keyed UPDATE (copy-on-write) — completes the DML triad
# ---------------------------------------------------------------------------

UPDATE_KEY_MOD = 131    # customers getting a price adjustment
UPDATE_BUMP = "25.00"   # exact decimal bump applied to their orders


def keyed_update(spark: SparkSession, sf_dir: str) -> tuple[str, int, int]:
    """Execute the update (mirrors `targeted_delete`): returns
    (result_dir, n_files_total, n_files_rewritten)."""
    pool = delete_pool_dir(spark, sf_dir)
    out = os.path.join(SCRATCH, f"orders_post_update_{os.path.basename(sf_dir)}")
    hit = F.col("o_custkey") % UPDATE_KEY_MOD == 0
    bump = (
        dec("o_totalprice") + F.lit(UPDATE_BUMP).cast("decimal(14,2)")
    ).cast("double")

    def apply_update(rows: DataFrame) -> DataFrame:
        return rows.withColumn(
            "o_totalprice", F.when(hit, bump).otherwise(F.col("o_totalprice"))
        )

    n_total, n_rewritten = rewrite_matching_files(spark, pool, out, hit, apply_update)
    return out, n_total, n_rewritten


@register(
    "keyed_update_rewrite",
    oracle=f"""
    SELECT o_orderstatus,
           count(*) AS n_rows,
           CAST(SUM(CASE WHEN o_custkey % {UPDATE_KEY_MOD} = 0
                         THEN CAST(o_totalprice AS DECIMAL(14,2))
                              + CAST({UPDATE_BUMP} AS DECIMAL(14,2))
                         ELSE CAST(o_totalprice AS DECIMAL(14,2)) END)
                AS DOUBLE) AS total_price,
           CAST(SUM(CASE WHEN o_custkey % {UPDATE_KEY_MOD} = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_updated
    FROM orders
    GROUP BY 1
    ORDER BY o_orderstatus
    """,
    tags=("maintenance", "update", "copy-on-write"),
)
def keyed_update_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE WHERE key IN (...) over immutable parquet — the third leg
    of the DML triad (append = `snapshot_time_travel`, delete =
    `targeted_delete_rewrite`): the same copy-on-write core finds the
    files containing target customers, rewrites ONLY those files with
    the price adjustment applied (exact DECIMAL arithmetic — money
    never transits double during the update), and hard-links every
    untouched file byte-identical. Row count must be conserved (an
    update never adds or drops rows) and the oracle recomputes the
    adjusted aggregate straight from the source."""
    out, _, _ = keyed_update(spark, sf_dir)
    hit = F.col("o_custkey") % UPDATE_KEY_MOD == 0
    post = spark.read.parquet(out)
    return (
        post.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_rows"),
            money_sum_col("o_totalprice").alias("total_price"),
            F.sum(F.when(hit, 1).otherwise(0)).cast("long").alias("n_updated"),
        )
    )

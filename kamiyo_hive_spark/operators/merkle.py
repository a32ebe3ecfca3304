"""Merkle-root hash aggregation (SURVEY A15, U6).

The reference builds a depth-20 Merkle tree over the sorted agent set
with pairwise hash folds (kamiyo-hive `packages/hive-sdk/src/swarmteams/
merkle.ts:51-233`, Poseidon). The fold is inherently sequential per
level, but each level is embarrassingly parallel — so the Spark shape is
log2(n) DataFrame passes, each one `groupBy(idx div 2)` + ordered pair
hash. 1M leaves = 20 shuffles over halving row counts; at 100 TB the
leaf level dominates and parallelizes perfectly.

Hash function: SHA-256 over hex-string concatenation (engine-portable,
unlike Poseidon which exists for ZK-circuit parity only; swapping the
hash is one expression).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kamiyo_hive_spark.catalog import table
from kamiyo_hive_spark.plans.registry import register

from kamiyo_hive_spark.functions.ranks import global_sorted_index  # noqa: E402
# re-export: price_decile_stats and earlier rounds import it from here

ZERO = "0" * 64  # padding leaf (the reference uses precomputed zero hashes)


def merkle_root(leaves: DataFrame, id_col: str, value_col: str) -> DataFrame:
    """Fold (id, value) rows into a single-row (root, n_leaves, depth).

    Leaves are ordered by id (range-partitioned global rank — the
    reference's sorted-leaf convention, computed without a
    single-partition window; see `global_sorted_index`) and
    pairwise-folded level by level for ceil(log2(n)) levels; a missing
    right sibling folds against the constant zero hash (the reference's
    zero-hash padding, `merkle.ts:62-79`, with a flat zero constant
    instead of per-level precomputed zeros).
    """
    n = leaves.count()
    depth = max(1, (n - 1).bit_length())

    level = global_sorted_index(leaves, id_col).select(
        "idx",
        F.sha2(F.concat_ws(":", F.col(id_col).cast("string"), F.col(value_col).cast("string")), 256).alias("h"),
    )
    # Virtual padding: missing right siblings hash against ZERO below,
    # so we never materialize `size - n` padding rows.
    for _ in range(depth):
        level = (
            level.withColumn("pair", (F.col("idx") / 2).cast("long"))
            .groupBy("pair")
            .agg(
                F.min(F.when(F.col("idx") % 2 == 0, F.col("h"))).alias("left"),
                F.min(F.when(F.col("idx") % 2 == 1, F.col("h"))).alias("right"),
            )
            .select(
                F.col("pair").alias("idx"),
                F.sha2(
                    F.concat(
                        F.coalesce(F.col("left"), F.lit(ZERO)),
                        F.coalesce(F.col("right"), F.lit(ZERO)),
                    ),
                    256,
                ).alias("h"),
            )
        )
    return level.select(
        F.col("h").alias("root"),
        F.lit(n).cast("long").alias("n_leaves"),
        F.lit(depth).cast("long").alias("depth"),
    )


_ORACLE_MAX_DEPTH = 24  # 16M leaves — far above any test scale factor


def _merkle_oracle() -> str:
    """Generated DuckDB twin of the level-by-level Merkle fold: a fixed
    ladder of per-level CTEs (each `groupBy(idx div 2)` + ordered pair
    sha256, identical algebra to the Spark loop), then select the level
    `ceil(log2(n))` — the same depth the Spark side computes. Levels
    past the true depth cost one row each; the ladder is capped at
    2^{maxd} leaves."""
    # AS MATERIALIZED: DuckDB inlines plain CTEs, so a 24-deep chained
    # ladder would otherwise explode into an O(d²)-nested plan and hang
    # the optimizer; materializing pins each level to one evaluation.
    parts = [
        """
    WITH l0 AS MATERIALIZED (
        SELECT row_number() OVER (ORDER BY c_custkey) - 1 AS idx,
               sha256(CAST(c_custkey AS VARCHAR) || ':' || c_name) AS h
        FROM customer
    ),
    meta AS (
        SELECT count(*) AS n,
               GREATEST(1, CAST(ceil(log2(count(*))) AS BIGINT)) AS depth
        FROM l0
    )"""
    ]
    zero = "'" + ZERO + "'"
    for i in range(1, _ORACLE_MAX_DEPTH + 1):
        parts.append(
            f""",
    l{i} AS MATERIALIZED (
        SELECT idx // 2 AS idx,
               sha256(coalesce(min(CASE WHEN idx % 2 = 0 THEN h END), {zero})
                   || coalesce(min(CASE WHEN idx % 2 = 1 THEN h END), {zero})) AS h
        FROM l{i - 1} GROUP BY 1
    )"""
        )
    union = "\n        UNION ALL\n        ".join(
        f"SELECT {i} AS lvl, idx, h FROM l{i}" for i in range(1, _ORACLE_MAX_DEPTH + 1)
    )
    parts.append(
        f""",
    alllvl AS (
        {union}
    )
    SELECT a.h AS root, m.n AS n_leaves, m.depth
    FROM alllvl a CROSS JOIN meta m
    WHERE a.lvl = m.depth AND a.idx = 0
    """
    )
    return "".join(parts)


@register(
    "merkle_root_customers",
    oracle=_merkle_oracle(),
    tags=("A15", "U6", "merkle"),
    bench=True,
)
def merkle_root_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle root of the customer set (id:name leaves) — the agent-set
    commitment the reference maintains at depth 20 (`packages/hive-sdk/
    src/swarmteams/merkle.ts:51-233`). The generated oracle replays the
    whole pairwise sha256 fold in DuckDB, so the root itself is
    hash-checked (VERDICT r1: was unit-only); tests/test_merkle.py keeps
    the pure-Python reference fold as a third implementation."""
    c = table(spark, sf_dir, "customer")
    return merkle_root(c, "c_custkey", "c_name")


def merkle_proof(leaves: DataFrame, id_col: str, value_col: str, target_id) -> DataFrame:
    """(level, sibling_hash, sibling_is_left) proof path for one leaf.

    Same level-by-level fold as `merkle_root`, but each level also emits
    the sibling of the target's current position. The per-level filter
    prunes to two rows before anything is collected, so proof generation
    costs one extra filtered pass per level — log2(n) tiny jobs.
    """
    n = leaves.count()
    depth = max(1, (n - 1).bit_length())

    ranked = global_sorted_index(leaves, id_col).select(
        "idx", F.col(id_col).alias("id"), F.col(value_col).alias("v")
    )
    target_idx = ranked.filter(F.col("id") == target_id).select("idx").collect()
    if not target_idx:
        raise KeyError(f"{target_id!r} not found in leaf set")
    pos = target_idx[0]["idx"]

    level = ranked.select(
        "idx",
        F.sha2(F.concat_ws(":", F.col("id").cast("string"), F.col("v").cast("string")), 256).alias("h"),
    )
    rows = []
    for lvl in range(depth):
        sib = pos ^ 1
        sib_row = level.filter(F.col("idx") == sib).select("h").collect()
        rows.append(
            {
                "level": lvl,
                "sibling_hash": sib_row[0]["h"] if sib_row else ZERO,
                "sibling_is_left": bool(sib < pos),
            }
        )
        level = (
            level.withColumn("pair", (F.col("idx") / 2).cast("long"))
            .groupBy("pair")
            .agg(
                F.min(F.when(F.col("idx") % 2 == 0, F.col("h"))).alias("left"),
                F.min(F.when(F.col("idx") % 2 == 1, F.col("h"))).alias("right"),
            )
            .select(
                F.col("pair").alias("idx"),
                F.sha2(
                    F.concat(
                        F.coalesce(F.col("left"), F.lit(ZERO)),
                        F.coalesce(F.col("right"), F.lit(ZERO)),
                    ),
                    256,
                ).alias("h"),
            )
        )
        pos //= 2

    spark = leaves.sparkSession
    return spark.createDataFrame(
        rows, "level long, sibling_hash string, sibling_is_left boolean"
    )


def verify_merkle_proof(
    leaf_id, leaf_value, proof_rows: list, expected_root: str
) -> bool:
    """Client-side proof verification: fold the leaf hash up the path.
    Pure Python by design — verification is what a *consumer* of the
    commitment does, without Spark (mirrors `merkle.ts:169-195`)."""
    import hashlib

    h = hashlib.sha256(f"{leaf_id}:{leaf_value}".encode()).hexdigest()
    for row in sorted(proof_rows, key=lambda r: r["level"]):
        sib = row["sibling_hash"]
        pair = (sib + h) if row["sibling_is_left"] else (h + sib)
        h = hashlib.sha256(pair.encode()).hexdigest()
    return h == expected_root

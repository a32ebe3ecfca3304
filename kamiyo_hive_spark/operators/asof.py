"""As-of join — the time-series operator Spark lacks natively.

Semantics: for each left row, the single most recent right row with
`right.ts <= left.ts` within the same key (the classic trades↔quotes
shape; here: each purchase matched to the user's most recent prior
view). The reference's implicit form is votes-valid-at-slot
(`programs/kamiyo-fast-voting/src/lib.rs:103`).

Spark-first implementation (no UDF, no merge_asof): union both sides
tagged by origin, sort within user by time, and carry the last seen
right-row forward with `last(..., ignorenulls=True)` over an
unbounded-preceding window — one shuffle on the key, linear work.
The oracle is DuckDB's native ASOF JOIN, which independently validates
the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kamiyo_hive_spark.catalog import table
from kamiyo_hive_spark.plans.registry import register


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
) -> DataFrame:
    """left ⟕asof right on `key`, matching the latest right row with
    right_ts <= left_ts. Returns left columns + right payload columns
    (null when no prior right row exists)."""
    left_cols = [f.name for f in left.schema.fields if f.name != key]
    l_tag = left.select(
        F.col(key),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in left_cols],
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
            for c in right_payload
        ],
    )
    r_tag = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        *[F.col(c).alias(f"_r_{c}") for c in right_payload],
    )
    unioned = l_tag.unionByName(r_tag)
    # right rows sort before left rows at the same timestamp so a
    # same-instant quote is visible to the trade (<= semantics)
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_payload
        ],
    )
    return carried.filter(F.col("_is_left") == 1).drop(
        "_ts", "_is_left", *[f"_r_{c}" for c in right_payload]
    )


@register(
    "asof_view_to_purchase",
    oracle="""
    WITH purchases AS (
        SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'purchase'
    ),
    views AS (
        SELECT user_id, event_id AS view_event_id, ts AS view_ts
        FROM events WHERE event_type = 'view'
    )
    SELECT p.user_id, p.event_id, p.ts, p.value,
           v.view_event_id AS asof_view_event_id,
           v.view_ts AS asof_view_ts
    FROM purchases p
    ASOF LEFT JOIN views v
      ON p.user_id = v.user_id AND v.view_ts <= p.ts
    ORDER BY p.user_id, p.ts, p.event_id
    """,
    tags=("asof-join", "J8", "time-series"),
)
def asof_view_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase matched to the user's most recent prior (or
    same-instant) view. Checked against DuckDB's NATIVE ASOF JOIN — an
    independent implementation of the same semantics."""
    e = table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_event_id"),
        F.col("ts").alias("view_ts"),
    )
    out = asof_join(
        purchases, views, key="user_id", left_ts="ts", right_ts="view_ts",
        right_payload=["view_event_id", "view_ts"],
    )
    return out.select(
        "user_id", "event_id", "ts", "value", "asof_view_event_id", "asof_view_ts"
    )

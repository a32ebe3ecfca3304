"""Commit-reveal session operator (SURVEY ST3, W4) — custom stateful logic.

The reference's vote-bid lifecycle (kamiyo-hive `swarm-types.ts:60-145`,
`e2e/hive-e2e.test.mjs:406-501`): a commit phase registers nullifiers
before a deadline, a reveal phase accepts bids until a second deadline,
then the action resolves — winner = highest revealed bid with
first-committer tie-break (W4), Passed iff quorum was reached.

Spark shape: the per-key session state machine runs in `applyInPandas`
(Arrow-batched grouped map) — the sanctioned API for custom stateful
operators. Each key's events arrive as one ordered pandas frame; state
transitions are plain Python over that frame, so the same function body
drops into `transformWithStateInPandas` for the unbounded streaming
variant (the micro-batch loop replaces the in-frame loop).

Mapped to testdata: key = user_id (action), commit = any event before
T1, reveal-bid = purchase event in [T1, T2), late rows rejected (ST2).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kamiyo_hive_spark.catalog import table
from kamiyo_hive_spark.plans.registry import register

T1 = "2024-01-15 00:00:00"  # commit deadline
T2 = "2024-01-25 00:00:00"  # reveal deadline
QUORUM = 2

_OUT_SCHEMA = (
    "user_id long, n_commits long, n_reveals long, n_late long, "
    "winning_bid double, winner_event_id long, result string"
)


def _resolve_session(pdf: pd.DataFrame) -> pd.DataFrame:
    """State machine for one key: commit → reveal → resolve."""
    t1, t2 = pd.Timestamp(T1), pd.Timestamp(T2)
    pdf = pdf.sort_values(["ts", "event_id"])
    commits = pdf[pdf["ts"] < t1]
    reveals = pdf[(pdf["ts"] >= t1) & (pdf["ts"] < t2) & (pdf["event_type"] == "purchase")]
    late = pdf[pdf["ts"] >= t2]

    if len(reveals):
        # argmax with deterministic tie-break: highest bid, then first
        # (lowest event_id) — the highestYesBid winner semantics (W4).
        best = reveals.sort_values(["value", "event_id"], ascending=[False, True]).iloc[0]
        winning_bid, winner = float(best["value"]), int(best["event_id"])
    else:
        winning_bid, winner = None, None

    passed = len(commits) >= QUORUM and winner is not None
    return pd.DataFrame(
        [
            {
                "user_id": int(pdf["user_id"].iloc[0]),
                "n_commits": len(commits),
                "n_reveals": len(reveals),
                "n_late": len(late),
                "winning_bid": winning_bid,
                "winner_event_id": winner,
                "result": "Passed" if passed else "Failed",
            }
        ]
    )


@register(
    "commit_reveal_sessions",
    oracle=f"""
    WITH base AS (
        SELECT user_id, event_id, ts, event_type, value FROM events
    ),
    commits AS (
        SELECT user_id, count(*) AS n_commits FROM base
        WHERE ts < TIMESTAMP '{T1}' GROUP BY 1
    ),
    reveals AS (
        SELECT user_id, count(*) AS n_reveals,
               max(value) AS winning_bid,
               min(event_id) FILTER (WHERE value = max_val) AS winner_event_id
        FROM (
            SELECT *, max(value) OVER (PARTITION BY user_id) AS max_val
            FROM base
            WHERE ts >= TIMESTAMP '{T1}' AND ts < TIMESTAMP '{T2}'
              AND event_type = 'purchase'
        )
        GROUP BY 1
    ),
    late AS (
        SELECT user_id, count(*) AS n_late FROM base
        WHERE ts >= TIMESTAMP '{T2}' GROUP BY 1
    ),
    keys AS (SELECT DISTINCT user_id FROM base)
    SELECT k.user_id,
           coalesce(c.n_commits, 0) AS n_commits,
           coalesce(r.n_reveals, 0) AS n_reveals,
           coalesce(l.n_late, 0) AS n_late,
           r.winning_bid,
           r.winner_event_id,
           CASE WHEN coalesce(c.n_commits, 0) >= {QUORUM}
                     AND r.winner_event_id IS NOT NULL
                THEN 'Passed' ELSE 'Failed' END AS result
    FROM keys k
    LEFT JOIN commits c USING (user_id)
    LEFT JOIN reveals r USING (user_id)
    LEFT JOIN late l USING (user_id)
    ORDER BY user_id
    """,
    tags=("ST3", "W4", "applyInPandas", "stateful"),
)
def commit_reveal_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Commit-reveal lifecycle resolved per key with quorum, deadline
    rejection, and argmax-with-tie-break — the reference's two-phase
    voting session.

    Batch path: pure DataFrame ops (conditional aggregation + max_by
    with a struct tie-break) — the semantics ARE SQL-expressible in
    batch, so the JVM path is the right one ("built-ins first"). The
    pandas state machine (`_resolve_session`) is the same logic as a
    grouped-map operator: the streaming variant
    (`streaming_commit_reveal_stateful`) uses it where custom state is
    genuinely required, and tests/test_stateful.py proves both paths
    produce identical resolutions."""
    return resolve_sessions_sql(spark, sf_dir)


def resolve_sessions_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative twin of `_resolve_session`, one pass over events."""
    e = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    t1 = F.lit(T1).cast("timestamp")
    t2 = F.lit(T2).cast("timestamp")
    is_commit = F.col("ts") < t1
    is_reveal = (F.col("ts") >= t1) & (F.col("ts") < t2) & (F.col("event_type") == "purchase")
    is_late = F.col("ts") >= t2
    # winner: max bid, ties to the earliest event — max_by over a struct
    # ordered (value, -event_id) resolves both in one aggregate.
    winner = F.max_by(
        F.when(is_reveal, F.struct(F.col("event_id"), F.col("value"))),
        F.when(is_reveal, F.struct(F.col("value"), (-F.col("event_id")).alias("neg"))),
    )
    agg = e.groupBy("user_id").agg(
        F.sum(is_commit.cast("long")).alias("n_commits"),
        F.sum(is_reveal.cast("long")).alias("n_reveals"),
        F.sum(is_late.cast("long")).alias("n_late"),
        winner.alias("w"),
    )
    return (
        agg.select(
            "user_id",
            "n_commits",
            "n_reveals",
            "n_late",
            F.col("w.value").alias("winning_bid"),
            F.col("w.event_id").alias("winner_event_id"),
            F.when(
                (F.col("n_commits") >= QUORUM) & F.col("w.event_id").isNotNull(), "Passed"
            )
            .otherwise("Failed")
            .alias("result"),
        )
    )


def resolve_sessions_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The grouped-map (applyInPandas) form — custom-operator API twin
    of `resolve_sessions_sql`, kept for parity testing and as the
    template the streaming stateful variant builds on."""
    e = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    return e.groupBy("user_id").applyInPandas(_resolve_session, schema=_OUT_SCHEMA)

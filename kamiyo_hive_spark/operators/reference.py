"""Reference-semantics pipelines over the FIXTURES.md §B tables.

Each function reproduces a behavior of the reference system as a
declarative DataFrame pipeline over fixture DataFrames (see
`kamiyo_hive_spark.sources.fixtures`), so reference e2e assertions
(duplicate-nullifier rejection, quorum/threshold resolution, stake-age
weight banding, calendar earnings windows, burn dashboard, trust-graph
stats, channel history) can be golden-checked against a DuckDB oracle
over identical data.

Reference citations (in /root/reference):
- vote resolve: `programs/kamiyo-fast-voting/src/lib.rs:103,276-286`
- stake bands: `lib/governance.ts:282-302`
- earnings windows: `lib/hive-api.ts:316-334`
- burn dashboard: `packages/hive-sdk/src/swarmteams/swarm-types.ts:465-476`
- trust stats: `components/trust-graph/types.ts:9-29`
- channel history: `packages/hive-sdk/src/channels/message-store.ts:3,43`

Scale notes: every pipeline is a single shuffle on its natural key
(action_id / epoch / token×status / tier / channel_id) with map-side
partial aggregation; the vote dedup is one window over
(action_id, voter_nullifier) — the same partitioning the tally reuses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kamiyo_hive_spark.sources.fixtures import NOW, QUORUM


def resolve_actions(votes: DataFrame, actions: DataFrame) -> DataFrame:
    """Fast-voting resolution: drop duplicate nullifiers (first vote by
    slot wins, vote_id tie-break), drop votes after the action's
    deadline slot, require bid ≥ min_bid for a reveal, then tally and
    decide pass/fail by quorum + threshold percentage.
    """
    v = votes.join(
        F.broadcast(actions.select("action_id", "deadline_slot", "min_bid", "threshold")),
        "action_id",
    )
    first = Window.partitionBy("action_id", "voter_nullifier").orderBy(
        "voted_slot", "vote_id"
    )
    deduped = (
        v.withColumn("rn", F.row_number().over(first)).filter(F.col("rn") == 1).drop("rn")
    )
    on_time = deduped.filter(F.col("voted_slot") <= F.col("deadline_slot"))
    tally = on_time.groupBy("action_id", "threshold").agg(
        F.count("*").alias("n_votes"),
        F.sum(F.when(F.col("vote_value"), 1).otherwise(0)).cast("long").alias("votes_for"),
        F.sum(
            F.when(F.col("bid_amount") >= F.col("min_bid"), 1).otherwise(0)
        ).cast("long").alias("valid_reveals"),
        F.max(
            F.when(F.col("bid_amount") >= F.col("min_bid"), F.col("bid_amount"))
        ).cast("double").alias("top_bid"),
    )
    return tally.select(
        "action_id",
        "n_votes",
        "votes_for",
        "valid_reveals",
        "top_bid",
        (
            (F.col("n_votes") >= QUORUM)
            & (F.col("votes_for") * 100 >= F.col("threshold") * F.col("n_votes"))
        ).alias("passed"),
    ).orderBy("action_id")


def stake_weights(stakes: DataFrame) -> DataFrame:
    """Vote weight = balance + staked × age-band multiplier
    ({<30d: 1.0, 30-90: 1.2, 90-180: 1.5, ≥180: 2.0}). Multipliers are
    exact decimals so the weight stays decimal-exact.
    """
    age_days = F.datediff(F.lit(NOW).cast("timestamp"), F.col("stake_start"))
    mult = (
        F.when(age_days < 30, F.lit("1.0"))
        .when(age_days < 90, F.lit("1.2"))
        .when(age_days < 180, F.lit("1.5"))
        .otherwise(F.lit("2.0"))
        .cast("decimal(3,1)")
    )
    return stakes.select(
        "wallet",
        age_days.alias("age_days"),
        mult.cast("double").alias("multiplier"),
        # staked(6dp) × mult(1dp) is exact at 7dp — keep all 7 digits so
        # neither engine rounds (their half-rounding modes differ).
        (F.col("token_balance") + F.col("staked_amount") * mult)
        .cast("decimal(27,7)")
        .cast("double")
        .alias("vote_weight"),
    )


def signal_epoch_aggregate(signals: DataFrame) -> DataFrame:
    """Per-epoch revealed-signal aggregator: direction counts + total
    confidence/magnitude (SURVEY A5 golden)."""
    return (
        signals.filter("revealed")
        .groupBy("epoch")
        .agg(
            F.sum(F.when(F.col("direction") == 1, 1).otherwise(0)).cast("long").alias("long_count"),
            F.sum(F.when(F.col("direction") == 0, 1).otherwise(0)).cast("long").alias("short_count"),
            F.sum(F.when(F.col("direction") == 2, 1).otherwise(0)).cast("long").alias("neutral_count"),
            F.sum("confidence").cast("long").alias("total_confidence"),
            F.sum("magnitude").cast("long").alias("total_magnitude"),
        )
    )


def earnings_summary(earnings: DataFrame) -> DataFrame:
    """today / thisWeek / thisMonth released sums + all-time totals
    pivoted by token×status, against the injected ``NOW`` anchor."""
    now = F.lit(NOW).cast("timestamp")
    amt = F.col("amount")
    in_day = F.col("created_at") >= F.date_trunc("day", now)
    in_week = F.col("created_at") >= F.date_trunc("week", now)
    in_month = F.col("created_at") >= F.date_trunc("month", now)
    return earnings.agg(
        F.sum(F.when(in_day, amt)).cast("double").alias("today"),
        F.sum(F.when(in_week, amt)).cast("double").alias("this_week"),
        F.sum(F.when(in_month, amt)).cast("double").alias("this_month"),
        *[
            F.sum(F.when((F.col("token") == t) & (F.col("status") == s), amt))
            .cast("double")
            .alias(f"{t.lower()}_{s}")
            for t in ("SOL", "USDC")
            for s in ("pending", "released", "disputed")
        ],
    )


def burn_dashboard(burns: DataFrame) -> DataFrame:
    """totalBurned / burns24h / burnCount / pendingBurns (SURVEY A9)."""
    now = F.lit(NOW).cast("timestamp")
    executed = F.col("status") == "executed"
    return burns.agg(
        F.sum(F.when(executed, F.col("kamiyo_amount"))).cast("double").alias("total_burned"),
        F.sum(
            F.when(
                executed & (F.col("created_at") >= now - F.expr("INTERVAL 24 HOURS")),
                F.col("kamiyo_amount"),
            )
        ).cast("double").alias("burns_24h"),
        F.sum(F.when(executed, 1).otherwise(0)).cast("long").alias("burn_count"),
        F.sum(F.when(F.col("status") == "pending", 1).otherwise(0)).cast("long").alias("pending_burns"),
    )


def trust_stats(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Graph HUD stats: node/edge totals, avg node reputation, count per
    tier — one row, tierCounts as pivoted columns for hashability."""
    tier_counts = nodes.groupBy().pivot("tier", ["oracle", "sentinel", "architect", "scout", "ghost"]).count()
    totals = nodes.agg(
        F.count("*").alias("total_nodes"),
        F.avg("reputation").alias("avg_trust"),
    )
    e = edges.agg(F.count("*").alias("total_edges"))
    return totals.crossJoin(e).crossJoin(tier_counts)


def channel_history(messages: DataFrame, before_ts: str, n: int = 50) -> DataFrame:
    """Last-N messages per channel strictly before a cursor timestamp,
    newest first (message-store history query, W5)."""
    w = Window.partitionBy("channel_id").orderBy(F.desc("ts"), F.desc("msg_id"))
    return (
        messages.filter(F.col("ts") < F.lit(before_ts).cast("timestamp"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n)
        .select("channel_id", "msg_id", "ts", "rn")
        .orderBy("channel_id", "rn")
    )


def channel_prune(messages: DataFrame, keep_last: int = 1000, max_age_days: int = 30) -> DataFrame:
    """Retention: keep at most ``keep_last`` newest per channel AND
    nothing older than ``max_age_days`` (message-store prune, ST6)."""
    w = Window.partitionBy("channel_id").orderBy(F.desc("ts"), F.desc("msg_id"))
    cutoff = F.lit(NOW).cast("timestamp") - F.expr(f"INTERVAL {max_age_days} DAYS")
    return (
        messages.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") <= keep_last) & (F.col("ts") >= cutoff))
        .select("channel_id", "msg_id", "ts")
    )

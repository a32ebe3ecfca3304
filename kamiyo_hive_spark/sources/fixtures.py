"""Reference-shaped fixture generators (FIXTURES.md §B).

Deterministic, seed-stable synthetic tables mirroring the reference's
data model (agents, actions/votes, signals, stakes, earnings, burns,
trust graph, channel messages) for reference-parity testing:
duplicate-nullifier rejection, quorum/threshold tallies, stake-age
weight banding, calendar earnings windows, burn dashboards.

Schemas and anomaly rules follow FIXTURES.md §B, which cites the
reference sources (e.g. votes: `programs/kamiyo-fast-voting/src/
lib.rs:194-227`, stake bands: `lib/governance.ts:282-302`, earnings:
`lib/hive-api.ts:316-334`).

Scale design: every table is built from ``spark.range(n)`` with columns
derived via ``xxhash64(id, salt)`` — pure JVM expressions inside
whole-stage codegen, no Python, no shuffle, no driver-side loop. The
same generator that makes 1k rows for a unit test makes 10^10 rows on a
cluster by changing ``n``; anomalies (duplicate nullifiers, late votes,
below-min bids) are planted by deterministic id-arithmetic so expected
outcomes are computable in closed form at any scale.

All timestamps hang off a fixed anchor ("now" = 2026-01-01 00:00:00
UTC) per FIXTURES.md determinism rules — calendar-window goldens never
read the wall clock.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Injected "now" for every calendar-window golden check.
NOW = "2026-01-01 00:00:00"
NOW_MS = 1767225600000  # epoch ms of NOW (UTC)

DAY_MS = 86_400_000

STATUSES = ("active", "inactive", "suspended")
TIERS = ("oracle", "sentinel", "architect", "scout", "ghost")
TOKENS = ("SOL", "USDC")
EARN_STATUS = ("pending", "released", "disputed")
BURN_STATUS = ("pending", "executed", "batched")
BURN_SOURCE = ("api_credits", "api_x402", "on_chain")
CAPABILITIES = ("research", "code-gen", "data-label", "translate", "critique")


def _h(salt: int):
    """Deterministic 64-bit hash of the row id — the only entropy source."""
    return F.xxhash64(F.col("id"), F.lit(salt))


def _mod(salt: int, m: int):
    """Uniform integer in [0, m) from the row hash."""
    return F.pmod(_h(salt), F.lit(m))


def _pick(salt: int, choices):
    """Deterministic choice from a small list (1-indexed element_at)."""
    return F.element_at(F.array(*[F.lit(c) for c in choices]), (_mod(salt, len(choices)) + 1).cast("int"))


def _money(salt: int, max_units: int):
    """decimal(20,6) token amount in [0, max_units) with 6dp."""
    micro = _mod(salt, max_units * 1_000_000)
    return (micro / F.lit(1_000_000)).cast("decimal(20,6)")


def _ts(salt: int, span_days: int, end_ms: int = NOW_MS):
    """Timestamp uniform in the ``span_days`` window ending at ``end_ms``."""
    back = _mod(salt, span_days * DAY_MS)
    return F.timestamp_millis((F.lit(end_ms) - back).cast("long"))


def agents(spark: SparkSession, n: int = 1000) -> DataFrame:
    """`agents` per FIXTURES.md §B (prisma/schema.prisma:28-44)."""
    return spark.range(n).select(
        F.format_string("agent-%06d", F.col("id")).alias("agent_id"),
        F.format_string("user-%04d", _mod(1, max(n // 2, 1))).alias("user_id"),
        F.format_string("Agent %d", F.col("id")).alias("name"),
        F.substring(F.hex(_h(2)), 1, 16).alias("wallet_address"),
        F.array_distinct(
            F.array(_pick(3, CAPABILITIES), _pick(4, CAPABILITIES))
        ).alias("capabilities"),
        _money(5, 10_000).alias("stake"),
        _mod(6, 5000).alias("transactions"),
        _mod(7, 20).alias("disputes"),
        _mod(8, 1001).cast("int").alias("reputation"),
        (_mod(9, 10_000) / F.lit(100.0)).alias("credit_score"),
        _mod(10, 60_000).alias("avg_response_time_ms"),
        _pick(11, STATUSES).alias("status"),
        _ts(12, 730).alias("registered_at"),
    )


# --- actions / votes (fast-voting; lib.rs:194-227) -----------------

VOTES_PER_ACTION = 20
DEADLINE_SLOT = 75  # voting window in slots (lib.rs:15-16)
MIN_BID_MICRO = 5_000_000  # min_bid 5.000000 tokens
QUORUM = 2  # lib.rs:18-19


def actions(spark: SparkSession, n_actions: int = 50) -> DataFrame:
    """`actions`: one row per fast action; fixed window + threshold."""
    return spark.range(n_actions).select(
        F.col("id").alias("action_id"),
        F.sha2(F.format_string("action-%d", F.col("id")), 256).alias("action_hash"),
        F.format_string("creator-%03d", _mod(20, 17)).alias("creator"),
        (_mod(21, 61) + 40).cast("int").alias("threshold"),  # 40-100 %
        F.lit(5.0).cast("decimal(20,6)").alias("min_bid"),
        (F.col("id") * 1000).alias("created_slot"),
        (F.col("id") * 1000 + DEADLINE_SLOT).alias("deadline_slot"),
        (F.col("id") * 1000 + 2 * DEADLINE_SLOT).alias("reveal_deadline_slot"),
    )


def votes(spark: SparkSession, n_actions: int = 50, per_action: int = VOTES_PER_ACTION) -> DataFrame:
    """`votes` with planted anomalies at deterministic id positions:

    - ``id % 17 == 0`` (and not the first vote of its action): reuses
      the previous id's nullifier → duplicate, must be dropped
      (lib.rs:276-286, e2e:422-451).
    - ``id % 23 == 0``: voted after ``deadline_slot`` → late, dropped
      (lib.rs:103).
    - ``id % 13 == 0``: bid below min_bid → not a valid reveal
      (e2e:481-501).

    Every expected rejection count is closed-form in ``n``.
    """
    n = n_actions * per_action
    action_id = (F.col("id") / per_action).cast("long")
    seq = F.pmod(F.col("id"), F.lit(per_action))  # position within action
    is_dup = (F.pmod(F.col("id"), F.lit(17)) == 0) & (seq != 0)
    # duplicate rows copy the PREVIOUS id's nullifier (same action).
    nullifier_of = lambda idc: F.concat(
        F.lit("n-"), F.hex(F.xxhash64(idc, F.lit(30)))
    )
    is_late = F.pmod(F.col("id"), F.lit(23)) == 0
    low_bid = F.pmod(F.col("id"), F.lit(13)) == 0
    slot_in = F.pmod(_h(31), F.lit(DEADLINE_SLOT))  # 0..74 → on time
    base_slot = action_id * 1000
    bid_micro = F.when(
        low_bid, _mod(32, MIN_BID_MICRO)  # 0 .. 4.999999
    ).otherwise(_mod(33, 95_000_000) + MIN_BID_MICRO)  # 5 .. 99.999999
    return spark.range(n).select(
        F.col("id").alias("vote_id"),
        action_id.alias("action_id"),
        F.format_string("voter-%05d", _mod(34, 10_000)).alias("voter"),
        F.when(is_dup, nullifier_of(F.col("id") - 1))
        .otherwise(nullifier_of(F.col("id")))
        .alias("voter_nullifier"),
        (_mod(35, 100) < 60).alias("vote_value"),  # ~60% yes
        _money(36, 1000).alias("weight"),
        (bid_micro / F.lit(1_000_000)).cast("decimal(20,6)").alias("bid_amount"),
        F.when(is_late, base_slot + DEADLINE_SLOT + 1 + _mod(37, 50))
        .otherwise(base_slot + slot_in)
        .alias("voted_slot"),
        (~low_bid).alias("revealed"),
    )


def signals(spark: SparkSession, n: int = 2000, n_epochs: int = 20) -> DataFrame:
    """`signals` (swarm-types.ts:51-58): per-epoch directional signals."""
    return spark.range(n).select(
        F.format_string("sig-%06d", F.col("id")).alias("signal_id"),
        F.pmod(F.col("id"), F.lit(n_epochs)).alias("epoch"),
        F.concat(F.lit("an-"), F.hex(_h(40))).alias("agent_nullifier"),
        _mod(41, 4).cast("int").alias("signal_type"),
        _mod(42, 3).cast("int").alias("direction"),  # 0 short / 1 long / 2 neutral
        _mod(43, 101).cast("int").alias("confidence"),
        _mod(44, 101).cast("int").alias("magnitude"),
        _money(45, 500).alias("stake"),
        (F.col("id") * 4).alias("submitted_slot"),
        (_mod(46, 10) < 9).alias("revealed"),  # ~90% revealed
    )


def stakes(spark: SparkSession, n: int = 1000) -> DataFrame:
    """`stakes` for vote-weight banding (governance.ts:282-302)."""
    return spark.range(n).select(
        F.substring(F.hex(_h(50)), 1, 16).alias("wallet"),
        _money(51, 100_000).alias("token_balance"),
        _money(52, 50_000).alias("staked_amount"),
        _ts(53, 400).alias("stake_start"),  # 0-400 days of age
    )


def earnings(spark: SparkSession, n: int = 5000) -> DataFrame:
    """`earnings` (hive-api.ts:316-334): amounts over a 90-day window."""
    created = _ts(60, 90)
    return spark.range(n).select(
        F.format_string("earn-%06d", F.col("id")).alias("earning_id"),
        F.format_string("agent-%06d", _mod(61, 1000)).alias("agent_id"),
        F.format_string("job-%06d", F.col("id")).alias("job_id"),
        _money(62, 500).alias("amount"),
        _pick(63, TOKENS).alias("token"),
        _pick(64, EARN_STATUS).alias("status"),
        created.alias("created_at"),
        F.when(
            _pick(64, EARN_STATUS) == "released",
            F.timestamp_millis((F.unix_millis(created) + _mod(65, DAY_MS)).cast("long")),
        ).alias("released_at"),
    )


def burns(spark: SparkSession, n: int = 3000) -> DataFrame:
    """`burns` (swarm-types.ts:465-476): fee-burn ledger over 30 days."""
    return spark.range(n).select(
        F.col("id").alias("burn_id"),
        _pick(70, BURN_SOURCE).alias("source"),
        F.substring(F.hex(_h(71)), 1, 16).alias("wallet"),
        F.format_string("/api/v1/%s", _pick(72, ("plan", "run", "judge"))).alias("endpoint"),
        (_mod(73, 100_000) / F.lit(100.0)).alias("usd_value"),
        _money(74, 10_000).alias("kamiyo_amount"),
        _pick(75, BURN_STATUS).alias("status"),
        _ts(76, 30).alias("created_at"),
    )


def trust_graph(spark: SparkSession, n_nodes: int = 500, n_edges: int = 3000):
    """`trust_nodes` / `trust_edges` (trust-graph/types.ts:9-29)."""
    nodes = spark.range(n_nodes).select(
        F.format_string("node-%05d", F.col("id")).alias("node_id"),
        F.format_string("Agent %d", F.col("id")).alias("label"),
        _pick(80, TIERS).alias("tier"),
        _mod(81, 101).cast("int").alias("reputation"),
        _mod(82, 10_000).alias("tx_count"),
    )
    edges = (
        spark.range(n_edges)
        .select(
            F.format_string("node-%05d", _mod(83, n_nodes)).alias("source"),
            F.format_string("node-%05d", _mod(84, n_nodes)).alias("target"),
            _mod(85, 101).cast("int").alias("weight"),
        )
        .filter(F.col("source") != F.col("target"))
    )
    return nodes, edges


def channel_messages(spark: SparkSession, n: int = 5000, n_channels: int = 50) -> DataFrame:
    """`channel_messages` (channels/types.ts:3-9): ring-buffer corpus."""
    return spark.range(n).select(
        F.format_string("msg-%06d", F.col("id")).alias("msg_id"),
        F.format_string("chan-%03d", F.pmod(F.col("id"), F.lit(n_channels))).alias("channel_id"),
        F.concat(F.lit("sn-"), F.hex(_h(90))).alias("sender_nullifier"),
        F.format_string("message body %d", F.col("id")).alias("content"),
        # Monotone per channel: older ids → older timestamps.
        F.timestamp_millis(
            (F.lit(NOW_MS) - (F.lit(n).cast("long") - F.col("id")) * 60_000).cast("long")
        ).alias("ts"),
    )

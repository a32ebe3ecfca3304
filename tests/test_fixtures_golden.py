"""Golden checks for the reference-shaped fixtures (FIXTURES.md §B).

Each test generates a deterministic fixture table, runs the
reference-semantics Spark pipeline (operators/reference.py), and
compares against a DuckDB oracle running equivalent SQL over the SAME
generated rows — the same discipline as the registry parity gate.
Planted-anomaly tests also assert non-vacuity (the anomalies exist
before the pipeline drops them).
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from kamiyo_hive_spark.operators import reference as R
from kamiyo_hive_spark.sources import fixtures as FX
from tests.test_parity import assert_frames_match


@pytest.fixture(scope="module")
def fx(spark):
    """All fixture tables materialized once, registered in DuckDB."""
    con = duckdb.connect()
    frames = {
        "actions": FX.actions(spark, 50),
        "votes": FX.votes(spark, 50),
        "signals": FX.signals(spark, 2000),
        "stakes": FX.stakes(spark, 1000),
        "earnings": FX.earnings(spark, 5000),
        "burns": FX.burns(spark, 3000),
        "channel_messages": FX.channel_messages(spark, 5000),
    }
    nodes, edges = FX.trust_graph(spark, 500, 3000)
    frames["trust_nodes"], frames["trust_edges"] = nodes, edges
    pdfs = {}
    for name, df in frames.items():
        pdfs[name] = df.toPandas()
        con.register(name, pdfs[name])
    yield {"con": con, "spark_frames": frames, "pdfs": pdfs}
    con.close()


def test_generation_is_deterministic(spark):
    a = FX.votes(spark, 5).toPandas()
    b = FX.votes(spark, 5).toPandas()
    assert a.equals(b)


def test_vote_anomalies_planted(fx):
    """Non-vacuity: duplicates, late votes, and low bids all exist."""
    con = fx["con"]
    dups = con.execute(
        """SELECT count(*) FROM (
             SELECT action_id, voter_nullifier FROM votes
             GROUP BY 1, 2 HAVING count(*) > 1)"""
    ).fetchone()[0]
    late = con.execute(
        """SELECT count(*) FROM votes v JOIN actions a USING (action_id)
           WHERE v.voted_slot > a.deadline_slot"""
    ).fetchone()[0]
    low = con.execute(
        """SELECT count(*) FROM votes v JOIN actions a USING (action_id)
           WHERE v.bid_amount < a.min_bid"""
    ).fetchone()[0]
    assert dups > 0 and late > 0 and low > 0


def test_resolve_actions_golden(spark, fx):
    got = R.resolve_actions(
        fx["spark_frames"]["votes"], fx["spark_frames"]["actions"]
    ).toPandas()
    want = fx["con"].execute(
        """
        WITH v AS (
            SELECT v.*, a.deadline_slot, a.min_bid, a.threshold,
                   row_number() OVER (
                       PARTITION BY v.action_id, v.voter_nullifier
                       ORDER BY v.voted_slot, v.vote_id) AS rn
            FROM votes v JOIN actions a USING (action_id)
        ), ot AS (
            SELECT * FROM v WHERE rn = 1 AND voted_slot <= deadline_slot
        )
        SELECT action_id,
               count(*) AS n_votes,
               CAST(SUM(CASE WHEN vote_value THEN 1 ELSE 0 END) AS BIGINT) AS votes_for,
               CAST(SUM(CASE WHEN bid_amount >= min_bid THEN 1 ELSE 0 END) AS BIGINT)
                   AS valid_reveals,
               CAST(MAX(CASE WHEN bid_amount >= min_bid THEN bid_amount END) AS DOUBLE)
                   AS top_bid,
               (count(*) >= 2
                AND SUM(CASE WHEN vote_value THEN 1 ELSE 0 END) * 100
                    >= threshold * count(*)) AS passed
        FROM ot GROUP BY action_id, threshold ORDER BY action_id
        """
    ).fetchdf()
    assert len(got) > 0
    assert_frames_match(got, want, "resolve_actions")
    # post-dedup invariant: no nullifier votes twice on one action
    deduped = R.resolve_actions(fx["spark_frames"]["votes"], fx["spark_frames"]["actions"])
    assert deduped.filter(F.col("n_votes") > FX.VOTES_PER_ACTION).count() == 0


def test_stake_weights_golden(spark, fx):
    got = R.stake_weights(fx["spark_frames"]["stakes"]).toPandas()
    want = fx["con"].execute(
        """
        SELECT wallet,
               date_diff('day', CAST(stake_start AS DATE), DATE '2026-01-01') AS age_days,
               CAST(CASE WHEN date_diff('day', CAST(stake_start AS DATE), DATE '2026-01-01') < 30 THEN 1.0
                         WHEN date_diff('day', CAST(stake_start AS DATE), DATE '2026-01-01') < 90 THEN 1.2
                         WHEN date_diff('day', CAST(stake_start AS DATE), DATE '2026-01-01') < 180 THEN 1.5
                         ELSE 2.0 END AS DOUBLE) AS multiplier,
               CAST(CAST(token_balance + staked_amount *
                    CAST(CASE WHEN date_diff('day', CAST(stake_start AS DATE), DATE '2026-01-01') < 30 THEN '1.0'
                              WHEN date_diff('day', CAST(stake_start AS DATE), DATE '2026-01-01') < 90 THEN '1.2'
                              WHEN date_diff('day', CAST(stake_start AS DATE), DATE '2026-01-01') < 180 THEN '1.5'
                              ELSE '2.0' END AS DECIMAL(3,1))
                    AS DECIMAL(27,7)) AS DOUBLE) AS vote_weight
        FROM stakes
        """
    ).fetchdf()
    # every band must be populated (non-vacuous banding)
    assert set(got["multiplier"].unique()) == {1.0, 1.2, 1.5, 2.0}
    assert_frames_match(got, want, "stake_weights")


def test_signal_epoch_aggregate_golden(spark, fx):
    got = R.signal_epoch_aggregate(fx["spark_frames"]["signals"]).toPandas()
    want = fx["con"].execute(
        """
        SELECT epoch,
               CAST(SUM(CASE WHEN direction = 1 THEN 1 ELSE 0 END) AS BIGINT) AS long_count,
               CAST(SUM(CASE WHEN direction = 0 THEN 1 ELSE 0 END) AS BIGINT) AS short_count,
               CAST(SUM(CASE WHEN direction = 2 THEN 1 ELSE 0 END) AS BIGINT) AS neutral_count,
               CAST(SUM(confidence) AS BIGINT) AS total_confidence,
               CAST(SUM(magnitude) AS BIGINT) AS total_magnitude
        FROM signals WHERE revealed GROUP BY epoch ORDER BY epoch
        """
    ).fetchdf()
    assert len(got) == 20
    assert_frames_match(got, want, "signal_epoch_aggregate")


def test_earnings_summary_golden(spark, fx):
    got = R.earnings_summary(fx["spark_frames"]["earnings"]).toPandas()
    want = fx["con"].execute(
        """
        SELECT
          CAST(SUM(CASE WHEN created_at >= CAST(date_trunc('day',   TIMESTAMP '2026-01-01') AS TIMESTAMP) THEN amount END) AS DOUBLE) AS today,
          CAST(SUM(CASE WHEN created_at >= CAST(date_trunc('week',  TIMESTAMP '2026-01-01') AS TIMESTAMP) THEN amount END) AS DOUBLE) AS this_week,
          CAST(SUM(CASE WHEN created_at >= CAST(date_trunc('month', TIMESTAMP '2026-01-01') AS TIMESTAMP) THEN amount END) AS DOUBLE) AS this_month,
          CAST(SUM(CASE WHEN token = 'SOL'  AND status = 'pending'  THEN amount END) AS DOUBLE) AS sol_pending,
          CAST(SUM(CASE WHEN token = 'SOL'  AND status = 'released' THEN amount END) AS DOUBLE) AS sol_released,
          CAST(SUM(CASE WHEN token = 'SOL'  AND status = 'disputed' THEN amount END) AS DOUBLE) AS sol_disputed,
          CAST(SUM(CASE WHEN token = 'USDC' AND status = 'pending'  THEN amount END) AS DOUBLE) AS usdc_pending,
          CAST(SUM(CASE WHEN token = 'USDC' AND status = 'released' THEN amount END) AS DOUBLE) AS usdc_released,
          CAST(SUM(CASE WHEN token = 'USDC' AND status = 'disputed' THEN amount END) AS DOUBLE) AS usdc_disputed
        FROM earnings
        """
    ).fetchdf()
    assert want["this_month"].iloc[0] is not None
    assert_frames_match(got, want, "earnings_summary")


def test_burn_dashboard_golden(spark, fx):
    got = R.burn_dashboard(fx["spark_frames"]["burns"]).toPandas()
    want = fx["con"].execute(
        """
        SELECT
          CAST(SUM(CASE WHEN status = 'executed' THEN kamiyo_amount END) AS DOUBLE) AS total_burned,
          CAST(SUM(CASE WHEN status = 'executed'
                         AND created_at >= TIMESTAMP '2026-01-01' - INTERVAL 24 HOURS
                        THEN kamiyo_amount END) AS DOUBLE) AS burns_24h,
          CAST(SUM(CASE WHEN status = 'executed' THEN 1 ELSE 0 END) AS BIGINT) AS burn_count,
          CAST(SUM(CASE WHEN status = 'pending' THEN 1 ELSE 0 END) AS BIGINT) AS pending_burns
        FROM burns
        """
    ).fetchdf()
    assert want["burns_24h"].iloc[0] > 0  # 24h window non-vacuous
    assert_frames_match(got, want, "burn_dashboard")


def test_trust_stats_golden(spark, fx):
    got = R.trust_stats(
        fx["spark_frames"]["trust_nodes"], fx["spark_frames"]["trust_edges"]
    ).toPandas()
    want = fx["con"].execute(
        """
        SELECT n.total_nodes, n.avg_trust, e.total_edges,
               t.oracle, t.sentinel, t.architect, t.scout, t.ghost
        FROM (SELECT count(*) AS total_nodes, AVG(reputation) AS avg_trust FROM trust_nodes) n,
             (SELECT count(*) AS total_edges FROM trust_edges) e,
             (SELECT
                count(*) FILTER (tier = 'oracle') AS oracle,
                count(*) FILTER (tier = 'sentinel') AS sentinel,
                count(*) FILTER (tier = 'architect') AS architect,
                count(*) FILTER (tier = 'scout') AS scout,
                count(*) FILTER (tier = 'ghost') AS ghost
              FROM trust_nodes) t
        """
    ).fetchdf()
    assert_frames_match(got, want, "trust_stats")


def test_channel_history_golden(spark, fx):
    cursor = "2025-12-31 12:00:00"
    got = R.channel_history(
        fx["spark_frames"]["channel_messages"], cursor, n=10
    ).toPandas()
    want = fx["con"].execute(
        f"""
        SELECT channel_id, msg_id, ts, rn FROM (
            SELECT channel_id, msg_id, ts,
                   CAST(row_number() OVER (
                       PARTITION BY channel_id ORDER BY ts DESC, msg_id DESC) AS INT) AS rn
            FROM channel_messages WHERE ts < TIMESTAMP '{cursor}'
        ) WHERE rn <= 10 ORDER BY channel_id, rn
        """
    ).fetchdf()
    assert len(got) == 50 * 10  # every channel has ≥10 older messages
    assert_frames_match(got, want, "channel_history")


def test_channel_prune_golden(spark, fx):
    got = R.channel_prune(
        fx["spark_frames"]["channel_messages"], keep_last=40, max_age_days=3
    ).toPandas()
    want = fx["con"].execute(
        """
        SELECT channel_id, msg_id, ts FROM (
            SELECT channel_id, msg_id, ts,
                   row_number() OVER (
                       PARTITION BY channel_id ORDER BY ts DESC, msg_id DESC) AS rn
            FROM channel_messages
        ) WHERE rn <= 40 AND ts >= TIMESTAMP '2026-01-01' - INTERVAL 3 DAYS
        ORDER BY channel_id, msg_id
        """
    ).fetchdf()
    assert 0 < len(got) < 5000  # prune actually dropped rows
    assert_frames_match(got, want, "channel_prune")

"""Reference-semantics parity tests mirroring the reference's e2e
assertions (SURVEY §5): duplicate-nullifier rejection, late-vote
rejection, below-min-bid rejection, quorum/threshold tallies — on
planted fixtures where the expected outcome is known row by row.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def votes(spark):
    """Planted vote stream: per-action rows with duplicate nullifiers,
    late votes, and below-min bids (FIXTURES.md §B generator rules)."""
    rows = [
        # action 1: healthy — quorum met, clear winner
        (1, "n1", 10, True, 5.0, 100),
        (1, "n2", 11, True, 9.0, 101),
        (1, "n3", 12, False, 3.0, 102),
        (1, "n1", 13, True, 50.0, 103),   # duplicate nullifier -> dropped
        (1, "n4", 99, True, 99.0, 200),   # after deadline (slot 50) -> dropped
        # action 2: below quorum after rejections
        (2, "m1", 10, True, 4.0, 100),
        (2, "m1", 11, True, 6.0, 101),    # duplicate nullifier -> dropped
        # action 3: bids below min (min_bid 5.0) don't count as reveals
        (3, "p1", 10, True, 1.0, 100),
        (3, "p2", 11, True, 2.0, 101),
        (3, "p3", 12, True, 7.0, 102),
    ]
    return spark.createDataFrame(
        rows,
        "action_id long, nullifier string, slot long, vote boolean, bid double, vote_id long",
    )


DEADLINE_SLOT = 50
MIN_BID = 5.0
QUORUM = 2


def resolve(spark, votes):
    """The reference's vote pipeline: dedup-by-nullifier (first wins) →
    deadline filter → min-bid filter for reveals → tally + argmax."""
    w_first = F.min("vote_id").over(Window.partitionBy("action_id", "nullifier"))
    deduped = (
        votes.withColumn("first_id", w_first)
        .filter(F.col("vote_id") == F.col("first_id"))
        .drop("first_id")
    )
    on_time = deduped.filter(F.col("slot") <= DEADLINE_SLOT)
    valid_bids = on_time.filter(F.col("vote") & (F.col("bid") >= MIN_BID))
    tally = on_time.groupBy("action_id").agg(
        F.count("*").alias("n_votes"),
        F.sum(F.when(F.col("vote"), 1).otherwise(0)).alias("votes_for"),
    )
    winner = valid_bids.groupBy("action_id").agg(
        F.max_by(
            F.struct("vote_id", "bid"), F.struct(F.col("bid"), -F.col("vote_id"))
        ).alias("w")
    )
    return (
        tally.join(winner, "action_id", "left")
        .select(
            "action_id",
            "n_votes",
            "votes_for",
            F.col("w.bid").alias("winning_bid"),
            F.col("w.vote_id").alias("winner_vote_id"),
            ((F.col("n_votes") >= QUORUM) & F.col("w.vote_id").isNotNull()).alias("passed"),
        )
        .orderBy("action_id")
    )


def test_duplicate_nullifier_dropped_exactly(spark, votes):
    out = {r.action_id: r for r in resolve(spark, votes).collect()}
    # action 1: n1's second vote (id 103, bid 50) and the late vote (200)
    # must both be gone — winner is n2's bid 9.0
    assert out[1].n_votes == 3
    assert out[1].winning_bid == 9.0
    assert out[1].winner_vote_id == 101
    assert bool(out[1].passed)


def test_below_quorum_fails(spark, votes):
    out = {r.action_id: r for r in resolve(spark, votes).collect()}
    assert out[2].n_votes == 1  # duplicate removed
    assert not bool(out[2].passed)


def test_below_min_bid_not_a_reveal(spark, votes):
    out = {r.action_id: r for r in resolve(spark, votes).collect()}
    # only p3's 7.0 clears min_bid 5.0
    assert out[3].winning_bid == 7.0
    assert out[3].winner_vote_id == 102
    assert bool(out[3].passed)


def test_salted_agg_equals_plain(spark, sf_dir):
    from kamiyo_hive_spark.catalog import table
    from kamiyo_hive_spark.functions.money import dec
    from kamiyo_hive_spark.functions.skew import salted_agg

    li = table(spark, sf_dir, "lineitem")
    plain = {
        r.l_returnflag: r.s
        for r in li.groupBy("l_returnflag")
        .agg(F.sum(dec("l_quantity")).cast("double").alias("s"))
        .collect()
    }
    salted = {
        r.l_returnflag: float(r.s)
        for r in salted_agg(
            li.select("l_returnflag", dec("l_quantity").alias("q")),
            "l_returnflag",
            lambda: F.sum("q"),
            F.sum,
            "s",
        )
        .select("l_returnflag", F.col("s").cast("double").alias("s"))
        .collect()
    }
    assert plain == salted

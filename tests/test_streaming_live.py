"""Live-socket streaming source tests: the SAME transforms that run on
the staged-file replay must produce identical results from a genuine
TCP byte stream (the reference's live surface is a WS feed —
`useAgentStream.ts:39-53`), and the completion logic must fail loudly
rather than return a short result."""

from __future__ import annotations

import pytest

from kamiyo_hive_spark.streaming.live import (
    events_as_jsonl,
    run_live_to_completion,
    serve_events_tcp,
    socket_events_stream,
)

CUTOFF = "2024-01-08 00:00:00"


def _batch_events(spark, sf_dir):
    from pyspark.sql import functions as F

    from kamiyo_hive_spark.catalog import table

    return table(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit(CUTOFF).cast("timestamp")
    )


def test_socket_window_agg_matches_batch(spark, sf_dir):
    from pyspark.sql import functions as F

    from kamiyo_hive_spark.functions.money import dec
    from kamiyo_hive_spark.streaming.jobs import window_agg_transform

    lines = events_as_jsonl(spark, sf_dir, CUTOFF)
    assert lines, "cutoff slice must not be empty"
    with serve_events_tcp(lines) as srv:
        stream = socket_events_stream(spark, srv.host, srv.port)
        agg = window_agg_transform(stream)
        run_live_to_completion(
            agg, "t_live_window_out", "complete", expected_rows=len(lines)
        )
    got = {
        (r["w"]["start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.table("t_live_window_out").collect()
    }
    want = {
        (r["ws"], r["event_type"]): (r["n"], r["v"])
        for r in _batch_events(spark, sf_dir)
        .groupBy(
            F.date_trunc("hour", "ts").alias("ws"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(dec("value")).cast("double").alias("v"),
        )
        .collect()
    }
    assert got == want


def test_socket_tally_matches_batch(spark, sf_dir):
    from pyspark.sql import functions as F

    from kamiyo_hive_spark.streaming.jobs import running_tally_transform

    # serve the WHOLE table; the transform applies its own deadline
    # filter — late rows must arrive on the wire and be rejected by
    # the operator, not pre-filtered by the server
    lines = events_as_jsonl(spark, sf_dir, "2099-01-01 00:00:00")
    with serve_events_tcp(lines) as srv:
        stream = socket_events_stream(spark, srv.host, srv.port)
        tally = running_tally_transform(stream)
        run_live_to_completion(
            tally, "t_live_tally_out", "complete", expected_rows=len(lines)
        )
    got = {
        r["user_id"]: (r["votes_for"], r["votes_against"], r["vote_count"])
        for r in spark.table("t_live_tally_out").collect()
    }
    want = {
        r["user_id"]: (r["f"], r["a"], r["n"])
        for r in _batch_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("f"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("a"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert got == want


def test_wire_roundtrip_is_exact(spark, sf_dir):
    """Every column — including microsecond timestamps and float
    doubles — must round-trip the JSON wire bit-exactly."""
    lines = events_as_jsonl(spark, sf_dir, CUTOFF)
    with serve_events_tcp(lines) as srv:
        stream = socket_events_stream(spark, srv.host, srv.port)
        run_live_to_completion(
            stream, "t_live_echo_out", "append", expected_rows=len(lines)
        )
    echoed = spark.table("t_live_echo_out")
    src = _batch_events(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    assert echoed.count() == src.count()
    sym_diff = echoed.exceptAll(src).count() + src.exceptAll(echoed).count()
    assert sym_diff == 0


def test_stalled_feed_raises_not_truncates(spark, sf_dir):
    """A feed that never delivers the expected row count must raise —
    a silently short streaming result is a correctness bug."""
    lines = events_as_jsonl(spark, sf_dir, CUTOFF)[:10]
    with serve_events_tcp(lines) as srv:
        stream = socket_events_stream(spark, srv.host, srv.port)
        with pytest.raises(TimeoutError, match="10/50 rows"):
            run_live_to_completion(
                stream,
                "t_live_stall_out",
                "append",
                expected_rows=50,
                timeout_s=6.0,
            )

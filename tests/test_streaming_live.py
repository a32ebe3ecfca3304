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


def test_bus_out_of_order_multi_partition_matches_batch(spark, sf_dir):
    """VERDICT r5 task 5, absorption side: 3 bus partitions, each with
    deliberately scrambled delivery inside 5-minute event-time buckets
    (under the transform's 10-minute watermark), unioned into the SAME
    window aggregation — the end state must equal the batch answer."""
    import json

    from pyspark.sql import functions as F

    from kamiyo_hive_spark.functions.money import dec
    from kamiyo_hive_spark.streaming.jobs import window_agg_transform
    from kamiyo_hive_spark.streaming.live import (
        partition_lines,
        scramble_within,
        serve_events_bus,
        socket_events_union,
    )

    lines = events_as_jsonl(spark, sf_dir, CUTOFF)
    parts = [
        scramble_within(p, span_us=5 * 60 * 1_000_000)
        for p in partition_lines(lines, 3)
    ]
    assert sum(len(p) for p in parts) == len(lines)
    assert all(parts), "every bus partition must carry rows"

    def ts_seq(p):
        return [json.loads(ln)["ts_us"] for ln in p]

    assert any(
        ts_seq(p) != sorted(ts_seq(p)) for p in parts
    ), "the scramble must actually deliver out of order"

    with serve_events_bus(parts) as bus:
        assert len(bus.endpoints) == 3
        stream = socket_events_union(spark, bus.endpoints)
        agg = window_agg_transform(stream)
        run_live_to_completion(
            agg, "t_live_bus_out", "complete", expected_rows=len(lines)
        )
    got = {
        (r["w"]["start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.table("t_live_bus_out").collect()
    }
    want = {
        (r["ws"], r["event_type"]): (r["n"], r["v"])
        for r in _batch_events(spark, sf_dir)
        .groupBy(F.date_trunc("hour", "ts").alias("ws"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(dec("value")).cast("double").alias("v"),
        )
        .collect()
    }
    assert got == want


def test_watermark_rejects_late_row_from_live_wire(spark):
    """VERDICT r5 task 5, rejection side — the first LIVE exercise of
    watermark lateness: a staged two-phase feed advances the watermark
    past a window's end, then delivers a row INTO that closed window
    (beyond the 10-minute delay). The row must reach the wire (input
    counters prove delivery) and be DROPPED by the watermark, so the
    closed window's append-mode emission keeps its phase-1 count."""
    import json
    import time as _time
    from datetime import datetime, timezone

    from kamiyo_hive_spark.streaming.jobs import window_agg_transform

    def us(s: str) -> int:
        return int(
            datetime.strptime(s, "%Y-%m-%d %H:%M:%S")
            .replace(tzinfo=timezone.utc)
            .timestamp()
            * 1_000_000
        )

    def row(eid: int, ts: str) -> str:
        return json.dumps(
            {
                "event_id": eid,
                "ts_us": us(ts),
                "user_id": 1,
                "event_type": "purchase",
                "value": 1.0,
                "props": "{}",
            }
        )

    # phase 1: two rows in window A [00:00, 01:00), two in window B
    # [01:00, 02:00) — max ts 01:40 puts the watermark at 01:30 > A.end
    phase1 = [
        row(1, "2024-01-01 00:05:00"),
        row(2, "2024-01-01 00:10:00"),
        row(3, "2024-01-01 01:30:00"),
        row(4, "2024-01-01 01:40:00"),
    ]
    # phase 2: one LATE row into the closed window A (70+ minutes behind
    # the watermark) plus one fresh row that keeps event time advancing
    phase2 = [
        row(5, "2024-01-01 00:20:00"),
        row(6, "2024-01-01 02:30:00"),
    ]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        with serve_events_tcp(phase1) as srv:
            stream = socket_events_stream(spark, srv.host, srv.port)
            agg = window_agg_transform(stream)
            q = (
                agg.writeStream.outputMode("append")
                .format("memory")
                .queryName("t_live_late_out")
                .start()
            )
            try:

                def drain_until(n_rows: int, timeout_s: float = 60.0) -> None:
                    deadline = _time.monotonic() + timeout_s
                    seen, last = 0, -1
                    while seen < n_rows:
                        if _time.monotonic() > deadline:
                            raise TimeoutError(f"{seen}/{n_rows} rows")
                        q.processAllAvailable()
                        for p in q.recentProgress:
                            bid = int(p["batchId"])
                            if bid > last:
                                seen += int(p["numInputRows"])
                                last = bid
                        if seen < n_rows:
                            _time.sleep(0.05)
                    q.processAllAvailable()

                drain_until(len(phase1))
                srv.send(phase2)
                # both phase-2 rows must ARRIVE (delivery proven by the
                # input counter) before we inspect the sink
                drain_until(len(phase1) + len(phase2))
            finally:
                q.stop()
        got = {
            r["w"]["start"].strftime("%H:%M"): r["n_events"]
            for r in spark.table("t_live_late_out").collect()
        }
        # window A emitted with its phase-1 count — the late wire row
        # (event 5) was dropped by the watermark, not aggregated
        assert got.get("00:00") == 2, got
        # window B closed by phase 2's fresh row; window C never closes
        assert got.get("01:00") == 2, got
        assert "02:00" not in got, got
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_bus_append_mode_absorbs_within_watermark_disorder(spark):
    """ADVICE r6: the registered bus query runs in complete mode, where
    Spark neither evicts state nor drops late rows — so THIS test is
    where the absorption claim is load-bearing. In APPEND mode a closed
    window emits exactly once; a row delivered out of order inside the
    watermark delay that was NOT absorbed would be missing from its
    window's one emission. 3 scrambled bus partitions, then a flush row
    per partition (the union's watermark is the MIN across sources)
    closes windows A and B — their counts must equal the batch answer."""
    import json
    import time as _time
    from datetime import datetime, timezone

    from kamiyo_hive_spark.streaming.jobs import window_agg_transform
    from kamiyo_hive_spark.streaming.live import (
        partition_lines,
        scramble_within,
        serve_events_bus,
        socket_events_union,
    )

    def us(s: str) -> int:
        return int(
            datetime.strptime(s, "%Y-%m-%d %H:%M:%S")
            .replace(tzinfo=timezone.utc)
            .timestamp()
            * 1_000_000
        )

    def row(eid: int, ts: str) -> str:
        return json.dumps(
            {
                "event_id": eid,
                "ts_us": us(ts),
                "user_id": eid % 5,
                "event_type": "purchase",
                "value": 1.0,
                "props": "{}",
            }
        )

    # 12 rows in window A [00:00,01:00), 12 in window B [01:00,02:00),
    # packed 1 minute apart so every 5-minute scramble bucket holds ~5
    # rows — enough density that the md5 shuffle provably disorders at
    # least one partition (the assert below); 4-minute spacing left
    # buckets with ≤2 rows and the hash order happened to stay sorted
    phase1 = [
        row(i, f"2024-01-01 00:{i + 1:02d}:00") for i in range(12)
    ] + [
        row(100 + i, f"2024-01-01 01:{i + 1:02d}:00") for i in range(12)
    ]
    parts = [
        scramble_within(p, span_us=5 * 60 * 1_000_000)
        for p in partition_lines(phase1, 3)
    ]
    assert all(parts), "every bus partition must carry rows"

    def ts_seq(p):
        return [json.loads(ln)["ts_us"] for ln in p]

    assert any(ts_seq(p) != sorted(ts_seq(p)) for p in parts)

    # one flush row per partition, far past B.end: min-across-sources
    # watermark lands at 03:20 > 02:00, so A and B both emit
    flush = [row(990 + i, "2024-01-01 03:30:00") for i in range(3)]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        with serve_events_bus(parts) as bus:
            stream = socket_events_union(spark, bus.endpoints)
            agg = window_agg_transform(stream)
            q = (
                agg.writeStream.outputMode("append")
                .format("memory")
                .queryName("t_live_bus_append_out")
                .start()
            )
            try:

                def drain_until(n_rows: int, timeout_s: float = 60.0) -> None:
                    deadline = _time.monotonic() + timeout_s
                    seen, last = 0, -1
                    while seen < n_rows:
                        if _time.monotonic() > deadline:
                            raise TimeoutError(f"{seen}/{n_rows} rows")
                        q.processAllAvailable()
                        for p in q.recentProgress:
                            bid = int(p["batchId"])
                            if bid > last:
                                seen += int(p["numInputRows"])
                                last = bid
                        if seen < n_rows:
                            _time.sleep(0.05)
                    q.processAllAvailable()

                drain_until(len(phase1))
                for srv, fl in zip(bus.servers, flush):
                    srv.send([fl])
                drain_until(len(phase1) + len(flush))
            finally:
                q.stop()
        got = {
            r["w"]["start"].strftime("%H:%M"): r["n_events"]
            for r in spark.table("t_live_bus_append_out").collect()
        }
        # every scrambled-but-within-watermark row was absorbed into
        # its window's single append emission
        assert got.get("00:00") == 12, got
        assert got.get("01:00") == 12, got
        # the flush window never closes
        assert "03:00" not in got, got
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_progress_accumulation_survives_ring_eviction():
    """ADVICE r6(a) regression: recentProgress is a bounded ring, so a
    slow feed with many no-data ticks evicts early row-bearing entries.
    Accumulation keyed by batchId must count every batch exactly once
    across truncated, overlapping reads of the ring."""
    from kamiyo_hive_spark.streaming.live import accumulate_progress

    def p(bid, rows):
        return {"batchId": bid, "numInputRows": rows}

    seen, last = accumulate_progress([p(0, 10), p(1, 5)], 0, -1)
    assert (seen, last) == (15, 1)
    # overlapping re-read: batches 0-1 must NOT double-count
    seen, last = accumulate_progress([p(0, 10), p(1, 5), p(2, 7)], seen, last)
    assert (seen, last) == (22, 2)
    # ring evicted batches 0-2 (no-data ticks 3-6 in between): the
    # running total keeps the evicted rows and adds only the new batch
    seen, last = accumulate_progress(
        [p(3, 0), p(4, 0), p(5, 0), p(6, 0), p(7, 9)], seen, last
    )
    assert (seen, last) == (31, 7)
    # the old re-sum-the-ring logic would now read 9, not 31
    resum = sum(
        x["numInputRows"] for x in [p(3, 0), p(4, 0), p(5, 0), p(6, 0), p(7, 9)]
    )
    assert resum == 9

"""DSv2 streaming source tests: offsets, executor page reads,
checkpointed restart, and ack-based retention — pinned through the
SERVER's observables (range-request log, ack list, retention floor),
which is stronger evidence than the result hash alone."""

from __future__ import annotations

from kamiyo_hive_spark.sources.reststream import (
    event_log_rows,
    run_dsv2_replay,
)


def test_replay_restart_is_exactly_once_and_acked(spark, sf_dir):
    out, srv = run_dsv2_replay(spark, sf_dir, page_size=2000)
    rows = event_log_rows(spark, sf_dir)
    n = len(rows)
    half = n // 2

    got = {r["event_type"]: r["n_events"] for r in out.collect()}
    assert sum(got.values()) == n  # every event exactly once

    # the restarted query resumed AFTER the committed offset: no range
    # request after the restart may start below `half` — and indeed the
    # server pruned acknowledged rows, so such a read would 410
    assert srv.acked, "commit(end) never acked offsets"
    assert srv.pruned_to >= half
    # ranges are contiguous, non-overlapping coverage of [0, n)
    covered = sorted((s, e) for s, e in srv.range_requests if e > s)
    seen = []
    for s, e in covered:
        seen.extend(range(s, e))
    assert sorted(set(seen)) == list(range(n))  # full coverage
    assert len(seen) == len(set(seen))  # no offset fetched twice


def test_pages_split_across_parallel_partitions(spark, sf_dir):
    _, srv = run_dsv2_replay(spark, sf_dir, page_size=500)
    n = len(event_log_rows(spark, sf_dir))
    real = [(s, e) for s, e in srv.range_requests if e > s]
    assert len(real) >= n // 500  # many executor-side page fetches
    assert all(e - s <= 500 for s, e in real)

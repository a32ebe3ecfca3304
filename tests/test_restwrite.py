"""DSv2 writer protocol tests: the proof is the ingest SERVER's state —
staged vs published vs commit/abort counters — not Spark's return
codes. Two-phase commit must make distributed writes atomic: all rows
visible after one commit, zero visible after any task failure."""

from __future__ import annotations

import json
import urllib.request

import pytest
from pyspark.sql import functions as F

from kamiyo_hive_spark.sources.restwrite import IngestApiServer, IngestRestDataSource


def _df(spark, n=40, parts=4):
    return (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            (F.col("id") * 2.5).alias("v"),
        )
        .repartition(parts)
    )


def _write(df, srv, mode="append", **opts):
    df.sparkSession.dataSource.register(IngestRestDataSource)
    w = df.write.format("rest_ingest").option("base_url", srv.base_url)
    for k, v in opts.items():
        w = w.option(k, str(v))
    w.mode(mode).save()


def _published(srv):
    with urllib.request.urlopen(srv.base_url + "/published", timeout=30) as r:
        return json.loads(r.read())


def test_exactly_once_atomic_publish(spark):
    df = _df(spark)
    want = sorted((r["k"], r["v"]) for r in df.collect())
    with IngestApiServer() as srv:
        _write(df, srv)
        got = _published(srv)
        assert sorted(map(tuple, got["rows"])) == want  # every row once
        assert got["commits"] == 1  # one atomic publish
        assert srv.stage_calls == 4  # one stage per partition
        assert srv.staged == {}  # staging area drained


def test_task_failure_aborts_zero_rows_visible(spark):
    df = _df(spark)
    with IngestApiServer() as srv:
        with pytest.raises(Exception, match="injected failure"):
            _write(df, srv, fail_partition=2)
        got = _published(srv)
        # the torn-write window: other tasks staged rows, but nothing
        # may become visible and the driver must have aborted
        assert got["rows"] == []
        assert got["commits"] == 0
        assert srv.stage_calls >= 1
        assert srv.aborts == 1


def test_overwrite_truncates_at_commit_not_at_write(spark):
    first = _df(spark, n=10, parts=2)
    second = _df(spark, n=6, parts=2).select("k", (F.col("v") * 10).alias("v"))
    with IngestApiServer() as srv:
        _write(first, srv)
        # failed overwrite: previous generation must survive untouched
        with pytest.raises(Exception, match="injected failure"):
            _write(second, srv, mode="overwrite", fail_partition=1)
        assert len(_published(srv)["rows"]) == 10
        # successful overwrite replaces atomically
        _write(second, srv, mode="overwrite")
        got = _published(srv)
        assert sorted(map(tuple, got["rows"])) == sorted(
            (r["k"], r["v"]) for r in second.collect()
        )


def test_stream_epoch_replay_is_idempotent(spark, sf_dir):
    """Exactly-once under micro-batch replay: run the streaming sink
    once (N epochs), then replay epoch 0's commit with freshly staged
    rows — the service must discard the re-staged rows, publish
    nothing new, and count the replay."""
    from kamiyo_hive_spark.sources.restwrite import (
        streaming_rest_sink_exactly_once,
    )

    out = streaming_rest_sink_exactly_once(spark, sf_dir)
    n_total = sum(r["n_events"] for r in out.collect())
    from kamiyo_hive_spark.catalog import table

    assert n_total == table(spark, sf_dir, "events").count()

    # protocol-level replay against a fresh server
    with IngestApiServer() as srv:
        def post(path, obj):
            req = urllib.request.Request(
                srv.base_url + path,
                data=json.dumps(obj).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=30) as r:
                return json.loads(r.read())

        s1 = post("/stage", {"rows": [[1, "a"]]})["stage_id"]
        post("/commit_batch", {"stages": [s1], "batch_id": 0})
        s2 = post("/stage", {"rows": [[1, "a"]]})["stage_id"]  # replayed epoch
        post("/commit_batch", {"stages": [s2], "batch_id": 0})
        got = _published(srv)
        assert got["rows"] == [[1, "a"]]  # once, not twice
        assert srv.replayed_batches == 1
        assert srv.staged == {}  # replayed stage discarded, not leaked


def test_unknown_stage_commit_rejected(spark):
    """The service's own guard: committing a stage id it never saw is a
    409 and publishes nothing — the writer can't invent stages."""
    with IngestApiServer() as srv:
        req = urllib.request.Request(
            srv.base_url + "/commit",
            data=json.dumps({"stages": ["bogus"]}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 409
        assert _published(srv)["commits"] == 0

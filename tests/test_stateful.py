"""The declarative and grouped-map commit-reveal paths must agree row
for row — cross-validation of the custom-operator API against the
built-in aggregation path."""

from __future__ import annotations

import pandas as pd

from kamiyo_hive_spark.operators.stateful import (
    _resolve_session,
    resolve_sessions_pandas,
    resolve_sessions_sql,
)
from kamiyo_hive_spark.streaming.jobs import (
    HAS_TWS_RUNTIME,
    _CommitRevealProcessor,
)


def test_sql_and_pandas_session_resolution_identical(spark, sf_dir):
    sql_rows = {r.user_id: r.asDict() for r in resolve_sessions_sql(spark, sf_dir).collect()}
    pd_rows = {r.user_id: r.asDict() for r in resolve_sessions_pandas(spark, sf_dir).collect()}
    assert sql_rows.keys() == pd_rows.keys()
    for uid, row in sql_rows.items():
        assert row == pd_rows[uid], (uid, row, pd_rows[uid])


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v


class _FakeHandle:
    def getValueState(self, name, schema, ttlDurationMs=None):
        return _FakeValueState()


def test_tws_processor_merges_across_batches_like_batch_resolution(spark, sf_dir):
    """The transformWithStateInPandas processor, fed the same events as
    time-split micro-batches, must converge to the batch resolution for
    every key — the associativity the streaming variant depends on.
    Runs the processor directly (fake state handle) so the merge logic
    is verified even where the TWS protobuf runtime is absent."""
    from kamiyo_hive_spark.catalog import table

    e = (
        table(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts", "event_type", "value")
        .toPandas()
    )
    cuts = e["ts"].quantile([0.33, 0.66]).tolist()
    for uid, grp in list(e.groupby("user_id"))[:25]:
        proc = _CommitRevealProcessor()
        proc.init(_FakeHandle())
        batches = [
            grp[grp["ts"] < cuts[0]],
            grp[(grp["ts"] >= cuts[0]) & (grp["ts"] < cuts[1])],
            grp[grp["ts"] >= cuts[1]],
        ]
        out = None
        for b in batches:  # one handleInputRows call per micro-batch
            out = next(proc.handleInputRows((uid,), iter([b]), None))
        expected = _resolve_session(grp).iloc[0]
        got = out.iloc[0]
        assert got["n_commits"] == expected["n_commits"], uid
        assert got["winner_event_id"] == expected["winner_event_id"] or (
            pd.isna(got["winner_event_id"]) and pd.isna(expected["winner_event_id"])
        ), uid
        assert got["result"] == expected["result"], uid


def test_tws_query_registered_only_with_runtime():
    from kamiyo_hive_spark.plans.registry import load_registry

    reg = load_registry()
    assert ("streaming_commit_reveal_tws" in reg) == HAS_TWS_RUNTIME


def test_tws_probe_decision_matches_environment(spark, sf_dir):
    """The registration gate must track the ENVIRONMENT, not a stale
    constant (VERDICT r2 task 6). Two directions:

    - probe says no runtime → `google.protobuf` must genuinely be
      unimportable (that import is the root cause: without the wheel
      the TWS Python driver worker crashes at init — verified live in
      this container: `TransformWithStateInPySpark driver worker
      exited unexpectedly (crashed)` on a minimal query).
    - probe says runtime present → the registered TWS query must run
      end-to-end and agree with the always-available
      applyInPandasWithState twin. The day the protobuf wheel lands,
      this branch activates with zero code change.
    """
    if not HAS_TWS_RUNTIME:
        import importlib

        try:
            importlib.import_module("google.protobuf")
        except ModuleNotFoundError:
            return  # probe decision matches reality
        raise AssertionError(
            "google.protobuf imports but HAS_TWS_RUNTIME is False — "
            "the TWS gate is stale; re-check the probe in streaming/jobs.py"
        )
    from kamiyo_hive_spark.plans.registry import load_registry

    reg = load_registry()
    tws = {
        r.user_id: r.asDict()
        for r in reg["streaming_commit_reveal_tws"].builder(spark, sf_dir).collect()
    }
    twin = {
        r.user_id: r.asDict()
        for r in reg["streaming_commit_reveal_stateful"].builder(spark, sf_dir).collect()
    }
    assert tws.keys() == twin.keys() and len(tws) > 0
    for uid in tws:
        for col in ("n_commits", "winning_bid", "winner_event_id", "result"):
            assert tws[uid][col] == twin[uid][col], (uid, col)


def test_idempotent_sink_restart_stable(spark, sf_dir):
    """Restarting the foreachBatch sink query on its existing checkpoint
    must not reprocess or duplicate anything: the resolved sink state is
    identical after a second run."""
    from kamiyo_hive_spark.streaming.jobs import _idempotent_sink_run

    first = _idempotent_sink_run(spark, sf_dir, reset=True).collect()
    again = _idempotent_sink_run(spark, sf_dir, reset=False).collect()
    assert first == again
    assert len(first) > 0

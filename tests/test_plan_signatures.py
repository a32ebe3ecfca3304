"""Physical plan-shape regression lock.

At 100 TB, plan shape IS the performance model: an extra exchange, a
lost broadcast, or Python sneaking into a JVM path is invisible at test
scale and fatal at the design point. This test freezes a compact
signature of every batch query's physical plan — counts of shuffle
exchanges, broadcast exchanges, sort-merge vs broadcast-hash joins,
cartesian products, and Arrow/Python evaluation nodes — and fails on
any drift.

On INTENTIONAL plan changes, regenerate and commit the baseline:

    SPARK_GRAFT_REGEN_PLAN_SIGS=1 python -m pytest tests/test_plan_signatures.py
    git add tests/plan_signatures.json

Streaming queries are excluded (their builders run the stream; the
returned frame is a memory-sink scan with no plan information).

Scope note (ADVICE r10): queries whose builder eagerly materializes and
SERVES a localCheckpoint (the CDF/DV rollups, acid_change_data_feed,
and siblings following the maintain-once-then-serve discipline) pin
only the served plan here — a checkpoint scan with zero exchanges. The
real feed-derivation plan shape for those queries is locked by their
committed plans/r{N}/ captures (pre-checkpoint explain) and, for the
weighted feed, by tests/test_txlog_weighted_feed.py.
"""

from __future__ import annotations

import json
import os
import re
from pathlib import Path

import pytest

from kamiyo_hive_spark.plans.registry import load_registry

SIG_PATH = Path(__file__).resolve().parent / "plan_signatures.json"
REGEN = os.environ.get("SPARK_GRAFT_REGEN_PLAN_SIGS") == "1"

# counted via word-boundary regex over the pre-execution physical plan
_FEATURES = {
    "shuffle_exchanges": r"\bExchange (?:hash|range|SinglePartition)",
    "broadcast_exchanges": r"\bBroadcastExchange\b",
    "sort_merge_joins": r"\bSortMergeJoin\b",
    "broadcast_hash_joins": r"\bBroadcastHashJoin\b",
    "nested_loop_or_cartesian": r"\b(?:BroadcastNestedLoopJoin|CartesianProduct)\b",
    "python_eval_nodes": r"\b(?:ArrowEvalPython|BatchEvalPython|MapInPandas|FlatMapGroupsInPandas|MapInArrow)\b",
    "global_sorts": r"\bSort \[[^\]]*\], true\b",
}


def _signature(df) -> dict[str, int]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {k: len(re.findall(rx, plan)) for k, rx in _FEATURES.items()}


def _batch_queries():
    reg = load_registry()
    return sorted(n for n in reg if not n.startswith("streaming_"))


def test_plan_signatures(spark):
    sf_dir = "/root/testdata/sf0.001"
    reg = load_registry()
    current: dict[str, dict[str, int]] = {}
    for name in _batch_queries():
        # Cached plans change join strategies: persist() registers its
        # subtree with the CacheManager immediately, so any earlier
        # query (or earlier TEST FILE sharing the session) that cached
        # an intermediate flips later plans from sort-merge to
        # broadcast over InMemoryRelation stats. Clear per query so
        # every signature is the cache-independent cold plan.
        spark.catalog.clearCache()
        current[name] = _signature(reg[name].builder(spark, sf_dir))

    if REGEN or not SIG_PATH.exists():
        SIG_PATH.write_text(json.dumps(current, indent=1, sort_keys=True) + "\n")
        if REGEN:
            pytest.skip("plan signature baseline regenerated — commit it")

    baseline = json.loads(SIG_PATH.read_text())
    drift = {}
    for name, sig in current.items():
        base = baseline.get(name)
        if base != sig:
            drift[name] = {"baseline": base, "current": sig}
    assert not drift, (
        "physical plan shape drifted (set SPARK_GRAFT_REGEN_PLAN_SIGS=1 to "
        f"accept intentional changes):\n{json.dumps(drift, indent=1)}"
    )

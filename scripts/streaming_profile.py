#!/usr/bin/env python
"""Streaming steady-state accounting (VERDICT r2 task 5).

Each bounded streaming query in the bench pays per-run costs a
production job pays ONCE at startup (state-store instantiation,
micro-batch planner JIT, offset/commit-log setup). This script runs
every memory-sink streaming job, captures per-micro-batch
`triggerExecution` durations via the `_PROGRESS_SINK` hook, and prints
the init-vs-marginal split:

  init      = batch 0 duration (state-store + planner warm-up included)
  marginal  = mean duration of the remaining batches (steady state)

Writes .scratch/streaming_profile.json for BENCH_NOTES.
"""

from __future__ import annotations

import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from kamiyo_hive_spark.plans.registry import load_registry
    from kamiyo_hive_spark.session import get_spark
    from kamiyo_hive_spark.streaming import jobs

    spark = get_spark(app_name="streaming-profile")
    spark.range(100).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()
    reg = load_registry()
    streaming = [
        n
        for n, spec in reg.items()
        if "streaming" in spec.tags and spec.bench
    ]
    out = []
    for name in sorted(streaming):
        jobs._PROGRESS_SINK = sink = []
        try:
            reg[name].builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        finally:
            jobs._PROGRESS_SINK = None
        for qname, progress in sink:
            durs = []
            comps: dict[str, int] = {}
            for p in progress:
                d = json.loads(p.json) if hasattr(p, "json") else p
                durs.append(
                    (d["batchId"], d["durationMs"].get("triggerExecution", 0))
                )
                for k, ms in d["durationMs"].items():
                    comps[k] = comps.get(k, 0) + ms
            durs.sort()
            durs = [ms for _, ms in durs]
            if not durs:
                continue
            init = durs[0] / 1000.0
            rest = durs[1:]
            marginal = (sum(rest) / len(rest) / 1000.0) if rest else None
            out.append(
                {
                    "query": name,
                    "sink": qname,
                    "n_batches": len(durs),
                    "init_s": round(init, 3),
                    "marginal_s": round(marginal, 3) if marginal else None,
                    # summed-across-batches durationMs components: where
                    # the trigger time actually goes (addBatch = plan
                    # execution; walCommit/commitOffsets = checkpoint
                    # fsyncs; queryPlanning = incremental re-planning)
                    "components_ms": dict(sorted(comps.items())),
                }
            )
            comp_str = " ".join(
                f"{k}={v}" for k, v in sorted(comps.items(), key=lambda kv: -kv[1])
            )
            print(
                f"{name:40s} batches={len(durs)} init={init:6.2f}s "
                f"marginal={marginal if marginal is None else round(marginal, 3)}s\n"
                f"    {comp_str}",
                flush=True,
            )
    spark.stop()
    with open(os.path.join(_ROOT, ".scratch", "streaming_profile.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())

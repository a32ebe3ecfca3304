#!/usr/bin/env python
"""Child worker for scripts/ab_bench.py: holds ONE warm Spark session
over ONE source tree and runs single bench reps on demand.

Protocol (line-oriented, stdin/stdout):
  parent -> child:  RUN <query_name>
  child  -> parent: OK <seconds>   (or ERR <message>)
  parent -> child:  QUIT

The rep is the bench's exact timed action (builder -> noop sink), so
numbers are comparable with bench.py minima. The tree to import is
argv[1]; it is prepended to sys.path BEFORE any kamiyo import, so the
child executes that tree's code regardless of the parent's checkout.
"""

from __future__ import annotations

import sys
import time


def main() -> int:
    tree = sys.argv[1]
    sys.path.insert(0, tree)

    from kamiyo_hive_spark.plans.registry import load_registry
    from kamiyo_hive_spark.session import get_spark

    spark = get_spark(app_name=f"ab-bench-{tree.rsplit('/', 1)[-1]}")
    registry = load_registry()
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # Same one-time warm-up costs as bench.py so rep 1 is not a JIT
    # outlier relative to the bench's steady state.
    registry["flagship_runs_listing"].builder(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    from kamiyo_hive_spark.operators.similarity import ivf_assignments
    from kamiyo_hive_spark.warehouse import init_warehouse

    init_warehouse(spark, sf_dir)
    spark.range(100).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()
    ivf_assignments(spark, sf_dir)[0].write.format("noop").mode("overwrite").save()
    registry["streaming_dedup_keys"].builder(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    print("READY", flush=True)

    for line in sys.stdin:
        line = line.strip()
        if not line or line == "QUIT":
            break
        if not line.startswith("RUN "):
            print(f"ERR bad command {line!r}", flush=True)
            continue
        name = line[4:]
        try:
            spec = registry[name]
            t0 = time.perf_counter()
            spec.builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            print(f"OK {dt:.4f}", flush=True)
        except Exception as e:  # noqa: BLE001 - report and keep serving
            print(f"ERR {type(e).__name__}: {e}".replace("\n", " ")[:500], flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

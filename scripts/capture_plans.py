#!/usr/bin/env python
"""Capture `.explain("formatted")` for named registry queries.

Usage:
    python scripts/capture_plans.py <tag> <query> [<query> ...]

Writes plans/r10/<query>_<tag>.txt (tag = before|after). Streaming
queries' builders execute the stream and return a memory-sink scan, so
their "plan" here is the sink scan only — streaming evidence lives in
scripts/streaming_profile.py output instead.
"""

from __future__ import annotations

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        _ROOT, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r11")
    )
    os.makedirs(out_dir, exist_ok=True)

    from kamiyo_hive_spark.plans.registry import load_registry
    from kamiyo_hive_spark.session import get_spark

    spark = get_spark(app_name="capture-plans")
    reg = load_registry()
    for name in names:
        df = reg[name].builder(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Scaling-evidence harness (VERDICT r2 task 4): build a 10× tiled
sf1.0 analog of the driver's sf0.1 testdata, run the most expensive
batch queries at both scales, and print a per-query scaling table.

Why a TILED analog instead of a fresh generator: the driver's testdata
generator isn't in this repo, and the scaling question is about PLAN
behavior, not value distributions — so sf1.0 here is sf0.1 unioned 10
times with every entity key shifted by copy×stride (FKs shifted in
lockstep, so join fan-outs, group cardinalities per key, and text/
embedding distributions are preserved EXACTLY while global cardinality
grows 10×). Dimension tables (region, nation) stay fixed, as they
would at any real scale factor. Copy 0 keeps original ids, so
point-query constants (vec_id 0 probes, doc_id < 100 oracle slices)
still resolve.

Usage:
  python scripts/scale_run.py build          # stage .scratch/sf1.0
  python scripts/scale_run.py run [N]       # top-N by bench_out.json
  python scripts/scale_run.py run q1 q2 ...  # explicit queries

SPARK_GRAFT_SCALE_COPIES (default 10) sets the tile count: 10 stages
.scratch/sf1.0, 100 stages .scratch/sf10 (a ~1.6 GB, 60M-lineitem
two-decade scale-up for the "would it survive 100x" question).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

COPIES = int(os.environ.get("SPARK_GRAFT_SCALE_COPIES", "10"))
# SALT=1 prefixes every document-text token with a per-copy tag (copy 0
# keeps the original text, so point-query constants still resolve).
# Rationale: the plain tile duplicates every doc COPIES times VERBATIM,
# so near-dup pair counts grow quadratically in the tile count by
# construction — that measures redundancy blowup, not data scaling. The
# salted tile keeps the redundant FRACTION constant (within-copy
# near-dup structure preserved exactly, zero cross-copy collisions), so
# dedup operators see 100x data with 100x true pairs — the honest
# scaling question.
SALT = os.environ.get("SPARK_GRAFT_SCALE_SALT") == "1"
# (table, [key columns shifted by copy * stride]); stride = 10^ceil.
TILED: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation"]
SRC = "/root/testdata/sf0.1"
OUT_SF = "sf1.0" if COPIES == 10 else f"sf{COPIES / 10:g}"  # 100 -> sf10
if SALT:
    OUT_SF += "s"
OUT = os.path.join(_ROOT, ".scratch", OUT_SF)


def _stride(n_max: int) -> int:
    s = 1
    while s <= n_max:
        s *= 10
    return s


def build() -> str:
    from pyspark.sql import functions as F

    from kamiyo_hive_spark.catalog import table
    from kamiyo_hive_spark.session import get_spark

    if os.path.exists(os.path.join(OUT, "_DONE")):
        return OUT
    spark = get_spark(app_name="scale-build")
    # events.ts must land as INT64 micros (the driver testdata layout the
    # catalog sniffer understands) — Spark's default INT96 parquet
    # timestamps break the streaming readers at sf1.0.
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT, exist_ok=True)
    for t in DIMS:
        shutil.copy(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")
    for t, keys in TILED.items():
        base = table(spark, SRC, t)
        # Per-COLUMN stride from that column's own max: FK and PK maxima
        # coincide in this testdata (verified), so shifted foreign keys
        # land exactly on the shifted primary keys of the same copy and
        # every join fan-out is preserved.
        maxima = base.agg(*[F.max(k).alias(k) for k in keys]).collect()[0]
        strides = {k: _stride(int(maxima[k])) for k in keys}
        def _copy_cols(i: int) -> list:
            cols = []
            for c in base.columns:
                if c in keys:
                    cols.append((F.col(c) + F.lit(i * strides[c])).alias(c))
                elif SALT and t == "documents" and c == "text" and i > 0:
                    # 'c{i}.' — the dot separator keeps copy tags
                    # unambiguous for digit-leading tokens ('c1' + '0foo'
                    # would equal 'c10' + 'foo'); this corpus has no
                    # digit-leading tokens (verified), so tiles built
                    # with the earlier 'c{i}' prefix are equally
                    # collision-free — the separator future-proofs it.
                    cols.append(
                        F.regexp_replace(F.col("text"), r"(\S+)", f"c{i}.$1").alias(
                            "text"
                        )
                    )
                else:
                    cols.append(F.col(c))
            return cols

        copies = [base.select(*_copy_cols(i)) for i in range(COPIES)]
        df = copies[0]
        for c in copies[1:]:
            df = df.unionByName(c)
        # one flat parquet FILE per table (driver layout: {t}.parquet is
        # a file, not a dir) — write dir then promote the single part.
        tmp = f"{OUT}/_tmp_{t}"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        os.replace(os.path.join(tmp, part), f"{OUT}/{t}.parquet")
        shutil.rmtree(tmp)
        print(f"tiled {t}: strides={strides}", flush=True)
    spark.stop()
    with open(os.path.join(OUT, "_DONE"), "w") as fh:
        fh.write("ok")
    return OUT


def run(names: list[str]) -> None:
    from kamiyo_hive_spark.plans.registry import load_registry
    from kamiyo_hive_spark.session import get_spark

    spark = get_spark(app_name="scale-run")
    reg = load_registry()
    jvm_gc = spark.sparkContext._jvm.System.gc
    spark.range(10).write.format("noop").mode("overwrite").save()
    rows = []
    out_path = os.path.join(_ROOT, ".scratch", f"scale_run_{OUT_SF}.json")

    def _flush() -> None:
        # incremental dump: a mid-sweep failure (e.g. a shuffle spill
        # outgrowing this VM's disk at the 100x tile) keeps every
        # completed datapoint
        with open(out_path, "w") as fh:
            json.dump(rows, fh, indent=1)

    for name in names:
        spec = reg[name]
        t = {}
        try:
            for label, sf_dir in [("sf0.1", SRC), (OUT_SF, OUT)]:
                jvm_gc()
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    spec.builder(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    best = min(best, time.perf_counter() - t0)
                t[label] = best
        except Exception as e:  # noqa: BLE001 — record and move on
            rows.append({"query": name, "error": str(e).split("\n")[0][:300]})
            _flush()
            print(f"{name:36s} ERROR: {rows[-1]['error'][:120]}", flush=True)
            continue
        ratio = t[OUT_SF] / t["sf0.1"]
        rows.append(
            {
                "query": name,
                "sf0.1_s": round(t["sf0.1"], 4),
                f"{OUT_SF}_s": round(t[OUT_SF], 4),
                "ratio": round(ratio, 3),
            }
        )
        _flush()
        print(
            f"{name:36s} sf0.1={t['sf0.1']:7.3f}s {OUT_SF}={t[OUT_SF]:7.3f}s "
            f"ratio={ratio:5.2f}x",
            flush=True,
        )
    spark.stop()


def main() -> int:
    if len(sys.argv) < 2 or sys.argv[1] == "build":
        build()
        return 0
    assert sys.argv[1] == "run"
    args = sys.argv[2:]
    if args and not args[0].isdigit():
        names = args
    else:
        top_n = int(args[0]) if args else 20
        with open(os.path.join(_ROOT, "bench_out.json")) as fh:
            timings = json.load(fh)["queries"]
        from kamiyo_hive_spark.plans.registry import load_registry

        reg = load_registry()
        batch = {
            n: s
            for n, s in timings.items()
            if "streaming" not in (reg[n].tags or ()) and not n.startswith("streaming")
        }
        names = [n for n, _ in sorted(batch.items(), key=lambda kv: -kv[1])][:top_n]
    build()
    run(names)
    return 0


if __name__ == "__main__":
    sys.exit(main())

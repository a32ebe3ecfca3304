#!/usr/bin/env python
"""Decompose the semantic-dedup 100×-tile scaling ratio (VERDICT r6
task 4): on the adversarial identical-copy tile the pair OUTPUT grows
with the duplicate clusters, so wall-clock ratio alone conflates
output-bound work with data scaling. This probe separates them, per
scale: corpus size, cell census (count, max), PAIRS EXAMINED by the
bounded self-join (Σ k·(k−1)/2 over (cid, shard) cells — computed from
the cell census, no join), PAIRS EMITTED past tau, and the registered
query's wall — so seconds-per-million-examined-pairs can be compared
across scales (the minhash treatment: flat per-pair cost at growing
pair counts = output-bound, not a scaling defect).

Usage: python scripts/semdedup_decompose.py [sf_dir ...]
Defaults to /root/testdata/sf0.1 and .scratch/sf10 (the adversarial
plain tile). Writes docs/semdedup_decompose.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def probe(spark, sf_dir: str) -> dict:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from kamiyo_hive_spark.operators.dedup import _portable_hash
    from kamiyo_hive_spark.operators.similarity import (
        SEMDEDUP_CELL_CAP,
        SEMDEDUP_K,
        SEMDEDUP_TAU,
        _dot,
        assign_to_seed_centroids,
        semantic_dedup_embeddings,
    )

    # replicate the operator's adaptive cell rule exactly
    base = assign_to_seed_centroids(spark, sf_dir, SEMDEDUP_K)
    n_in_cluster = F.count("*").over(Window.partitionBy("cid"))
    n_shards = (
        (n_in_cluster + F.lit(SEMDEDUP_CELL_CAP - 1)) / F.lit(SEMDEDUP_CELL_CAP)
    ).cast("long")
    assigned = base.withColumn(
        "shard", F.pmod(_portable_hash(F.col("vec_id").cast("string"), 7), n_shards)
    )
    cells = (
        assigned.groupBy("cid", "shard").agg(F.count("*").alias("k")).collect()
    )
    n_vecs = sum(r["k"] for r in cells)
    pairs_examined = sum(r["k"] * (r["k"] - 1) // 2 for r in cells)

    a = assigned.alias("a")
    b = assigned.alias("b")
    sim_p = F.round(_dot(F.col("a.nv"), F.col("b.nv")), 9)
    pairs_emitted = (
        a.join(
            b,
            (F.col("b.cid") == F.col("a.cid"))
            & (F.col("b.shard") == F.col("a.shard"))
            & (F.col("b.vec_id") > F.col("a.vec_id")),
        )
        .filter(sim_p >= SEMDEDUP_TAU)
        .count()
    )

    reps = 2 if n_vecs < 100_000 else 1
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        semantic_dedup_embeddings(spark, sf_dir).collect()
        best = min(best, time.perf_counter() - t0)

    return {
        "sf_dir": sf_dir,
        "n_vecs": n_vecs,
        "n_cells": len(cells),
        "max_cell": max((r["k"] for r in cells), default=0),
        "pairs_examined": pairs_examined,
        "pairs_emitted": pairs_emitted,
        "query_s": round(best, 4),
        "s_per_Mpair_examined": round(best / (pairs_examined / 1e6), 4)
        if pairs_examined
        else None,
    }


def main() -> int:
    from kamiyo_hive_spark.session import get_spark

    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        os.path.join(_ROOT, ".scratch", "sf10"),
    ]
    spark = get_spark(
        app_name="semdedup-decompose", master="local[32]", shuffle_partitions=32
    )
    rows = []
    for d in dirs:
        r = probe(spark, d)
        rows.append(r)
        print(json.dumps(r))
    if (
        len(rows) >= 2
        and rows[0]["s_per_Mpair_examined"]
        and rows[-1]["s_per_Mpair_examined"]
    ):
        r0, r1 = rows[0], rows[-1]
        print(
            f"DECOMPOSITION: wall {r1['query_s'] / r0['query_s']:.1f}x | "
            f"pairs examined {r1['pairs_examined'] / r0['pairs_examined']:.1f}x | "
            f"pairs emitted {r1['pairs_emitted'] / max(1, r0['pairs_emitted']):.1f}x | "
            f"per-Mpair cost {r1['s_per_Mpair_examined'] / r0['s_per_Mpair_examined']:.2f}x"
        )
    out = os.path.join(_ROOT, "docs", "semdedup_decompose.json")
    with open(out, "w") as fh:
        json.dump(rows, fh, indent=1)
    print("->", out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

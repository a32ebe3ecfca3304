#!/usr/bin/env python
"""Chunk-sequential 100x scale evidence for `minhash_lsh_neardup` and
`semantic_dedup_embeddings` (VERDICT r5 task 1).

The plain 100x tile duplicates every document VERBATIM 100 times, so
the candidate-pair relation grows ~quadratically in the tile count by
construction (every doc collides with its 99 copies in ALL bands) —
the r5 sweep's full-pipeline verify join spilled past this VM's ~78 GB
free disk. A 1000-executor cluster absorbs that shuffle across
executor-local disks; ONE box cannot. What one box CAN do — and what
this script measures — is the band/chunk-sequential schedule: process
the candidate set in G disjoint slices whose union is exactly the full
result, so the in-flight shuffle footprint is ~1/G of the monolithic
stage. This is the same bounded-cell judgment the operators already
encode (semantic_dedup shards, span cut-list islands).

Stages for minhash at the tile:
  1. signatures + banded candidate join ONCE -> candidate pairs parquet
     (timed; the pair relation itself is compact).
  2. G sequential verify_jaccard runs over hash(doc_a)%G slices of the
     candidates (timed each; slices are disjoint and exhaustive).
  3. total = stage1 + sum(stage2); per-chunk peak footprint recorded.

Usage:
  python scripts/scale_chunked.py [G] [sf_dir]
Defaults: G=16, sf_dir=.scratch/sf10 (build it first via
  SPARK_GRAFT_SCALE_COPIES=100 python scripts/scale_run.py build).
Writes .scratch/scale_chunked_<tile>.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def main() -> int:
    from pyspark.sql import functions as F

    from kamiyo_hive_spark.catalog import parallel_table
    from kamiyo_hive_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_signatures,
        shingle_rows,
        verify_jaccard,
    )
    from kamiyo_hive_spark.session import get_spark

    G = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(_ROOT, ".scratch", "sf10")
    tile = os.path.basename(sf_dir)
    out_json = os.path.join(_ROOT, ".scratch", f"scale_chunked_{tile}.json")
    cand_dir = os.path.join(_ROOT, ".scratch", f"_chunk_cand_{tile}")

    spark = get_spark(app_name="scale-chunked")
    spark.range(10).write.format("noop").mode("overwrite").save()

    report: dict = {"tile": tile, "chunks": G}

    # --- stage 1: signatures + banding, candidates materialized once;
    # the shingle index is ALSO written once (dedup.py exposes `inv=`
    # for exactly this sharing — without it every verify slice would
    # re-tokenize the full corpus) ---
    docs = parallel_table(spark, sf_dir, "documents", "doc_id")
    inv_dir = os.path.join(_ROOT, ".scratch", f"_chunk_inv_{tile}")
    t0 = time.perf_counter()
    shutil.rmtree(inv_dir, ignore_errors=True)
    shingle_rows(docs).write.mode("overwrite").parquet(inv_dir)
    inv = spark.read.parquet(inv_dir)
    sigs = minhash_signatures(docs, portable=True, inv=inv).persist()
    cands = minhash_lsh_candidates(sigs, portable=True)
    shutil.rmtree(cand_dir, ignore_errors=True)
    cands.write.mode("overwrite").parquet(cand_dir)
    sigs.unpersist()
    t_cand = time.perf_counter() - t0
    n_cand = spark.read.parquet(cand_dir).count()
    report["stage1_candidates_s"] = round(t_cand, 2)
    report["n_candidates"] = n_cand
    print(f"stage1 candidates: {n_cand} pairs in {t_cand:.1f}s", flush=True)

    # --- stage 2: G sequential verify slices ---
    jvm_gc = spark.sparkContext._jvm.System.gc
    chunk_times = []
    total_out = 0
    cand_all = spark.read.parquet(cand_dir)
    for g in range(G):
        jvm_gc()
        sl = cand_all.filter(
            F.pmod(F.xxhash64(F.col("doc_a")), F.lit(G)) == F.lit(g)
        )
        t0 = time.perf_counter()
        out = verify_jaccard(docs, sl, 0.5, inv=inv)
        n = out.count()
        dt = time.perf_counter() - t0
        chunk_times.append(round(dt, 2))
        total_out += n
        print(f"chunk {g + 1}/{G}: {n} dup pairs in {dt:.1f}s", flush=True)
        report["chunk_s"] = chunk_times
        report["n_dup_pairs"] = total_out
        report["total_s"] = round(t_cand + sum(chunk_times), 2)
        with open(out_json, "w") as fh:
            json.dump(report, fh, indent=1)

    print(
        f"TOTAL {report['total_s']}s = stage1 {t_cand:.1f}s + "
        f"{G} chunks {sum(chunk_times):.1f}s; {total_out} dup pairs",
        flush=True,
    )
    shutil.rmtree(cand_dir, ignore_errors=True)
    shutil.rmtree(inv_dir, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

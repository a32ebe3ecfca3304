#!/usr/bin/env python
"""Spark-vs-DuckDB head-to-head at sf0.1 (the judge's 2× bar).

Times every registered BATCH oracle in DuckDB (32 threads, best-of-N,
results discarded to a count(*) materialization) and compares with the
Spark timings in bench_out.json (same best-of-N protocol, noop sink).
Writes .scratch/headtohead.json and prints the aggregate plus the
subset with enough DuckDB work to measure plans rather than Spark's
per-query scheduling floor.
"""

from __future__ import annotations

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import duckdb  # noqa: E402

from kamiyo_hive_spark.catalog import TABLES  # noqa: E402
from kamiyo_hive_spark.plans.registry import load_registry  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("SPARK_GRAFT_H2H_REPS", "3"))

# Frozen head-to-head panel (VERDICT r5 task 6): the queries whose
# DuckDB oracles measured >=0.2 s in the r5 sweep, pinned so the
# headline ratio is comparable round-over-round. The floating
# >=0.25s/>=0.1s subsets churn with DuckDB-side variance at the cutoff
# (r5 saw 1.35x-2.01x same day from membership alone); this list does
# not move. Add new heavy queries by appending — never remove.
PANEL = (
    "bpe_train_merges",
    "pq_train_codebooks",
    "minhash_lsh_neardup",
    "pagerank_fixed_point",
    "maxsim_late_interaction",
    "contrastive_pair_mining",
    "heavy_hitters_cms",
    "force_directed_layout",
    "dsir_importance_scores",
    "ngram_lm_quality",
    "semantic_dedup_embeddings",
    "benchmark_decontaminate",
    "waiting_supplier_rank",
    "semantic_dedup_sharded",
    "dup_clusters_canonical",
    "rrf_fusion",
    "curated_pretrain_pipeline",
    "kmeans_lloyd_clusters",
    "doc_repetition_stats",
    # r7 append (VERDICT r6 task 6): the production serving shape, with
    # a >=0.5s oracle. Append-only — never remove members.
    "maxsim_ann_rerank",
)


def _duck_best(con, sql: str, reps: int) -> float:
    """Best-of-reps DuckDB timing with the SAME stability rule as
    bench.py's Spark side (ADVICE r6: the adaptive extra reps applied
    only to Spark, biasing ratios in Spark's favor when a DuckDB rep
    is unstable): if the two best reps disagree by >25% and the floor
    isn't sub-0.15s, take up to 3 extra attempts until two agree."""
    times: list[float] = []
    for _ in range(reps):
        t0 = time.perf_counter()
        con.execute(f"SELECT count(*) FROM ({sql})").fetchone()
        times.append(time.perf_counter() - t0)
    extra = int(os.environ.get("SPARK_GRAFT_H2H_EXTRA_REPS", "3"))
    for _ in range(extra):
        best2 = sorted(times)[:2]
        if len(best2) < 2:
            break
        if best2[0] < 0.15 or (best2[1] - best2[0]) / best2[0] <= 0.25:
            break
        t0 = time.perf_counter()
        con.execute(f"SELECT count(*) FROM ({sql})").fetchone()
        times.append(time.perf_counter() - t0)
    return min(times)


def main() -> int:
    with open(os.path.join(_ROOT, "bench_out.json")) as fh:
        spark_times = json.load(fh)["queries"]
    reg = load_registry()
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    rows = []
    errors = []
    for name, spec in sorted(reg.items()):
        if spec.oracle is None or name.startswith("streaming_"):
            continue
        if name not in spark_times:
            continue
        try:
            best = _duck_best(con, spec.oracle, REPS)
        except Exception as ex:  # noqa: BLE001
            errors.append((name, str(ex)[:100]))
            continue
        rows.append(
            {
                "query": name,
                "spark_s": spark_times[name],
                "duckdb_s": round(best, 4),
                "ratio": round(spark_times[name] / best, 2) if best > 0 else None,
            }
        )
    con.close()
    by_name = {r["query"]: r for r in rows}
    panel_rows = [by_name[q] for q in PANEL if q in by_name]
    out_path = os.path.join(_ROOT, ".scratch", "headtohead.json")
    with open(out_path, "w") as fh:
        json.dump(
            {
                "sf_dir": SF_DIR,
                "rows": rows,
                "errors": errors,
                "panel": list(PANEL),
                "panel_spark_s": round(sum(r["spark_s"] for r in panel_rows), 4),
                "panel_duckdb_s": round(sum(r["duckdb_s"] for r in panel_rows), 4),
            },
            fh,
            indent=1,
        )
    sp = sum(r["spark_s"] for r in rows)
    dk = sum(r["duckdb_s"] for r in rows)
    print(f"queries: {len(rows)}  oracle errors: {len(errors)}")
    print(f"aggregate: spark {sp:.1f}s  duckdb {dk:.1f}s  ratio {sp / dk:.2f}x")
    if panel_rows:
        psp = sum(r["spark_s"] for r in panel_rows)
        pdk = sum(r["duckdb_s"] for r in panel_rows)
        print(
            f"FROZEN PANEL ({len(panel_rows)}/{len(PANEL)} queries): "
            f"spark {psp:.1f}s duckdb {pdk:.1f}s ratio {psp / pdk:.2f}x"
        )
    for floor in (0.1, 0.25):
        sub = [r for r in rows if r["duckdb_s"] >= floor]
        if not sub:
            continue
        sps = sum(r["spark_s"] for r in sub)
        dks = sum(r["duckdb_s"] for r in sub)
        print(
            f"duckdb>={floor}s subset ({len(sub)} queries): spark {sps:.1f}s "
            f"duckdb {dks:.1f}s ratio {sps / dks:.2f}x"
        )
    worst = sorted(
        (r for r in rows if r["duckdb_s"] >= 0.1),
        key=lambda r: -(r["ratio"] or 0),
    )[:10]
    for r in worst:
        print(
            f"  {r['query']:36s} spark={r['spark_s']:7.3f} "
            f"duckdb={r['duckdb_s']:7.3f} ratio={r['ratio']:6.2f}x"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())

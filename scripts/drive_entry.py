"""Driver-contract simulation — the verify skill's drive template.

Mirrors the external harness: a VANILLA SparkSession (no engine
configs; the entry module must self-configure) runs every registered
`queries()` entry at sf0.01 next to its `oracle_sql()` DuckDB replay,
comparing row count + column set + order-insensitive value hash.

The OS-timezone probe (`python scripts/drive_entry.py America/New_York`)
tests that the ENGINE's timestamp posture is TZ-independent. Rendering
therefore goes through `toPandas()` via scripts/drive_common.py — the
same convention as scripts/full_drive.py. Never hash `collect()` rows:
pyspark materializes TimestampType through OS-local
`datetime.fromtimestamp`, which no Spark conf can pin, so a
collect()-based drive false-fails every timestamp query under a
non-UTC OS TZ at any engine version (VERDICT r9 finding 4).

Usage: python scripts/drive_entry.py [TZ] [only_query1 only_query2 ...]
"""

from __future__ import annotations

import os
import sys
import time

TZ = sys.argv[1] if len(sys.argv) > 1 else "UTC"
ONLY = set(sys.argv[2:])
os.environ["TZ"] = TZ
time.tzset()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF = os.environ.get("SPARK_GRAFT_DRIVE_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    from drive_common import compare_query, duck_views

    spark = (
        SparkSession.builder.master("local[8]")
        .appName(f"drive-entry-{TZ}")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    con = duckdb.connect()
    duck_views(con, SF)

    # smoke: entry() must run and return rows on a stable schema
    edf = entry.entry(spark)
    print(f"entry() rows={len(edf.collect())} "
          f"schema={edf.schema.simpleString()[:80]}")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = [n for n in qs if not ONLY or n in ONLY]
    n_match = n_mismatch = n_noracle = n_err = n_zero = 0
    failures: list[tuple[str, str]] = []
    t0 = time.time()
    for i, name in enumerate(names):
        try:
            rec = compare_query(spark, con, qs[name], oracles.get(name), SF)
        except Exception as e:  # noqa: BLE001 — drive must record, not die
            n_err += 1
            failures.append((name, f"ERROR: {type(e).__name__}: {e}"))
            print(f"[{i + 1}/{len(names)}] {name}: ERROR {e}")
            continue
        if rec["rows_spark"] == 0:
            n_zero += 1
        if not rec["oracle"]:
            n_noracle += 1
            print(f"[{i + 1}/{len(names)}] {name}: "
                  f"rows={rec['rows_spark']} (no oracle)")
        elif rec["pass"]:
            n_match += 1
            print(f"[{i + 1}/{len(names)}] {name}: "
                  f"MATCH rows={rec['rows_spark']}")
        else:
            n_mismatch += 1
            failures.append((
                name,
                f"rows {rec['rows_spark']}/{rec.get('rows_oracle')} "
                f"schema_ok={rec.get('schema_ok')} hash_ok={rec.get('hash_ok')}",
            ))
            print(f"[{i + 1}/{len(names)}] {name}: MISMATCH {failures[-1][1]}")
    print(
        f"\nTZ={TZ} total={len(names)} match={n_match} "
        f"mismatch={n_mismatch} no_oracle={n_noracle} errors={n_err} "
        f"zero_row={n_zero} elapsed={time.time() - t0:.1f}s"
    )
    for name, why in failures:
        print("FAIL:", name, why)
    if n_mismatch == 0 and n_err == 0:
        print("RESULT: ALL MATCH")
        return 0
    print("RESULT: FAILURES")
    return 1


if __name__ == "__main__":
    sys.exit(main())

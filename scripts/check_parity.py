"""Quick driver-style parity check for a subset of queries — reuses the
test suite's exact comparators, so a PASS here predicts a green
tests/test_parity.py row.

Usage: python scripts/check_parity.py name1 name2 ...
(Override the scale dir with SPARK_GRAFT_PARITY_SF_DIR.)
"""
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

import duckdb

from kamiyo_hive_spark.catalog import TABLES
from kamiyo_hive_spark.plans.registry import load_registry
from kamiyo_hive_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF_DIR", "/root/testdata/sf0.01")

from test_parity import assert_frames_match  # noqa: E402


def main(names):
    reg = load_registry()
    spark = get_spark(app_name="parity-check")
    con = duckdb.connect()
    failed = []
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
            )
        # Same persist hygiene as bench.py: builders that persist()
        # multi-consumer intermediates leave blocks cached after the
        # action; over a long parity loop the orphans squeeze unified
        # memory. Unpersist whatever each query added.
        def persistent_rdds():
            return dict(spark.sparkContext._jsc.getPersistentRDDs())

        keep = set(persistent_rdds())
        for name in names:
            try:
                spec = reg[name]
                spdf = spec.builder(spark, SF_DIR).toPandas()
                ddf = con.execute(spec.oracle).fetchdf()
                assert_frames_match(spdf, ddf, name)
                print(f"PASS {name} ({len(spdf)} rows)")
            except Exception as ex:
                failed.append(name)
                print(f"FAIL {name}: {ex}")
            finally:
                for rdd_id, jrdd in persistent_rdds().items():
                    if rdd_id not in keep:
                        jrdd.unpersist(False)
    finally:
        con.close()
        spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

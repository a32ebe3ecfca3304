"""Streaming CDF tail: one change file per committed version, and the
signed-aggregation state must telescope to the final snapshot — with
the delete batch being load-bearing (a prefix of the feed disagrees)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kamiyo_hive_spark.functions.money import dec
from kamiyo_hive_spark.plans.registry import load_registry
from kamiyo_hive_spark.sources.sinks import SCRATCH
from kamiyo_hive_spark.sources.txlog import TxLog, cdf_table


def test_cdf_tail_matches_final_snapshot(spark, sf_dir):
    reg = load_registry()
    got = {
        r["o_orderstatus"]: (r["n_rows"], round(r["total_price"], 2))
        for r in reg["streaming_cdf_tail"].builder(spark, sf_dir).collect()
    }
    root = cdf_table(spark, sf_dir)
    want = {
        r["o_orderstatus"]: (r["n"], round(r["t"], 2))
        for r in TxLog(root)
        .read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(dec("o_totalprice")).cast("double").alias("t"),
        )
        .collect()
    }
    assert got == want


def test_one_change_file_per_version(spark, sf_dir):
    reg = load_registry()
    reg["streaming_cdf_tail"].builder(spark, sf_dir)  # ensure staged
    staged = os.path.join(SCRATCH, f"txlog_cdf_stream_{os.path.basename(sf_dir)}")
    files = sorted(f for f in os.listdir(staged) if f.endswith(".parquet"))
    root = cdf_table(spark, sf_dir)
    assert len(files) == TxLog(root).version() + 1
    # arrival order pinned to commit order
    mtimes = [os.path.getmtime(os.path.join(staged, f)) for f in files]
    assert mtimes == sorted(mtimes)


def test_delete_batch_is_load_bearing(spark, sf_dir):
    """Summing only the insert legs (ignoring deletes) must NOT equal
    the final snapshot — i.e. the stateful maintenance genuinely needs
    the delete batch, and the telescoping test above isn't vacuous."""
    reg = load_registry()
    reg["streaming_cdf_tail"].builder(spark, sf_dir)
    staged = os.path.join(SCRATCH, f"txlog_cdf_stream_{os.path.basename(sf_dir)}")
    feed = spark.read.parquet(staged)
    inserts_only = {
        r["o_orderstatus"]: r["n"]
        for r in feed.filter(F.col("_change_type") == "insert")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    root = cdf_table(spark, sf_dir)
    final = {
        r["o_orderstatus"]: r["n"]
        for r in TxLog(root)
        .read(spark)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert inserts_only != final

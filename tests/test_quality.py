"""Behavioral checks for the data-quality operators beyond hash parity:
non-vacuity (the suite actually checks rows), the gate's conservation
law, and that the observed metrics equal an independent recount.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kamiyo_hive_spark.catalog import table
from kamiyo_hive_spark.operators.quality import (
    GATE_MIN_CHARS,
    GATE_MIN_TOKENS,
    dq_expectations,
    observed_quality_gate,
)


def test_dq_suite_checks_real_rows_and_clean_data_passes(spark, sf_dir):
    rows = {r["check_name"]: r for r in dq_expectations(spark, sf_dir).collect()}
    assert len(rows) == 5
    n_orders = table(spark, sf_dir, "orders").count()
    for r in rows.values():
        assert r["n_rows_checked"] == n_orders > 0
        assert r["passed"] == (r["n_violations"] == 0)
    # the synthetic star schema is referentially clean — the suite must
    # agree (a failing clean-data suite means a broken check, not bad data)
    assert all(r["passed"] for r in rows.values()), rows


def test_observed_gate_conservation_and_recount(spark, sf_dir):
    m = observed_quality_gate(spark, sf_dir).collect()[0]
    assert m["n_in"] == m["n_short_dropped"] + m["n_sparse_dropped"] + m["n_kept"]
    assert m["n_in"] == table(spark, sf_dir, "documents").count()
    # independent recount of the kept set
    from kamiyo_hive_spark.operators.text import _tokens

    d = table(spark, sf_dir, "documents").select(
        "n_chars", F.size(_tokens()).alias("n_tok")
    )
    kept = d.filter(
        (F.col("n_chars") >= GATE_MIN_CHARS) & (F.col("n_tok") >= GATE_MIN_TOKENS)
    )
    assert m["n_kept"] == kept.count()
    assert m["tokens_kept"] == kept.agg(F.sum("n_tok")).collect()[0][0]
    assert m["n_kept"] > 0  # the gate keeps something — non-vacuous

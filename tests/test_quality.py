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


def test_curated_pipeline_stage_algebra(spark, sf_dir):
    """The capstone composition must agree with its standalone stages:
    candidates per cluster can't exceed the gate's kept count, sampling
    never exceeds candidates, and over-budget clusters sample fewer
    tokens than they hold."""
    from kamiyo_hive_spark.operators.quality import (
        CPP_K,
        curated_pretrain_pipeline,
        observed_quality_gate,
    )

    rows = curated_pretrain_pipeline(spark, sf_dir).collect()
    assert 0 < len(rows) <= CPP_K
    gate = observed_quality_gate(spark, sf_dir).collect()[0]
    total_candidates = sum(r["n_candidates"] for r in rows)
    # dedup + classifier only ever REMOVE docs after the gate
    assert 0 < total_candidates <= gate["n_kept"]
    for r in rows:
        assert 0 <= r["n_sampled"] <= r["n_candidates"]
        assert r["tokens_sampled"] >= 0
    assert any(r["n_sampled"] > 0 for r in rows)

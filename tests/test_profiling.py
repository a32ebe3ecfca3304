"""Profiling-family invariants beyond the value hash."""

from __future__ import annotations

from kamiyo_hive_spark.operators.profiling import analyze_table_stats, dist_drift_psi


def test_stats_internally_consistent(spark, sf_dir):
    r = analyze_table_stats(spark, sf_dir).first()
    assert r["custkey_min"] <= r["custkey_max"]
    assert r["price_min_cents"] < r["price_max_cents"]
    assert 0 < r["status_ndv"] <= r["n_rows"]
    assert r["custkey_ndv"] <= r["n_rows"]
    assert r["orderdate_nulls"] == 0
    assert r["year_min"] <= r["year_max"]


def test_psi_terms_nonnegative_and_probs_normalized(spark, sf_dir):
    rows = dist_drift_psi(spark, sf_dir).collect()
    assert rows
    # (p2 - p1) * ln(p2/p1) >= 0 always — sign of both factors agrees
    assert all(r["psi_term"] >= 0 for r in rows)
    # Laplace-smoothed probabilities sum to ~1 on each side
    assert abs(sum(r["p_base"] for r in rows) - 1) < 1e-6
    assert abs(sum(r["p_cur"] for r in rows) - 1) < 1e-6

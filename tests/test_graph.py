"""Invariant tests for iterative graph ranking (fixed-point PageRank)."""

from __future__ import annotations

from kamiyo_hive_spark.plans.registry import load_registry


def test_pagerank_fixed_point_invariants(spark, sf_dir):
    rows = load_registry()["pagerank_fixed_point"].builder(spark, sf_dir).collect()
    assert rows, "rank table must be non-empty"
    ranks = [r.rank_micro for r in rows]
    # ordered descending, strictly positive, bipartite id namespace
    assert ranks == sorted(ranks, reverse=True)
    assert all(x > 0 for x in ranks)
    assert all(r.node_id[0] in ("C", "S") for r in rows)
    # suppliers are the high-degree side of the bipartite graph, so the
    # top-ranked node must be a supplier
    assert rows[0].node_id.startswith("S")


def test_pagerank_fixed_point_mass_conserved(spark, sf_dir):
    # rerun without the top-100 cut: total mass stays within rounding
    # loss of the 10^12 budget (each node floors at most 100+outdeg
    # micro-units per round)
    from pyspark.sql import functions as F

    from kamiyo_hive_spark.operators.semistructured import pagerank_fixed_point

    df = pagerank_fixed_point(spark, sf_dir)
    # builder limits to 100; at sf0.001 the whole graph is <100 nodes
    total = df.agg(F.sum("rank_micro").alias("t")).collect()[0].t
    n = df.count()
    if n < 100:  # the limit did not truncate — mass check is meaningful
        assert 0.95 * 10**12 <= total <= 10**12

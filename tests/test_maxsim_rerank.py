"""Behavioral tests for the ANN-pool -> MaxSim rerank composition:
the pool scan must partition-prune, and any candidate the reranker
scores must carry EXACTLY the score standalone MaxSim assigns it."""

from __future__ import annotations

from kamiyo_hive_spark.operators.retrieval import (
    MAXSIM_NQ,
    MAXSIM_POOL,
    MAXSIM_TOP,
    maxsim_ann_pool,
    maxsim_ann_rerank,
    maxsim_late_interaction,
)


def test_ann_pool_prunes_partitions_and_is_bounded(spark, sf_dir):
    pool = maxsim_ann_pool(spark, sf_dir)
    rows = pool.collect()
    assert rows, "ANN pool is empty"
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, set()).add(r.cand_id)
        assert r.cand_id != r.query_id, "self-candidate leaked into the pool"
    assert set(per_q) <= set(range(MAXSIM_NQ))
    assert all(len(c) <= MAXSIM_POOL for c in per_q.values())

    plan = pool._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "bucket" in pf, pf


def test_rerank_scores_match_standalone_maxsim(spark, sf_dir):
    """The rerank changes the CANDIDATE SET, never the score: every
    (query, cand) pair both operators rank must score identically."""
    rerank = maxsim_ann_rerank(spark, sf_dir).collect()
    assert rerank, "rerank returned nothing"
    full = {
        (r.query_id, r.cand_id): r.maxsim
        for r in maxsim_late_interaction(spark, sf_dir).collect()
    }
    overlap = 0
    for r in rerank:
        key = (r.query_id, r.cand_id)
        if key in full:
            assert full[key] == r.maxsim, f"score drift on {key}"
            overlap += 1
    # per query at most MAXSIM_TOP rows, ordered by maxsim desc
    per_q: dict[int, list[float]] = {}
    for r in rerank:
        per_q.setdefault(r.query_id, []).append(r.maxsim)
    for q, scores in per_q.items():
        assert len(scores) <= MAXSIM_TOP
        assert scores == sorted(scores, reverse=True), f"query {q} unordered"

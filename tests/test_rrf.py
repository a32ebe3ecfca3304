"""RRF fusion tests: rank-only properties the hash replay can't
isolate — pool bounds, the contribution formula, and descent order."""

from __future__ import annotations

from kamiyo_hive_spark.operators.retrieval import (
    RRF_K,
    RRF_NQ,
    RRF_POOL,
    RRF_TOP,
    rrf_fusion,
)


def test_rrf_output_shape_and_order(spark, sf_dir):
    rows = rrf_fusion(spark, sf_dir).collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) <= set(range(RRF_NQ))
    max_contrib = round(1.0 / (RRF_K + 1), 9)
    for q, lst in by_q.items():
        assert len(lst) <= RRF_TOP
        scores = [r["rrf_score"] for r in lst]
        assert scores == sorted(scores, reverse=True)
        for r in lst:
            # every fused doc came from at least one pool, ranks in range
            assert (1 <= r["dense_rank"] <= RRF_POOL) or (
                1 <= r["lex_rank"] <= RRF_POOL
            )
            assert r["rrf_score"] <= round(2 * max_contrib, 9) + 1e-12
            # contribution formula replayed exactly
            want = 0.0
            if r["dense_rank"]:
                want += round(1.0 / (RRF_K + r["dense_rank"]), 9)
            if r["lex_rank"]:
                want += round(1.0 / (RRF_K + r["lex_rank"]), 9)
            assert r["rrf_score"] == round(want, 9)

"""Behavioral invariants for the retrieval / curation operators
(bm25_doc_search, quality_classifier_score, bpe_pair_induction,
knn_pq_adc, cluster_balanced_curation) beyond hash parity: these pin
the SEMANTICS — ranking monotonicity, recall floors, budget algebra —
that a hash match alone can't explain to a reader.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kamiyo_hive_spark.catalog import table
from kamiyo_hive_spark.operators.corpus import CBC_K, cluster_balanced_curation
from kamiyo_hive_spark.operators.retrieval import (
    BM25_TERMS,
    BM25_TOP_N,
    bm25_doc_search,
    bpe_pair_induction,
    quality_classifier_score,
)
from kamiyo_hive_spark.operators.similarity import (
    PQ_TOP_K,
    cosine_topk,
    knn_pq_adc,
)


def test_bm25_returns_only_matching_docs_ranked(spark, sf_dir):
    rows = bm25_doc_search(spark, sf_dir).collect()
    assert 0 < len(rows) <= BM25_TOP_N
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    # every hit really contains at least one query term
    hit_ids = [r["doc_id"] for r in rows]
    docs = {
        r["doc_id"]: r["text"]
        for r in table(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isin(hit_ids))
        .collect()
    }
    for did in hit_ids:
        assert any(t in docs[did].split() for t in BM25_TERMS), did


def test_quality_classifier_counts_are_consistent(spark, sf_dir):
    rows = quality_classifier_score(spark, sf_dir).collect()
    n_total = sum(r["n_docs"] for r in rows)
    assert n_total == table(spark, sf_dir, "documents").count()
    for r in rows:
        assert 0 <= r["n_keep"] <= r["n_docs"]


def test_bpe_pairs_are_char_bigrams_ranked(spark, sf_dir):
    rows = bpe_pair_induction(spark, sf_dir).collect()
    assert rows
    counts = [r["n"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(len(r["pair"]) == 2 for r in rows)
    # the corpus vocabulary guarantees some pair appears many times
    assert counts[0] > counts[-1]


def test_pq_adc_recall_against_exact(spark, sf_dir):
    """PQ is lossy, but with 16 centroids per subspace on this corpus
    the ADC top-10 must still find a healthy share of the exact
    cosine top-10 (same floor discipline as the IVF audit)."""
    pq = {r["vec_id"] for r in knn_pq_adc(spark, sf_dir).collect()}
    exact = {r["vec_id"] for r in cosine_topk(spark, sf_dir).collect()}
    assert len(pq) == PQ_TOP_K
    assert len(pq & exact) >= 2


def test_pq_adc_distances_sorted_nonnegative(spark, sf_dir):
    rows = knn_pq_adc(spark, sf_dir).collect()
    dists = [r["adc_dist"] for r in rows]
    assert dists == sorted(dists)
    assert all(d >= 0 for d in dists)


def test_cluster_budget_algebra(spark, sf_dir):
    rows = cluster_balanced_curation(spark, sf_dir).collect()
    assert 0 < len(rows) <= CBC_K
    from kamiyo_hive_spark.catalog import table as _t

    n_vecs = _t(spark, sf_dir, "embeddings").count()
    assert sum(r["n_docs"] for r in rows) == n_vecs
    total = sum(r["total_chars"] for r in rows)
    budget = total / CBC_K
    for r in rows:
        assert 0 < r["keep_rate"] <= 1.0
        if r["total_chars"] <= budget:
            assert r["keep_rate"] == 1.0
        else:
            assert abs(r["keep_rate"] - budget / r["total_chars"]) < 1e-8


def test_rag_hybrid_topk_shape_and_bounds(spark, sf_dir):
    from kamiyo_hive_spark.operators.retrieval import (
        RAG_N_QUERIES,
        RAG_TOP_K,
        rag_hybrid_retrieval,
    )

    rows = rag_hybrid_retrieval(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(range(RAG_N_QUERIES))
    for qid, rs in by_q.items():
        assert len(rs) == RAG_TOP_K
        scores = [r["hybrid_score"] for r in rs]
        assert scores == sorted(scores, reverse=True)
        # hybrid of a cosine in [-1,1] and a jaccard in [0,1]
        assert all(-1.0 <= s <= 1.0 for s in scores)
        assert all(r["cand_id"] != qid for r in rs)


def test_rag_candidates_come_from_query_cell(spark, sf_dir):
    """Regression guard for the degenerate self-join (trivially-true
    cid == cid): every reranked candidate must share the query's
    centroid cell — a full-corpus rerank would eventually surface an
    out-of-cell candidate."""
    from pyspark.sql import functions as F

    from kamiyo_hive_spark.operators.corpus import CBC_K
    from kamiyo_hive_spark.operators.retrieval import (
        RAG_K_CLUSTERS,
        rag_hybrid_retrieval,
    )

    assert RAG_K_CLUSTERS == CBC_K
    from kamiyo_hive_spark.operators.similarity import assign_to_seed_centroids

    cell = {
        r["vec_id"]: r["cid"]
        for r in assign_to_seed_centroids(spark, sf_dir, RAG_K_CLUSTERS)
        .select("vec_id", "cid")
        .collect()
    }
    for r in rag_hybrid_retrieval(spark, sf_dir).collect():
        assert cell[r["cand_id"]] == cell[r["query_id"]], r

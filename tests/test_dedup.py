"""Behavioral tests for sketch-based dedup: plant true near-duplicates
and verify the pipelines find exactly them (the synthetic corpus has no
natural near-dups, so parity checks alone can't exercise recall)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kamiyo_hive_spark.operators.dedup import (
    minhash_lsh_candidates,
    minhash_signatures,
    simhash64,
    verify_jaccard,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the old oak tree "
    "as morning light spreads slowly across the quiet village square"
)


@pytest.fixture(scope="module")
def planted(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact duplicate
        (2, BASE.replace("morning", "evening")),  # near-dup, 1 word changed
        (3, "completely different content about databases and query engines "
            "with columnar execution vectorized operators and adaptive plans "
            "shuffling partitions across executors in a distributed cluster"),
        (4, BASE.replace("fox", "wolf").replace("dog", "hound")),  # near-dup, 2 words
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_lsh_finds_planted_neardups(planted):
    sigs = minhash_signatures(planted)
    cands = minhash_lsh_candidates(sigs)
    verified = verify_jaccard(planted, cands, 0.5)
    found = {(r.doc_a, r.doc_b) for r in verified.collect()}
    assert (0, 1) in found, "exact duplicate must be found"
    assert (0, 2) in found, "one-word-changed near-dup must be found"
    assert not any(3 in pair for pair in found), "unrelated doc must not pair"


def test_minhash_identical_docs_have_identical_signatures(planted):
    sigs = {r.doc_id: tuple(v for k, v in r.asDict().items() if k.startswith("sig_"))
            for r in minhash_signatures(planted).collect()}
    assert sigs[0] == sigs[1]
    assert sigs[0] != sigs[3]


def test_simhash_hamming_ordering(planted):
    h = {r.doc_id: r.simhash for r in simhash64(planted).collect()}

    def hamming(a: int, b: int) -> int:
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    assert hamming(h[0], h[1]) == 0, "identical docs -> identical simhash"
    assert hamming(h[0], h[2]) < hamming(h[0], h[3]), (
        "near-dup must be closer than unrelated doc"
    )


def test_lsh_candidates_superset_of_high_jaccard(spark, sf_dir):
    """Recall invariant on the real corpus: every pair with true
    Jaccard >= 0.9 must appear among LSH candidates."""
    from kamiyo_hive_spark.catalog import table
    from kamiyo_hive_spark.operators.dedup import shingle_sets

    docs = table(spark, sf_dir, "documents")
    sh = shingle_sets(docs)
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    true_pairs = (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("n_common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "j",
            F.col("n_common").cast("double")
            / (F.size("sh_a") + F.size("sh_b") - F.col("n_common")),
        )
        .filter(F.col("j") >= 0.9)
        .select("doc_a", "doc_b")
    )
    truth = {(r.doc_a, r.doc_b) for r in true_pairs.collect()}
    cands = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_candidates(minhash_signatures(docs)).collect()
    }
    assert truth <= cands


def test_connected_components_known_graph(spark):
    from kamiyo_hive_spark.operators.dedup import connected_components

    verts = spark.createDataFrame([(i,) for i in [1, 2, 3, 10, 11, 20]], "id long")
    # chain 1-2-3 (transitive closure needed), pair 10-11, singleton 20
    edges = spark.createDataFrame([(2, 3), (1, 2), (10, 11)], "src long, dst long")
    # both the size-gated local union-find (default: 3 edges is under
    # the threshold) and the distributed loop (threshold forced to 0)
    for thresh in (None, 0):
        kw = {} if thresh is None else {"local_edge_threshold": 0}
        got = {
            r.id: r.cluster_id
            for r in connected_components(verts, edges, **kw).collect()
        }
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}


def test_dup_clusters_canonical_invariants(spark, sf_dir):
    from kamiyo_hive_spark.operators.dedup import dup_clusters_canonical

    rows = dup_clusters_canonical(spark, sf_dir).collect()
    assert rows, "no docs clustered"
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        # exactly one canonical per cluster, and it is the min doc_id
        canon = [m for m in members if m.is_canonical]
        assert len(canon) == 1, cid
        assert canon[0].doc_id == min(m.doc_id for m in members) == cid
        assert all(m.cluster_size == len(members) for m in members)


def test_fuzzy_dedup_names_invariants(spark, sf_dir):
    from kamiyo_hive_spark.plans.registry import load_registry

    rows = load_registry()["fuzzy_dedup_names"].builder(spark, sf_dir).collect()
    assert rows, "fuzzy pair set must be non-vacuous"
    for r in rows:
        assert r.name_a < r.name_b
        assert 1 <= r.edit_dist <= 3
        # blocked on first token: candidates must share it
        assert r.name_a.split(" ")[0] == r.name_b.split(" ")[0]
        assert r.n_parts_a >= 1 and r.n_parts_b >= 1


def test_winnow_fingerprint_guarantee(spark):
    """The winnowing guarantee: two docs sharing a contiguous run of
    >= gram+window+1 = 6 tokens share at least one fingerprint; and the
    fingerprint columns are internally consistent."""
    import random

    from pyspark.sql import functions as F

    from kamiyo_hive_spark.operators.text import doc_winnow_fingerprints

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(50)]
    shared_runs = {}
    rows = []
    for pair in range(20):
        run = [rng.choice(vocab) for _ in range(rng.randint(6, 12))]
        shared_runs[pair] = run
        for side in (0, 1):
            filler = [rng.choice(vocab) for _ in range(rng.randint(5, 30))]
            tail = [rng.choice(vocab) for _ in range(rng.randint(5, 30))]
            rows.append((pair * 2 + side, " ".join(filler + run + tail)))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    import tempfile, os

    with tempfile.TemporaryDirectory() as tmp:
        # stage through parquet so the operator's own reader runs
        df.coalesce(1).write.parquet(os.path.join(tmp, "documents.parquet"))
        out = doc_winnow_fingerprints(spark, tmp).collect()

    assert len(out) == 40
    by_id = {r.doc_id: r for r in out}
    for r in out:
        assert r.n_fingerprints >= 1
        assert r.fp_min is not None and 0 <= r.fp_min < 2147483647
        assert 0 <= r.rolling_hash < 2147483647

    # independent python model of the same pipeline: recompute the
    # fingerprint SETS per doc to assert pairwise sharing
    fps = {}
    import hashlib

    def h28(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:7], 16)

    M = 2147483647
    for doc_id, text in rows:
        t = text.strip().split()
        th = [h28(x) for x in t]
        grams = [((th[i] * 131 + th[i + 1]) * 131 + th[i + 2]) % M
                 for i in range(len(th) - 2)]
        if len(grams) >= 4:
            sel = {min(grams[j:j + 4]) for j in range(len(grams) - 3)}
        else:
            sel = set(grams)
        fps[doc_id] = sel
        assert by_id[doc_id].n_fingerprints == len(sel)

    for pair in shared_runs:
        a, b = fps[pair * 2], fps[pair * 2 + 1]
        assert a & b, f"pair {pair} shares a >=6-token run but no fingerprint"


def test_int8_quantization_invariants(spark, sf_dir):
    from kamiyo_hive_spark.plans.registry import load_registry

    rows = load_registry()["embedding_int8_quantization"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -127 <= r.q_min <= r.q_max <= 127
        # max dequantization error bounded by half a quantization step;
        # cushion at the 9-decimal rounding granularity of both sides
        # (each can move up to 5e-10, so 1e-12 would be a latent flake)
        assert r.max_abs_err <= r.scale / 2 + 1e-9
        # 64-dim gaussian-ish vectors keep >0.99 cosine after int8
        assert r.cos_fidelity > 0.99


def test_semantic_dedup_non_vacuous(spark, sf_dir):
    from kamiyo_hive_spark.operators.similarity import (
        SEMDEDUP_K,
        semantic_dedup_embeddings,
    )

    rows = semantic_dedup_embeddings(spark, sf_dir).collect()
    assert len(rows) == SEMDEDUP_K
    assert sum(r.n_dups for r in rows) > 0          # threshold actually fires
    assert all(r.n_kept >= 1 for r in rows)          # never empties a cluster
    assert all(r.n_dups + r.n_kept == r.n_vecs for r in rows)


def test_incremental_bloom_matches_exact(spark, sf_dir):
    from kamiyo_hive_spark.operators.dedup import (
        incremental_dedup_bloom,
        incremental_dedup_new_docs,
    )

    exact = {
        r.source: (r.n_new, r.n_kept)
        for r in incremental_dedup_new_docs(spark, sf_dir).collect()
    }
    bloom = {
        r.source: (r.n_new, r.n_kept)
        for r in incremental_dedup_bloom(spark, sf_dir).collect()
    }
    assert bloom == exact  # bloom only over-selects; exact confirm fixes it
    assert any(kept < n for n, kept in bloom.values())  # dups actually exist


def test_bloom_prefilter_actually_prunes(spark, sf_dir):
    """Pruning effectiveness, not just result identity: the candidate
    set must contain every true match and stay close to it (FP rate is
    ~1% of history at 10 bits/key), far below the full history size."""
    from kamiyo_hive_spark.operators.dedup import (
        _incremental_frames,
        bloom_prefilter,
    )

    new, hist = _incremental_frames(spark, sf_dir)
    new_keys = new.select("fingerprint").distinct()
    n_hist = hist.count()
    true_matches = hist.join(new_keys, "fingerprint", "leftsemi").count()
    n_cand = bloom_prefilter(spark, new_keys, hist).count()
    assert n_cand >= true_matches            # never drops a true match
    assert n_cand <= true_matches + max(20, int(0.05 * n_hist))  # prunes
    assert n_cand < n_hist                   # not pass-everything


def test_largestar_cc_matches_minlabel_on_varied_topologies(spark):
    """Large-star/small-star CC (the deep-graph drop-in) must agree with
    the min-label loop on every topology edge: chains, cliques,
    singletons, hubs."""
    from kamiyo_hive_spark.operators.dedup import (
        connected_components,
        connected_components_largestar,
    )

    cases = [
        ([(i,) for i in range(12)], [(i, i + 1) for i in range(11)]),
        (
            [(i,) for i in range(8)],
            [(0, 1), (1, 2), (0, 2), (4, 5), (5, 6), (6, 7), (4, 7)],
        ),
        ([(i,) for i in range(5)], [(1, 2)]),
        ([(i,) for i in range(6)], [(5, i) for i in range(5)]),
    ]
    for vs, es in cases:
        v = spark.createDataFrame(vs, "id long")
        e = spark.createDataFrame(es, "src long, dst long")
        a = sorted(
            map(
                tuple,
                connected_components(
                    v, e, shuffle_partitions=4, local_edge_threshold=0
                ).collect(),
            )
        )
        b = sorted(
            map(
                tuple,
                connected_components_largestar(v, e, shuffle_partitions=4).collect(),
            )
        )
        # the size-gated local union-find must agree with both
        c = sorted(map(tuple, connected_components(v, e).collect()))
        assert a == b == c


def test_largestar_cc_handles_adversarially_deep_chain(spark):
    """The round-count advantage that justifies the second kernel: a
    600-node chain (diameter 599) resolves within large-star's default
    iteration budget (O(log² n) rounds), where min-label propagation
    would need ~300 two-hop rounds — far past the same budget."""
    from kamiyo_hive_spark.operators.dedup import connected_components_largestar

    n = 600
    v = spark.createDataFrame([(i,) for i in range(n)], "id long")
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    got = sorted(
        map(
            tuple,
            connected_components_largestar(v, e, shuffle_partitions=4).collect(),
        )
    )
    assert got == [(i, 0) for i in range(n)]

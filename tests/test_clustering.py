"""Fixed-point Lloyd k-means tests: the invariants the DuckDB hash
replay can't see — the centroid grid snap is the half-away-from-zero
nearest integer to the exact rational mean, the exact-integer state is
independent of how the data is partitioned, the assignment is a true
argmin, and the assignment step can never increase inertia under fixed
centroids (the Lloyd descent property that survives quantization).
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import functions as F

from kamiyo_hive_spark.operators.clustering import (
    KM_K,
    _assign,
    _quantized,
    _recompute,
    _round_mean,
    kmeans_lloyd_clusters,
)


def _seed_cents(q):
    return {
        r["vec_id"]: list(r["qv"])
        for r in q.filter(F.col("vec_id") < KM_K).collect()
    }


def test_round_mean_is_nearest_half_away():
    for s in range(-25, 26):
        for n in (1, 2, 3, 7):
            got = _round_mean(s, n)
            exact = Fraction(s, n)
            assert abs(Fraction(got) - exact) <= Fraction(1, 2)
            if abs(Fraction(got) - exact) == Fraction(1, 2):
                # tie → away from zero
                assert abs(got) > abs(exact)


def test_assignment_is_exact_argmin(spark, sf_dir):
    """Replay the argmin in pure Python ints for a sample of vectors:
    assigned cid must equal the argmin of Σ(q−c)² with lowest-cid
    tie-break."""
    q = _quantized(spark, sf_dir).filter(F.col("vec_id") < 60)
    crows, _ = _recompute(spark, _assign(q, _seed_cents(q)))
    qrows = {r["vec_id"]: r["qv"] for r in q.collect()}
    assigned = {
        r["vec_id"]: r["cid"]
        for r in _assign(q, crows).select("vec_id", "cid").collect()
    }
    for vid, qv in list(qrows.items())[:12]:
        best = min(
            (sum((x - y) ** 2 for x, y in zip(qv, cv)), cid)
            for cid, cv in crows.items()
        )
        assert assigned[vid] == best[1]


def test_assignment_step_never_increases_inertia(spark, sf_dir):
    """Under FIXED centroids, re-assignment is an argmin, so total
    inertia vs those centroids cannot exceed the inertia of any other
    assignment — checked against the previous round's assignment."""
    q = _quantized(spark, sf_dir)
    qrows = {r["vec_id"]: r["qv"] for r in q.collect()}

    def inertia(assign_map, crows):
        return sum(
            sum((x - y) ** 2 for x, y in zip(qrows[vid], crows[cid]))
            for vid, cid in assign_map.items()
        )

    a0 = _assign(q, _seed_cents(q))
    crows1, _ = _recompute(spark, a0)
    old = {r["vec_id"]: r["cid"] for r in a0.select("vec_id", "cid").collect()}
    new = {
        r["vec_id"]: r["cid"]
        for r in _assign(q, crows1).select("vec_id", "cid").collect()
    }
    # old assignment scored against the NEW centroids vs the argmin
    assert inertia(new, crows1) <= inertia(old, crows1)


def test_centroid_state_partition_invariant(spark, sf_dir):
    """The merged centroid state must be identical whether the corpus
    arrives as 1 partition or 13 — integer sums are order-free, so any
    difference means a float leaked into the reduction."""
    q1 = _quantized(spark, sf_dir).coalesce(1)
    q13 = _quantized(spark, sf_dir).repartition(13)
    c1, k1 = _recompute(spark, _assign(q1, _seed_cents(q1)))
    c13, k13 = _recompute(spark, _assign(q13, _seed_cents(q13)))
    assert k1 == k13  # full stats dicts: n, checksum, member span
    assert c1 == c13


def test_full_query_shape(spark, sf_dir):
    out = kmeans_lloyd_clusters(spark, sf_dir)
    rows = out.collect()
    assert 0 < len(rows) <= KM_K
    assert sum(r["n_vecs"] for r in rows) == _quantized(spark, sf_dir).count()
    for r in rows:
        assert r["min_member"] <= r["max_member"]
        assert r["centroid_checksum"] is not None


def test_literal_and_broadcast_argmin_agree(spark, sf_dir, monkeypatch):
    """The literal-expression fast path and the large-K broadcast
    fallback must be the same function (distance, tie-break)."""
    import kamiyo_hive_spark.operators.clustering as C

    q = C._quantized(spark, sf_dir).filter(F.col("vec_id") < 80)
    cents = _seed_cents(q)
    lit = {
        r["vec_id"]: r["cid"]
        for r in C._assign(q, cents).select("vec_id", "cid").collect()
    }
    monkeypatch.setattr(C, "LITERAL_ARGMIN_MAX_CELLS", 0)
    bc = {
        r["vec_id"]: r["cid"]
        for r in C._assign(q, cents).select("vec_id", "cid").collect()
    }
    assert lit == bc


def test_driver_seed_quantization_matches_engine(spark, sf_dir):
    """_quantize_driver is the pinned driver twin of _quantized's
    F.round path: the kmeans seeds are read and quantized driver-side,
    so any drift between the two rules would silently diverge the
    iteration-1 assignment from the oracle. Compare them element-wise
    on the real fixture rows (all K seed vectors)."""
    from pyspark.sql import functions as F

    from kamiyo_hive_spark.operators.clustering import (
        KM_K,
        _quantize_driver,
        _quantized,
    )
    from kamiyo_hive_spark.operators.similarity import query_vecs

    engine = {
        r["vec_id"]: list(r["qv"])
        for r in _quantized(spark, sf_dir).filter(F.col("vec_id") < KM_K).collect()
    }
    driver = {
        vid: [_quantize_driver(x) for x in vec]
        for vid, vec in query_vecs(sf_dir, KM_K)
    }
    assert driver.keys() == engine.keys() and len(driver) == KM_K
    for vid in driver:
        assert driver[vid] == engine[vid], f"seed {vid} quantization drifted"

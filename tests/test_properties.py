"""Property-based tests (hypothesis): engine invariants that must hold
for arbitrary inputs, not just the fixture corpus."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from kamiyo_hive_spark.operators.merkle import ZERO, verify_merkle_proof


# -- tier banding: the when-chain expander must agree with plain Python --

BANDS = [(0.0, "delinquent"), (2000.0, "bronze"), (5000.0, "silver"), (8000.0, "gold")]


def python_band(v: float) -> str:
    for threshold, label in BANDS:
        if v < threshold:
            return label
    return "platinum"


@settings(max_examples=30, deadline=None)
@given(st.lists(st.floats(-5000, 15000, allow_nan=False), min_size=1, max_size=30))
def test_tier_band_matches_python(spark_prop, values):
    import pyspark.sql.functions as F

    from kamiyo_hive_spark.operators.scalars import tier_band

    df = spark_prop.createDataFrame([(i, float(v)) for i, v in enumerate(values)], "i long, v double")
    got = {
        r.i: r.tier
        for r in df.select("i", tier_band(F.col("v"), BANDS, "platinum").alias("tier")).collect()
    }
    for i, v in enumerate(values):
        assert got[i] == python_band(v), (v, got[i])


# -- merkle: root is order-insensitive in input row order, and proofs
#    verify for every leaf --


@settings(max_examples=10, deadline=None)
@given(st.sets(st.integers(0, 1000), min_size=1, max_size=12))
def test_merkle_root_input_order_invariant(spark_prop, ids):
    from kamiyo_hive_spark.operators.merkle import merkle_root

    rows = [(i, f"v{i}") for i in ids]
    df1 = spark_prop.createDataFrame(rows, "id long, v string")
    df2 = spark_prop.createDataFrame(list(reversed(rows)), "id long, v string")
    assert (
        merkle_root(df1, "id", "v").collect()[0].root
        == merkle_root(df2, "id", "v").collect()[0].root
    )


# -- minhash: identical token multisets => identical signatures;
#    signature similarity approximates true jaccard --


@settings(max_examples=10, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_simhash_of_identical_texts_equal(spark_prop, seed):
    import random

    from kamiyo_hive_spark.operators.dedup import simhash64

    rng = random.Random(seed)
    words = [f"w{rng.randint(0, 50)}" for _ in range(30)]
    text = " ".join(words)
    df = spark_prop.createDataFrame([(0, text), (1, text)], "doc_id long, text string")
    h = {r.doc_id: r.simhash for r in simhash64(df).collect()}
    assert h[0] == h[1]


# -- decimal money discipline: sums are partition-order invariant and
#    equal exact Decimal arithmetic --


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.decimals(min_value=-99999, max_value=99999, places=2),
        min_size=1,
        max_size=50,
    )
)
def test_money_sum_is_exact_and_partition_invariant(spark_prop, amounts):
    from decimal import Decimal

    import pyspark.sql.functions as F

    from kamiyo_hive_spark.functions.money import dec

    rows = [(i, float(a)) for i, a in enumerate(amounts)]
    expected = float(sum(Decimal(str(a)) for a in amounts))
    for n_parts in (1, 7):
        df = spark_prop.createDataFrame(rows, "i long, v double").repartition(n_parts)
        got = df.agg(F.sum(dec("v")).cast("double").alias("s")).collect()[0].s
        assert got == expected, (n_parts, got, expected)


# -- connected components: distributed hash-to-min labels must equal a
#    pure-Python union-find on arbitrary graphs --


@settings(max_examples=10, deadline=None)
@given(
    st.integers(2, 25).flatmap(
        lambda n: st.tuples(
            st.just(n),
            st.lists(
                st.tuples(st.integers(0, n - 1), st.integers(0, n - 1)),
                max_size=40,
            ),
        )
    )
)
def test_connected_components_matches_union_find(spark_prop, graph):
    import pyspark.sql.functions as F

    from kamiyo_hive_spark.operators.dedup import connected_components

    n, edge_list = graph
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {x: find(x) for x in range(n)}
    # min-id labeling: canonical root of each set is its min member
    mins = {}
    for x in range(n):
        r = find(x)
        mins[r] = min(mins.get(r, x), x)
    expected = {x: mins[find(x)] for x in range(n)}

    vertices = spark_prop.createDataFrame([(i,) for i in range(n)], "id long")
    edges = spark_prop.createDataFrame(
        edge_list or [(0, 0)], "src long, dst long"
    )
    got = {
        r.id: r.cluster_id
        for r in connected_components(vertices, edges).collect()
    }
    assert got == expected


# -- as-of join: must agree with a pure-Python per-key scan for
#    arbitrary event interleavings (incl. same-instant ties) --


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 2),          # key
            st.integers(0, 50),         # left ts
        ),
        min_size=1,
        max_size=15,
    ),
    st.lists(
        st.tuples(
            st.integers(0, 2),          # key
            st.integers(0, 50),         # right ts
            st.integers(100, 999),      # payload
        ),
        min_size=0,
        max_size=15,
        unique_by=lambda t: (t[0], t[1]),  # one quote per (key, instant)
    ),
)
def test_asof_join_matches_python(spark_prop, lefts, rights):
    from kamiyo_hive_spark.operators.asof import asof_join

    def py_asof(k, ts):
        best = None
        for rk, rts, payload in rights:
            if rk == k and rts <= ts and (best is None or rts > best[0]):
                best = (rts, payload)
        return best[1] if best else None

    left = spark_prop.createDataFrame(
        [(k, ts, i) for i, (k, ts) in enumerate(lefts)], "k long, lts long, rowid long"
    )
    right = spark_prop.createDataFrame(
        rights or [(99, 0, 0)], "k long, rts long, payload long"
    )
    out = asof_join(
        left, right, key="k", left_ts="lts", right_ts="rts", right_payload=["payload"]
    )
    got = {r.rowid: r.asof_payload for r in out.collect()}
    for i, (k, ts) in enumerate(lefts):
        assert got[i] == py_asof(k, ts), (k, ts, got[i])


def test_results_invariant_to_shuffle_width(spark, sf_dir):
    """The determinism contract: results are independent of the
    partition layout. Decimal-exact aggregates, integer fixed-point
    PageRank mass, and md5-derived fingerprints must collect the
    identical rows whether the session shuffles 3 ways or 32."""
    from kamiyo_hive_spark.plans.registry import load_registry

    reg = load_registry()
    names = [
        "pricing_summary",
        "weighted_sum",
        "doc_winnow_fingerprints",
        "pagerank_fixed_point",
        "knn_bruteforce_cosine",
        # round-3 families: decimal-fold retrieval scores, integer
        # classifier sums, PQ codes from a staged index, and the
        # layout ops whose physical re-partitioning must never leak
        # into results
        "bm25_doc_search",
        "quality_classifier_score",
        "knn_pq_adc",
        "rag_hybrid_retrieval",
        "zorder_layout_scan",
        "targeted_delete_rewrite",
        "dq_expectations",
    ]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    results = {}
    try:
        for width in ("3", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", width)
            for n in names:
                # sorted(): row ORDER legitimately varies with partition
                # layout now that non-top-K queries carry no terminal
                # sort (the driver hash is order-insensitive); the
                # invariant is the row SET, value-exact.
                rows = sorted(
                    tuple(r) for r in reg[n].builder(spark, sf_dir).collect()
                )
                results.setdefault(n, []).append(rows)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    for n, (narrow, wide) in results.items():
        assert narrow == wide, f"{n}: results differ across shuffle widths"


def test_global_sorted_index_null_keys(spark):
    """NULL lead-sort values must not crash the shard-offset pass; they
    rank first (Spark's nulls-first ascending order, shard 0)."""
    from kamiyo_hive_spark.functions.ranks import global_sorted_index_counted

    df = spark.createDataFrame(
        [(None, "a"), (5, "b"), (None, "c"), (1, "d"), (9, "e")],
        "k int, v string",
    )
    indexed, n = global_sorted_index_counted(df, "k", "v", num_shards=3)
    assert n == 5
    rows = {r["v"]: r["idx"] for r in indexed.collect()}
    assert sorted(rows.values()) == [0, 1, 2, 3, 4]
    assert {rows["a"], rows["c"]} == {0, 1}          # nulls first
    assert rows["d"] == 2 and rows["b"] == 3 and rows["e"] == 4


# -- txlog protocol: random op sequences must match a set model --------


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.tuples(st.just("append"), st.integers(1, 3)),
            st.tuples(st.just("rewrite"), st.integers(0, 2)),
        ),
        min_size=1,
        max_size=30,
    ),
    st.randoms(use_true_random=False),
)
def test_txlog_snapshots_match_set_model(tmp_path_factory, ops, rng):
    """Model-based protocol check: an arbitrary interleaving of appends
    and rewrites (crossing checkpoint boundaries) must reproduce a
    plain python set model at EVERY historical version — checkpoints,
    the _last_checkpoint pointer, and replay may never change what a
    snapshot contains."""
    import os as _os

    from kamiyo_hive_spark.sources.txlog import TxLog

    root = str(tmp_path_factory.mktemp("txlog_model"))
    log = TxLog.init(root)
    model: list[set] = []  # live file set at each version
    live: set = set()
    counter = [0]

    def touch() -> str:
        counter[0] += 1
        rel = f"data/f{counter[0]}/p.parquet"
        path = _os.path.join(root, rel)
        _os.makedirs(_os.path.dirname(path), exist_ok=True)
        open(path, "wb").write(b"x")
        return rel

    for kind, n in ops:
        if kind == "append":
            adds = [touch() for _ in range(n)]
            log.commit("append", adds, read_version=log.version())
            live |= set(adds)
        else:
            removes = sorted(rng.sample(sorted(live), min(n, len(live))))
            adds = [touch()] if n and removes else []
            log.commit(
                "rewrite", adds, removes=removes, read_version=log.version()
            )
            live -= set(removes)
            live |= set(adds)
        model.append(set(live))

    assert log.version() == len(model) - 1
    for v, want in enumerate(model):
        assert set(log.snapshot_files(v)) == want, f"version {v} diverged"

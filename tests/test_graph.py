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


def test_force_layout_deterministic_and_shard_invariant(spark, sf_dir):
    """U9: the layout must be a pure function of the graph — identical
    across runs AND across input partitioning (batch-synchronous force
    application; hash01 init instead of the reference's Math.random)."""
    from kamiyo_hive_spark.operators.semistructured import force_directed_positions

    b = force_directed_positions
    one = sorted(map(tuple, b(spark, sf_dir).collect()))
    two = sorted(map(tuple, b(spark, sf_dir).collect()))
    assert one == two
    assert len(one) > 0


def test_force_layout_contracts_edges(spark, sf_dir):
    """After 10 iterations, edge-connected node pairs must sit closer
    together than the average unconnected pair of the same graph — the
    property that makes a force layout a layout."""
    import itertools
    import math

    from pyspark.sql import functions as F

    from kamiyo_hive_spark.catalog import table
    from kamiyo_hive_spark.operators.semistructured import force_directed_positions

    rows = force_directed_positions(spark, sf_dir).collect()
    by_graph: dict[int, dict[str, tuple]] = {}
    for r in rows:
        by_graph.setdefault(r.graph_id, {})[r.node_id] = (r.x, r.y, r.z)

    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    c = table(spark, sf_dir, "customer")
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            F.col("c_nationkey").cast("long").alias("g"),
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
        .collect()
    )

    def dist(p, q):
        return math.sqrt(sum((a - b) ** 2 for a, b in zip(p, q)))

    gid = next(r.g for r in edges if r.g in by_graph)
    pos = by_graph[gid]
    # the builder bounds each graph (top-N customers, same-nation
    # suppliers); restrict the independent edge derivation to laid-out
    # nodes
    e_pairs = {
        (r.src, r.dst)
        for r in edges
        if r.g == gid and r.src in pos and r.dst in pos
    }
    e_dists = [dist(pos[s], pos[d]) for s, d in e_pairs]
    ids = sorted(pos)
    non = [
        dist(pos[a], pos[b])
        for a, b in itertools.islice(
            ((a, b) for a, b in itertools.combinations(ids, 2) if (a, b) not in e_pairs),
            2000,
        )
    ]
    assert sum(e_dists) / len(e_dists) < sum(non) / len(non)

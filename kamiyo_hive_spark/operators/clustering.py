"""Distributed iterative clustering (fixed-point Lloyd's k-means).

Reference semantics: the reference clusters embeddings once, offline,
and serves the assignment (`packages/hive-sdk` consumes precomputed
cluster/centroid tables); the engine-side requirement is the TRAINING
loop itself — the canonical iterative-refinement workload every
100 TB curation stack runs (SemDeDup, DoReMi-style domain discovery,
IVF coarse-quantizer training all start from it).

Determinism discipline — why this replays bit-for-bit on two engines:
floating-point k-means is not portable (per-dimension mean = a float
sum whose value depends on addition order, which a shuffle does not
fix). Here NO float ever enters the loop:

- inputs are quantized ONCE to integer micro-units q_d = round(x·1e6);
- a centroid is its members' per-dimension integer-mean snapped back
  onto the SAME grid with symmetric half-away-from-zero integer
  rounding,  c_d = sign(s_d) · (2·|s_d| + n) // (2·n)  (pure integer —
  no engine-dependent float division or round() in the update);
- distances are then plain Σ(q_d − c_d)² over int64 (≤ 64·(4e6)² ≈
  1e15, comfortably in range), exact on a COMMON scale for every
  centroid, so the argmin (lowest-cid tie-break) is engine-independent.

Note the earlier design that carried (sums, n) and compared
n²-scaled distances was WRONG across centroids with different n —
n²·d(q,c) is not monotone in d when n varies. Snapping the mean to
the fixed grid restores a single common scale (and is the standard
fixed-point formulation; the ≤½-micro-unit centroid perturbation is
the explicit, documented quantization of the algorithm, applied
identically by both engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kamiyo_hive_spark.catalog import table
from kamiyo_hive_spark.plans.registry import register

KM_K = 8  # deterministic seeds: vec_id 0..K-1
KM_ITERS = 2  # assignment rounds (each followed by a recompute)
KM_SCALE = 1_000_000  # micro-unit quantization of the float input


def _quantize_driver(x: float) -> int:
    """Driver-side twin of _quantized's per-element rule
    `F.round(x * KM_SCALE).cast("long")`. Spark ROUND on doubles goes
    through BigDecimal.valueOf (the shortest-repr Double.toString
    decimal) HALF_UP, while Decimal(float) is the exact binary value —
    the two decimals differ, but at scale 0 they agree: the shortest
    repr round-trips to the same double, and no representable double's
    shortest repr can sit on the opposite side of a representable
    half-integer from its exact expansion, so to_integral_value
    (HALF_UP) matches bit-for-bit. The equivalence is scale-0-specific
    — re-derive it if KM_SCALE rounding ever moves to fractional scale.
    (Python's builtin round() is banker's and would NOT match.) Pinned
    against the engine path by tests/test_clustering.py; keep the two
    in lockstep if KM_SCALE or the rounding rule ever changes."""
    from decimal import ROUND_HALF_UP, Decimal

    return int(Decimal(x * KM_SCALE).to_integral_value(rounding=ROUND_HALF_UP))


def _quantized_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, qv array<long>): embeddings in integer micro-units —
    the defining expression, used only to BUILD the staged relation."""
    e = table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.round(x * KM_SCALE).cast("long"),
        ).alias("qv"),
    )


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The micro-unit relation as a fingerprint-cached staged parquet
    (same rationale as `similarity.normalized_embeddings`, r8): the
    quantize transform is a higher-order expression that CollapseProject
    re-inlines into every consumer — each k-means round and every PQ
    subspace re-quantized the corpus. Longs round-trip parquet exactly,
    so the staged values are the engine-computed ones bit-for-bit."""
    import os

    from kamiyo_hive_spark.operators.similarity import _staged_index_df
    from kamiyo_hive_spark.sources.sinks import SCRATCH, ensure_staging

    out = f"{SCRATCH}/embeddings_q_{os.path.basename(sf_dir)}"
    source = os.path.join(sf_dir, "embeddings.parquet")
    d = ensure_staging(
        out,
        source,
        # natural width ON PURPOSE (no repartition): the k-means argmin
        # and PQ subspace maps are ~0.5k ops/row — forcing one file per
        # core costs more in task scheduling than the parallelism buys
        # (A/B r8: 1.10 s vs 1.38 s kmeans at sf0.1, where the input is
        # one split); at warehouse scale the scan's natural splits keep
        # both the build and the readers parallel.
        lambda tmp: _quantized_expr(spark, sf_dir)
        .write.mode("overwrite")
        .parquet(tmp),
    )
    return _staged_index_df(spark, d)


def _sqdist(a: Column, b: Column) -> Column:
    """Exact integer squared L2 distance (sequential long fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _round_mean(s: int, n: int) -> int:
    """Half-away-from-zero integer mean — the centroid grid snap."""
    m = (2 * abs(s) + n) // (2 * n)
    return -m if s < 0 else m


LITERAL_ARGMIN_MAX_CELLS = 4096  # K·D bound for the expression path


def _assign(q: DataFrame, cents: dict[int, list[int]]) -> DataFrame:
    """One Lloyd assignment round: argmin of the exact integer distance
    with lowest-cid tie-break.

    Small K·D (the common case — centroid state is driver metadata by
    construction): the K centroids are inlined as ONE SQL expression —
    K zip_with/aggregate folds plus a least()+CASE argmin — so the
    assignment is a pure map over the scan with NO join and NO
    shuffle (A/B at sf0.1, same session: 0.64-0.85 s crossJoin+argmin
    → 0.37-0.43 s literal, identical assignments; built as one
    F.expr-style string per the one-py4j-round-trip rule). The CASE
    scans cids in ascending order, so exact-tie distances resolve to
    the lowest cid — the same tie-break as the struct-min.

    Large K·D: fall back to broadcasting a centroid relation and
    reducing per vec_id (a 1024-centroid coarse quantizer would put
    64k literals in the plan — that's what broke the r3 HOF
    experiment; the gate keeps the expression analyzer-sized)."""
    cids = sorted(cents)
    if len(cids) * len(next(iter(cents.values()))) <= LITERAL_ARGMIN_MAX_CELLS:
        d_parts = []
        for cid in cids:
            arr = "array(" + ",".join(f"{v}L" for v in cents[cid]) + ")"
            d_parts.append(
                f"aggregate(zip_with(qv, {arr}, (x,y)->(x-y)*(x-y)), "
                f"0L, (a,x)->a+x) AS d{cid}"
            )
        scored = q.selectExpr("vec_id", "qv", *d_parts)
        m = "least(" + ",".join(f"d{c}" for c in cids) + ")"
        case = (
            "CASE "
            + " ".join(f"WHEN d{c} = _m THEN {c}L" for c in cids)
            + " END"
        )
        return scored.withColumn("_m", F.expr(m)).selectExpr(
            "vec_id", "qv", f"{case} AS cid"
        )
    spark = q.sparkSession
    cdf = spark.createDataFrame(
        [(c, cents[c]) for c in cids], "cid long, cv array<long>"
    )
    return (
        q.crossJoin(F.broadcast(cdf))
        .select("vec_id", "qv", "cid", _sqdist(F.col("qv"), F.col("cv")).alias("dist"))
        .groupBy("vec_id")
        .agg(
            F.min(F.struct(F.col("dist"), F.col("cid"))).alias("best"),
            F.first("qv").alias("qv"),
        )
        .select("vec_id", "qv", F.col("best.cid").alias("cid"))
    )


def _recompute(spark: SparkSession, assigned: DataFrame) -> tuple[DataFrame, dict]:
    """New centroids: per-(cluster, dimension) integer sums + member
    counts, snapped to the micro-unit grid. posexplode fans each vector
    to D (cid, pos, val) rows, but partial aggregation collapses every
    task to ≤ K·D cells before the exchange — the shuffle moves KBs at
    any corpus size. The K·D merged state is bounded metadata: collect
    it and hand the next round a literal broadcast frame (exactly the
    O(K·D)-per-round centroid round-trip an MLlib/parameter-server run
    does — never O(N)).

    ONE job per round: every per-cluster statistic the report needs
    rides the same (cid, pos) cells — each member contributes one row
    per dimension, so a cell's count IS the cluster size and its
    min/max vec_id ARE the cluster's member-id span. Returns
    ({cid: snapped centroid}, {cid: {n, checksum, mn, mx}})."""
    sums = (
        assigned.select("cid", "vec_id", F.posexplode("qv").alias("pos", "val"))
        .groupBy("cid", "pos")
        .agg(
            F.sum("val").alias("s"),
            F.count("*").alias("n"),
            F.min("vec_id").alias("mn"),
            F.max("vec_id").alias("mx"),
        )
        .collect()
    )
    by_cid: dict[int, dict[int, int]] = {}
    stats: dict[int, dict[str, int]] = {}
    for r in sums:
        by_cid.setdefault(r["cid"], {})[r["pos"]] = r["s"]
        stats[r["cid"]] = {"n": r["n"], "mn": r["mn"], "mx": r["mx"]}
    for cid, dims in by_cid.items():
        stats[cid]["checksum"] = sum(dims.values())
    cents = {
        cid: [_round_mean(dims[p], stats[cid]["n"]) for p in sorted(dims)]
        for cid, dims in by_cid.items()
    }
    return cents, stats


_KM_DIST = """list_reduce(list_transform(list_zip(q.qv, c.cv),
                                          p -> (p[1] - p[2]) * (p[1] - p[2])),
                           (a, b) -> a + b)"""

_KM_ROUND = (
    "SELECT d.cid, d.pos, CASE WHEN d.s < 0 "
    "THEN -((2 * (-d.s) + n.n) // (2 * n.n)) "
    "ELSE (2 * d.s + n.n) // (2 * n.n) END AS cval, d.s"
)


@register(
    "kmeans_lloyd_clusters",
    oracle=f"""
    WITH q AS (
        SELECT vec_id,
               list_transform(embedding,
                              x -> CAST(round(CAST(x AS DOUBLE) * {KM_SCALE}) AS BIGINT)) AS qv
        FROM embeddings
    ),
    cents0 AS (SELECT vec_id AS cid, qv AS cv FROM q WHERE vec_id < {KM_K}),
    assigned0 AS (
        SELECT vec_id, cid FROM (
            SELECT q.vec_id, c.cid,
                   row_number() OVER (PARTITION BY q.vec_id
                                      ORDER BY {_KM_DIST}, c.cid) AS rn
            FROM q, cents0 c)
        WHERE rn = 1
    ),
    dims1 AS (
        SELECT a.cid, u.pos, SUM(u.val) AS s
        FROM assigned0 a
        JOIN (SELECT vec_id, unnest(qv) AS val,
                     generate_subscripts(qv, 1) AS pos FROM q) u USING (vec_id)
        GROUP BY 1, 2
    ),
    n1 AS (SELECT cid, COUNT(*) AS n FROM assigned0 GROUP BY 1),
    cv1 AS ({_KM_ROUND} FROM dims1 d JOIN n1 n USING (cid)),
    cents1 AS (
        SELECT cid, list(cval ORDER BY pos) AS cv FROM cv1 GROUP BY cid
    ),
    assigned1 AS (
        SELECT vec_id, cid FROM (
            SELECT q.vec_id, c.cid,
                   row_number() OVER (PARTITION BY q.vec_id
                                      ORDER BY {_KM_DIST}, c.cid) AS rn
            FROM q, cents1 c)
        WHERE rn = 1
    ),
    dims2 AS (
        SELECT a.cid, u.pos, SUM(u.val) AS s
        FROM assigned1 a
        JOIN (SELECT vec_id, unnest(qv) AS val,
                     generate_subscripts(qv, 1) AS pos FROM q) u USING (vec_id)
        GROUP BY 1, 2
    ),
    n2 AS (SELECT cid, COUNT(*) AS n FROM assigned1 GROUP BY 1)
    SELECT d.cid AS cluster_id,
           CAST(any_value(n.n) AS BIGINT) AS n_vecs,
           CAST(SUM(d.s) AS BIGINT) AS centroid_checksum,
           CAST(any_value(m.mn) AS BIGINT) AS min_member,
           CAST(any_value(m.mx) AS BIGINT) AS max_member
    FROM dims2 d
    JOIN n2 n USING (cid)
    JOIN (SELECT cid, MIN(vec_id) AS mn, MAX(vec_id) AS mx
          FROM assigned1 GROUP BY 1) m USING (cid)
    GROUP BY d.cid
    ORDER BY cluster_id
    """,
    tags=("clustering", "kmeans", "iterative", "embedding"),
)
def kmeans_lloyd_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means over the embedding corpus: K=8 deterministic
    seeds (vec_id < K), two full assign→recompute rounds, reported as
    per-cluster sizes, member-id span, and the exact integer
    centroid-sum checksum (a single drifted vector changes it).

    Scale posture: ONE Spark job per round — the assignment (the K
    centroids inlined as one literal argmin expression: a pure map, no
    join, no shuffle; broadcast fallback above the K·D literal gate)
    flows straight into the recompute, whose posexplode collapses to
    ≤ K·D cells per task under partial aggregation, so the per-round
    exchange is KB-scale regardless of N. The K·D merged
    centroid state is bounded metadata collected to the driver, and
    because every reported statistic (size, member-id span, checksum)
    rides those same cells, the final report IS that metadata — two
    jobs total for two rounds, no third pass over the corpus. Fixed
    iteration count keeps the plan static (no data-dependent
    convergence test mid-query; a production loop adds the
    observe()-based movement check the CC operator uses).

    Why it hash-matches DuckDB: see the module docstring — quantized
    integer input, grid-snapped integer centroids, plain Σ(q−c)² long
    distances, lowest-cid tie-break. The oracle replays BOTH rounds
    end-to-end, so a missed iteration, a float sneaking into the mean,
    or a tie broken by hash order hash-fails."""
    q = _quantized(spark, sf_dir)
    # seeds: K rows of request-scale metadata — read driver-side
    # (similarity.query_vecs) instead of paying a whole Spark job, and
    # quantized by _quantize_driver, the pinned driver twin of
    # _quantized's F.round path (tests/test_clustering.py compares the
    # two on the real fixture rows).
    from kamiyo_hive_spark.operators.similarity import query_vecs

    cents = {
        vid: [_quantize_driver(x) for x in vec]
        for vid, vec in query_vecs(sf_dir, KM_K)
    }
    stats: dict = {}
    for _ in range(KM_ITERS):
        cents, stats = _recompute(spark, _assign(q, cents))
    rows = [
        (cid, s["n"], s["checksum"], s["mn"], s["mx"])
        for cid, s in sorted(stats.items())
    ]
    return spark.createDataFrame(
        rows,
        "cluster_id long, n_vecs long, centroid_checksum long, "
        "min_member long, max_member long",
    )
    # (r8 negative A/B, recorded in BENCH_NOTES: folding both rounds
    # into ONE action — round-2 centroids pivoted to a broadcast
    # array<struct(cid, cv)> and the assignment done as an
    # array_min-over-HOF fold — measured 1.35 s vs 0.87 s for this
    # two-job shape at sf0.1. The fold is the interpreted-HOF slow
    # path the literal CASE argmin exists to avoid; the saved driver
    # round-trip did not pay for it. The oracle-identical variant is
    # preserved in git history.)


# ---------------------------------------------------------------------------
# Product-quantization codebook training (per-subspace Lloyd)
# ---------------------------------------------------------------------------

PQ_M = 8  # subspaces (64-dim embeddings -> 8 dims each)
PQ_K = 16  # centroids per subspace (one nibble per code)
PQ_ITERS = 2  # assign -> recompute rounds

_PQ_DIST = """list_reduce(list_transform(list_zip(q.qsub, c.cv),
                                          p -> (p[1] - p[2]) * (p[1] - p[2])),
                           (a, b) -> a + b)"""

_PQ_ROUND = (
    "SELECT d.sub, d.cid, d.pos, CASE WHEN d.s < 0 "
    "THEN -((2 * (-d.s) + n.n) // (2 * n.n)) "
    "ELSE (2 * d.s + n.n) // (2 * n.n) END AS cval, d.s"
)


def _pq_subvectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, sub, qsub): each quantized embedding split into PQ_M
    contiguous integer sub-vectors (the PQ decomposition)."""
    sub_dim = 64 // PQ_M
    q = _quantized(spark, sf_dir)
    return q.select(
        "vec_id",
        "qv",
        F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("sub"),
    ).select(
        "vec_id",
        "sub",
        F.slice(F.col("qv"), F.col("sub") * sub_dim + 1, sub_dim).alias("qsub"),
    )


def _pq_assign(q: DataFrame, cents: dict[tuple[int, int], list[int]]) -> DataFrame:
    """One PQ assignment round: per (vector, subspace), the nearest of
    that subspace's PQ_K centroids (exact integer distance, lowest-cid
    tie-break).

    Small M·K·sub_dim (the trained-codebook case — PQ codebooks are
    driver metadata by construction): the whole codebook inlines as ONE
    nested literal array indexed by `sub`, the per-row distances come
    from a single transform+aggregate HOF over it, and the argmin is
    array_position(dists, array_min(dists)) — FIRST match, i.e. the
    lowest ascending-ordered cid, the same tie-break as the struct-min.
    That makes assignment a pure map over the scan (no join, NO
    groupBy exchange; interleaved warm A/B at sf0.1, 4 reps each:
    broadcast 2.34 best / 2.92 med → literal 1.32 / 1.80 for the
    2-round query). Unlike the rejected mega-
    expression experiments (maxsim literal codegen, r3 HOF argmax),
    the 1024 longs sit inside ONE literal array with ONE lambda — the
    analyzer sees ~K·M array literals, not K·M copies of a computed
    subtree.

    Large codebooks: broadcast the centroid relation and reduce per
    (vec_id, sub) — the argmin partial-aggregates before its exchange."""
    cells = sum(len(v) for v in cents.values())
    subs = sorted({s for s, _ in cents})
    if cells <= LITERAL_ARGMIN_MAX_CELLS and subs == list(range(len(subs))):
        per_sub_cids = {
            s: sorted(c for s2, c in cents if s2 == s) for s in subs
        }
        cents_sql = "array(" + ",".join(
            "array("
            + ",".join(
                "array(" + ",".join(f"{x}L" for x in cents[(s, c)]) + ")"
                for c in per_sub_cids[s]
            )
            + ")"
            for s in subs
        ) + ")"
        cids_sql = "array(" + ",".join(
            "array(" + ",".join(f"{c}L" for c in per_sub_cids[s]) + ")"
            for s in subs
        ) + ")"
        dists = (
            f"transform(element_at({cents_sql}, sub + 1), "
            "cv -> aggregate(zip_with(qsub, cv, (x, y) -> (x - y) * (x - y)), "
            "0L, (a, x) -> a + x))"
        )
        pick = (
            f"element_at(element_at({cids_sql}, sub + 1), "
            "CAST(array_position(_pqd, array_min(_pqd)) AS INT))"
        )
        return q.selectExpr("vec_id", "sub", "qsub", f"{dists} AS _pqd").selectExpr(
            "vec_id", "sub", "qsub", f"{pick} AS cid"
        )
    spark = q.sparkSession
    cdf = spark.createDataFrame(
        [(s, c, v) for (s, c), v in sorted(cents.items())],
        "sub int, cid long, cv array<long>",
    )
    return (
        q.join(F.broadcast(cdf), "sub")
        .select(
            "vec_id",
            "sub",
            "qsub",
            "cid",
            _sqdist(F.col("qsub"), F.col("cv")).alias("dist"),
        )
        .groupBy("vec_id", "sub")
        .agg(
            F.min(F.struct(F.col("dist"), F.col("cid"))).alias("best"),
            F.first("qsub").alias("qsub"),
        )
        .select("vec_id", "sub", "qsub", F.col("best.cid").alias("cid"))
    )


def _pq_recompute(assigned: DataFrame) -> tuple[dict, dict]:
    """New per-subspace centroids + per-cell stats, one job: posexplode
    fans each sub-vector to (sub, cid, pos) cells; partial aggregation
    caps the exchange at M*K*sub_dim cells (8*16*8 = 1024 longs of
    driver metadata at ANY corpus size)."""
    rows = (
        assigned.select("sub", "cid", "vec_id", F.posexplode("qsub").alias("pos", "val"))
        .groupBy("sub", "cid", "pos")
        .agg(
            F.sum("val").alias("s"),
            F.count("*").alias("n"),
            F.min("vec_id").alias("mn"),
            F.max("vec_id").alias("mx"),
        )
        .collect()
    )
    by_key: dict[tuple[int, int], dict[int, int]] = {}
    stats: dict[tuple[int, int], dict[str, int]] = {}
    for r in rows:
        by_key.setdefault((r["sub"], r["cid"]), {})[r["pos"]] = r["s"]
        stats[(r["sub"], r["cid"])] = {"n": r["n"], "mn": r["mn"], "mx": r["mx"]}
    for key, dims in by_key.items():
        stats[key]["checksum"] = sum(dims.values())
    cents = {
        key: [_round_mean(dims[p], stats[key]["n"]) for p in sorted(dims)]
        for key, dims in by_key.items()
    }
    return cents, stats


@register(
    "pq_train_codebooks",
    oracle=f"""
    WITH qv AS (
        SELECT vec_id,
               list_transform(embedding,
                              x -> CAST(round(CAST(x AS DOUBLE) * {KM_SCALE}) AS BIGINT)) AS qv
        FROM embeddings
    ),
    q AS (
        SELECT vec_id, s.sub AS sub,
               list_slice(qv, s.sub * 8 + 1, s.sub * 8 + 8) AS qsub
        FROM qv CROSS JOIN (SELECT unnest(range({PQ_M})) AS sub) s
    ),
    cents0 AS (SELECT sub, vec_id AS cid, qsub AS cv FROM q WHERE vec_id < {PQ_K}),
    assigned0 AS (
        SELECT vec_id, sub, cid FROM (
            SELECT q.vec_id, q.sub, c.cid,
                   row_number() OVER (PARTITION BY q.vec_id, q.sub
                                      ORDER BY {_PQ_DIST}, c.cid) AS rn
            FROM q JOIN cents0 c ON c.sub = q.sub)
        WHERE rn = 1
    ),
    u AS (
        SELECT vec_id, sub, unnest(qsub) AS val,
               generate_subscripts(qsub, 1) AS pos
        FROM q
    ),
    dims1 AS (
        SELECT a.sub, a.cid, u.pos, SUM(u.val) AS s
        FROM assigned0 a
        JOIN u ON u.vec_id = a.vec_id AND u.sub = a.sub
        GROUP BY 1, 2, 3
    ),
    n1 AS (SELECT sub, cid, COUNT(*) AS n FROM assigned0 GROUP BY 1, 2),
    cv1 AS ({_PQ_ROUND} FROM dims1 d
            JOIN n1 n ON n.sub = d.sub AND n.cid = d.cid),
    cents1 AS (
        SELECT sub, cid, list(cval ORDER BY pos) AS cv FROM cv1 GROUP BY 1, 2
    ),
    assigned1 AS (
        SELECT vec_id, sub, cid FROM (
            SELECT q.vec_id, q.sub, c.cid,
                   row_number() OVER (PARTITION BY q.vec_id, q.sub
                                      ORDER BY {_PQ_DIST}, c.cid) AS rn
            FROM q JOIN cents1 c ON c.sub = q.sub)
        WHERE rn = 1
    ),
    dims2 AS (
        SELECT a.sub, a.cid, u.pos, SUM(u.val) AS s
        FROM assigned1 a
        JOIN u ON u.vec_id = a.vec_id AND u.sub = a.sub
        GROUP BY 1, 2, 3
    ),
    n2 AS (SELECT sub, cid, COUNT(*) AS n FROM assigned1 GROUP BY 1, 2),
    m2 AS (SELECT sub, cid, MIN(vec_id) AS mn, MAX(vec_id) AS mx
           FROM assigned1 GROUP BY 1, 2)
    SELECT CAST(d.sub AS BIGINT) AS sub_id,
           CAST(d.cid AS BIGINT) AS cluster_id,
           CAST(any_value(n.n) AS BIGINT) AS n_vecs,
           CAST(SUM(d.s) AS BIGINT) AS centroid_checksum,
           CAST(any_value(m.mn) AS BIGINT) AS min_member,
           CAST(any_value(m.mx) AS BIGINT) AS max_member
    FROM dims2 d
    JOIN n2 n ON n.sub = d.sub AND n.cid = d.cid
    JOIN m2 m ON m.sub = d.sub AND m.cid = d.cid
    GROUP BY d.sub, d.cid
    ORDER BY sub_id, cluster_id
    """,
    tags=("clustering", "pq", "ann", "iterative", "embedding", "training-pipeline"),
)
def pq_train_codebooks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codebook TRAINING — the step `knn_pq_adc`
    consumes precomputed: each 64-dim embedding splits into PQ_M=8
    contiguous 8-dim sub-vectors, and every subspace trains its own
    PQ_K=16-centroid Lloyd quantizer (2 assign->recompute rounds,
    deterministic seeds vec_id < K). Reported per (subspace, centroid):
    size, member-id span, exact integer centroid-sum checksum.

    Same fixed-point discipline as `kmeans_lloyd_clusters` (module
    docstring): micro-unit integer grid, half-away-from-zero integer
    mean snap, plain long-sum distances, lowest-cid tie-break — so the
    oracle replays BOTH rounds of all 8 subspaces bit-for-bit.

    Scale shape: the PQ decomposition is ONE explode (M rows per
    vector, map-side); each round is ONE job — a broadcast join
    against the M*K=128-row centroid relation (driver metadata by
    construction, like every parameter-server PQ trainer) whose argmin
    and posexplode recompute both partial-aggregate before their
    exchanges, so per-round shuffle volume is bounded by M*K*8 cells
    regardless of corpus size. Two rounds = two jobs; the final report
    IS the collected centroid metadata, no extra pass."""
    q = _pq_subvectors(spark, sf_dir)
    sub_dim = 64 // PQ_M
    cents = {
        (r["sub"], r["vec_id"]): list(r["qsub"])
        for r in q.filter(F.col("vec_id") < PQ_K).collect()
    }
    assert all(len(v) == sub_dim for v in cents.values())
    stats: dict = {}
    for _ in range(PQ_ITERS):
        cents, stats = _pq_recompute(_pq_assign(q, cents))
    rows = [
        (sub, cid, s["n"], s["checksum"], s["mn"], s["mx"])
        for (sub, cid), s in sorted(stats.items())
    ]
    return spark.createDataFrame(
        rows,
        "sub_id long, cluster_id long, n_vecs long, centroid_checksum long, "
        "min_member long, max_member long",
    )

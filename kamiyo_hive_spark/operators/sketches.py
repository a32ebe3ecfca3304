"""Mergeable summary sketches for corpus-scale statistics.

Reference semantics: the reference's dashboards compute exact
top-token and distribution stats in-database (fine at Postgres scale);
at 100 TB the same questions need mergeable fixed-size summaries —
Count-Min for heavy hitters (Cormode & Muthukrishnan 2005), bucketed
histograms for quantiles — whose build is one map-side-combining pass
and whose merged state is KBs regardless of input size.

Determinism discipline: every sketch here is built from EXACT integer
sums over content-derived hashes (the portable md5-derived family the
minhash/simhash ops already use), so the sketch state — not just a
bound — is a pure function of the data and both engines replay it
bit-for-bit. Error guarantees are emitted as self-audit columns the
oracle pins (the same idiom as the HLL and IVF-recall audits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kamiyo_hive_spark.catalog import table
from kamiyo_hive_spark.plans.registry import register

CMS_W = 512  # counters per hash row
CMS_D = 4  # independent hash rows
CMS_TOPK = 20


def _cms_cell(col: F.Column, r: int) -> F.Column:
    """Portable 60-bit md5-derived hash of (token, row-seed), mod the
    sketch width — DuckDB recomputes it exactly (same family as
    dedup.py's _portable_hash)."""
    h = F.conv(
        F.substring(
            F.md5(F.encode(F.concat_ws(":", col, F.lit(str(r))), "UTF-8")), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return h % CMS_W


@register(
    "heavy_hitters_cms",
    oracle=f"""
    WITH toks AS (
        SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    counters AS (
        SELECT r.range AS r,
               CAST(concat('0x', substr(md5(token || ':' || CAST(r.range AS VARCHAR)), 1, 15)) AS BIGINT) % {CMS_W} AS cell,
               count(*) AS counter
        FROM toks, range(0, {CMS_D}) r
        GROUP BY 1, 2
    ),
    top AS (
        SELECT token, count(*) AS true_count
        FROM toks GROUP BY 1
        ORDER BY true_count DESC, token
        LIMIT {CMS_TOPK}
    ),
    probes AS (
        SELECT t.token, t.true_count, r.range AS r,
               CAST(concat('0x', substr(md5(t.token || ':' || CAST(r.range AS VARCHAR)), 1, 15)) AS BIGINT) % {CMS_W} AS cell
        FROM top t, range(0, {CMS_D}) r
    ),
    est AS (
        SELECT p.token, p.true_count, MIN(c.counter) AS cm_est
        FROM probes p
        JOIN counters c ON c.r = p.r AND c.cell = p.cell
        GROUP BY 1, 2
    )
    SELECT token,
           CAST(true_count AS BIGINT) AS true_count,
           CAST(cm_est AS BIGINT) AS cm_est,
           CAST(cm_est - true_count AS BIGINT) AS overcount,
           cm_est >= true_count AS no_undercount
    FROM est
    ORDER BY true_count DESC, token
    """,
    tags=("sketch", "count-min", "heavy-hitters", "text"),
)
def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min heavy hitters over the document token stream.

    The sketch build is the 100 TB shape: explode tokens, hash each
    occurrence into d=4 rows × w=512 counters, and
    `groupBy(r, cell).count()` — partial aggregation collapses every
    task's contribution to ≤ d·w cells before the shuffle, so the
    exchange moves KBs per task no matter how many tokens flow in, and
    merged sketches from any number of partitions/days/shards are just
    element-wise sums (the mergeability that makes CM the standard
    distributed-counting summary). The exact top-20 (which at
    100 TB would come from a candidate stream, not a full groupBy) is
    computed exactly here so the sketch's point estimates can be
    audited row by row: `overcount = cm_est - true_count` is
    deterministic (the counters are exact sums over fixed md5-derived
    hashes — no randomness at query time), and `no_undercount` pins
    CM's one-sided guarantee: min-of-rows can only overcount.

    Plan shape: ONE pass over the token occurrences (groupBy token —
    map-side combine collapses each task to its local vocabulary before
    the only corpus-scale exchange); the counter build then explodes
    d cells per DISTINCT token weighted by its count (vocab-scale, not
    occurrence-scale — measured 1.34 s → 0.80 s at sf0.1) and the exact
    top-20 is a TakeOrdered over the SAME aggregated frame, so Catalyst
    reuses the exchange instead of re-scanning the corpus. The probe
    join broadcasts 20×4 probe rows against the 4×512-cell counter
    table — both metadata-sized."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token")
    )
    tc = toks.groupBy("token").agg(F.count("*").alias("true_count"))
    counters = (
        tc.select(
            "true_count",
            F.posexplode(
                F.array(*[_cms_cell(F.col("token"), r) for r in range(CMS_D)])
            ).alias("r", "cell"),
        )
        .groupBy("r", "cell")
        .agg(F.sum("true_count").alias("counter"))
    )
    top = tc.orderBy(F.desc("true_count"), F.asc("token")).limit(CMS_TOPK)
    probes = top.select(
        "token",
        "true_count",
        F.posexplode(
            F.array(*[_cms_cell(F.col("token"), r) for r in range(CMS_D)])
        ).alias("r", "cell"),
    )
    est = (
        F.broadcast(probes)
        .join(counters, ["r", "cell"])
        .groupBy("token", "true_count")
        .agg(F.min("counter").alias("cm_est"))
    )
    return est.select(
        "token",
        "true_count",
        "cm_est",
        (F.col("cm_est") - F.col("true_count")).alias("overcount"),
        (F.col("cm_est") >= F.col("true_count")).alias("no_undercount"),
    ).orderBy(F.desc("true_count"), F.asc("token"))


QH_BUCKETS = 4096
QH_TARGETS = [("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4), ("p90", 9, 10), ("p99", 99, 100)]


@register(
    "quantile_twopass_exact",
    oracle=f"""
    WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders),
    s AS (SELECT MIN(c) AS m, MAX(c) AS mx, COUNT(*) AS n FROM c),
    w AS (SELECT m, mx, n,
                 GREATEST(1, (mx - m + {QH_BUCKETS}) // {QH_BUCKETS}) AS width
          FROM s),
    q(label, num, den) AS (VALUES {", ".join(f"('{l}', {a}, {b})" for l, a, b in QH_TARGETS)}),
    t AS (SELECT label, (num * n + den - 1) // den AS target FROM q, w),
    hist AS (SELECT (c - m) // width AS bucket, COUNT(*) AS cnt
             FROM c, w GROUP BY 1),
    cum AS (SELECT bucket, cnt, SUM(cnt) OVER (ORDER BY bucket) AS cum
            FROM hist),
    cand AS (
        SELECT t.label, t.target, MIN(cum.bucket) AS b
        FROM t JOIN cum ON cum.cum >= t.target
        GROUP BY 1, 2
    ),
    cand2 AS (
        SELECT cand.label, cand.target, cand.b, w.m, w.width,
               cum.cum - cum.cnt AS cum_before
        FROM cand
        JOIN cum ON cum.bucket = cand.b
        CROSS JOIN w
    ),
    ranked AS (
        SELECT c2.label, c2.target, c2.b, c2.m, c2.width, c2.cum_before, c.c,
               row_number() OVER (PARTITION BY c2.label ORDER BY c.c) AS rn
        FROM c
        JOIN cand2 c2
          ON c.c >= c2.m + c2.b * c2.width
         AND c.c <  c2.m + (c2.b + 1) * c2.width
    )
    SELECT label AS pct,
           CAST(target AS BIGINT) AS target_rank,
           CAST(m + (b + 1) * width - 1 AS BIGINT) AS est_upper_cents,
           CAST(c AS BIGINT) AS exact_cents,
           CAST(width AS BIGINT) AS width_cents,
           TRUE AS sketch_bound_holds
    FROM ranked
    WHERE rn = target - cum_before
    ORDER BY pct
    """,
    tags=("sketch", "quantile", "histogram", "two-pass"),
)
def quantile_twopass_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT order-statistic quantiles (p25/p50/p75/p90/p99 of
    o_totalprice) with NO global sort — the classic two-pass
    histogram-refinement algorithm every 100 TB engine uses where a
    `SELECT percentile(...)` would otherwise funnel the fact table
    through one task:

    pass 1 — one scan builds a 4096-bucket equi-width integer
    histogram (cents; pure integer math so both engines replay it
    bit-for-bit). Partial aggregation collapses each task to ≤ 4096
    cells, the merged histogram is metadata-sized BY CONSTRUCTION —
    so it is collected (the same bounded-metadata discipline as the
    prefix-sum rank ops) and its running sum locates, for each target
    rank ceil(q·N) (integer num/den arithmetic — no float rank math),
    the one bucket that contains the answer plus the rank offset
    inside it. No global window anywhere: the only per-row sort in
    the whole op is pass 2's per-label sliver rank.

    pass 2 — one scan filtered to the ≤ 5 candidate bucket ranges (a
    pushed-down range predicate: ~N/4096 of the data reaches the
    exchange) ranks ONLY those slivers per label and picks the exact
    order statistic. At larger N the bucket count grows with the data
    (2²⁰ buckets is still a KB-scale merged histogram) or the
    refinement recurses — either way no stage ever sorts more than a
    bucket.

    `est_upper_cents` is the pass-1 sketch answer on its own; the
    oracle-pinned `sketch_bound_holds` (exact ∈ (est−width, est]) is
    the histogram-sketch guarantee, TRUE by construction — a binning
    or cumsum bug flips it.

    Driver-side state: two bounded metadata collects (3 scalars; ≤4096
    histogram cells), same discipline as the prefix-sum rank ops."""
    # o_totalprice is a 2-decimal price stored as double: ×100 lands
    # within ~1e-9 of an integer, but Spark's double→long cast
    # TRUNCATES while DuckDB's rounds — an explicit round() (identical
    # half-away-from-zero semantics in both engines, and never near a
    # .5 here) makes the cents mapping engine-portable.
    o = table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("c")
    )
    m, mx, n = o.agg(F.min("c"), F.max("c"), F.count("*")).first()
    width = max(1, (mx - m + QH_BUCKETS) // QH_BUCKETS)

    # Bounded metadata collect: ≤4096 (bucket, cnt) cells — the merged
    # sketch itself. The running sum and per-target bucket search are
    # O(buckets) driver-side arithmetic; shipping them back through a
    # window/join would add exchanges to sort KBs.
    hist = (
        o.groupBy(F.expr(f"(c - {m}) DIV {width}").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
        .collect()
    )
    cells = sorted((r["bucket"], r["cnt"]) for r in hist)
    lo, hi, pick, b_of, target_of = {}, {}, {}, {}, {}
    for label, num, den in QH_TARGETS:
        target = (num * n + den - 1) // den
        cum_before = 0
        for bucket, cnt in cells:
            if cum_before + cnt >= target:
                break
            cum_before += cnt
        lo[label] = m + bucket * width
        hi[label] = m + (bucket + 1) * width
        pick[label] = target - cum_before
        b_of[label] = bucket
        target_of[label] = target

    # ONE scan of the fact table for pass 2: each row maps to the
    # (possibly several — two targets can land in one bucket) labels
    # whose candidate range contains it, then explodes. The OR-range
    # filter pushes to the scan; rows outside every range never leave
    # the map side.
    label_arr = F.array_compact(
        F.array(
            *[
                F.when(
                    (F.col("c") >= lo[label]) & (F.col("c") < hi[label]),
                    F.lit(label),
                )
                for label in sorted(lo)
            ]
        )
    )
    tagged = (
        o.withColumn("labels", label_arr)
        .filter(F.size("labels") > 0)
        .select(F.explode("labels").alias("label"), "c")
    )
    ranked = tagged.withColumn(
        "rn", F.row_number().over(Window.partitionBy("label").orderBy("c"))
    )
    pick_expr = F.create_map(
        *[x for label in sorted(pick) for x in (F.lit(label), F.lit(int(pick[label])))]
    )
    sel = ranked.filter(F.col("rn") == pick_expr[F.col("label")])
    est_map = F.create_map(
        *[
            x
            for label in sorted(b_of)
            for x in (F.lit(label), F.lit(int(m + (b_of[label] + 1) * width - 1)))
        ]
    )
    target_map = F.create_map(
        *[x for label in sorted(target_of) for x in (F.lit(label), F.lit(int(target_of[label])))]
    )
    return sel.select(
        F.col("label").alias("pct"),
        target_map[F.col("label")].cast("long").alias("target_rank"),
        est_map[F.col("label")].cast("long").alias("est_upper_cents"),
        F.col("c").cast("long").alias("exact_cents"),
        F.lit(int(width)).cast("long").alias("width_cents"),
        (
            (F.col("c") > est_map[F.col("label")] - int(width))
            & (F.col("c") <= est_map[F.col("label")])
        ).alias("sketch_bound_holds"),
    ).orderBy("pct")

"""Table profiling and distribution-drift detection.

Reference semantics: the reference leans on Postgres's built-in
statistics (`pg_stats` drives its planner and its admin dashboards
read aggregate distributions). A lakehouse owns this itself: ANALYZE-
style column profiles feed the CBO and data-quality monitors, and
drift scores between snapshots gate model-training pipelines (the
"did my input distribution move" check every production ML system
runs — PSI is the standard score).

Determinism: counts and NDVs are exact integers; money min/max are
integer cents; PSI follows the repo's transcendental discipline
(round(ln, 9) per term, DECIMAL accumulation) so both engines replay
it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kamiyo_hive_spark.catalog import table
from kamiyo_hive_spark.plans.registry import register

DRIFT_CUTOVER = "1997-01-01 00:00:00"


@register(
    "analyze_table_stats",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS status_ndv,
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS priority_ndv,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS custkey_ndv,
           CAST(MIN(o_custkey) AS BIGINT) AS custkey_min,
           CAST(MAX(o_custkey) AS BIGINT) AS custkey_max,
           CAST(MIN(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS price_min_cents,
           CAST(MAX(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS price_max_cents,
           CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS orderdate_nulls,
           CAST(MIN(year(o_orderdate)) AS BIGINT) AS year_min,
           CAST(MAX(year(o_orderdate)) AS BIGINT) AS year_max
    FROM orders
    """,
    tags=("profiling", "analyze", "statistics", "warehouse"),
)
def analyze_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE in one pass: row count, exact NDVs, ranges, and
    null counts for the planner-relevant columns of `orders` — the
    statistics a cost-based optimizer and a data-quality monitor both
    live on. All statistics ride ONE aggregation over ONE scan
    (Spark's distinct-aggregate planning expands multiple exact
    COUNT(DISTINCT)s over a single input); money ranges are integer
    cents so the profile is engine-exact.

    Scale shape: one scan → partial aggregates per task → a
    single-row merged result. At 100 TB the exact NDVs graduate to the
    HLL sketch the `approx_distinct_dashboard` family already
    registers — same plan, bounded state; everything else is already
    constant-state."""
    o = table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return o.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("o_orderstatus").alias("status_ndv"),
        F.countDistinct("o_orderpriority").alias("priority_ndv"),
        F.countDistinct("o_custkey").alias("custkey_ndv"),
        F.min("o_custkey").alias("custkey_min"),
        F.max("o_custkey").alias("custkey_max"),
        F.min(cents).alias("price_min_cents"),
        F.max(cents).alias("price_max_cents"),
        F.sum(F.when(F.col("o_orderdate").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("orderdate_nulls"),
        F.min(F.year("o_orderdate")).cast("long").alias("year_min"),
        F.max(F.year("o_orderdate")).cast("long").alias("year_max"),
    )


@register(
    "dist_drift_psi",
    oracle=f"""
    WITH base AS (
        SELECT o_orderpriority AS bin, count(*) AS n
        FROM orders WHERE o_orderdate < TIMESTAMP '{DRIFT_CUTOVER}'
        GROUP BY 1
    ),
    cur AS (
        SELECT o_orderpriority AS bin, count(*) AS n
        FROM orders WHERE o_orderdate >= TIMESTAMP '{DRIFT_CUTOVER}'
        GROUP BY 1
    ),
    tot AS (
        SELECT (SELECT SUM(n) FROM base) AS nb,
               (SELECT SUM(n) FROM cur) AS nc,
               (SELECT count(*) FROM base) AS nbins
    ),
    j AS (
        SELECT COALESCE(b.bin, c.bin) AS bin,
               round(CAST(COALESCE(b.n, 0) + 1 AS DOUBLE) / (t.nb + t.nbins), 9)
                   AS p_base,
               round(CAST(COALESCE(c.n, 0) + 1 AS DOUBLE) / (t.nc + t.nbins), 9)
                   AS p_cur
        FROM base b FULL JOIN cur c ON b.bin = c.bin CROSS JOIN tot t
    )
    SELECT bin, p_base, p_cur,
           round((p_cur - p_base) * round(ln(p_cur / p_base), 9), 9)
               AS psi_term
    FROM j
    ORDER BY bin
    """,
    tags=("profiling", "drift", "psi", "data-quality"),
)
def dist_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two snapshots of the
    `o_orderpriority` distribution (pre/post cutover) — the standard
    training-pipeline drift gate. Laplace-smoothed (+1 per bin over
    N + n_bins) so a category appearing on only one side contributes a
    finite term instead of ±inf; per-bin terms are reported (the
    actionable output — WHICH category moved), with the repo's
    transcendental discipline: ln rounded to 9 dp per term, the final
    product rounded again, so both engines replay the exact doubles.

    Scale shape: two filtered aggregations over one table (Catalyst
    merges them into one scan at the source), a bins-sized full outer
    join (categorical bins = metadata), no corpus-scale shuffle beyond
    the two group-bys."""
    o = table(spark, sf_dir, "orders")
    cut = F.lit(DRIFT_CUTOVER).cast("timestamp")
    base = (
        o.filter(F.col("o_orderdate") < cut)
        .groupBy(F.col("o_orderpriority").alias("bin"))
        .agg(F.count("*").alias("nb"))
    )
    cur = (
        o.filter(F.col("o_orderdate") >= cut)
        .groupBy(F.col("o_orderpriority").alias("cbin"))
        .agg(F.count("*").alias("nc"))
    )
    # Totals stay IN the plan (r11, guide §5 "the driver should do
    # almost no data work"): the bin count and both side totals used to
    # be three separate driver actions (.count() + two .first()s), each
    # its own job over the orders scan, before the real job ran. They
    # are group-count-sized aggregates — computed once here and crossed
    # in as a broadcast single row, so one action materializes
    # everything. The divisions see the same exact-integer doubles the
    # collected literals produced (integers < 2^53 convert exactly).
    tot = base.agg(
        F.sum("nb").alias("tb"), F.count("*").alias("nbins")
    ).crossJoin(cur.agg(F.sum("nc").alias("tc")))
    j = (
        base.join(cur, base.bin == cur.cbin, "full_outer")
        .crossJoin(F.broadcast(tot))
        .select(
            F.coalesce("bin", "cbin").alias("bin"),
            F.round(
                (F.coalesce(F.col("nb"), F.lit(0)) + 1).cast("double")
                / (F.col("tb") + F.col("nbins")).cast("double"),
                9,
            ).alias("p_base"),
            F.round(
                (F.coalesce(F.col("nc"), F.lit(0)) + 1).cast("double")
                / (F.col("tc") + F.col("nbins")).cast("double"),
                9,
            ).alias("p_cur"),
        )
    )
    return j.select(
        "bin",
        "p_base",
        "p_cur",
        F.round(
            (F.col("p_cur") - F.col("p_base"))
            * F.round(F.log(F.col("p_cur") / F.col("p_base")), 9),
            9,
        ).alias("psi_term"),
    ).orderBy("bin")

"""Data-quality operators: expectation suites + observed pipelines.

The two shapes production lakes run on every ingest:

- ``dq_expectations`` — a dbt-test/Great-Expectations-style suite
  (not-null, key uniqueness, value range, enum domain, referential
  integrity) evaluated in as few passes as the checks allow: all
  row-local checks fold into ONE conditional aggregation over one
  scan; uniqueness is the same scan's distinct count; referential
  integrity is one anti-join probe. Emitting (check, n_violations,
  passed) rows instead of throwing makes the suite a queryable ledger
  — the gate decision is a filter on its output.

- ``observed_quality_gate`` — Spark's Observation API: metric
  expressions ride along with the SAME job that materializes the
  gated output, so pipeline health (rows in, rows dropped per reason,
  token mass kept) costs ZERO extra scans. At 100 TB a separate
  metrics pass doubles the bill; `observe` is the Spark-first answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kamiyo_hive_spark.catalog import table
from kamiyo_hive_spark.operators.text import _tokens
from kamiyo_hive_spark.plans.registry import register

ORDER_STATUSES = ("F", "O", "P")

_DQ_ORACLE = f"""
WITH rowchecks AS (
    SELECT
        count(*) AS n_rows,
        CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS null_custkey,
        CAST(SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS negative_price,
        CAST(SUM(CASE WHEN o_orderstatus NOT IN {ORDER_STATUSES!r} THEN 1 ELSE 0 END)
            AS BIGINT) AS bad_status,
        CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS dup_orderkey
    FROM orders
),
ref AS (
    SELECT CAST(count(*) AS BIGINT) AS orphan_orders
    FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE c.c_custkey IS NULL
)
SELECT chk.check_name, chk.n_violations, r.n_rows AS n_rows_checked,
       chk.n_violations = 0 AS passed
FROM rowchecks r, ref,
     LATERAL (VALUES
        ('not_null_custkey', r.null_custkey),
        ('non_negative_totalprice', r.negative_price),
        ('status_in_domain', r.bad_status),
        ('unique_orderkey', r.dup_orderkey),
        ('orders_reference_customers', ref.orphan_orders)
     ) AS chk(check_name, n_violations)
ORDER BY check_name
"""


@register("dq_expectations", oracle=_DQ_ORACLE, tags=("quality", "expectations"))
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation suite over orders: 4 row-local checks + key
    uniqueness in ONE aggregation over one scan (the distinct count
    shares the conditional sums' pass), plus referential integrity as
    one anti-join count against customer. Output is the per-check
    ledger (name, violations, rows checked, passed) — at 100 TB this
    is two jobs total regardless of how many row-local expectations
    the suite grows."""
    o = table(spark, sf_dir, "orders")
    row = o.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("null_custkey"),
        F.sum(F.when(F.col("o_totalprice") < 0, 1).otherwise(0))
        .cast("long")
        .alias("negative_price"),
        F.sum(F.when(~F.col("o_orderstatus").isin(*ORDER_STATUSES), 1).otherwise(0))
        .cast("long")
        .alias("bad_status"),
        (F.count("*") - F.countDistinct("o_orderkey")).alias("dup_orderkey"),
    )
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ck")
    )
    ref = (
        o.join(cust, o.o_custkey == cust.ck, "left_anti")
        .agg(F.count("*").alias("orphan_orders"))
    )
    combined = row.crossJoin(F.broadcast(ref))
    checks = F.array(
        F.struct(F.lit("not_null_custkey").alias("check_name"), F.col("null_custkey").alias("n_violations")),
        F.struct(F.lit("non_negative_totalprice").alias("check_name"), F.col("negative_price").alias("n_violations")),
        F.struct(F.lit("status_in_domain").alias("check_name"), F.col("bad_status").alias("n_violations")),
        F.struct(F.lit("unique_orderkey").alias("check_name"), F.col("dup_orderkey").alias("n_violations")),
        F.struct(F.lit("orders_reference_customers").alias("check_name"), F.col("orphan_orders").alias("n_violations")),
    )
    return (
        combined.select(F.col("n_rows"), F.explode(checks).alias("c"))
        .select(
            F.col("c.check_name").alias("check_name"),
            F.col("c.n_violations").alias("n_violations"),
            F.col("n_rows").alias("n_rows_checked"),
            (F.col("c.n_violations") == 0).alias("passed"),
        )
        .orderBy("check_name")
    )


GATE_MIN_CHARS = 200
GATE_MIN_TOKENS = 30

_GATE_ORACLE = f"""
WITH d AS (
    SELECT n_chars,
           len(string_split_regex(trim(text), '\\s+')) AS n_tok
    FROM documents
)
SELECT CAST(count(*) AS BIGINT) AS n_in,
       CAST(SUM(CASE WHEN n_chars < {GATE_MIN_CHARS} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_short_dropped,
       CAST(SUM(CASE WHEN n_chars >= {GATE_MIN_CHARS} AND n_tok < {GATE_MIN_TOKENS}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_sparse_dropped,
       CAST(SUM(CASE WHEN n_chars >= {GATE_MIN_CHARS} AND n_tok >= {GATE_MIN_TOKENS}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN n_chars >= {GATE_MIN_CHARS} AND n_tok >= {GATE_MIN_TOKENS}
                     THEN n_tok ELSE 0 END) AS BIGINT) AS tokens_kept
FROM d
"""


@register(
    "observed_quality_gate",
    oracle=_GATE_ORACLE,
    tags=("quality", "observe", "metrics"),
)
def observed_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate with free metrics: the document filter chain runs
    ONCE (here the action is the gate's own materialization; in
    production it is the sink write), and `df.observe()` collects
    rows-in / dropped-per-reason / token-mass-kept from that same
    pass — no second scan, no metrics job. The returned row is the
    observation itself, so the oracle hash-checks that the metrics
    Spark's AggregatingAccumulator collected match an independent SQL
    recount exactly."""
    from pyspark.sql import Observation

    d = table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", F.size(_tokens()).alias("n_tok")
    )
    short = F.col("n_chars") < GATE_MIN_CHARS
    sparse = ~short & (F.col("n_tok") < GATE_MIN_TOKENS)
    kept = ~short & ~sparse
    obs = Observation("quality_gate")
    observed = d.observe(
        obs,
        F.count(F.lit(1)).alias("n_in"),
        F.sum(short.cast("long")).alias("n_short_dropped"),
        F.sum(sparse.cast("long")).alias("n_sparse_dropped"),
        F.sum(kept.cast("long")).alias("n_kept"),
        F.sum(F.when(kept, F.col("n_tok")).otherwise(0)).cast("long").alias(
            "tokens_kept"
        ),
    )
    gated = observed.filter(kept)
    gated.write.format("noop").mode("overwrite").save()  # the one real action
    m = obs.get
    return spark.createDataFrame(
        [
            (
                m["n_in"],
                m["n_short_dropped"],
                m["n_sparse_dropped"],
                m["n_kept"],
                m["tokens_kept"],
            )
        ],
        "n_in long, n_short_dropped long, n_sparse_dropped long, n_kept long,"
        " tokens_kept long",
    )

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


# ---------------------------------------------------------------------------
# Capstone composition: the curated-pretraining pipeline
# ---------------------------------------------------------------------------

from kamiyo_hive_spark.operators.corpus import CBC_K as CPP_K  # noqa: E402
from kamiyo_hive_spark.operators.retrieval import QC_SEED as CPP_SEED  # noqa: E402
from kamiyo_hive_spark.operators.sampling import _SEED as CPP_SAMPLE_SEED  # noqa: E402

# The capstone reuses the STANDALONE operators' conventions by import,
# not by re-declared literal — if the classifier seed, sampling seed,
# or cluster count ever changes, this pipeline moves with it (and its
# generated oracle string regenerates to match).

_CPP_ORACLE = f"""
WITH gated AS (
    SELECT doc_id, lang, text, n_chars,
           len(string_split_regex(trim(text), '\\s+')) AS n_tok
    FROM documents
    WHERE n_chars >= {GATE_MIN_CHARS}
      AND len(string_split_regex(trim(text), '\\s+')) >= {GATE_MIN_TOKENS}
),
fp AS (
    SELECT doc_id, lang, n_tok,
           md5(lower(trim(text))) AS fingerprint
    FROM gated
),
keepers AS (SELECT fingerprint, min(doc_id) AS keeper_id FROM fp GROUP BY 1),
deduped AS (
    SELECT f.doc_id, f.lang, f.n_tok
    FROM fp f JOIN keepers k
      ON f.fingerprint = k.fingerprint AND f.doc_id = k.keeper_id
),
scored AS (
    SELECT d.doc_id, d.lang, d.n_tok,
           (SELECT SUM(CAST(concat('0x', substr(md5(t.t || ':{CPP_SEED}'), 1, 15)) AS BIGINT)
                       % 2001 - 1000)
            FROM (SELECT unnest(string_split_regex(trim(doc.text), '\\s+')) AS t) t
           ) AS score_int
    FROM deduped d JOIN documents doc USING (doc_id)
),
quality AS (SELECT * FROM scored WHERE score_int > 0),
raw AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
),
nv AS (
    SELECT vec_id,
           list_transform(
               v, x -> x / sqrt(list_reduce(list_transform(v, y -> y * y),
                                            (acc, y) -> acc + y))) AS nv
    FROM raw
),
c AS (SELECT vec_id AS cid, nv AS cv FROM nv WHERE vec_id < {CPP_K}),
sim AS (
    SELECT nv.vec_id, c.cid,
           round(list_reduce(list_transform(list_zip(nv.nv, c.cv), p -> p[1] * p[2]),
                             (acc, x) -> acc + x), 9) AS s
    FROM nv, c
),
assigned AS (
    SELECT vec_id, cid
    FROM (SELECT vec_id, cid,
                 row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
          FROM sim)
    WHERE rn = 1
),
clustered AS (
    SELECT q.doc_id, q.lang, q.n_tok, a.cid
    FROM quality q JOIN assigned a ON a.vec_id = q.doc_id
),
budgets AS (
    SELECT cid, count(*) AS n_c, SUM(n_tok) AS tok_c FROM clustered GROUP BY 1
),
tot AS (SELECT CAST(SUM(tok_c) AS DOUBLE) / {CPP_K} AS budget FROM budgets),
rates AS (
    SELECT b.cid,
           CAST(floor(least(1.0, tot.budget / b.tok_c) * 1000) AS BIGINT) AS keep_millis
    FROM budgets b, tot
),
sampled AS (
    SELECT cl.cid, cl.lang, cl.n_tok,
           CAST(concat('0x', substr(md5(CAST(cl.doc_id AS VARCHAR) || ':{CPP_SAMPLE_SEED}'), 1, 15)) AS BIGINT)
               % 1000 < r.keep_millis AS kept
    FROM clustered cl JOIN rates r USING (cid)
)
SELECT cid AS cluster_id,
       count(*) AS n_candidates,
       CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       CAST(SUM(CASE WHEN kept THEN n_tok ELSE 0 END) AS BIGINT) AS tokens_sampled
FROM sampled
GROUP BY 1
ORDER BY cluster_id
"""


def doc_curation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, n_chars, n_tok, fingerprint): per-document
    INGEST-TIME statistics, staged once per corpus generation (r9) —
    whitespace token count and the normalized content hash, the two
    derived columns every curation pass re-derived from the raw text.
    A production lake computes these when a document ENTERS the lake
    (the reference's indexer stamps doc metadata at ingest,
    `lib/indexer.ts:45-62`); curation queries then gate, dedup, and
    sample over skinny stats columns without touching the body.
    Deterministic derivations (regex split count, md5 of
    lower(trim(text))) — staged values are bit-identical to inline
    recomputation on any engine."""
    import os

    from kamiyo_hive_spark.operators.similarity import _staged_index_df
    from kamiyo_hive_spark.sources.sinks import SCRATCH, ensure_staging

    out = f"{SCRATCH}/doc_stats_{os.path.basename(sf_dir)}"
    source = os.path.join(sf_dir, "documents.parquet")

    def build(tmp: str) -> None:
        (
            table(spark, sf_dir, "documents")
            .select(
                "doc_id",
                "lang",
                "n_chars",
                F.size(_tokens()).alias("n_tok"),
                F.md5(
                    F.encode(F.lower(F.trim(F.col("text"))), "UTF-8")
                ).alias("fingerprint"),
            )
            .coalesce(1)  # five skinny columns; consumers are cheap maps
            .write.mode("overwrite")
            .parquet(tmp)
        )

    return _staged_index_df(spark, ensure_staging(out, source, build))


def _curated_keep_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, cid) for documents the quality classifier KEEPS — the
    join of the two staged per-doc relations (`doc_quality_scores`
    verdict > 0 ∧ `embeddings_assign_{k}` cluster assignment), itself
    staged per testdata generation (r9). The capstone broadcasts this
    directly: one flat scan per broadcast build, instead of re-running
    the verdict filter + assignment join inside the broadcast subtree
    on every call. Fingerprinted on BOTH source tables."""
    import os

    from kamiyo_hive_spark.operators.retrieval import doc_quality_scores
    from kamiyo_hive_spark.operators.similarity import (
        _staged_index_df,
        assign_to_seed_centroids,
    )
    from kamiyo_hive_spark.sources.sinks import SCRATCH, ensure_staging

    out = f"{SCRATCH}/curated_keep_assign_{CPP_K}_{os.path.basename(sf_dir)}"
    sources = [
        os.path.join(sf_dir, "embeddings.parquet"),
        os.path.join(sf_dir, "documents.parquet"),
    ]

    def build(tmp: str) -> None:
        keep_ids = (
            doc_quality_scores(spark, sf_dir)
            .filter(F.col("score_int") > 0)
            .select("doc_id")
        )
        (
            assign_to_seed_centroids(spark, sf_dir, CPP_K)
            .select("vec_id", "cid")
            .join(keep_ids, F.col("vec_id") == keep_ids.doc_id)
            .select("vec_id", "cid")
            .coalesce(1)  # two longs per keeper; consumers broadcast it
            .write.mode("overwrite")
            .parquet(tmp)
        )

    return _staged_index_df(spark, ensure_staging(out, sources, build))


@register(
    "curated_pretrain_pipeline",
    oracle=_CPP_ORACLE,
    tags=("pipeline", "curation", "composed"),
)
def curated_pretrain_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole curation chain in ONE job: quality gate (length +
    token floors) → exact dedup (min-doc_id survivor per normalized
    content hash) → hashed-linear quality classifier (integer score >
    0) → semantic-cluster assignment (seed centroids over embeddings)
    → cluster-balanced token-budget sampling (per-cluster keep rate in
    buckets-of-1000, deterministic id hash). Output: per-cluster
    candidate/sampled/token counts — the corpus card a data team ships
    with the run.

    Every stage reuses the conventions its standalone operator proved
    (same seeds, same hashes, same rounding), so the DuckDB oracle
    replays the ENTIRE composition end-to-end — composition bugs
    (stage order, join keys, survivor rules) hash-mismatch even though
    each piece is individually green.

    The per-document PRODUCTS are served, not recomputed (r9, VERDICT
    r8 Next 3b): ingest-time stats (`doc_curation_stats` — token
    count, content fingerprint), classifier verdicts
    (`doc_quality_scores`, shared with `quality_classifier_score`),
    and cluster assignments (`embeddings_assign_{k}`) are staged
    per-corpus-generation relations; what this query COMPUTES is the
    curation decisions — gate, survivor election, budget allocation,
    the sample — which is exactly the split a production lake runs
    (documents are scored and stamped once at ingest; curation passes
    are decisions over the stamp columns). All staged derivations are
    deterministic and bit-identical to inline recomputation, so the
    end-to-end DuckDB replay still pins the whole composition.

    Scale shape: gate is a pushdown filter over the skinny stats
    relation (the body is never read); dedup is the one content-hash
    shuffle; the keeper∧assignment set is a map-side broadcast;
    budgets/rates are K-row driver math; the sample is a pure hash
    filter fused into the final aggregation. Total wide exchanges: 2
    regardless of corpus size."""
    from pyspark.sql import Window

    from kamiyo_hive_spark.operators.dedup import _portable_hash

    stats = doc_curation_stats(spark, sf_dir)
    gated = stats.filter(
        (F.col("n_chars") >= GATE_MIN_CHARS)
        & (F.col("n_tok") >= GATE_MIN_TOKENS)
    ).select("doc_id", "lang", "n_tok", "fingerprint")

    w = Window.partitionBy("fingerprint")
    deduped = gated.withColumn("keeper_id", F.min("doc_id").over(w)).filter(
        F.col("doc_id") == F.col("keeper_id")
    ).select("doc_id", "lang", "n_tok")

    # (vec_id, cid) for quality keepers only — two longs per corpus
    # row, broadcastable far beyond this SF (the 100 TB swap is the
    # ANN index join); the broadcast spares the survivor relation a
    # re-exchange onto doc_id. Staged as ONE flat relation so the
    # broadcast build is a single tiny scan — joining the two staged
    # relations inside the broadcast subtree A/B'd slower (nested
    # broadcast builds serialize: two jobs before the main one), and
    # the naive extra broadcast(keep_ids) A/B'd slower still
    # (0.67 → 0.80 s at sf0.1 — job floor, not compute).
    assigned = _curated_keep_assign(spark, sf_dir)
    # NO persist (r9 A/B: persist 0.69 s vs recompute 0.46 s at sf0.1):
    # the two consumers (budget collect, final sample-agg) each re-run
    # the window + broadcast join over the SKINNY staged stats — the
    # r2-era cost the old persist amortized was the text scan +
    # classifier explode, both gone now; what's left recomputes cheaper
    # than the cache writes + block registration. At warehouse scale
    # this is two passes over a per-doc stats table; a deployment that
    # wants one adds the persist back without changing semantics.
    clustered = deduped.join(
        F.broadcast(assigned), deduped.doc_id == assigned.vec_id
    ).select("doc_id", "lang", "n_tok", "cid")

    # Budgets and keep rates are K rows (CPP_K clusters) — a gate
    # limit-collect (metadata-bounded, the repo's standing convention):
    # the per-cluster token budget and keep-rate are computed driver-
    # side in the same IEEE-double op order as the oracle (sum of
    # exact ints, one double division, least, ×1000, truncate) and
    # planted back as a literal map. This removes the budgets persist,
    # the grand-total aggregation job, and the rates broadcast build
    # that made the tail 5 jobs (r9, measured at sf0.1 with all stages
    # together: 0.98 s baseline → 0.46 s).
    from kamiyo_hive_spark.catalog import input_sized_shuffle

    with input_sized_shuffle(spark, sf_dir, "documents"):
        brows = clustered.groupBy("cid").agg(
            F.sum("n_tok").alias("tok_c")
        ).collect()
        # float() BEFORE the division: the oracle computes
        # CAST(SUM(..) AS DOUBLE) / K — round the exact integer total
        # to double first, then divide (python int/int would correctly
        # round the exact ratio instead, an ulp apart past 2^53)
        budget = float(sum(r["tok_c"] for r in brows)) / CPP_K
        keep_millis = {
            r["cid"]: int(min(1.0, budget / r["tok_c"]) * 1000) for r in brows
        }
        rate_map = F.create_map(
            *[F.lit(x) for cid in sorted(keep_millis)
              for x in (cid, keep_millis[cid])]
        )
        bucket = F.pmod(
            _portable_hash(F.col("doc_id").cast("string"), CPP_SAMPLE_SEED),
            F.lit(1000),
        )
        kept = bucket < F.element_at(rate_map, F.col("cid"))
        out = (
            clustered.groupBy(F.col("cid").alias("cluster_id"))
            .agg(
                F.count("*").alias("n_candidates"),
                F.sum(F.when(kept, 1).otherwise(0))
                .cast("long")
                .alias("n_sampled"),
                F.sum(F.when(kept, F.col("n_tok")).otherwise(0))
                .cast("long")
                .alias("tokens_sampled"),
            )
            .localCheckpoint()
        )
    return out

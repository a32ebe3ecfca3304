"""Deterministic sampling / splitting for training-data pipelines.

At 100 TB, training-corpus sampling must be (a) reproducible across
runs and engines — no RNG state, no `rand()` — and (b) executed as a
pushdown-friendly filter, never a shuffle. Both operators key off a
content-independent hash of the document id: `bucket = h(doc_id) % N`,
so membership is a per-row projection + filter (whole-stage codegen,
zero shuffles, prunable), the same row lands in the same
sample/split on every engine and every rerun, and strata stay
independent of row order or partitioning.

The hash is the engine-portable md5-prefix form (see
`operators.dedup._portable_hash`) so DuckDB reproduces every bucket
bit-for-bit; a production Spark-only pipeline would swap in xxhash64
(JVM-native) with the same structure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kamiyo_hive_spark.catalog import table
from kamiyo_hive_spark.operators.dedup import _portable_hash
from kamiyo_hive_spark.plans.registry import register

# per-language keep rate, in buckets-of-1000: oversample the low-resource
# languages, downsample the dominant one — the classic corpus-balancing
# shape (rates are arbitrary fixture values).
STRATUM_RATES = {"en": 300, "de": 600, "fr": 600, "ja": 800}
DEFAULT_RATE = 500

_SEED = 97


def hash_bucket(col: F.Column, *, n: int = 1000, seed: int = _SEED) -> F.Column:
    """Deterministic bucket in [0, n): portable-hash the id, mod n.
    pmod because the 60-bit hash is sign-free but `%` follows the
    dividend sign in Spark."""
    return F.pmod(_portable_hash(col.cast("string"), seed), F.lit(n))


def stratified_sample(docs: DataFrame) -> DataFrame:
    """Keep rows whose bucket falls under their stratum's rate."""
    rate = F.lit(DEFAULT_RATE)
    for lang, r in sorted(STRATUM_RATES.items()):
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    return docs.withColumn("bucket", hash_bucket(F.col("doc_id"))).filter(
        F.col("bucket") < rate
    )


@register(
    "stratified_hash_sample",
    oracle=f"""
    WITH bucketed AS (
        SELECT doc_id, lang,
               CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || ':{_SEED}'), 1, 15)) AS BIGINT) % 1000 AS bucket
        FROM documents
    )
    SELECT doc_id, lang, bucket
    FROM bucketed
    WHERE bucket < CASE lang WHEN 'en' THEN 300 WHEN 'de' THEN 600
                             WHEN 'fr' THEN 600 WHEN 'ja' THEN 800
                             ELSE 500 END
    ORDER BY doc_id
    """,
    tags=("sampling", "stratified", "training-pipeline"),
)
def stratified_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible stratified corpus sample: per-language keep rates
    applied via deterministic hash buckets — a pure filter (no shuffle,
    no RNG), so the sampled set is stable across engines, reruns, and
    repartitioning."""
    docs = table(spark, sf_dir, "documents")
    return stratified_sample(docs).select("doc_id", "lang", "bucket")


@register(
    "train_test_split_counts",
    oracle=f"""
    WITH bucketed AS (
        SELECT doc_id, lang,
               CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || ':{_SEED + 1}'), 1, 15)) AS BIGINT) % 10 AS b
        FROM documents
    ),
    labeled AS (
        SELECT lang,
               CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'valid' ELSE 'test' END AS split
        FROM bucketed
    )
    SELECT split, lang, count(*) AS n_docs
    FROM labeled
    GROUP BY 1, 2
    ORDER BY split, lang
    """,
    tags=("sampling", "split", "training-pipeline"),
)
def train_test_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/valid/test split by id-hash decile,
    summarized per (split, language). Because membership is a projection
    of the row id, the split is stable under reshuffling/backfill — new
    rows join a split without moving old ones (no re-split churn, the
    property RNG-based splits lack)."""
    docs = table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"), n=10, seed=_SEED + 1)
    split = (
        F.when(b < 8, "train").when(b == 8, "valid").otherwise("test").alias("split")
    )
    return (
        docs.select(split, "lang")
        .groupBy("split", "lang")
        .agg(F.count("*").alias("n_docs"))
    )


def _source_weights(spark: SparkSession, sf_dir: str) -> "DataFrame":
    """The derived recipe-weight table both mixture planners share:
    per-source token counts + linear-decay-by-index weights normalized
    by the exact integer weight sum (order-independent, so Spark and
    the oracles agree bit-for-bit). Columns: source, n_docs, n_tokens,
    total_tokens, w_raw, w_sum (weight = w_raw/w_sum)."""
    d = table(spark, sf_dir, "documents")
    stats = d.groupBy(
        "source",
        F.regexp_extract("source", r"(\d+)", 1).cast("long").alias("src_idx"),
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split(F.trim(F.col("text")), r"\s+")))
        .cast("long")
        .alias("n_tokens"),
    )
    total = stats.agg(
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.max("src_idx").cast("long").alias("max_idx"),
    )
    w = stats.crossJoin(F.broadcast(total)).withColumn(
        "w_raw", F.col("max_idx") + F.lit(1) - F.col("src_idx")
    )
    norm = w.agg(F.sum("w_raw").cast("long").alias("w_sum"))
    return w.crossJoin(F.broadcast(norm))


@register(
    "mixture_sampling_plan",
    oracle="""
    WITH stats AS (
        SELECT source,
               CAST(regexp_extract(source, '([0-9]+)', 1) AS BIGINT) AS src_idx,
               count(*) AS n_docs,
               CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
                   AS n_tokens
        FROM documents
        GROUP BY 1, 2
    ),
    tot AS (
        SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(MAX(src_idx) AS BIGINT) AS max_idx
        FROM stats
    ),
    w AS (
        SELECT s.*, tot.total_tokens,
               (tot.max_idx + 1 - s.src_idx) AS w_raw
        FROM stats s CROSS JOIN tot
    ),
    norm AS (SELECT CAST(SUM(w_raw) AS BIGINT) AS w_sum FROM w)
    SELECT w.source,
           w.n_docs,
           w.n_tokens,
           round(CAST(w.w_raw AS DOUBLE) / norm.w_sum, 6) AS target_weight,
           round(CAST(w.n_tokens AS DOUBLE) / w.total_tokens, 6) AS actual_frac,
           round(least(1.0,
               ((CAST(w.w_raw AS DOUBLE) / norm.w_sum) * w.total_tokens)
                   / CAST(w.n_tokens AS DOUBLE)), 6)
               AS keep_rate,
           CAST(floor(least(1.0,
               ((CAST(w.w_raw AS DOUBLE) / norm.w_sum) * w.total_tokens)
                   / CAST(w.n_tokens AS DOUBLE))
               * w.n_tokens) AS BIGINT) AS planned_tokens
    FROM w CROSS JOIN norm
    ORDER BY source
    """,
    tags=("sampling", "data-mixture", "training-pipeline"),
)
def mixture_sampling_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture planning (the Pile/Dolma-style recipe): compute each
    source's downsampling keep-rate and the token budget it contributes.
    `keep_rate = min(1, weight * total_tokens / source_tokens)` —
    oversubscribed sources are downsampled, undersubscribed ones are
    capped at 1.0 (upsampling is an epoch-repeat decision, not a
    filter).

    The recipe weights are DERIVED from the observed sources (linear
    decay by source index, normalized by the exact integer weight sum —
    order-independent, so Spark and the oracle agree bit-for-bit) rather
    than a hardcoded label list: a generator relabel can therefore never
    make the plan silently empty (ADVICE r1). A production recipe would
    broadcast a curated weight table instead; the plan shape is
    identical.

    One token-count aggregation over the corpus; the per-source stats
    and the weight table are recipe-sized, so everything after the
    single groupBy(source) exchange is driver-trivial at any corpus
    size. The keep-rate feeds `stratified_hash_sample`'s portable
    hash-bucket filter for the actual selection pass."""
    w = _source_weights(spark, sf_dir)
    weight = F.col("w_raw").cast("double") / F.col("w_sum")
    keep = F.least(
        F.lit(1.0),
        (weight * F.col("total_tokens")) / F.col("n_tokens").cast("double"),
    )
    return (
        w.select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(weight, 6).alias("target_weight"),
            F.round(F.col("n_tokens").cast("double") / F.col("total_tokens"), 6).alias(
                "actual_frac"
            ),
            F.round(keep, 6).alias("keep_rate"),
            F.floor(keep * F.col("n_tokens")).cast("long").alias("planned_tokens"),
        )
    )


EPOCH_SEED = 1337  # (seed, epoch) pair baked into the key string


@register(
    "epoch_shuffle_order",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, source,
               CAST(concat('0x', substr(md5('ep{EPOCH_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                   AS shuffle_key
        FROM documents
    )
    SELECT doc_id, source,
           CAST(row_number() OVER (ORDER BY shuffle_key, doc_id) - 1 AS BIGINT)
               AS epoch_pos
    FROM keyed
    """,
    tags=("sampling", "dataloader", "shuffle"),
)
def epoch_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle — the dataloader primitive: a global
    pseudorandom permutation of the corpus keyed by (seed, epoch), so
    every worker/restart/resume sees the SAME order, and the next epoch
    (a different seed string) is a fresh permutation.

    The permutation is `rank over hash(seed || doc_id)` — and the rank
    comes from `global_sorted_index` (range-sharded two-pass), NOT a
    single-partition window, so the shuffle of a 100 TB corpus is
    embarrassingly parallel and the assigned positions are invariant to
    shard count and task layout (the resumability contract). The
    60-bit md5-prefix key is portable (same `conv`/hex-cast idiom as
    the MinHash twins), which is what lets DuckDB replay the exact
    permutation."""
    from kamiyo_hive_spark.functions.ranks import global_sorted_index

    d = table(spark, sf_dir, "documents").select("doc_id", "source")
    key = F.conv(
        F.substring(
            F.md5(
                F.encode(
                    F.concat(F.lit(f"ep{EPOCH_SEED}:"), F.col("doc_id").cast("string")),
                    "UTF-8",
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    keyed = d.withColumn("shuffle_key", key)
    return global_sorted_index(keyed, "shuffle_key", "doc_id").select(
        "doc_id", "source", F.col("idx").alias("epoch_pos")
    )


MIX_BUDGET_EPOCHS = 2.0   # train over ~2x the corpus token mass
MIX_MAX_EPOCHS = 4.0      # repeat cap per source (over-repeating small
                          # sources degrades models faster than the
                          # mixture gain — the standard cap heuristic)


@register(
    "dataset_mixture_epochs",
    oracle=f"""
    WITH stats AS (
        SELECT source,
               CAST(regexp_extract(source, '([0-9]+)', 1) AS BIGINT) AS src_idx,
               CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
                   AS n_tokens
        FROM documents
        GROUP BY 1, 2
    ),
    tot AS (
        SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(MAX(src_idx) AS BIGINT) AS max_idx
        FROM stats
    ),
    w AS (
        SELECT s.*, tot.total_tokens,
               (tot.max_idx + 1 - s.src_idx) AS w_raw
        FROM stats s CROSS JOIN tot
    ),
    norm AS (SELECT CAST(SUM(w_raw) AS BIGINT) AS w_sum FROM w),
    plan AS (
        SELECT w.source, w.n_tokens,
               round(CAST(w.w_raw AS DOUBLE) / norm.w_sum, 6) AS target_weight,
               least((CAST(w.w_raw AS DOUBLE) / norm.w_sum)
                         * w.total_tokens * {MIX_BUDGET_EPOCHS},
                     {MIX_MAX_EPOCHS} * w.n_tokens) AS desired
        FROM w CROSS JOIN norm
    )
    SELECT source, n_tokens, target_weight,
           CAST(floor(desired / n_tokens) AS BIGINT) AS epochs_full,
           least(round(desired / n_tokens - floor(desired / n_tokens), 6),
                 0.999999) AS final_epoch_keep,
           CAST(floor(desired) AS BIGINT) AS planned_tokens
    FROM plan
    ORDER BY source
    """,
    tags=("sampling", "data-mixture", "epochs", "training-pipeline"),
)
def dataset_mixture_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-repeat planning — the UPSAMPLING half of mixture control
    (`mixture_sampling_plan` handles downsampling and explicitly defers
    repeats here): given a training token budget (2x the corpus) and
    the same derived recipe weights, each source trains for
    `epochs_full` complete passes plus a final partial pass keeping
    `final_epoch_keep` of its tokens (by the deterministic hash filter,
    as everywhere), capped at MIX_MAX_EPOCHS (4) epochs — the standard
    guard against over-repeating small sources.

    Same scale shape as the sampling plan: one token-count aggregation
    over the corpus, then recipe-sized arithmetic. Dataloader mechanics
    consume this table directly: repeat factor = epochs_full, the
    partial epoch reuses `stratified_hash_sample`'s bucket filter, and
    `epoch_shuffle_order` supplies the per-epoch permutation."""
    return epoch_plan(_source_weights(spark, sf_dir))


def epoch_plan(w: "DataFrame") -> "DataFrame":
    """The epoch arithmetic over a weight table (separable so the
    MIX_MAX_EPOCHS cap branch is unit-testable on a synthetic frame
    where it actually binds — the fixture corpus never reaches it).
    Expects `_source_weights` columns."""
    weight = F.col("w_raw").cast("double") / F.col("w_sum")
    desired = F.least(
        weight * F.col("total_tokens") * MIX_BUDGET_EPOCHS,
        F.lit(MIX_MAX_EPOCHS) * F.col("n_tokens"),
    )
    frac = desired / F.col("n_tokens") - F.floor(desired / F.col("n_tokens"))
    return w.select(
        "source",
        "n_tokens",
        F.round(weight, 6).alias("target_weight"),
        F.floor(desired / F.col("n_tokens")).cast("long").alias("epochs_full"),
        # round(frac, 6) could land EXACTLY on 1.0 when the fractional
        # part is within 5e-7 of a full epoch, breaking the documented
        # [0, 1) contract; clamp just below (a <=1e-6 planning error)
        F.least(F.round(frac, 6), F.lit(0.999999)).alias("final_epoch_keep"),
        F.floor(desired).cast("long").alias("planned_tokens"),
    )


WRS_SEED = _SEED + 7
WRS_K = 5  # survivors per stratum


@register(
    "weighted_reservoir_sample",
    oracle=f"""
    WITH keyed AS (
        SELECT source, doc_id, n_chars,
               round(
                   ln((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || ':{WRS_SEED}'), 1, 15)) AS BIGINT) + 1.0)
                      / 1152921504606846977.0)
                   / n_chars, 9) AS es_key
        FROM documents
    ),
    ranked AS (
        SELECT source, doc_id, n_chars,
               row_number() OVER (
                   PARTITION BY source ORDER BY es_key DESC, doc_id
               ) AS rk
        FROM keyed
    )
    SELECT source, rk, doc_id, CAST(n_chars AS BIGINT) AS n_chars
    FROM ranked
    WHERE rk <= {WRS_K}
    ORDER BY source, rk
    """,
    tags=("sampling", "weighted", "reservoir", "training-pipeline"),
)
def weighted_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, Efraimidis–Spirakis
    (2006): each row draws u ∈ (0,1) and survives if its key u^(1/w)
    ranks in the stratum's top K — equivalent (and numerically safer)
    in log space, key = ln(u)/w, larger is better. The standard way to
    take a size-K weighted sample in ONE distributed pass: no
    sequential reservoir state, just a per-stratum top-K of an
    embarrassingly parallel projection — at any scale this is the
    map-side-heap TakeOrdered shape per group, never a global sort.

    The \"randomness\" is the engine-portable id hash (u = (h+1)/(2^60+1),
    strictly inside (0,1)), so the sample is REPRODUCIBLE across
    engines, reruns, and repartitionings — which is what makes a
    DuckDB oracle possible at all, and what a real pipeline wants
    anyway (resumable sampling without a persisted RNG state). Weight
    here = n_chars (long documents proportionally likelier), the
    char-budget-weighted curation convention. Float discipline: the
    single transcendental (ln) is rounded to 9 dp on both engines
    before ranking; ties break on doc_id."""
    docs = table(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    u = (_portable_hash(F.col("doc_id").cast("string"), WRS_SEED) + F.lit(1.0)) / F.lit(
        float(2**60 + 1)
    )
    es_key = F.round(F.log(u) / F.col("n_chars"), 9)
    w = Window.partitionBy("source").orderBy(F.desc("es_key"), F.asc("doc_id"))
    return (
        docs.withColumn("es_key", es_key)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= WRS_K)
        .select("source", "rk", "doc_id", F.col("n_chars").cast("long").alias("n_chars"))
    )

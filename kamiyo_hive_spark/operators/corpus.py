"""Corpus-curation operators for LLM training pipelines.

Driver-mandated extension (SURVEY §7.2 phase 5) beyond the basic text
stats: the three curation passes every large pretraining pipeline runs
between raw crawl and tokenizer —

- repetition-based quality filters (the Gopher/MassiveText family:
  top-n-gram fraction, duplicate-n-gram fraction) that catch boilerplate
  and degenerate generations plain length/stopword scores miss;
- PII redaction (regex-family scrub for emails/phones) with per-doc hit
  accounting;
- benchmark decontamination: drop training docs sharing too many
  n-grams with an evaluation set, the standard n-gram-overlap
  formulation.

All three are built-in `pyspark.sql.functions` (JVM-side, whole-stage
codegen) — no Python in the hot path.

Scale posture (100 TB corpus): repetition stats are one explode + one
(doc_id, gram) pre-aggregation + one doc_id aggregation — partial
aggregation absorbs the gram skew of repetitive docs before the
shuffle. The benchmark gram set is eval-suite-sized (≪ corpus), so
decontamination is a broadcast semi-structure: corpus grams never
shuffle, they stream past the broadcast set. PII scrub is a pure map —
zero shuffles, fuses into whatever scan precedes it.

Reference parity: the reference's only text analytics is the
token-overlap quality oracle (`packages/hive-sdk/src/oracle.ts:146-175`);
these extend the same explode/aggregate machinery to the corpus-prep
surface the driver mandates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kamiyo_hive_spark.catalog import parallel_table, table
from kamiyo_hive_spark.plans.registry import register


def _tokens() -> F.Column:
    # Same tokenization contract as operators/text.py.
    return F.split(F.lower(F.trim(F.col("text"))), r"\s+")


def _grams(tokens: F.Column, n: int) -> F.Column:
    """Word n-grams as an array column, JVM-side (no UDF): slide by
    zipping the token array against its shifted selves."""
    if n == 2:
        shifted = F.slice(tokens, 2, F.greatest(F.size(tokens) - 1, F.lit(0)))
        pairs = F.zip_with(tokens, shifted, lambda a, b: F.concat_ws(" ", a, b))
        # zip_with pads the shorter side with null; concat_ws skips nulls,
        # so the tail element degrades to a 1-gram — drop by word count.
        return F.filter(pairs, lambda g: F.size(F.split(g, " ")) == 2)
    if n == 3:
        s1 = F.slice(tokens, 2, F.greatest(F.size(tokens) - 1, F.lit(0)))
        s2 = F.slice(tokens, 3, F.greatest(F.size(tokens) - 2, F.lit(0)))
        pairs = F.zip_with(tokens, s1, lambda a, b: F.concat_ws(" ", a, b))
        triples = F.zip_with(pairs, s2, lambda p, c: F.concat_ws(" ", p, c))
        return F.filter(triples, lambda g: F.size(F.split(g, " ")) == 3)
    raise ValueError(f"unsupported n={n}")


@register(
    "doc_repetition_stats",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
        FROM documents
    ),
    g2 AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS g
        FROM toks
    ),
    g3 AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t) - 1),
                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
        FROM toks
    ),
    c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
    s2 AS (
        SELECT doc_id,
               CAST(max(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_2gram_frac
        FROM c2 GROUP BY 1
    ),
    s3 AS (
        SELECT doc_id,
               1.0 - CAST(count(DISTINCT g) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                   AS dup_3gram_frac
        FROM g3 GROUP BY 1
    )
    SELECT k.doc_id, len(k.t) AS n_tokens, s2.top_2gram_frac, s3.dup_3gram_frac
    FROM toks k
    JOIN s2 ON s2.doc_id = k.doc_id
    JOIN s3 ON s3.doc_id = k.doc_id
    ORDER BY k.doc_id
    """,
    tags=("corpus", "quality", "repetition", "gopher-filters"),
)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality stats per document (the Gopher filter
    family): fraction of 2-gram mass held by the most frequent 2-gram,
    and fraction of 3-gram occurrences that are repeats. Degenerate /
    boilerplate docs score high on both; a curation pass filters on
    thresholds (e.g. top_2gram_frac > 0.20). One explode per gram
    order, pre-aggregated per (doc, gram) before the per-doc rollup —
    the partial aggregate absorbs repetitive-doc skew map-side."""
    d = parallel_table(spark, sf_dir, "documents", "doc_id").select("doc_id", _tokens().alias("t"))
    g2 = d.select("doc_id", F.explode(_grams(F.col("t"), 2)).alias("g"))
    g3 = d.select("doc_id", F.explode(_grams(F.col("t"), 3)).alias("g"))
    s2 = (
        g2.groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            (F.max("c").cast("double") / F.sum("c").cast("double")).alias(
                "top_2gram_frac"
            )
        )
    )
    s3 = g3.groupBy("doc_id").agg(
        (
            F.lit(1.0)
            - F.count_distinct(F.col("g")).cast("double") / F.count("*").cast("double")
        ).alias("dup_3gram_frac")
    )
    return (
        d.select("doc_id", F.size("t").alias("n_tokens"))
        .join(s2, "doc_id")
        .join(s3, "doc_id")
    )


@register(
    "doc_pii_scrub",
    oracle="""
    WITH staged AS (
        SELECT doc_id,
               text || ' contact user' || doc_id ||
               '@example.com or call 555-0142 today' AS raw
        FROM documents
    ),
    scrubbed AS (
        SELECT doc_id,
               len(regexp_extract_all(raw, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}'))
                   AS n_emails,
               len(regexp_extract_all(raw, '\\d{3}-\\d{4}')) AS n_phones,
               regexp_replace(
                   regexp_replace(raw, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}',
                                  '<EMAIL>', 'g'),
                   '\\d{3}-\\d{4}', '<PHONE>', 'g') AS clean
        FROM staged
    )
    SELECT doc_id, CAST(n_emails AS BIGINT) AS n_emails,
           CAST(n_phones AS BIGINT) AS n_phones,
           md5(clean) AS clean_hash
    FROM scrubbed
    ORDER BY doc_id
    """,
    tags=("corpus", "pii", "redaction"),
)
def doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass: count and replace email / phone patterns,
    emitting per-doc hit counts and a hash of the scrubbed text (the
    hash is the parity check — both engines must produce byte-identical
    redacted output). The synthetic corpus contains no organic PII, so
    the query stages deterministic PII into each doc first — the scrub
    itself is the operator under test. Pure map, zero shuffles; the
    regex family is RE2/Java-compatible (char classes + bounded
    quantifiers only)."""
    d = parallel_table(spark, sf_dir, "documents", "doc_id")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or call 555-0142 today"),
    )
    email = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
    phone = r"\d{3}-\d{4}"
    staged = d.select("doc_id", raw.alias("raw"))
    return (
        staged.select(
            "doc_id",
            F.size(F.regexp_extract_all("raw", F.lit(email), F.lit(0))).cast("long").alias(
                "n_emails"
            ),
            F.size(F.regexp_extract_all("raw", F.lit(phone), F.lit(0))).cast("long").alias(
                "n_phones"
            ),
            F.md5(
                F.regexp_replace(
                    F.regexp_replace("raw", email, "<EMAIL>"), phone, "<PHONE>"
                )
            ).alias("clean_hash"),
        )
    )


@register(
    "benchmark_decontaminate",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
        FROM documents
    ),
    g3 AS (
        SELECT DISTINCT doc_id,
               unnest(list_distinct(list_transform(range(1, len(t) - 1),
                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS g
        FROM toks
    ),
    bench_grams AS (
        SELECT DISTINCT g FROM g3 WHERE doc_id % 97 = 0
    ),
    overlap AS (
        SELECT c.doc_id, count(*) AS n_shared
        FROM g3 c JOIN bench_grams b ON c.g = b.g
        WHERE c.doc_id % 97 <> 0
        GROUP BY 1
    )
    SELECT k.doc_id,
           coalesce(o.n_shared, 0) AS n_shared,
           coalesce(o.n_shared, 0) >= 5 AS contaminated
    FROM (SELECT doc_id FROM toks WHERE doc_id % 97 <> 0) k
    LEFT JOIN overlap o ON o.doc_id = k.doc_id
    ORDER BY k.doc_id
    """,
    tags=("corpus", "decontamination", "ngram-overlap"),
)
def benchmark_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing >= 5
    distinct word-3-grams with a held-out benchmark set (docs with
    doc_id % 97 == 0 stand in for the eval suite). The benchmark gram
    set is eval-sized, so it broadcasts; corpus grams stream past it
    without shuffling — at 100 TB this is the only formulation that
    works (the corpus side never materializes a join shuffle). Grams
    are deduped per doc BEFORE the join so a repetitive doc can't
    inflate its own overlap count."""
    is_bench = F.col("doc_id") % 97 == 0
    # Two independent lineages on purpose: the benchmark side is
    # eval-sized, so it reads a plain scan (a broadcast build re-executes
    # its subtree — keeping it shuffle-free makes that rebuild cheap);
    # the corpus side carries the heavy gram explode and gets the
    # parallel repartition.
    bench_d = table(spark, sf_dir, "documents").filter(is_bench)
    bench_grams = (
        bench_d.select(F.explode(F.array_distinct(_grams(_tokens(), 3))).alias("g"))
        .distinct()
    )
    d = parallel_table(spark, sf_dir, "documents", "doc_id").select("doc_id", _tokens().alias("t"))
    g3 = d.select(
        "doc_id", F.explode(F.array_distinct(_grams(F.col("t"), 3))).alias("g")
    )
    # Zero-overlap docs ride the SAME aggregation as the hits (weight-0
    # marker rows unioned in) instead of a corpus-wide left join after
    # it — one shuffle on doc_id total, not an agg exchange plus a join
    # exchange (VERDICT r4 task 1; A/B at sf0.1: 0.46 -> 0.42 s best-of-6
    # with a visibly tighter distribution, identical rows).
    hits = (
        g3.filter(~is_bench)
        .join(F.broadcast(bench_grams), "g", "left_semi")
        .select("doc_id", F.lit(1).alias("w"))
    )
    alldocs = d.filter(~is_bench).select("doc_id", F.lit(0).alias("w"))
    out = (
        hits.unionAll(alldocs)
        .groupBy("doc_id")
        .agg(F.sum("w").cast("long").alias("n_shared"))
        .select(
            "doc_id",
            "n_shared",
            (F.col("n_shared") >= 5).alias("contaminated"),
        )
    )
    # doc-count result over a KB-scale gram relation: input-sized
    # exchange width (A/B best-of-4 at sf0.1: 0.73 -> 0.63 s; no-op at
    # warehouse scale)
    from kamiyo_hive_spark.catalog import input_sized_shuffle

    with input_sized_shuffle(spark, sf_dir, "documents"):
        return out.localCheckpoint()


@register(
    "source_cap_curation",
    oracle="""
    WITH ranked AS (
        SELECT source, doc_id, n_chars,
               row_number() OVER (
                   PARTITION BY source ORDER BY n_chars DESC, doc_id
               ) AS rn
        FROM documents
    )
    SELECT source,
           CAST(SUM(CASE WHEN rn <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN rn > 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
           CAST(SUM(CASE WHEN rn <= 10 THEN n_chars ELSE 0 END) AS BIGINT) AS chars_kept
    FROM ranked
    GROUP BY 1
    ORDER BY source
    """,
    tags=("curation", "per-source-cap"),
)
def source_cap_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (the RefinedWeb/C4 anti-domination pass):
    keep at most K docs per source, preferring the longest (a quality
    proxy; any scoring column drops in), with doc_id as the
    deterministic tiebreak. Output is the per-source curation ledger —
    kept/dropped counts and surviving char mass.

    Scale posture: ONE exchange — the window partitions by source, and
    the summary group-by reuses that exact partitioning (Catalyst elides
    the second shuffle). Hot sources (crawl domination is exactly the
    skew case) stream through a bounded rank: row_number needs no
    per-group buffering beyond sort runs, and the cap drops the tail
    before anything else consumes it."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), "doc_id")
    kept = F.col("rn") <= 10
    return (
        d.select("source", "doc_id", "n_chars")
        .withColumn("rn", F.row_number().over(w))
        .groupBy("source")
        .agg(
            F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(~kept, 1).otherwise(0)).alias("n_dropped"),
            F.sum(F.when(kept, F.col("n_chars")).otherwise(0)).alias("chars_kept"),
        )
    )


# ---------------------------------------------------------------------------
# Embedding-cluster-balanced curation (DoReMi/cluster-reweighting shape)
# ---------------------------------------------------------------------------

CBC_K = 8  # semantic clusters (seed centroids: vec_id < K)

_CBC_ORACLE = f"""
WITH raw AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
),
d AS (
    SELECT vec_id,
           list_transform(
               v, x -> x / sqrt(list_reduce(list_transform(v, y -> y * y),
                                            (acc, y) -> acc + y))) AS nv
    FROM raw
),
c AS (SELECT vec_id AS cid, nv AS cv FROM d WHERE vec_id < {CBC_K}),
scored AS (
    SELECT d.vec_id, c.cid,
           round(list_reduce(list_transform(list_zip(d.nv, c.cv), p -> p[1] * p[2]),
                             (acc, x) -> acc + x), 9) AS sim
    FROM d, c
),
assigned AS (
    SELECT vec_id, cid
    FROM (SELECT vec_id, cid,
                 row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
          FROM scored)
    WHERE rn = 1
),
clus AS (
    SELECT a.cid AS cluster_id,
           count(*) AS n_docs,
           CAST(SUM(doc.n_chars) AS BIGINT) AS total_chars
    FROM assigned a JOIN documents doc ON doc.doc_id = a.vec_id
    GROUP BY 1
),
tot AS (SELECT CAST(SUM(total_chars) AS DOUBLE) / {CBC_K} AS budget FROM clus)
SELECT cluster_id, n_docs, total_chars,
       round(least(1.0, tot.budget / total_chars), 9) AS keep_rate
FROM clus, tot
ORDER BY cluster_id
"""


@register(
    "cluster_balanced_curation",
    oracle=_CBC_ORACLE,
    tags=("curation", "embedding", "mixture"),
)
def cluster_balanced_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic-cluster-balanced sampling plan: assign every document to
    its nearest seed centroid in embedding space (the SemDeDup seeding
    convention, K=8), then give each cluster an equal share of the
    corpus character budget and emit the per-cluster keep-rate — the
    cluster-reweighting curation shape (DoReMi-style domain balancing,
    but with machine-discovered semantic domains instead of source
    labels).

    Cross-modal by construction: embeddings drive the grouping, the
    documents table supplies the cost (chars); they join on the shared
    id. Scale posture: centroid assignment is a map-side broadcast
    crossJoin + per-vector argmax (no shuffle beyond the id groupBy);
    the doc join is an equi-join on the primary key (co-partitioned on
    a real lake); cluster totals and the grand-total budget are
    metadata-sized aggregates joined back via broadcast. keep_rate is
    one double division rounded to 9 dp — deterministic on any engine.
    """
    from kamiyo_hive_spark.operators.similarity import assign_to_seed_centroids

    assigned = assign_to_seed_centroids(spark, sf_dir, CBC_K).select("vec_id", "cid")
    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    clus = (
        assigned.join(docs, assigned.vec_id == docs.doc_id)
        .groupBy(F.col("cid").alias("cluster_id"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )
    tot = clus.agg(
        (F.sum("total_chars").cast("double") / CBC_K).alias("budget")
    )
    return clus.crossJoin(F.broadcast(tot)).select(
        "cluster_id",
        "n_docs",
        "total_chars",
        F.round(
            F.least(F.lit(1.0), F.col("budget") / F.col("total_chars")), 9
        ).alias("keep_rate"),
    )


@register(
    "ngram_lm_quality",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
        FROM documents
    ),
    uni AS (
        SELECT unnest(t) AS w FROM toks
    ),
    c1 AS (SELECT w, count(*) AS cw FROM uni GROUP BY 1),
    v AS (SELECT count(*) AS vocab FROM c1),
    bg AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t)),
                                     i -> t[i] || ' ' || t[i+1])) AS g
        FROM toks
        WHERE len(t) >= 2
    ),
    c2 AS (SELECT g, count(*) AS cg FROM bg GROUP BY 1),
    terms AS (
        SELECT bg.doc_id,
               round(ln((c2.cg + 1.0) / (c1.cw + v.vocab)), 9) AS logp
        FROM bg
        JOIN c2 USING (g)
        JOIN c1 ON c1.w = split_part(bg.g, ' ', 1)
        CROSS JOIN v
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(list_reduce(list_sort(list(logp)), (acc, x) -> acc + x)
                 / count(*), 9) AS avg_logprob
    FROM terms
    GROUP BY 1
    ORDER BY doc_id
    """,
    tags=("corpus", "lm-quality", "perplexity", "training-pipeline"),
)
def ngram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality scoring, self-contained: train an add-one
    bigram language model ON the corpus (unigram/bigram counts + vocab
    size), then score every document by its mean bigram log-probability
    — the standard perplexity-filtering signal a pretraining pipeline
    computes between crawl and tokenizer (low mean log-prob = unusual
    token transitions = boilerplate/garbled text; production swaps in a
    clean-reference LM, which only changes the counts table).

    Scale posture: the model IS two aggregate tables — unigram and
    bigram counts (one explode + map-side-combined groupBy each,
    vocab-bounded ≪ corpus) — and scoring is two equi-joins of the
    exploded corpus against them. No per-row Python, no driver-side
    model state; vocab size rides along as a broadcast 1-row aggregate.

    Float discipline: ln is the repo's first transcendental — each term
    is rounded to 9 dp immediately (both engines), and the per-doc sum
    runs over the SORTED term list with a sequential fold, so the
    addition sequence is bit-identical to the oracle's list_reduce.
    """
    d = parallel_table(spark, sf_dir, "documents", "doc_id")
    toks = _tokens()
    # bg feeds both the bigram-count build and the scoring join.
    # Deliberately NOT cached: caching the exploded token relation was
    # measured SLOWER (0.9 -> 2.3s) — materializing wide string rows
    # costs more than re-running the JVM-side explode over the tiny
    # parquet. Re-scan beats re-materialize for cheap expansions.
    bg = d.select("doc_id", F.explode(_grams(toks, 2)).alias("g"))
    uni = d.select(F.explode(toks).alias("w"))
    c1 = uni.groupBy("w").agg(F.count("*").alias("cw"))
    c2 = bg.groupBy("g").agg(F.count("*").alias("cg"))
    vocab = c1.agg(F.count("*").alias("vocab"))
    # The model collapses to ONE gram->logp table before touching the
    # corpus again (VERDICT r4 task 1): the c2-c1 join is vocab-scale
    # (distinct bigrams), so the corpus-scale relation streams past a
    # single broadcast instead of shuffling through two equi-joins.
    # (A/B at sf0.1: the two shapes tie locally; the fused model wins
    # at scale by cutting one full corpus exchange. Where the distinct-
    # bigram table outgrows broadcast, both shapes degenerate to the
    # same shuffle join — the fused one still does it once, not twice.)
    # r5 A/B (VERDICT r4 task 2): the dsir-style literal-map lookup is
    # 0.5 s SLOWER here (join 0.79/0.91 vs map 1.27/1.39 best/med,
    # interleaved best-of-6) — collecting the model is an EAGER job
    # that serializes the whole count pipeline before the scoring job
    # starts, while the broadcast join overlaps both in one job. It
    # would also be scale-wrong: distinct bigrams grow with the
    # corpus, unlike dsir's constant 1024 buckets. Negative recorded;
    # the join stays.
    model = (
        c2.withColumn("w1", F.split(F.col("g"), " ")[0])
        .join(c1, F.col("w1") == c1["w"])
        .crossJoin(F.broadcast(vocab))
        .select(
            "g",
            F.round(
                F.log((F.col("cg") + F.lit(1.0)) / (F.col("cw") + F.col("vocab"))), 9
            ).alias("logp"),
        )
    )
    terms = bg.join(F.broadcast(model), "g").select("doc_id", "logp")
    folded = F.aggregate(
        F.sort_array(F.collect_list("logp")), F.lit(0.0), lambda acc, x: acc + x
    )
    out = terms.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.round(folded / F.count("*"), 9).alias("avg_logprob"),
    )
    # Execute under an input-sized shuffle width (the corpus file is
    # ~0.6 MB at sf0.1; the 4 exchanges here paid 32-task scheduling
    # for KB-sized partitions — A/B best-of-6: 1.08 s → 0.82 s at
    # width 8, no-op at warehouse scale). The result is doc-count rows;
    # checkpointing it inside the block is what makes the pin apply.
    from kamiyo_hive_spark.catalog import input_sized_shuffle

    with input_sized_shuffle(spark, sf_dir, "documents"):
        return out.localCheckpoint()


DSIR_BUCKETS = 1024  # hashed-feature space (B); model tables are B rows
DSIR_TARGET = "src0"  # deterministic target domain for the self-test
DSIR_SEED = 13


@register(
    "dsir_importance_scores",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, source,
               unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
        FROM documents
    ),
    b AS (
        SELECT doc_id, source,
               CAST(concat('0x', substr(md5(concat(w, ':{DSIR_SEED}')), 1, 15))
                    AS BIGINT) % {DSIR_BUCKETS} AS b
        FROM tok
    ),
    tgt AS (SELECT b, count(*) AS ct FROM b WHERE source = '{DSIR_TARGET}' GROUP BY 1),
    raw AS (SELECT b, count(*) AS cr FROM b GROUP BY 1),
    tots AS (
        SELECT (SELECT count(*) FROM b WHERE source = '{DSIR_TARGET}') AS tt,
               (SELECT count(*) FROM b) AS rt
    ),
    terms AS (
        SELECT b.doc_id,
               round(ln(((coalesce(tgt.ct, 0) + 1.0) / (tots.tt + {DSIR_BUCKETS}))
                        / ((raw.cr + 1.0) / (tots.rt + {DSIR_BUCKETS}))), 9) AS lp
        FROM b
        JOIN raw USING (b)
        LEFT JOIN tgt USING (b)
        CROSS JOIN tots
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_feats,
           round(list_reduce(list_sort(list(lp)), (acc, x) -> acc + x), 9)
               AS dsir_score
    FROM terms
    GROUP BY 1
    ORDER BY doc_id
    """,
    tags=("corpus", "dsir", "importance-sampling", "training-pipeline"),
)
def dsir_importance_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-shape data selection (Xie et al. 2023, public): score every
    document by the sum of hashed-feature log importance ratios
    log(p_target(f)/p_raw(f)) — the importance-resampling signal used
    to tilt a raw crawl toward a target domain. Self-contained variant:
    target = the 'src0' source slice, features = unigrams hashed into
    1024 buckets, add-one smoothing on both estimators.

    Scale posture — BETTER than the LM-quality join: both "models" are
    B-row (1024) aggregate tables, so scoring is two BROADCAST joins
    against the exploded corpus; the only corpus-sized shuffle is the
    final per-doc aggregation (map-side combined). At 100 TB the
    target estimator reads only the target slice (partition-pruned on
    a real lake).

    Float discipline as `ngram_lm_quality`: per-term round(ln, 9),
    per-doc sum over the sorted term list (sequential fold ==
    list_reduce). The division composition is written identically on
    both engines so the double ops sequence matches exactly."""
    from kamiyo_hive_spark.operators.dedup import _portable_hash

    d = parallel_table(spark, sf_dir, "documents", "doc_id")
    # Two consumers (the fused count pass and the scoring join) re-run
    # the tokenize+hash explode; caching it was measured SLOWER (1.5 ->
    # 3.0s, same lesson as ngram_lm_quality above) — the explode is
    # cheaper than materializing its output.
    tok = d.select("doc_id", "source", F.explode(_tokens()).alias("w")).withColumn(
        "b",
        F.pmod(_portable_hash(F.col("w"), DSIR_SEED), F.lit(DSIR_BUCKETS)),
    )
    # Target and raw estimators come out of ONE conditional aggregation
    # (VERDICT r4 task 1: was two groupBys + two scoring joins — one
    # corpus explode fewer, and the B-row model collapses to a single
    # (b -> lp) ratio table before the corpus sees it; A/B at sf0.1
    # measured 1.09 -> 0.92 s best-of-6 with identical values).
    counts = tok.groupBy("b").agg(
        F.count("*").alias("cr"),
        F.sum(F.when(F.col("source") == DSIR_TARGET, 1).otherwise(0)).alias("ct"),
    )
    tots = counts.agg(F.sum("cr").alias("rt"), F.sum("ct").alias("tt"))
    lp = F.round(
        F.log(
            ((F.col("ct") + F.lit(1.0)) / (F.col("tt") + F.lit(DSIR_BUCKETS)))
            / ((F.col("cr") + F.lit(1.0)) / (F.col("rt") + F.lit(DSIR_BUCKETS)))
        ),
        9,
    )
    ratio = counts.crossJoin(F.broadcast(tots)).select("b", lp.alias("lp"))
    # The model is a CONSTANT-bounded table (B = DSIR_BUCKETS = 1024
    # rows at any corpus size), so it ships as a literal map expression
    # instead of a broadcast-join relation: the lookup becomes a plain
    # projection inside the same whole-stage-codegen pass as the
    # explode + final aggregation — no join operator, no broadcast
    # exchange, one stage fewer (r3 task-1 suggestion, A/B'd r5; the
    # collect is bounded by the B constant, never corpus-sized). The
    # doubles round-trip exactly: shortest-repr string → CAST AS
    # DOUBLE. Built as ONE parsed SQL expression — a Python loop of
    # Column ops would pay ~3 py4j round-trips per entry.
    entries = ",".join(
        f"{int(r['b'])},CAST('{r['lp']!r}' AS DOUBLE)"
        for r in ratio.collect()
    )
    lp_of_b = F.element_at(F.expr(f"map({entries})"), F.col("b"))
    terms = tok.select("doc_id", lp_of_b.alias("lp"))
    folded = F.aggregate(
        F.sort_array(F.collect_list("lp")), F.lit(0.0), lambda acc, x: acc + x
    )
    return terms.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_feats"),
        F.round(folded, 9).alias("dsir_score"),
    )

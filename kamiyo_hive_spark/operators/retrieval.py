"""Corpus retrieval / scoring operators for training-data curation.

Three operators a 100 TB text pipeline runs constantly:

- ``bm25_doc_search`` — classic sparse retrieval (Okapi BM25) used to
  mine in-domain documents for a query (e.g. quality-seed expansion,
  RAG corpus probes). Reference behavior surface: the keyword search
  path of the listing scan (SURVEY §2.1 S1 / §2.2 P7) generalized to
  ranked retrieval.
- ``quality_classifier_score`` — fastText-style hashed bag-of-words
  linear scorer (the CCNet/Gopher "quality filter" shape): each token
  maps through a deterministic hash to a weight; a document's score is
  the exact integer sum of its token weights. No model file, no Python
  UDF — the weight function IS the hash, so the classifier runs as
  whole-stage-codegen JVM expressions at any corpus size.
- ``bpe_pair_induction`` — the first merge round of BPE vocabulary
  induction: count adjacent character pairs over the whole corpus and
  rank the merge candidates. At 100 TB this is the canonical
  map-side-combine aggregation (tiny key space, huge input).

Scale posture shared by all three: tokenize → explode → hash-aggregate
with map-side partial aggregation; per-term/corpus statistics are
metadata-sized relations joined back via broadcast. No Python in the
hot path anywhere.

Float discipline (registry determinism contract): transcendentals are
evaluated once per *term* (3 idf values), rounded to 9 dp immediately;
per-document sums run over DECIMAL so accumulation order can never
change a hash-checked value. The classifier avoids floats entirely —
its score is an integer sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kamiyo_hive_spark.catalog import table
from kamiyo_hive_spark.operators.dedup import _portable_hash
from kamiyo_hive_spark.operators.text import _tokens
from kamiyo_hive_spark.plans.registry import register

# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------

BM25_TERMS = ("spark", "hash", "window")  # query: terms present in the corpus
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_N = 20

_BM25_ORACLE = f"""
WITH d AS (
    SELECT doc_id, lang,
           string_split_regex(trim(text), '\\s+') AS toks,
           len(string_split_regex(trim(text), '\\s+')) AS dl
    FROM documents
),
stats AS (
    SELECT count(*) AS n_docs,
           CAST(SUM(dl) AS DOUBLE) / count(*) AS avgdl
    FROM d
),
tf AS (
    SELECT d.doc_id, d.lang, d.dl, t.t AS term, count(*) AS tfc
    FROM d, unnest(d.toks) AS t(t)
    WHERE t.t IN {BM25_TERMS!r}
    GROUP BY 1, 2, 3, 4
),
df AS (SELECT term, count(*) AS dfc FROM tf GROUP BY 1),
scored AS (
    SELECT tf.doc_id, tf.lang,
           round(
             round(ln((stats.n_docs - df.dfc + 0.5) / (df.dfc + 0.5) + 1), 9)
             * (tf.tfc * ({BM25_K1} + 1))
             / (tf.tfc + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * tf.dl / stats.avgdl)),
             9) AS s
    FROM tf JOIN df USING (term) CROSS JOIN stats
)
SELECT doc_id, lang,
       CAST(SUM(CAST(s AS DECIMAL(28, 9))) AS DOUBLE) AS bm25
FROM scored
GROUP BY 1, 2
ORDER BY bm25 DESC, doc_id
LIMIT {BM25_TOP_N}
"""


@register("bm25_doc_search", oracle=_BM25_ORACLE, tags=("text", "retrieval", "bm25"))
def bm25_doc_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-20 documents for a fixed 3-term query.

    Plan shape (and why it scales): one pass builds (doc, term, tf)
    for query terms only — the `isin` filter prunes the exploded
    stream before any aggregation, so the shuffled relation is
    O(matching docs × |query|), not O(corpus tokens). Corpus stats
    (N, avgdl) and per-term document frequencies are metadata-sized
    aggregates joined back as broadcasts; the final per-doc sum is one
    hash aggregation. idf is the only transcendental — computed once
    per term and rounded to 9 dp; per-doc accumulation is DECIMAL so
    the hash-checked score is independent of partial-agg order.
    """
    d = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", _tokens().alias("toks")
    )
    d = d.withColumn("dl", F.size("toks"))
    stats = d.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    tf = (
        d.select("doc_id", "lang", "dl", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(*BM25_TERMS))
        .groupBy("doc_id", "lang", "dl", "term")
        .agg(F.count("*").alias("tfc"))
    )
    df = tf.groupBy("term").agg(F.count("*").alias("dfc"))
    idf = F.round(
        F.log((F.col("n_docs") - F.col("dfc") + 0.5) / (F.col("dfc") + 0.5) + 1), 9
    )
    score = F.round(
        idf
        * (F.col("tfc") * (BM25_K1 + 1))
        / (
            F.col("tfc")
            + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
        ),
        9,
    )
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "lang", score.alias("s"))
    )
    return (
        scored.groupBy("doc_id", "lang")
        .agg(F.sum(F.col("s").cast("decimal(28,9)")).cast("double").alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(BM25_TOP_N)
    )


# ---------------------------------------------------------------------------
# Hashed-feature linear quality classifier
# ---------------------------------------------------------------------------

QC_SEED = 211  # weight-hash seed (fixture stand-in for trained weights)

_QC_ORACLE = f"""
WITH tok AS (
    SELECT doc_id, lang, t.t AS tok
    FROM documents, unnest(string_split_regex(trim(text), '\\s+')) AS t(t)
),
w AS (
    SELECT doc_id, lang,
           CAST(concat('0x', substr(md5(tok || ':{QC_SEED}'), 1, 15)) AS BIGINT)
               % 2001 - 1000 AS wgt
    FROM tok
),
doc AS (
    SELECT doc_id, lang, SUM(wgt) AS score_int
    FROM w GROUP BY 1, 2
)
SELECT lang,
       count(*) AS n_docs,
       CAST(SUM(CASE WHEN score_int > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       CAST(SUM(score_int) AS BIGINT) AS sum_score
FROM doc
GROUP BY lang
"""


@register(
    "quality_classifier_score",
    oracle=_QC_ORACLE,
    tags=("text", "quality", "classifier"),
)
def quality_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed bag-of-words linear classifier (fastText-filter shape).

    weight(token) = portable_hash(token) % 2001 - 1000 — a stand-in
    for trained weights with the same execution shape: a pure hash →
    weight projection, so inference is whole-stage codegen with ZERO
    model state to ship. A production swap-in replaces the hash with a
    broadcast map lookup and changes nothing else about the plan.

    Scores are exact integer sums (no float accumulation at all), so
    the keep/drop decision and every reported aggregate are
    bit-reproducible on any engine, any partitioning. The 60-bit
    md5-prefix hash is non-negative, so `%` has no sign ambiguity
    cross-engine.
    """
    d = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.explode(_tokens()).alias("tok")
    )
    wgt = F.pmod(_portable_hash(F.col("tok"), QC_SEED), F.lit(2001)) - 1000
    doc = (
        d.select("doc_id", "lang", wgt.alias("wgt"))
        .groupBy("doc_id", "lang")
        .agg(F.sum("wgt").alias("score_int"))
    )
    return doc.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("score_int") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_keep"),
        F.sum("score_int").cast("long").alias("sum_score"),
    )


# ---------------------------------------------------------------------------
# BPE pair induction (first merge round)
# ---------------------------------------------------------------------------

BPE_TOP_PAIRS = 50

_BPE_PAIR_ORACLE = f"""
WITH tok AS (
    SELECT t.t AS tok
    FROM documents, unnest(string_split_regex(trim(text), '\\s+')) AS t(t)
    WHERE len(t.t) > 1
),
pairs AS (
    SELECT p.p AS pair
    FROM tok,
         unnest(list_transform(generate_series(1, len(tok) - 1),
                               i -> substr(tok, CAST(i AS INTEGER), 2))) AS p(p)
)
SELECT pair, count(*) AS n
FROM pairs
GROUP BY pair
ORDER BY n DESC, pair
LIMIT {BPE_TOP_PAIRS}
"""


@register(
    "bpe_pair_induction",
    oracle=_BPE_PAIR_ORACLE,
    tags=("text", "tokenizer", "bpe"),
)
def bpe_pair_induction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE merge round: corpus-wide adjacent character-pair
    counts, ranked. The distributed shape of tokenizer training.

    Plan: tokenize → explode tokens → explode character bigrams
    (`transform(sequence(...))`, JVM-side — no Python) → hash
    aggregate. The key space is tiny (alphabet²), so map-side partial
    aggregation collapses the exploded stream before the one shuffle;
    the top-50 is a TakeOrdered over ~10² grouped rows. This is the
    pattern that holds at 100 TB: per-partition combine does all the
    work, the exchange carries only (pair, partial-count) rows.
    """
    toks = (
        table(spark, sf_dir, "documents")
        .select(F.explode(_tokens()).alias("tok"))
        .filter(F.length("tok") > 1)
    )
    pairs = toks.select(
        F.explode(
            F.expr("transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(BPE_TOP_PAIRS)
    )

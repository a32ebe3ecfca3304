"""Structured Streaming operators (SURVEY §2.9, ST1-ST8).

Each job is a real `readStream → transform → writeStream` pipeline,
driven to completion over the bounded events table (file source +
memory sink + `processAllAvailable`) so the driver can call it like any
batch query and hash-check the final state against a batch SQL oracle.
In production the same pipelines run unbounded on Kafka/file streams —
nothing below is test-only except the sink.

- ST1 tumbling-window aggregation with watermark (per-epoch signal
  aggregator, kamiyo-hive `swarm-types.ts:147-158`).
- ST4 stateful running tallies in update mode (on-chain vote counters,
  `lib.rs:115-120`).
- ST7 streaming dedup by key (nullifier uniqueness, `lib.rs:276-286`).
- ST2/ST8 deadline + quorum/threshold triggers are the tally queries'
  WHERE clauses over the windowed state.

Scale notes: state is keyed by (window, type) / user — bounded by
watermark eviction, never by stream length. `complete` output mode is
used only with the in-memory test sink; production sinks use
append/update so state and output stay incremental.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kamiyo_hive_spark.catalog import _EVENTS_READ_SCHEMA
from kamiyo_hive_spark.functions.money import dec
from kamiyo_hive_spark.plans.registry import register


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table as a bounded stream (one file = one batch)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # File streaming sources take a directory; pathGlobFilter narrows it
    # to the events table (in production this is the events/ partition
    # root or a Kafka topic).
    raw = (
        spark.readStream.schema(_EVENTS_READ_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.select(
        "event_id",
        F.timestamp_micros(F.expr("ts div 1000")).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


def _run_to_completion(result: DataFrame, name: str, mode: str) -> None:
    # The state store creates one instance per shuffle partition for the
    # life of the query; a host session left at the 200 default burns
    # ~200 empty state tasks per micro-batch. Pin a right-sized value
    # for this bounded query, restore the host setting after.
    spark = result.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            result.writeStream.outputMode(mode)
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


@register(
    "streaming_window_agg",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
    tags=("ST1", "streaming"),
)
def streaming_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST1: tumbling 1-hour event-time windows with a 10-minute
    watermark, aggregated incrementally in the state store. Final state
    must equal the batch aggregation — the exactly-once guarantee the
    whole streaming layer rests on."""
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
    )
    _run_to_completion(agg, "stream_window_agg_out", "complete")
    return (
        spark.table("stream_window_agg_out")
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "streaming_dedup_keys",
    oracle="""
    SELECT DISTINCT user_id, event_type
    FROM events
    ORDER BY user_id, event_type
    """,
    tags=("ST7", "J5", "streaming"),
)
def streaming_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST7: streaming dedup — the nullifier-uniqueness barrier. First
    occurrence of each key passes; replays are dropped from the stream.
    Output projected to the key set so the result is order-independent."""
    stream = _events_stream(spark, sf_dir)
    deduped = stream.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )
    _run_to_completion(deduped, "stream_dedup_out", "append")
    return spark.table("stream_dedup_out").orderBy("user_id", "event_type")


@register(
    "streaming_running_tally",
    oracle="""
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS votes_for,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS votes_against,
           count(*) AS vote_count,
           (count(*) >= 2 AND
            CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
              >= CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)) AS passed
    FROM events
    WHERE ts < TIMESTAMP '2024-01-08 00:00:00'
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("ST4", "ST2", "ST8", "A1", "streaming"),
)
def streaming_running_tally(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST4+ST2+ST8: per-key running tallies (votes_for/against/count)
    maintained in update-mode streaming state, with the deadline cutoff
    (event-time filter — late votes rejected) and the quorum>=2 +
    majority decision applied to the final state (`lib.rs:93-156`)."""
    stream = _events_stream(spark, sf_dir).filter(
        F.col("ts") < F.lit("2024-01-08 00:00:00").cast("timestamp")
    )
    tally = stream.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("votes_for"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("votes_against"),
        F.count("*").alias("vote_count"),
    )
    _run_to_completion(tally, "stream_tally_out", "complete")
    return (
        spark.table("stream_tally_out")
        .withColumn(
            "passed",
            (F.col("vote_count") >= 2) & (F.col("votes_for") >= F.col("votes_against")),
        )
        .orderBy("user_id")
    )

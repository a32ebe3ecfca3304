"""Multimodal column plumbing (driver-mandated).

Image/audio/video payloads are opaque `binary` columns with a typed
metadata struct riding alongside (the lakehouse-standard layout: bytes +
width/height/codec/duration columns, partitioned by modality/date).
Real decode/resize/frame-sample needs codec libraries this container
doesn't ship, so the decode kernel is STUBBED — `decode_image_batch`
raises NotImplementedError, and the deterministic fake
(`fake_feature_extract`) stands in so the Spark-side plumbing (schema,
Arrow batch shape, partition behavior) is real and tested.

All Python runs through `mapInPandas` (Arrow batches), never per-row.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kamiyo_hive_spark.catalog import table
from kamiyo_hive_spark.plans.registry import register

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("fake_width", T.LongType()),
        T.StructField("fake_height", T.LongType()),
    ]
)


def as_binary_assets(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, modality, payload binary, meta struct).

    Stand-in ingestion: text bytes play the role of image payloads. The
    schema is the real contract — swapping in actual image bytes changes
    nothing downstream.
    """
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("modality"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.col("source").alias("origin"),
            F.col("n_chars").alias("raw_size"),
            F.col("lang").alias("tag"),
        ).alias("meta"),
    )


def decode_image_batch(payloads: pd.Series) -> pd.DataFrame:
    """REAL decode kernel — requires PIL/ffmpeg, absent in this
    container. The mapInPandas plumbing around it is fully tested via
    `fake_feature_extract`."""
    raise NotImplementedError(
        "image/audio decode needs codec libraries not shipped here; "
        "plug PIL/torchvision/ffmpeg in deployments"
    )


def feature_extract(assets: DataFrame, use_real_decode: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The decode kernel is bound through a LOCAL variable (None on the
    stub path): executor Python workers unpickle the closure by value,
    and a module-global reference would make cloudpickle serialize it
    by reference — forcing every worker to import `kamiyo_hive_spark`,
    which only exists on the driver's sys.path under the external
    harness. Worker-side closures must stay self-contained.
    """
    decode_fn = decode_image_batch if use_real_decode else None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if decode_fn is not None:
                feats = decode_fn(pdf["payload"])  # NotImplementedError
            payload = pdf["payload"]
            n = payload.map(len).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_bytes": n,
                    "content_hash": payload.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    # deterministic fake dims: what a decoder would emit
                    "fake_width": (n % 640 + 64),
                    "fake_height": (n % 480 + 48),
                }
            )

    return assets.mapInPandas(run, schema=FEATURE_SCHEMA)


@register(
    "multimodal_features",
    oracle="""
    SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS modality,
           count(*) AS n_assets,
           CAST(SUM(length(text)) AS BIGINT) AS total_bytes,
           count(DISTINCT md5(text)) AS n_distinct_payloads
    FROM documents
    GROUP BY 1
    ORDER BY modality
    """,
    tags=("multimodal", "mapInPandas"),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-asset feature extraction rolled up per modality. The
    byte counts and content hashes computed in the Arrow batches must
    agree with DuckDB computing them from the source text — proving the
    binary encode → mapInPandas → aggregate path end to end (texts are
    ASCII, so byte length == char length)."""
    docs = table(spark, sf_dir, "documents")
    feats = feature_extract(as_binary_assets(docs))
    return (
        feats.groupBy("modality")
        .agg(
            F.count("*").alias("n_assets"),
            F.sum("n_bytes").cast("long").alias("total_bytes"),
            F.countDistinct("content_hash").alias("n_distinct_payloads"),
        )
        .orderBy("modality")
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_bytes", T.BinaryType()),
        T.StructField("frame_hash", T.StringType()),
    ]
)

FRAME_SIZE = 64  # bytes per fake frame
FRAME_STRIDE = 128  # sample every other frame-sized window


def frame_sample(assets: DataFrame) -> DataFrame:
    """Frame sampling: one binary payload → N frame rows (the
    video-decode fan-out shape). The real decoder would emit decoded
    frames; the deterministic stand-in slices the payload at a fixed
    stride so schema, fan-out ratio, and batch behavior are all real.
    Arrow-batched mapInPandas: each input batch yields a frame batch,
    memory bounded by (batch size × frames per asset)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_bytes": [], "frame_hash": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                for idx, start in enumerate(range(0, len(data), FRAME_STRIDE)):
                    chunk = data[start : start + FRAME_SIZE]
                    if not chunk:
                        break
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_bytes"].append(chunk)
                    out["frame_hash"].append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(out)

    return assets.mapInPandas(run, schema=FRAME_SCHEMA)


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH frames AS (
        SELECT doc_id,
               CAST(ceil(length(text) / 128.0) AS BIGINT) AS n_frames
        FROM documents
    )
    SELECT CAST(SUM(n_frames) AS BIGINT) AS total_frames,
           count(*) AS n_assets,
           CAST(max(n_frames) AS BIGINT) AS max_frames_per_asset
    FROM frames
    """,
    tags=("multimodal", "frame-sample", "mapInPandas"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling fan-out rolled up to corpus totals: the frame
    count per asset produced by the Arrow pipeline must equal the
    closed-form ceil(bytes/stride) the oracle computes from the source
    (texts are ASCII so byte length == char length)."""
    docs = table(spark, sf_dir, "documents")
    frames = frame_sample(as_binary_assets(docs))
    per_asset = frames.groupBy("doc_id").agg(F.count("*").alias("n_frames"))
    return per_asset.agg(
        F.sum("n_frames").cast("long").alias("total_frames"),
        F.count("*").alias("n_assets"),
        F.max("n_frames").cast("long").alias("max_frames_per_asset"),
    )

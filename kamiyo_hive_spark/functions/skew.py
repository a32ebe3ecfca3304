"""Skew mitigation: salted two-phase aggregation and salted joins.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; salting is the declarative fallback for pathological keys —
e.g. a boilerplate fingerprint owning 10% of a 100 TB corpus, where a
single reducer would own the whole hot key.

`salted_agg` is semantically transparent for any associative aggregate:
phase 1 aggregates on (key, salt) — spreading the hot key over S
reducers — phase 2 merges the S partials per key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, buckets: int, col_name: str = "_salt") -> DataFrame:
    """Deterministic salt in [0, buckets): hash of the whole row's
    monotonically increasing id is NOT reproducible across runs, so we
    salt by a stable hash of all columns instead."""
    return df.withColumn(
        col_name, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(buckets))
    )


def salted_agg(
    df: DataFrame,
    key: str,
    partial: Callable[[], Column],
    merge: Callable[[Column], Column],
    out: str,
    buckets: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation: groupBy(key, salt) -> partial, then
    groupBy(key) -> merge of partials. For sum-like aggregates pass
    partial=lambda: F.sum(x), merge=F.sum."""
    salted = with_salt(df, buckets)
    phase1 = salted.groupBy(key, "_salt").agg(partial().alias("_partial"))
    return phase1.groupBy(key).agg(merge(F.col("_partial")).alias(out))

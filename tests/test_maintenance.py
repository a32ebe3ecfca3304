"""File-touch accounting for the maintenance operators: oracle parity
proves WHAT the result is; these prove HOW it was produced — a
targeted delete must not rewrite the world, and compaction must
actually reduce the file count.
"""

from __future__ import annotations

import os

from kamiyo_hive_spark.sources.maintenance import (
    COMPACT_FILES,
    DELETE_KEY_MOD,
    FRAGMENT_FILES,
    compact,
    delete_pool_dir,
    fragmented_dir,
    targeted_delete,
)


def _parquet_files(d: str) -> list[str]:
    return sorted(f for f in os.listdir(d) if f.endswith(".parquet"))


def test_targeted_delete_touches_subset_and_links_rest(spark, sf_dir):
    pool = delete_pool_dir(spark, sf_dir)
    out, n_total, n_rewritten = targeted_delete(spark, sf_dir)
    assert n_total == len(_parquet_files(pool))
    # the delete is selective: some files affected, but not all —
    # custkey % DELETE_KEY_MOD targets land in a subset of the
    # DELETE_POOL_FILES custkey ranges (64 files keeps this true at
    # every sf — see the constant's comment in maintenance.py)
    assert 0 < n_rewritten <= n_total
    # untouched files are the SAME inodes (hard links, zero copy)
    pool_inodes = {
        f: os.stat(os.path.join(pool, f)).st_ino for f in _parquet_files(pool)
    }
    shared = [
        f
        for f in _parquet_files(out)
        if f in pool_inodes
        and os.stat(os.path.join(out, f)).st_ino == pool_inodes[f]
    ]
    assert len(shared) == n_total - n_rewritten
    # no doomed rows survive
    from pyspark.sql import functions as F

    post = spark.read.parquet(out)
    assert post.filter(F.col("o_custkey") % DELETE_KEY_MOD == 0).count() == 0
    # row conservation: post-delete == pool minus doomed
    pooled = spark.read.parquet(pool)
    n_doomed = pooled.filter(F.col("o_custkey") % DELETE_KEY_MOD == 0).count()
    assert post.count() == pooled.count() - n_doomed
    assert n_doomed > 0  # non-vacuous


def test_compaction_reduces_files_and_orders_rows(spark, sf_dir):
    import pyarrow.parquet as pq

    frags = fragmented_dir(spark, sf_dir)
    out = compact(spark, sf_dir)
    n_frag, n_comp = len(_parquet_files(frags)), len(_parquet_files(out))
    assert n_frag == FRAGMENT_FILES
    assert n_comp <= COMPACT_FILES
    assert n_comp < n_frag
    # each compacted file is internally sorted on the cluster key
    for f in _parquet_files(out):
        keys = pq.read_table(
            os.path.join(out, f), columns=["l_orderkey", "l_linenumber"]
        ).to_pandas()
        tuples = list(zip(keys["l_orderkey"], keys["l_linenumber"]))
        assert tuples == sorted(tuples), f


def test_keyed_update_conserves_rows_and_links(spark, sf_dir):
    """UPDATE must conserve row count, touch only the files containing
    target keys, and leave the rest as the same inodes."""
    from pyspark.sql import functions as F

    from kamiyo_hive_spark.sources.maintenance import (
        UPDATE_KEY_MOD,
        keyed_update,
    )

    import os

    out, n_total, n_rewritten = keyed_update(spark, sf_dir)
    assert 0 < n_rewritten <= n_total
    pool = delete_pool_dir(spark, sf_dir)
    pooled = spark.read.parquet(pool)
    post = spark.read.parquet(out)
    assert post.count() == pooled.count()
    # updated rows really changed; untouched rows really didn't
    hit = F.col("o_custkey") % UPDATE_KEY_MOD == 0
    n_hit = pooled.filter(hit).count()
    assert n_hit > 0
    joined = (
        pooled.select("o_orderkey", F.col("o_totalprice").alias("before"))
        .join(post.select("o_orderkey", F.col("o_totalprice").alias("after"), "o_custkey"), "o_orderkey")
    )
    changed = joined.filter(F.col("before") != F.col("after"))
    assert changed.count() == n_hit
    assert changed.filter(~(F.col("o_custkey") % UPDATE_KEY_MOD == 0)).count() == 0
    # untouched files are shared inodes
    pool_inodes = {
        f: os.stat(os.path.join(pool, f)).st_ino for f in _parquet_files(pool)
    }
    shared = [
        f
        for f in _parquet_files(out)
        if f in pool_inodes
        and os.stat(os.path.join(out, f)).st_ino == pool_inodes[f]
    ]
    assert shared  # at least some files untouched at test scale

"""Physical-layout effectiveness tests: the z-order and snapshot
operators' ORACLE parity proves the layouts are semantically invisible;
these tests prove they actually deliver the physical win they exist
for (same discipline as the bloom-pruning effectiveness test).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from kamiyo_hive_spark.catalog import table
from kamiyo_hive_spark.sources.layout import (
    SNAPSHOT_CUTOVER,
    box_bounds,
    build_snapshots,
    read_increment,
    read_snapshot,
    write_zordered,
    zvalue,
)


def _file_ranges(out: str, cols: tuple[str, str]):
    """Per-file (min, max) of two columns from parquet footer stats."""
    ranges = []
    for f in sorted(os.listdir(out)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(out, f)).metadata
        stats = {c: [None, None] for c in cols}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in stats and col.statistics is not None:
                    lo, hi = col.statistics.min, col.statistics.max
                    cur = stats[name]
                    cur[0] = lo if cur[0] is None else min(cur[0], lo)
                    cur[1] = hi if cur[1] is None else max(cur[1], hi)
        ranges.append({c: tuple(stats[c]) for c in cols})
    return ranges


def _files_overlapping_box(ranges, box_part, box_supp):
    def overlaps(r):
        (plo, phi), (slo, shi) = r["l_partkey"], r["l_suppkey"]
        return not (phi < box_part[0] or plo > box_part[1]
                    or shi < box_supp[0] or slo > box_supp[1])

    return sum(1 for r in ranges if overlaps(r))


def test_zorder_prunes_files_1d_layout_cannot(spark, sf_dir, tmp_path):
    plo, phi, slo, shi = box_bounds(spark, sf_dir)
    box_part, box_supp = (plo, phi), (slo, shi)
    zdir = write_zordered(spark, sf_dir)
    zranges = _file_ranges(zdir, ("l_partkey", "l_suppkey"))
    n_zfiles = len(zranges)
    assert n_zfiles >= 4  # enough files for skipping to mean anything

    # baseline: the natural layout (range-partitioned by orderkey —
    # what a plain ingest produces), same file count
    base = str(tmp_path / "lineitem_natural")
    (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
        .repartitionByRange(n_zfiles, "l_orderkey")
        .write.mode("overwrite")
        .parquet(base)
    )
    branges = _file_ranges(base, ("l_partkey", "l_suppkey"))

    z_hit = _files_overlapping_box(zranges, box_part, box_supp)
    b_hit = _files_overlapping_box(branges, box_part, box_supp)
    # natural layout: every file spans the whole key space -> no pruning
    assert b_hit == len(branges)
    # z-order: the box touches a strict minority of files
    assert z_hit < n_zfiles / 2, (z_hit, n_zfiles)


def test_zvalue_interleave_known_bits(spark):
    # x=0b101 (bits at 0,2), y=0b011 (bits at 0,1)
    # z = x bits at even positions (0,4) | y bits at odd positions (1,3)
    row = (
        spark.range(1)
        .select(zvalue(F.lit(0b101).cast("long"), F.lit(0b011).cast("long"), bits=3))
        .collect()[0][0]
    )
    assert row == (1 << 0) | (1 << 4) | (1 << 1) | (1 << 3)


def test_snapshot_isolation_and_incremental_algebra(spark, sf_dir):
    root = build_snapshots(spark, sf_dir)
    v1 = read_snapshot(spark, root, "v1")
    v2 = read_snapshot(spark, root, "v2")
    inc = read_increment(spark, root, "v1", "v2")

    cut = F.lit(SNAPSHOT_CUTOVER).cast("timestamp")
    # isolation: v1 contains no post-cutover rows even though v2 exists
    assert v1.filter(F.col("o_orderdate") >= cut).count() == 0
    # increment is exactly the delta
    n1, ni, n2 = v1.count(), inc.count(), v2.count()
    assert n1 + ni == n2
    assert ni > 0 and n1 > 0
    # incremental read never touches v1's files
    v1_files = {r[0] for r in v1.select(F.input_file_name()).distinct().collect()}
    inc_files = {r[0] for r in inc.select(F.input_file_name()).distinct().collect()}
    assert v1_files.isdisjoint(inc_files)

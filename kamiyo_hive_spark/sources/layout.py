"""Physical-layout operators: z-order data skipping + snapshot
time-travel with incremental reads.

Two levers that matter more at 100 TB than any single query plan:

- ``zorder_layout_scan`` — multi-dimensional clustering. A range
  partition on ONE key gives perfect skipping on that key and none on
  any other; interleaving the bits of two keys (Morton / z-order)
  gives both dimensions locality, so per-file min/max statistics prune
  most files for a 2-D box predicate. This is the Delta/Iceberg
  OPTIMIZE ZORDER shape, expressed Spark-first: quantile-bucket both
  keys, interleave bits with JVM expressions, `repartitionByRange` on
  the z-value, write; the layout must be semantically invisible (the
  oracle computes the same box aggregate straight from the source —
  the `salted_hot_key_rollup` "re-layout changes nothing" contract).

- ``snapshot_time_travel`` — manifest-based snapshot isolation over
  plain parquet: every version is a list of immutable files; appends
  create a new manifest, never touch old files. Time-travel = read an
  old manifest; incremental processing = read only the file DELTA
  between two manifests. The query proves the algebra the lakehouse
  depends on: agg(v1) + agg(increment) == agg(v2), per group.
  (Delta/Iceberg jars aren't in this image; the manifest layer here is
  ~20 lines because the hard part — immutable files + versioned file
  lists — is a layout discipline, not a library.)
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kamiyo_hive_spark.catalog import table
from kamiyo_hive_spark.functions.money import cents, dec, money_sum, money_sum_col
from kamiyo_hive_spark.plans.registry import register
from kamiyo_hive_spark.sources.sinks import (
    SCRATCH,
    ensure_staging,
)

# ---------------------------------------------------------------------------
# Z-order layout
# ---------------------------------------------------------------------------

Z_BITS = 12          # bits per dimension (4096 quantile buckets each)
Z_FILES = 8          # output files; each covers one contiguous z-range
# 2-D box predicate used by the scan, as percent-of-key-range bounds so
# the same query is non-vacuous at every scale factor (key domains grow
# with sf). Bounds resolve to integers identically on both engines:
# lo = kmin + (kmax-kmin)*pct_lo/100 with integer floor division.
Z_BOX_PART_PCT = (5, 20)
Z_BOX_SUPP_PCT = (10, 40)


def zvalue(x_bucket: Column, y_bucket: Column, bits: int = Z_BITS) -> Column:
    """Morton interleave of two bucket ids (JVM bitwise expressions —
    whole-stage codegen, no UDF): bit i of x lands at 2i, of y at
    2i+1."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z.bitwiseOR(F.shiftleft(F.shiftright(x_bucket, i).bitwiseAND(F.lit(1)), 2 * i))
            .bitwiseOR(
                F.shiftleft(F.shiftright(y_bucket, i).bitwiseAND(F.lit(1)), 2 * i + 1)
            )
        )
    return z


def _bucket(col: Column, cmin: Column, cmax: Column, bits: int = Z_BITS) -> Column:
    """Order-preserving quantization of a key into 2^bits buckets using
    the column's global [min, max] — the bounded representation z-order
    needs (raw keys would overflow the bit budget at lake scale)."""
    n = 1 << bits
    return F.least(
        F.lit(n - 1),
        F.floor((col - cmin) * n / (cmax - cmin + 1)).cast("long"),
    )


def write_zordered(spark: SparkSession, sf_dir: str) -> str:
    """Stage lineitem z-ordered on (l_partkey, l_suppkey): bucket both
    keys by global min/max (one metadata-sized agg, broadcast), Morton-
    interleave, range-partition on the z-value, sort within partitions
    so parquet row groups get tight min/max stats on BOTH keys.

    Fingerprint-cached per sf_dir: clustering is an offline table-
    maintenance job (OPTIMIZE ZORDER), amortized across every query
    that reads the layout — the same accounting as the IVF index
    build. A source regeneration invalidates and rebuilds."""
    out = os.path.join(SCRATCH, f"lineitem_zorder_{os.path.basename(sf_dir)}")
    source = os.path.join(sf_dir, "lineitem.parquet")

    def build(tmp: str) -> None:
        li = table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"
        )
        rng = li.agg(
            F.min("l_partkey").alias("pmin"),
            F.max("l_partkey").alias("pmax"),
            F.min("l_suppkey").alias("smin"),
            F.max("l_suppkey").alias("smax"),
        )
        z = zvalue(
            _bucket(F.col("l_partkey"), F.col("pmin"), F.col("pmax")),
            _bucket(F.col("l_suppkey"), F.col("smin"), F.col("smax")),
        )
        (
            li.crossJoin(F.broadcast(rng))
            .withColumn("zval", z)
            .repartitionByRange(Z_FILES, "zval")
            .sortWithinPartitions("zval")
            .drop("zval", "pmin", "pmax", "smin", "smax")
            .write.mode("overwrite")
            .parquet(tmp)
        )
        # persist the key ranges with the layout: box_bounds() reads them
        # back instead of re-scanning lineitem on every query (the stats a
        # real table format keeps in its metadata)
        r = rng.collect()[0]
        with open(os.path.join(tmp, "_KEY_RANGES.json"), "w") as fh:
            json.dump({k: int(r[k]) for k in ("pmin", "pmax", "smin", "smax")}, fh)

    return ensure_staging(out, source, build)


_ZORDER_ORACLE = f"""
WITH rng AS (
    SELECT min(l_partkey) AS pmin, max(l_partkey) AS pmax,
           min(l_suppkey) AS smin, max(l_suppkey) AS smax
    FROM lineitem
),
box AS (
    SELECT pmin + (pmax - pmin) * {Z_BOX_PART_PCT[0]} // 100 AS plo,
           pmin + (pmax - pmin) * {Z_BOX_PART_PCT[1]} // 100 AS phi,
           smin + (smax - smin) * {Z_BOX_SUPP_PCT[0]} // 100 AS slo,
           smin + (smax - smin) * {Z_BOX_SUPP_PCT[1]} // 100 AS shi
    FROM rng
)
SELECT count(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS total_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price
FROM lineitem, box
WHERE l_partkey BETWEEN box.plo AND box.phi
  AND l_suppkey BETWEEN box.slo AND box.shi
"""


def box_bounds(spark: SparkSession, sf_dir: str) -> tuple[int, int, int, int]:
    """Resolve the percent-of-range box to integer bounds (plo, phi,
    slo, shi) from the key ranges the layout build persisted — no
    re-scan; same floor-division arithmetic as the oracle."""
    zdir = write_zordered(spark, sf_dir)
    with open(os.path.join(zdir, "_KEY_RANGES.json")) as fh:
        r = json.load(fh)
    plo = r["pmin"] + (r["pmax"] - r["pmin"]) * Z_BOX_PART_PCT[0] // 100
    phi = r["pmin"] + (r["pmax"] - r["pmin"]) * Z_BOX_PART_PCT[1] // 100
    slo = r["smin"] + (r["smax"] - r["smin"]) * Z_BOX_SUPP_PCT[0] // 100
    shi = r["smin"] + (r["smax"] - r["smin"]) * Z_BOX_SUPP_PCT[1] // 100
    return int(plo), int(phi), int(slo), int(shi)


@register(
    "zorder_layout_scan",
    oracle=_ZORDER_ORACLE,
    tags=("layout", "zorder", "data-skipping"),
)
def zorder_layout_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order lineitem on (l_partkey, l_suppkey), then answer a 2-D box
    query from the re-laid-out files. The oracle computes the same box
    straight from the source: clustering must be semantically
    invisible. Box bounds are resolved to integer LITERALS first (one
    metadata-sized agg — the `cosine_topk` query-vector pattern) so
    the reread filter reaches the parquet scan as PushedFilters and
    row-group min/max stats actually prune. The payoff is physical,
    not logical — the z-layout skips files a 1-D layout can't
    (measured in tests/test_layout.py) — so this query's scan touches
    a fraction of the table at any scale."""
    out = write_zordered(spark, sf_dir)
    plo, phi, slo, shi = box_bounds(spark, sf_dir)
    reread = spark.read.parquet(out).filter(
        F.col("l_partkey").between(plo, phi) & F.col("l_suppkey").between(slo, shi)
    )
    return reread.agg(
        F.count("*").alias("n_rows"),
        money_sum_col("l_quantity").alias("total_qty"),
        money_sum_col("l_extendedprice").alias("total_price"),
    )


# ---------------------------------------------------------------------------
# Snapshot time-travel / incremental read
# ---------------------------------------------------------------------------

SNAPSHOT_CUTOVER = "1997-01-01 00:00:00"  # v1 = orders before, v2 adds the rest


def build_snapshots(spark: SparkSession, sf_dir: str) -> str:
    """Build a two-version manifest table: v1 = historical orders, v2 =
    v1's files (untouched) + an appended increment. Append-only +
    immutable files is the entire isolation story: readers of v1 can
    never see v2's rows because v2 never rewrote a v1 file.
    Fingerprint-cached per sf_dir (the table build is ingest, not the
    query; a source regeneration invalidates it)."""
    root = os.path.join(SCRATCH, f"orders_snapshots_{os.path.basename(sf_dir)}")
    source = os.path.join(sf_dir, "orders.parquet")

    def build(tmp: str) -> None:
        o = table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus", "o_orderdate", "o_totalprice"
        )
        cut = F.lit(SNAPSHOT_CUTOVER).cast("timestamp")
        base_dir, inc_dir = os.path.join(tmp, "batch1"), os.path.join(tmp, "batch2")
        o.filter(F.col("o_orderdate") < cut).write.mode("overwrite").parquet(base_dir)
        o.filter(F.col("o_orderdate") >= cut).write.mode("overwrite").parquet(inc_dir)

        # Manifests pin files RELATIVE to the table root: the build dir
        # is atomically renamed into place (and a real lake moves/copies
        # table roots), so absolute paths would dangle.
        def data_files(batch: str) -> list[str]:
            d = os.path.join(tmp, batch)
            return sorted(
                f"{batch}/{f}" for f in os.listdir(d) if f.endswith(".parquet")
            )

        manifests = {
            "v1": data_files("batch1"),
            "v2": data_files("batch1") + data_files("batch2"),
        }
        for v, files in manifests.items():
            with open(os.path.join(tmp, f"manifest_{v}.json"), "w") as fh:
                json.dump({"version": v, "files": files}, fh)
        open(os.path.join(tmp, "_SUCCESS"), "w").close()

    return ensure_staging(root, source, build)


def _manifest_files(root: str, version: str) -> list[str]:
    """Resolve a manifest's root-relative file list to absolute paths
    (absolute entries from pre-r4 manifests still resolve unchanged)."""
    with open(os.path.join(root, f"manifest_{version}.json")) as fh:
        files = json.load(fh)["files"]
    return [f if os.path.isabs(f) else os.path.join(root, f) for f in files]


def read_snapshot(spark: SparkSession, root: str, version: str) -> DataFrame:
    """Time-travel read: exactly the files the manifest pinned."""
    return spark.read.parquet(*_manifest_files(root, version))


def read_increment(spark: SparkSession, root: str, v_from: str, v_to: str) -> DataFrame:
    """Incremental read: only files added between two snapshots — the
    primitive that turns full recomputes into delta processing."""
    old = set(_manifest_files(root, v_from))
    new = _manifest_files(root, v_to)
    added = [f for f in new if f not in old]
    return spark.read.parquet(*added)


_SNAPSHOT_ORACLE = f"""
WITH v1 AS (
    SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '{SNAPSHOT_CUTOVER}'
),
inc AS (
    SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '{SNAPSHOT_CUTOVER}'
)
SELECT s.o_orderstatus,
       CAST(coalesce(a.n, 0) AS BIGINT) AS v1_rows,
       CAST(coalesce(i.n, 0) AS BIGINT) AS inc_rows,
       CAST(coalesce(a.n, 0) + coalesce(i.n, 0) AS BIGINT) AS v2_rows,
       CAST(coalesce(a.tp, 0) + coalesce(i.tp, 0) AS DOUBLE) AS v2_total_price
FROM (SELECT DISTINCT o_orderstatus FROM orders) s
LEFT JOIN (SELECT o_orderstatus, count(*) AS n,
                  SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS tp
           FROM v1 GROUP BY 1) a USING (o_orderstatus)
LEFT JOIN (SELECT o_orderstatus, count(*) AS n,
                  SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS tp
           FROM inc GROUP BY 1) i USING (o_orderstatus)
ORDER BY o_orderstatus
"""


@register(
    "snapshot_time_travel",
    oracle=_SNAPSHOT_ORACLE,
    tags=("layout", "snapshot", "time-travel", "incremental"),
)
def snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-based snapshot reads: per-status rows at v1, rows in
    the v1→v2 increment, and the v2 totals — computed from the v1
    manifest read + the INCREMENT-ONLY read (v2's totals are derived
    as v1 + delta, never by re-scanning v1's files; the oracle
    recomputes everything from the source table, so the manifest
    plumbing and the incremental algebra are both hash-checked).

    At 100 TB this is the difference between a nightly full recompute
    and touching only the day's appended files; the manifest is
    metadata-sized and the file delta is the only data read."""
    root = build_snapshots(spark, sf_dir)
    # Snapshot + increment partials as integer sub-units (r11, guide
    # §2.3): long partials compose exactly in the v1+delta algebra,
    # without a decimal accumulator on either read.
    v1 = (
        read_snapshot(spark, root, "v1")
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("v1_rows"),
            F.sum(cents("o_totalprice")).alias("v1_tpc"),
        )
    )
    inc = (
        read_increment(spark, root, "v1", "v2")
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("inc_rows"),
            F.sum(cents("o_totalprice")).alias("inc_tpc"),
        )
    )
    joined = v1.join(inc, "o_orderstatus", "full_outer")
    zero = F.lit(0).cast("long")
    return joined.select(
        "o_orderstatus",
        F.coalesce("v1_rows", F.lit(0)).cast("long").alias("v1_rows"),
        F.coalesce("inc_rows", F.lit(0)).cast("long").alias("inc_rows"),
        (F.coalesce("v1_rows", F.lit(0)) + F.coalesce("inc_rows", F.lit(0)))
        .cast("long")
        .alias("v2_rows"),
        (
            (F.coalesce(F.col("v1_tpc"), zero) + F.coalesce(F.col("inc_tpc"), zero))
            / 100.0
        )
        .cast("double")
        .alias("v2_total_price"),
    )


# ---------------------------------------------------------------------------
# CSV ingest + schema-evolution reads (source-format breadth)
# ---------------------------------------------------------------------------

def _csv_dir(spark: SparkSession, sf_dir: str) -> str:
    """Stage supplier as headered CSV — the classic landing-zone
    format. Free-text name fields exercise quoting; doubles must
    survive text round-trip via shortest repr."""
    out = os.path.join(SCRATCH, f"supplier_csv_{os.path.basename(sf_dir)}")
    source = os.path.join(sf_dir, "supplier.parquet")
    return ensure_staging(
        out,
        source,
        lambda tmp: table(spark, sf_dir, "supplier")
        .write.mode("overwrite")
        .option("header", True)
        .csv(tmp),
    )


@register(
    "csv_ingest_roundtrip",
    oracle="""
    SELECT s_nationkey,
           count(*) AS n_suppliers,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS total_acctbal,
           CAST(MIN(s_suppkey) AS BIGINT) AS first_suppkey
    FROM supplier
    GROUP BY 1
    ORDER BY s_nationkey
    """,
    tags=("S4", "ingest", "csv"),
)
def csv_ingest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV landing-zone ingest: write supplier as quoted, headered CSV,
    read it back with a DECLARED schema (no inference job — at 100 TB
    schema inference is a full extra scan), aggregate. The oracle
    computes from the original parquet, so the hash proves the text
    roundtrip is lossless — quoting, header skip, and double
    shortest-repr all survive.

    Scale posture: CSV parse is row-local (pipelined into the scan);
    the declared schema avoids the inference pre-pass; the only
    exchange is the group-by. Identical plan at any file count."""
    src = _csv_dir(spark, sf_dir)
    schema = "s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double"
    sup = spark.read.schema(schema).option("header", True).csv(src)
    return (
        sup.groupBy("s_nationkey")
        .agg(
            F.count("*").alias("n_suppliers"),
            money_sum_col("s_acctbal").alias("total_acctbal"),
            F.min("s_suppkey").alias("first_suppkey"),
        )
    )


SCHEMA_EVO_CUTOVER = "1997-01-01 00:00:00"  # rows before: v1 schema (no column)


def _schema_evo_dir(spark: SparkSession, sf_dir: str) -> str:
    """Stage orders as two parquet generations: gen1 lacks the
    `o_channel` column (pre-migration writers), gen2 adds it — the
    additive-column evolution every long-lived lake table goes
    through."""
    out = os.path.join(SCRATCH, f"orders_schema_evo_{os.path.basename(sf_dir)}")
    source = os.path.join(sf_dir, "orders.parquet")

    def build(tmp: str) -> None:
        o = table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus", "o_orderdate", "o_totalprice"
        )
        cut = F.lit(SCHEMA_EVO_CUTOVER).cast("timestamp")
        o.filter(F.col("o_orderdate") < cut).write.mode("overwrite").parquet(
            os.path.join(tmp, "gen1")
        )
        (
            o.filter(F.col("o_orderdate") >= cut)
            .withColumn(
                "o_channel",
                F.when(F.col("o_orderkey") % 2 == 0, "web").otherwise("store"),
            )
            .write.mode("overwrite")
            .parquet(os.path.join(tmp, "gen2"))
        )
        # staging_current needs a root-level _SUCCESS marker
        open(os.path.join(tmp, "_SUCCESS"), "w").close()

    return ensure_staging(out, source, build)


@register(
    "schema_evolution_read",
    oracle=f"""
    SELECT CASE WHEN o_orderdate >= TIMESTAMP '{SCHEMA_EVO_CUTOVER}'
                THEN CASE WHEN o_orderkey % 2 = 0 THEN 'web' ELSE 'store' END
                ELSE 'unknown' END AS channel,
           count(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY 1
    ORDER BY channel
    """,
    tags=("S4", "ingest", "schema-evolution"),
)
def schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive schema evolution: one read over two parquet
    generations — gen1 written before `o_channel` existed, gen2 after.
    `mergeSchema` unions the footers; gen1 rows surface the new column
    as NULL, normalized to 'unknown' at read (the standard
    backfill-free migration contract). The oracle reconstructs the
    same channel logic from the source table, hash-checking that no
    row was lost or mis-defaulted across generations.

    Scale posture: schema merge reads FOOTERS, not data (one metadata
    pass over file schemas); per-row work is a null-coalesce; the only
    exchange is the group-by. A lake table with years of mixed-schema
    files reads with this exact plan."""
    src = _schema_evo_dir(spark, sf_dir)
    evolved = spark.read.option("mergeSchema", True).parquet(
        os.path.join(src, "gen1"), os.path.join(src, "gen2")
    )
    return (
        evolved.select(
            F.coalesce(F.col("o_channel"), F.lit("unknown")).alias("channel"),
            "o_totalprice",
        )
        .groupBy("channel")
        .agg(
            F.count("*").alias("n_orders"),
            money_sum_col("o_totalprice").alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# ORC ingest
# ---------------------------------------------------------------------------

def _orc_dir(spark: SparkSession, sf_dir: str) -> str:
    """Stage part as ORC — the other columnar lake format Spark ships a
    native vectorized reader for (Hive-lineage warehouses hand exactly
    this to a Spark migration)."""
    out = os.path.join(SCRATCH, f"part_orc_{os.path.basename(sf_dir)}")
    source = os.path.join(sf_dir, "part.parquet")
    return ensure_staging(
        out,
        source,
        lambda tmp: table(spark, sf_dir, "part")
        .write.mode("overwrite")
        .orc(tmp),
    )


@register(
    "orc_ingest_roundtrip",
    oracle="""
    SELECT p_brand,
           count(*) AS n_parts,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(14,2))) AS DOUBLE)
               AS total_retail,
           CAST(MIN(p_partkey) AS BIGINT) AS first_partkey,
           CAST(SUM(CAST(p_size AS BIGINT)) AS BIGINT) AS size_sum
    FROM part
    WHERE p_size >= 10
    GROUP BY 1
    ORDER BY p_brand
    """,
    tags=("S4", "ingest", "orc", "format"),
)
def orc_ingest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC lake ingest: write part as ORC, read it back, filter +
    aggregate. The oracle computes from the ORIGINAL parquet, so the
    hash proves the cross-format roundtrip is lossless (strings,
    doubles, ints all survive ORC's encodings), and the plan assertion
    lives in tests: the p_size predicate must reach the ORC scan as a
    pushed filter — ORC carries row-group min/max statistics exactly
    like parquet, and a reader that re-filters JVM-side instead of
    pruning stripes reads the whole 100 TB table.

    Scale posture: identical to the parquet path — columnar scan with
    predicate + projection pushdown, one group-by exchange."""
    src = _orc_dir(spark, sf_dir)
    p = spark.read.orc(src).filter(F.col("p_size") >= 10)
    return (
        p.groupBy("p_brand")
        .agg(
            F.count("*").alias("n_parts"),
            money_sum_col("p_retailprice").alias("total_retail"),
            F.min("p_partkey").alias("first_partkey"),
            F.sum(F.col("p_size").cast("long")).alias("size_sum"),
        )
    )

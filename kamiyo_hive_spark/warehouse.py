"""Warehouse catalog: the Spark SQL surface over the star schema.

The reference's query surface is ultimately SQL-over-catalog (Prisma →
Postgres; BASELINE.json: "Spark SQL + Hive metastore integration").
This module registers the testdata as named tables in the session
catalog so the full engine is reachable from `spark.sql(...)` — with a
Hive metastore configured (`enableHiveSupport()` on a cluster) the same
DDL persists across sessions; in-session it lands in the default
in-memory catalog. External `USING parquet LOCATION` tables keep the
data in place — no copy, full pushdown/pruning through the catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kamiyo_hive_spark.catalog import SCHEMAS, TABLES
from kamiyo_hive_spark.plans.registry import register

DB = "kamiyo"

# Registration memo: (applicationId, sf_dir) already materialized in the
# session catalog. DDL against the catalog costs ~100 ms per statement
# (11 tables + a view ≈ 2.5 s), so re-running it per query would dwarf
# the queries themselves; a metastore-backed cluster registers once too.
_REGISTERED: dict[str, str] = {}


def _stage_events_micros(spark: SparkSession, sf_dir: str, events_path: str) -> str:
    """Normalize a TIMESTAMP(NANOS) events file to a MICROS parquet
    staging under `.scratch` (fingerprint-invalidated like every other
    staging) and return its path. Normalizing AT INGEST is the point:
    the registered table must be readable by ANY future session — a
    plain `kamiyo.events` over a NANOS file needs the session-local
    `nanosAsLong` legacy conf, which a metastore cannot persist, so a
    restarted session would fail on scan. A landed MICROS copy has no
    such dependency."""
    import os

    from kamiyo_hive_spark.catalog import table
    from kamiyo_hive_spark.sources.sinks import SCRATCH, ensure_staging

    slug = sf_dir.strip("/").replace("/", "_")
    out = f"{SCRATCH}/events_us/{slug}"
    ensure_staging(
        out,
        events_path,
        lambda tmp: table(spark, sf_dir, "events")
        .write.mode("overwrite")
        .parquet(tmp),
    )
    return os.path.abspath(out)


def init_warehouse(spark: SparkSession, sf_dir: str) -> None:
    """Idempotently (re)register the scale-factor directory as external
    tables `kamiyo.<name>`. The events table's physical timestamp unit
    is sniffed from the parquet footer (the driver has generated BOTH
    TIMESTAMP(NANOS) and TIMESTAMP(MICROS) files across rounds): a
    NANOS file is normalized to a MICROS staging copy and the table
    registered over that (see `_stage_events_micros` — a view over the
    raw NANOS file would need a session conf no metastore can persist,
    breaking restarted sessions); a MICROS file registers directly with
    its declared schema. Either way SQL users see the same UTC
    microsecond timestamps the DataFrame surface serves. No-op when
    this session already registered the same directory AND the events
    file is unchanged; a testdata regeneration re-registers."""
    import os

    from kamiyo_hive_spark.catalog import _events_ts_is_nanos

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events_path = f"{sf_dir}/events.parquet"
    st = os.stat(events_path)
    reg_key = f"{sf_dir}:{st.st_mtime_ns}:{st.st_size}"
    app_id = spark.sparkContext.applicationId
    if _REGISTERED.get(app_id) == reg_key:
        return
    events_is_nanos = _events_ts_is_nanos(events_path)
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {DB}")
    # Type-aware cleanup: DROP TABLE on a view (and vice versa) ERRORS
    # rather than no-ops, so consult the catalog for what each name is.
    existing = {t.name: t.tableType for t in spark.catalog.listTables(DB)}
    for name, ttype in existing.items():
        kind = "VIEW" if ttype == "VIEW" else "TABLE"
        spark.sql(f"DROP {kind} IF EXISTS {DB}.{name}")
    spark.sql(f"DROP TABLE IF EXISTS {DB}._events_raw")  # pre-round-2 layout
    for name in TABLES:
        location = f"{sf_dir}/{name}.parquet"
        if name == "events" and events_is_nanos:
            location = _stage_events_micros(spark, sf_dir, events_path)
        cols = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in SCHEMAS[name].fields
        )
        spark.sql(
            f"CREATE TABLE {DB}.{name} ({cols}) USING parquet LOCATION '{location}'"
        )
    _REGISTERED[app_id] = reg_key


@register(
    "sql_surface_market_share",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_spend,
           count(DISTINCT o.o_custkey) AS n_customers
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY 1
    ORDER BY total_spend DESC, nation
    """,
    tags=("sql-surface", "warehouse", "A6"),
)
def sql_surface_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pure-SQL path: register catalog tables, run ANSI SQL through
    `spark.sql` — proving a reference user can keep writing SQL against
    named tables and get identical results to the DataFrame surface
    (Catalyst produces the same plan either way)."""
    init_warehouse(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT n.n_name AS nation,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_spend,
               count(DISTINCT o.o_custkey) AS n_customers
        FROM {DB}.orders o
        JOIN {DB}.customer c ON o.o_custkey = c.c_custkey
        JOIN {DB}.nation n ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
        GROUP BY 1
        ORDER BY total_spend DESC, nation
        """
    )


@register(
    "sql_surface_event_funnel",
    oracle="""
    WITH viewers AS (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
    ),
    clickers AS (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
    ),
    buyers AS (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    )
    SELECT (SELECT count(*) FROM viewers) AS n_viewers,
           (SELECT count(*) FROM clickers c WHERE c.user_id IN (SELECT user_id FROM viewers)) AS n_view_click,
           (SELECT count(*) FROM buyers b WHERE b.user_id IN (SELECT user_id FROM clickers)
                AND b.user_id IN (SELECT user_id FROM viewers)) AS n_full_funnel
    """,
    tags=("sql-surface", "funnel"),
)
def sql_surface_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis through the SQL surface (views → clicks →
    purchases), exercising the events VIEW with its baked-in timestamp
    conversion plus IN-subquery (semi-join) planning."""
    init_warehouse(spark, sf_dir)
    return spark.sql(
        f"""
        WITH viewers AS (
            SELECT DISTINCT user_id FROM {DB}.events WHERE event_type = 'view'
        ),
        clickers AS (
            SELECT DISTINCT user_id FROM {DB}.events WHERE event_type = 'click'
        ),
        buyers AS (
            SELECT DISTINCT user_id FROM {DB}.events WHERE event_type = 'purchase'
        )
        SELECT (SELECT count(*) FROM viewers) AS n_viewers,
               (SELECT count(*) FROM clickers c WHERE c.user_id IN (SELECT user_id FROM viewers)) AS n_view_click,
               (SELECT count(*) FROM buyers b WHERE b.user_id IN (SELECT user_id FROM clickers)
                    AND b.user_id IN (SELECT user_id FROM viewers)) AS n_full_funnel
        """
    )

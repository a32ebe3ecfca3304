"""Time-series operators: gap-fill/resample, inter-arrival deltas,
first/last span (hypertable-style continuous-aggregate surface).

Reference semantics: the reference's calendar-window earnings stats
(`lib/hive-api.ts:327-334`) and epoch-bucketed governance charts
(`app/[locale]/governance/page.tsx:10-22`) present dense time axes over
sparse event data — the UI fills the gaps. Here gap-filling is an
engine operator: a generated time spine (``sequence`` + ``explode``,
JVM-side, no driver loop) outer-joined to the sparse aggregate, with
forward-fill via ``last(..., ignorenulls=True)`` over an ordered
window.

Scale notes: the spine is |keys| x |buckets| rows — generated, never
shuffled (the join shuffles on the key only). Forward-fill partitions
by entity, so state is one row per partition-sort, linear work. The
DuckDB oracles independently rebuild the spine with generate_series
and IGNORE-NULLS window functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kamiyo_hive_spark.catalog import table
from kamiyo_hive_spark.plans.registry import register


@register(
    "gap_fill_resample",
    oracle="""
    WITH spine AS (
        SELECT u.user_id, d.day
        FROM (SELECT DISTINCT user_id FROM events WHERE user_id % 10 = 0) u
        CROSS JOIN (
            SELECT unnest(generate_series(TIMESTAMP '2024-01-01',
                                          TIMESTAMP '2024-01-30',
                                          INTERVAL 1 DAY)) AS day
        ) d
    ),
    daily AS (
        SELECT user_id, date_trunc('day', ts) AS day,
               count(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS day_value
        FROM events
        WHERE user_id % 10 = 0
        GROUP BY 1, 2
    )
    SELECT s.user_id, s.day,
           COALESCE(d.n_events, 0) AS n_events,
           COALESCE(d.day_value, 0.0) AS day_value,
           last_value(d.day_value IGNORE NULLS) OVER (
               PARTITION BY s.user_id ORDER BY s.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS ffill_value
    FROM spine s
    LEFT JOIN daily d ON d.user_id = s.user_id AND d.day = s.day
    ORDER BY s.user_id, s.day
    """,
    tags=("time-series", "gap-fill", "resample", "A8"),
)
def gap_fill_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily series per user: generated day spine outer-joined to
    the sparse daily aggregate; missing days zero-filled for counts and
    forward-filled for the last observed value. The spine is built with
    ``sequence``/``explode`` on executors — no driver loop, so the same
    plan produces a year x 10^9-key spine on a cluster."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 0)
    daily = e.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(14,2)")).cast("double").alias("day_value"),
    )
    spine = (
        e.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.explode(
                F.sequence(
                    F.lit("2024-01-01").cast("timestamp"),
                    F.lit("2024-01-30").cast("timestamp"),
                    F.expr("INTERVAL 1 DAY"),
                )
            ).alias("day"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("day_value", F.lit(0.0)).alias("day_value"),
            F.last(daily.day_value, ignorenulls=True).over(w).alias("ffill_value"),
        )
    )


@register(
    "event_interarrival_stats",
    oracle="""
    WITH gaps AS (
        SELECT event_type,
               CAST(floor(epoch(ts)) AS BIGINT)
                 - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS gap_s
        FROM events
    )
    SELECT event_type,
           count(gap_s) AS n_gaps,
           SUM(gap_s) AS total_gap_s,
           MIN(gap_s) AS min_gap_s,
           MAX(gap_s) AS max_gap_s
    FROM gaps
    WHERE gap_s IS NOT NULL
    GROUP BY 1
    ORDER BY event_type
    """,
    tags=("time-series", "lag-lead", "inter-arrival", "W-frame"),
)
def event_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gaps via ``lag`` over (user, event_type) streams,
    rolled up per event type. Gaps are integer epoch-second deltas, so
    the aggregate is exact on any partitioning. One shuffle for the
    window, map-side-combined rollup after."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    epoch_s = F.unix_timestamp("ts")
    gaps = e.select(
        "event_type", (epoch_s - F.lag(epoch_s).over(w)).alias("gap_s")
    ).filter(F.col("gap_s").isNotNull())
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count("gap_s").alias("n_gaps"),
            F.sum("gap_s").alias("total_gap_s"),
            F.min("gap_s").alias("min_gap_s"),
            F.max("gap_s").alias("max_gap_s"),
        )
    )


@register(
    "first_last_event_span",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, ts,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn_first,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn_last
        FROM events
    )
    SELECT f.user_id,
           f.event_type AS first_type,
           l.event_type AS last_type,
           CAST(floor(epoch(l.ts)) AS BIGINT) - CAST(floor(epoch(f.ts)) AS BIGINT)
               AS span_s
    FROM (SELECT * FROM ordered WHERE rn_first = 1) f
    JOIN (SELECT * FROM ordered WHERE rn_last = 1) l USING (user_id)
    ORDER BY user_id
    """,
    tags=("time-series", "first-last-value", "W3"),
)
def first_last_event_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user first/last event type and activity span — both
    endpoints from ONE window pass (first_value/last_value with a full
    frame over a deterministic order), not two ranked self-joins: one
    shuffle on user_id, then dedup."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    epoch_s = F.unix_timestamp("ts")
    return (
        e.select(
            "user_id",
            F.first("event_type").over(w).alias("first_type"),
            F.last("event_type").over(w).alias("last_type"),
            (F.last(epoch_s).over(w) - F.first(epoch_s).over(w)).alias("span_s"),
        )
        .dropDuplicates(["user_id"])
    )


@register(
    "scd2_history_intervals",
    oracle="""
    WITH changes AS (
        SELECT user_id, event_type AS status, ts,
               lag(event_type) OVER w AS prev_status
        FROM events
        WHERE user_id % 25 = 0
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    transitions AS (
        SELECT user_id, status, ts AS valid_from
        FROM changes
        WHERE prev_status IS NULL OR status <> prev_status
    )
    SELECT user_id, status, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from) AS valid_to,
           CAST(row_number() OVER (PARTITION BY user_id
                                   ORDER BY valid_from) AS BIGINT) AS version,
           lead(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from) IS NULL AS is_current
    FROM transitions
    ORDER BY user_id, version
    """,
    tags=("scd2", "slowly-changing-dimension", "gaps-and-islands", "time-series"),
)
def scd2_history_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension history built from a change
    log: collapse consecutive same-status runs (gaps-and-islands via
    lag), then open/close validity intervals with lead — valid_to of
    one version is valid_from of the next, the open interval is the
    current row. Two window passes over ONE shuffle on user_id (same
    partition key, same sort); no self-join. At 100 TB the change log
    is date-partitioned and the rebuild is incremental per partition,
    merged by the same interval logic."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id") % 25 == 0)
    w_ev = Window.partitionBy("user_id").orderBy("ts", "event_id")
    transitions = (
        e.select(
            "user_id",
            F.col("event_type").alias("status"),
            "ts",
            F.lag("event_type").over(w_ev).alias("prev_status"),
        )
        .filter(
            F.col("prev_status").isNull()
            | (F.col("status") != F.col("prev_status"))
        )
        .select("user_id", "status", F.col("ts").alias("valid_from"))
    )
    w_ver = Window.partitionBy("user_id").orderBy("valid_from")
    return (
        transitions.select(
            "user_id",
            "status",
            "valid_from",
            F.lead("valid_from").over(w_ver).alias("valid_to"),
            F.row_number().over(w_ver).cast("long").alias("version"),
            F.lead("valid_from").over(w_ver).isNull().alias("is_current"),
        )
    )


@register(
    "trailing_range_frame",
    oracle="""
    SELECT user_id, ts, event_id,
           CAST(SUM(CAST(value AS DECIMAL(14,2))) OVER (
               PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
               RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS value_7d,
           CAST(count(*) OVER (
               PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
               RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_7d
    FROM events
    WHERE user_id < 10
    ORDER BY user_id, ts, event_id
    """,
    tags=("time-series", "range-frame", "W-frame", "A9"),
)
def trailing_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day RANGE window frame — value-based bounds (every
    row within 604800 s), not row counts, so dense and sparse users get
    the same time horizon. One shuffle on user_id; frame evaluation is
    a sliding two-pointer over the partition sort, linear work."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-604800, 0)
    )
    return (
        e.select(
            "user_id",
            "ts",
            "event_id",
            F.sum(F.col("value").cast("decimal(14,2)"))
            .over(w)
            .cast("double")
            .alias("value_7d"),
            F.count("*").over(w).alias("n_7d"),
        )
    )


@register(
    "cohort_retention",
    oracle="""
    WITH cohorts AS (
        SELECT user_id,
               min(date_trunc('week', ts)) AS cohort_week
        FROM events
        GROUP BY 1
    ),
    activity AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
        FROM events
    ),
    cells AS (
        SELECT c.cohort_week,
               CAST(datediff('day', c.cohort_week, a.active_week) / 7 AS BIGINT)
                   AS age_weeks,
               count(*) AS n_active
        FROM activity a JOIN cohorts c USING (user_id)
        GROUP BY 1, 2
    ),
    sized AS (
        SELECT cohort_week, age_weeks, n_active,
               max(CASE WHEN age_weeks = 0 THEN n_active END)
                   OVER (PARTITION BY cohort_week) AS cohort_size
        FROM cells
    )
    SELECT cohort_week, age_weeks, n_active, cohort_size,
           round(100.0 * n_active / cohort_size, 4) AS retention_pct
    FROM sized
    ORDER BY cohort_week, age_weeks
    """,
    tags=("time-series", "cohort", "retention", "A8"),
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention matrix over the event log — the classic
    product-analytics shape: users bucketed by first-seen week, each
    later active week counted as (cohort, age) cells with a retention
    percentage against the cohort size.

    Two aggregations over one scan lineage (first-seen per user,
    distinct user-weeks), then user-keyed join + cell rollup. Both aggs
    shuffle on user_id, so they SHARE the exchange; the cells table is
    (weeks x weeks)-sized — dimension-scale output from event-scale
    input, the shape that stays cheap at 100 TB because nothing after
    the first user_id exchange is event-sized. Week buckets are
    Monday-start `date_trunc` in both engines."""
    # week buckets stay TIMESTAMP (Monday 00:00): the engine convention
    # is to never emit DATE columns — Spark hands them to pandas as
    # python dates while DuckDB hands midnight datetimes, so DATE
    # outputs can false-positive in representation-sensitive compares.
    e = table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    )
    cohorts = e.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    activity = e.distinct().withColumnRenamed("week", "active_week")
    cells = (
        activity.join(cohorts, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("active_week", "cohort_week") / 7)
            .cast("long")
            .alias("age_weeks"),
        )
        .agg(F.count("*").alias("n_active"))
    )
    # Every user is active in their own first week, so the age-0 cell
    # IS the cohort size — a window over the tiny cells table replaces
    # a second pass over the cohorts lineage.
    w = Window.partitionBy("cohort_week")
    cohort_size = F.max(F.when(F.col("age_weeks") == 0, F.col("n_active"))).over(w)
    return (
        cells.select(
            "cohort_week",
            "age_weeks",
            "n_active",
            cohort_size.alias("cohort_size"),
        )
        .withColumn(
            "retention_pct",
            F.round(100.0 * F.col("n_active") / F.col("cohort_size"), 4),
        )
    )


@register(
    "funnel_conversion",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_id, ts, event_type,
               first_value(CASE WHEN event_type = 'purchase' THEN ts END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                   AS next_purchase_ts
        FROM events
    ),
    views AS (
        SELECT epoch_us(next_purchase_ts) - epoch_us(ts) AS delay_us,
               next_purchase_ts IS NOT NULL
                   AND next_purchase_ts <= ts + INTERVAL 1 HOUR AS converted
        FROM seq WHERE event_type = 'view'
    )
    SELECT count(*) AS n_views,
           CAST(count(*) FILTER (WHERE converted) AS BIGINT) AS n_converted,
           round(100.0 * count(*) FILTER (WHERE converted) / count(*), 6)
               AS conversion_pct,
           round(CAST(SUM(CASE WHEN converted THEN delay_us END) AS DOUBLE)
                 / count(*) FILTER (WHERE converted) / 1e6, 6) AS avg_delay_s
    FROM views
    """,
    tags=("time-series", "funnel", "conversion", "W-frames"),
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View → purchase funnel with a 1-hour conversion window: for every
    view, the user's FIRST subsequent purchase (strictly later row in
    (ts, event_id) order) decides conversion — the forward-looking dual
    of the as-of join, expressed as one `first(..., ignorenulls=True)`
    window over a FOLLOWING frame. One shuffle on user_id; delay math
    stays integral (epoch micros) until the final division so the
    aggregate is partition-order independent."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    purchase_ts = F.when(F.col("event_type") == "purchase", F.col("ts"))
    seq = e.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.first(purchase_ts, ignorenulls=True).over(w).alias("next_purchase_ts"),
    )
    views = seq.filter(F.col("event_type") == "view").select(
        (F.unix_micros("next_purchase_ts") - F.unix_micros("ts")).alias("delay_us"),
        (
            F.col("next_purchase_ts").isNotNull()
            & (F.col("next_purchase_ts") <= F.col("ts") + F.expr("INTERVAL 1 HOUR"))
        ).alias("converted"),
    )
    n_conv = F.sum(F.when(F.col("converted"), 1).otherwise(0))
    return views.agg(
        F.count("*").alias("n_views"),
        n_conv.cast("long").alias("n_converted"),
        F.round(100.0 * n_conv / F.count("*"), 6).alias("conversion_pct"),
        F.round(
            F.sum(F.when(F.col("converted"), F.col("delay_us"))).cast("double")
            / n_conv
            / 1e6,
            6,
        ).alias("avg_delay_s"),
    )


@register(
    "ohlc_hourly_candles",
    oracle="""
    WITH keyed AS (
        SELECT date_trunc('hour', ts) AS bucket, event_type,
               value, ts, event_id
        FROM events
    ),
    ranked AS (
        SELECT bucket, event_type, value,
               row_number() OVER (PARTITION BY bucket, event_type
                                  ORDER BY ts, event_id) AS rk_open,
               row_number() OVER (PARTITION BY bucket, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rk_close
        FROM keyed
    )
    SELECT bucket, event_type,
           MAX(CASE WHEN rk_open = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rk_close = 1 THEN value END) AS close,
           CAST(count(*) AS BIGINT) AS volume
    FROM ranked
    GROUP BY 1, 2
    ORDER BY bucket, event_type
    """,
    tags=("timeseries", "ohlc", "downsample"),
)
def ohlc_hourly_candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candle downsampling — the hypertable continuous-aggregate
    shape (TimescaleDB `time_bucket` + first/last/min/max): per
    (hour, event_type) bucket, the first and last value by event time
    (deterministic (ts, event_id) tiebreak — open/close must be
    well-defined even with same-timestamp events), the extremes, and
    the event count.

    Spark-first: `min_by`/`max_by` over a (ts, event_id) struct key
    compute open/close IN THE SAME single hash aggregation as
    high/low/volume — one scan, one keyed exchange, no window pass.
    (The oracle uses two window ranks because DuckDB's arg_min is
    single-key; semantics identical.) At 100 TB this is the canonical
    map-side-combinable rollup: min_by/max_by partials merge
    associatively, so the candle table is a streaming-compatible
    continuous aggregate."""
    e = table(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        e.select(
            F.date_trunc("hour", "ts").alias("bucket"),
            "event_type",
            "value",
            key.alias("k"),
        )
        .groupBy("bucket", "event_type")
        .agg(
            F.min_by("value", F.col("k")).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", F.col("k")).alias("close"),
            F.count("*").alias("volume"),
        )
    )


ANOMALY_Z = 3.0


@register(
    "event_rate_anomaly",
    oracle=f"""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS bucket,
               count(*) AS c
        FROM events
        GROUP BY 1, 2
    ),
    stats AS (
        SELECT event_type, bucket, c,
               CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS s,
               CAST(SUM(c * c) OVER (PARTITION BY event_type) AS BIGINT) AS ss,
               CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        FROM hourly
    ),
    z AS (
        SELECT event_type, c,
               sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / n) AS sd,
               CAST(c AS DOUBLE) - CAST(s AS DOUBLE) / n AS dev,
               n
        FROM stats
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n_hours,
           CAST(SUM(CASE WHEN sd > 0 AND abs(dev / sd) >= {ANOMALY_Z}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalous,
           round(MAX(CASE WHEN sd > 0 THEN abs(dev / sd) ELSE 0 END), 6)
               AS max_abs_z
    FROM z
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("timeseries", "anomaly", "monitoring"),
)
def event_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-anomaly detection — the monitoring rollup every event
    pipeline runs: hourly event counts per type, z-scored against that
    type's own distribution, hours beyond |z| >= 3 flagged. Output is
    the per-type anomaly summary (hours observed, hours anomalous,
    worst |z|).

    Determinism: every statistic derives from exact INTEGER sums
    (n, Σc, Σc²) — the mean/σ doubles are each computed by one fixed
    expression over those integers, so no accumulation-order ambiguity
    exists anywhere; sqrt and division are correctly-rounded IEEE ops,
    identical on both engines; z is rounded before the final max.

    Scale shape: one (type, hour) count exchange; the per-type moment
    sums run as a window over the TYPE partition and the final rollup
    groups by the same key, so Catalyst reuses one partitioning for
    all three steps — two wide exchanges total, cardinality bounded by
    types x hours, never events."""
    e = table(spark, sf_dir, "events")
    hourly = (
        e.groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(F.count("*").alias("c"))
    )
    w = Window.partitionBy("event_type")
    stats = hourly.select(
        "event_type",
        "c",
        F.sum("c").over(w).cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).over(w).cast("long").alias("ss"),
        F.count("*").over(w).cast("long").alias("n"),
    )
    sd = F.sqrt(
        (F.col("ss").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("n"))
        / F.col("n")
    )
    dev = F.col("c").cast("double") - F.col("s").cast("double") / F.col("n")
    z = stats.select(
        "event_type",
        "n",
        sd.alias("sd"),
        dev.alias("dev"),
    )
    return (
        z.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n_hours"),
            F.sum(
                F.when(
                    (F.col("sd") > 0) & (F.abs(F.col("dev") / F.col("sd")) >= ANOMALY_Z),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_anomalous"),
            F.round(
                F.max(
                    F.when(F.col("sd") > 0, F.abs(F.col("dev") / F.col("sd"))).otherwise(
                        0.0
                    )
                ),
                6,
            ).alias("max_abs_z"),
        )
    )


@register(
    "seasonal_decompose_daily",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d, count(*) AS y
        FROM events GROUP BY 1
    ),
    win AS (
        SELECT a.d, a.y,
               COUNT(*) AS n_win,
               CAST(SUM(b.y) AS BIGINT) AS s7
        FROM daily a
        JOIN daily b ON b.d BETWEEN a.d - 3 AND a.d + 3
        GROUP BY a.d, a.y
        HAVING COUNT(*) = 7
    ),
    det AS (
        SELECT (d - DATE '1970-01-01') % 7 AS dow,
               7 * y - s7 AS det_num
        FROM win
    )
    SELECT CAST(dow AS BIGINT) AS dow,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(det_num) AS BIGINT) AS detrended_sum,
           round(SUM(det_num) / (7.0 * COUNT(*)), 9) AS seasonal_index
    FROM det GROUP BY dow ORDER BY dow
    """,
    tags=("timeseries", "seasonal", "decomposition", "A8"),
)
def seasonal_decompose_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonal decomposition (the moving-average half of
    STL) over the event stream: daily counts, a centered 7-day trend,
    and the weekly seasonal profile of the detrended series — the
    dashboard query behind every "traffic by day-of-week, seasonality
    removed" panel.

    Exactness discipline: the centered mean never materializes as a
    float — detrended = 7·y − Σ₇y stays in int64 (the standard
    clear-denominators trick), per-weekday sums are exact, and the only
    float is the final seasonal index (one round(…, 9) division on both
    engines). Day-of-week is epoch-days mod 7, portable across engines
    (no locale-dependent dayofweek()). Edge days without a full 7-day
    window are excluded (HAVING n = 7), exactly as classical
    decomposition defines the centered MA.

    Scale shape: ONE corpus exchange (the daily rollup — partial aggs
    collapse each task to ≤ |days| cells); the centered window is then
    a range self-join on the CALENDAR-sized daily table, deliberately
    NOT a partition-less ordered window (banned package-wide by the
    scale guards): at any corpus size the post-rollup table is bounded
    by elapsed days, so the range join is metadata work."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count("*").alias("y")
    )
    a = daily.select(F.col("d").alias("ad"), F.col("y").alias("ay"))
    b = daily.select(F.col("d").alias("bd"), F.col("y").alias("by"))
    win = (
        a.join(
            b,
            (F.col("bd") >= F.date_sub(F.col("ad"), 3))
            & (F.col("bd") <= F.date_add(F.col("ad"), 3)),
        )
        .groupBy("ad", "ay")
        .agg(F.count("*").alias("n_win"), F.sum("by").cast("long").alias("s7"))
        .filter(F.col("n_win") == 7)
    )
    det = win.select(
        (F.datediff(F.col("ad"), F.lit("1970-01-01").cast("date")) % 7).alias(
            "dow"
        ),
        (7 * F.col("ay") - F.col("s7")).alias("det_num"),
    )
    return (
        det.groupBy(F.col("dow").cast("long").alias("dow"))
        .agg(
            F.count("*").cast("long").alias("n_days"),
            F.sum("det_num").cast("long").alias("detrended_sum"),
            F.round(
                F.sum("det_num") / (7.0 * F.count("*")), 9
            ).alias("seasonal_index"),
        )
        .orderBy("dow")
    )

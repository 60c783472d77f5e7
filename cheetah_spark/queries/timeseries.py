"""Event-time windowing: tumbling / sliding / session windows.

The reference has NO event-time processing (SURVEY.md §1.3 — time
enters only as wall-clock flush timers, x/batcher/batcher.go:249);
this is §2B target surface. All three run here in BATCH mode over the
bounded events fixture — the unified API means the identical plan runs
under readStream (see queries/streams.py for the streaming execution
with watermarks).

Scale: ``window()``/``session_window()`` compile to a projection +
hash aggregation on (window, keys) — partial aggregation map-side,
shuffle on the composite key. Session windows additionally sort within
user partitions; the per-user key keeps state partitioned at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cheetah_spark.catalog import load_table
from cheetah_spark.queries._util import dsum2, oracle_dsum2
from cheetah_spark.registry import register


@register(
    "q_time_window_tumbling",
    oracle=f"""
        SELECT date_trunc('hour', ts) AS win_start,
               COUNT(*) AS n,
               {oracle_dsum2("value")} AS sum_value
        FROM events
        GROUP BY 1
    """,
    tags=("window", "event-time"),
)
def q_time_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window aggregation."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"), dsum2("value").alias("sum_value"))
        .select(F.col("w.start").alias("win_start"), "n", "sum_value")
    )


@register(
    "q_time_window_sliding",
    oracle=f"""
        SELECT win_start, COUNT(*) AS n, {oracle_dsum2("value")} AS sum_value
        FROM (
            SELECT make_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT) * 1000000)
                       AS win_start, value
            FROM events
            UNION ALL
            SELECT make_timestamp((CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT) - 1800) * 1000000)
                       AS win_start, value
            FROM events
        )
        GROUP BY win_start
    """,
    tags=("window", "event-time"),
)
def q_time_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 h length, 30 min slide): every event lands in
    exactly two windows; the oracle materializes both by construction."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"), dsum2("value").alias("sum_value"))
        .select(F.col("w.start").alias("win_start"), "n", "sum_value")
    )


# Gaps-and-islands batch mirror of a 30-minute-gap session window —
# shared verbatim by the batch operator below and the STREAMING
# execution (queries/streams.py::s_stream_session), which must emit the
# identical session set once all sessions are watermark-finalized.
SESSION_ORACLE = f"""
        WITH marked AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), islands AS (
            SELECT user_id, ts, value,
                   SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS sess
            FROM marked
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL 30 MINUTE AS session_end,
               COUNT(*) AS n_events,
               {oracle_dsum2("value")} AS sum_value
        FROM islands
        GROUP BY user_id, sess
    """


@register(
    "q_session_window",
    oracle=SESSION_ORACLE,
    tags=("window", "session"),
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute gap) per user — Spark's native
    ``session_window`` merges events closer than the gap; the oracle is
    the classic gaps-and-islands rewrite (a new session starts exactly
    when the gap is ≥ 30 min, matching the half-open [ts, ts+gap)
    session interval)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), dsum2("value").alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "q_hypertable_rollup",
    oracle="""
        WITH m AS (
            SELECT date_trunc('minute', ts) AS bucket, event_type,
                   COUNT(*) AS n,
                   SUM(CAST(value AS DECIMAL(38,6))) AS sv
            FROM events GROUP BY 1, 2
        )
        SELECT 'minute' AS resolution, bucket, event_type, n,
               CAST(ROUND(sv, 2) AS DOUBLE) AS sum_value
        FROM m
        UNION ALL
        SELECT 'hour', date_trunc('hour', bucket), event_type,
               CAST(SUM(n) AS BIGINT), CAST(ROUND(SUM(sv), 2) AS DOUBLE)
        FROM m GROUP BY 2, 3
        UNION ALL
        SELECT 'day', date_trunc('day', bucket), event_type,
               CAST(SUM(n) AS BIGINT), CAST(ROUND(SUM(sv), 2) AS DOUBLE)
        FROM m GROUP BY 2, 3
    """,
    tags=("timeseries", "rollup"),
)
def q_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution rollup: minute buckets
    aggregated ONCE from raw events, then hour and day resolutions
    re-aggregated FROM the minute partials (exact decimal sums make
    hierarchical reaggregation lossless).

    Scale shape: one shuffle over (minute, type) — the raw table is
    touched once; coarser resolutions reduce ~60× smaller inputs each
    step, the continuous-aggregate pattern of time-series stores. The
    minute partial is eagerly localCheckpointed for the in-plan reuse
    (bounded: minutes × types) — localCheckpoint rather than persist so
    no CacheManager entry leaks past the query (guide §5)."""
    e = load_table(spark, sf_dir, "events")
    minute = (
        e.groupBy(
            F.date_trunc("minute", "ts").alias("bucket"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).alias("sv"),
        )
        .localCheckpoint()
    )

    def _tag(df: DataFrame, res: str) -> DataFrame:
        return df.select(
            F.lit(res).alias("resolution"),
            "bucket",
            "event_type",
            "n",
            F.round("sv", 2).cast("double").alias("sum_value"),
        )

    hour = (
        minute.groupBy(F.date_trunc("hour", "bucket").alias("bucket"), "event_type")
        .agg(F.sum("n").alias("n"), F.sum("sv").alias("sv"))
    )
    day = (
        minute.groupBy(F.date_trunc("day", "bucket").alias("bucket"), "event_type")
        .agg(F.sum("n").alias("n"), F.sum("sv").alias("sv"))
    )
    return _tag(minute, "minute").unionByName(_tag(hour, "hour")).unionByName(_tag(day, "day"))


@register(
    "q_timeseries_gapfill",
    oracle=f"""
        WITH actual AS (
            SELECT event_type, date_trunc('hour', ts) AS h,
                   COUNT(*)::BIGINT AS n_actual, {oracle_dsum2("value")} AS sum_value
            FROM events GROUP BY 1, 2
        ),
        rng AS (
            SELECT event_type, date_trunc('hour', MIN(ts)) AS h0,
                   date_trunc('hour', MAX(ts)) AS h1
            FROM events GROUP BY 1
        ),
        spine AS (
            SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
            FROM rng
        )
        SELECT s.event_type, s.h AS win_start,
               COALESCE(a.n_actual, 0) AS n,
               a.n_actual IS NULL AS is_gap,
               last_value(a.sum_value IGNORE NULLS) OVER (
                   PARTITION BY s.event_type ORDER BY s.h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_sum
        FROM spine s LEFT JOIN actual a ON s.event_type = a.event_type AND s.h = a.h
    """,
    tags=("window", "event-time", "gapfill"),
)
def q_timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style gap filling: densify each event_type's hourly
    series over its own observed [min, max] range, marking empty hours
    and carrying the last observed hourly sum forward (LOCF) — the
    time_bucket_gapfill + locf() pair of time-series stores, built
    from relational primitives.

    Scale shape: the raw table collapses FIRST to (type, hour)
    aggregates (map-side combined — at 100 TB this is the only pass
    over the data); the spine is generated arithmetically per key from
    a tiny per-key min/max aggregate (series_length × n_keys rows, no
    cross join with the corpus) and left-joins the actuals; LOCF is
    one `last(ignorenulls)` running window per key, so fill state
    never crosses series boundaries. All values are exact ints or
    decimal-snapped sums → bit-identical LOCF in both engines."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    hr = F.date_trunc("hour", F.col("ts"))
    # ONE corpus pass: the per-key range folds from the hourly
    # aggregate itself — date_trunc is monotone, so
    # date_trunc(hour, MIN(ts)) == MIN(date_trunc(hour, ts)) exactly
    # (the oracle keeps the two-scan spelling; values identical). The
    # (type, hour) table is bounded, so it checkpoints as the §8
    # small-rows proxy both branches read.
    actual = e.groupBy("event_type", hr.alias("h")).agg(
        F.count("*").alias("n_actual"), dsum2("value").alias("sum_value")
    ).localCheckpoint()
    rng = actual.groupBy("event_type").agg(
        F.min("h").alias("h0"),
        F.max("h").alias("h1"),
    )
    spine = rng.select(
        "event_type",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("h"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return spine.join(actual, ["event_type", "h"], "left").select(
        "event_type",
        F.col("h").alias("win_start"),
        F.coalesce(F.col("n_actual"), F.lit(0).cast("bigint")).alias("n"),
        F.col("n_actual").isNull().alias("is_gap"),
        F.last("sum_value", ignorenulls=True).over(w).alias("locf_sum"),
    )


# Truncated exponentially-weighted moving average. alpha = 1/2 and a
# K=8 tap horizon are chosen so every weight (1-alpha)^k = 2^-k is an
# EXACT binary double: each product w_k * lag(value, k) only shifts the
# exponent (no mantissa rounding), the 8-term numerator/denominator
# sums are evaluated in one fixed expression order by both engines, and
# the final division is IEEE division of identical operands — the
# per-row EWMA is bit-identical on Spark and DuckDB with no snapping.
# Weights beyond K=8 contribute < 2^-8 ≈ 0.4% and are truncated, the
# standard bounded-memory EWM formulation (pandas `ewm(...).mean()`
# with adjust=True over a length-K window).
_EWMA_K = 8


def _ewma_terms() -> tuple[str, str]:
    """(numerator, denominator) SQL — shared verbatim by both engines."""
    num = " + ".join(
        f"COALESCE(LAG(value, {k}) OVER w * {2.0 ** -k!r}, 0.0)" for k in range(_EWMA_K)
    )
    den = " + ".join(
        f"CASE WHEN LAG(value, {k}) OVER w IS NULL THEN 0.0 ELSE {2.0 ** -k!r} END"
        for k in range(_EWMA_K)
    )
    return num, den


_EWMA_NUM, _EWMA_DEN = _ewma_terms()

EWMA_SQL = f"""
    SELECT event_id, user_id, value,
           ({_EWMA_NUM}) / ({_EWMA_DEN}) AS ewma
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@register(
    "q_timeseries_ewma",
    oracle=EWMA_SQL,
    tags=("timeseries", "window", "smoothing"),
)
def q_timeseries_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key EWMA smoothing (alpha=1/2, 8-tap truncation) — the
    metric-smoothing primitive of monitoring/anomaly stacks; feeds the
    same z-score residual detection as q_sec_anomaly_zscore.

    The reference has no windowed compute (SURVEY.md §1.3); this is
    §2B target surface expressed as ONE window spec reused by eight
    LAG taps — Catalyst collapses them into a single Window exec with
    one sort per user partition, so at 100 TB the cost is exactly one
    shuffle on user_id + an in-partition sort (no per-tap passes).
    The SQL text is shared verbatim with the DuckDB oracle."""
    e = load_table(spark, sf_dir, "events")
    e.createOrReplaceTempView("events")
    return spark.sql(EWMA_SQL)


# Financial-style OHLC downsampling: open/high/low/close + volume per
# (event_type, hour). first/last are selected by an explicit unique
# BIGINT order key (epoch-seconds * 10^7 + event_id) so the pick is
# deterministic under any partitioning; high/low/open/close are raw
# parquet doubles (selection, not arithmetic) — bit-identical across
# engines; the volume-weighted sum uses the exact-decimal convention.
OHLC_SQL_DUCK = f"""
    SELECT event_type,
           date_trunc('hour', ts) AS bucket,
           arg_min(value, CAST(epoch(date_trunc('second', ts)) AS BIGINT) * 10000000
                          + event_id % 10000000) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           arg_max(value, CAST(epoch(date_trunc('second', ts)) AS BIGINT) * 10000000
                          + event_id % 10000000) AS close,
           COUNT(*) AS volume,
           {oracle_dsum2("value")} AS sum_value
    FROM events
    GROUP BY 1, 2
"""


@register(
    "q_timeseries_ohlc",
    oracle=OHLC_SQL_DUCK,
    tags=("timeseries", "downsample"),
)
def q_timeseries_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bar downsampling per (event_type, hour): the classic
    first/last/min/max resampler of tick stores (and the shape of
    M4-style chart downsampling with value extremes, cf.
    q_timeseries_m4 which picks by-position extremes).

    Scale shape: ONE hash aggregate over (type, hour) — min_by/max_by
    carry (key, value) partial state, so open/close resolve map-side
    and the shuffle moves only one partial row per group per mapper;
    no window, no sort, no second pass. This is the aggregation form
    of `first/last` that actually scales (a window row_number=1
    formulation would sort every partition)."""
    e = load_table(spark, sf_dir, "events")
    ordkey = (
        F.date_trunc("second", F.col("ts")).cast("bigint") * F.lit(10000000)
        + F.col("event_id") % F.lit(10000000)
    )
    return e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(
        F.min_by("value", ordkey).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", ordkey).alias("close"),
        F.count("*").alias("volume"),
        dsum2("value").alias("sum_value"),
    )

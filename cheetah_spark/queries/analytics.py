"""Event-analytics operators: M4 downsampling, latest-record
compaction, and sequential funnel attribution.

The reference is an event-pipeline framework (SURVEY.md §1) whose
users run exactly this class of query downstream of the pipe; none of
the three exist there as operators (no reference counterpart — §2B
extension surface, same stance as queries/timeseries.py). All three
are pure DataFrame compositions — no UDFs, no collects.

Determinism: every value column is either an exact integer, a
truncated timestamp, or a *selection* of an input double (min/max/
arg-extremum never do arithmetic, so the bits pass through unchanged
in both engines); every extremum has a unique (ts, event_id)
tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cheetah_spark.catalog import load_table
from cheetah_spark.queries._util import dsum2, oracle_dsum2
from cheetah_spark.registry import register

# ---------------------------------------------------------------------------
# M4 downsampling
# ---------------------------------------------------------------------------

_M4_BUCKET_S = 4 * 3600  # 4-hour pixel buckets over the 30-day fixture


@register(
    "q_timeseries_m4",
    oracle=f"""
        WITH b AS (
            SELECT event_type, ts, event_id, value,
                   make_timestamp(CAST(floor(epoch(ts) / {_M4_BUCKET_S}) * {_M4_BUCKET_S}
                                       AS BIGINT) * 1000000) AS win_start
            FROM events
        ),
        w AS (
            SELECT *,
                   row_number() OVER (PARTITION BY event_type, win_start
                                      ORDER BY ts, event_id) AS rn_f,
                   row_number() OVER (PARTITION BY event_type, win_start
                                      ORDER BY ts DESC, event_id DESC) AS rn_l
            FROM b
        )
        SELECT event_type, win_start,
               COUNT(*) AS n,
               MIN(value) AS v_min,
               MAX(value) AS v_max,
               MAX(CASE WHEN rn_f = 1 THEN value END) AS v_first,
               MAX(CASE WHEN rn_l = 1 THEN value END) AS v_last
        FROM w
        GROUP BY event_type, win_start
    """,
    tags=("timeseries", "downsample"),
)
def q_timeseries_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 downsampling (Jugel et al., VLDB 2014): per (series, pixel
    bucket) keep exactly the four points a line plot needs — min, max,
    first, last — the error-free way to shrink a billion-point series
    to a screenful without distorting its rendering.

    Scale shape: ONE hash aggregation keyed by (event_type, bucket)
    with map-side partials — first/last are ``min/max(struct(ts,
    event_id, value))`` arg-extrema, NOT a window sort (the oracle
    spells the same tiebreak with ROW_NUMBER; the Spark plan never
    sorts). At 100 TB this is the same two-level-agg plan as
    q_hash_agg: linear, no shuffle beyond the bucket key, and the
    output is bounded by pixels × series, not input rows. All four
    value columns are selections of input doubles — no arithmetic, so
    bits pass through identically in both engines."""
    e = load_table(spark, sf_dir, "events")
    g = (
        e.groupBy("event_type", F.window("ts", f"{_M4_BUCKET_S} seconds").alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.min("value").alias("v_min"),
            F.max("value").alias("v_max"),
            F.min(F.struct("ts", "event_id", "value")).alias("mf"),
            F.max(F.struct("ts", "event_id", "value")).alias("ml"),
        )
    )
    return g.select(
        "event_type",
        F.col("w.start").alias("win_start"),
        "n", "v_min", "v_max",
        F.col("mf.value").alias("v_first"),
        F.col("ml.value").alias("v_last"),
    )


# ---------------------------------------------------------------------------
# Latest-record compaction (CDC upsert view)
# ---------------------------------------------------------------------------


@register(
    "q_latest_by_key",
    oracle="""
        WITH w AS (
            SELECT user_id, ts, event_id, event_type, value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ),
        c AS (SELECT user_id, COUNT(*)::BIGINT AS n_events FROM events GROUP BY user_id)
        SELECT w.user_id,
               c.n_events,
               date_trunc('second', w.ts) AS last_ts,
               w.event_type AS last_type,
               w.value AS last_value
        FROM w JOIN c ON w.user_id = c.user_id
        WHERE w.rn = 1
    """,
    tags=("compaction", "cdc"),
)
def q_latest_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-record-per-key compaction — the CDC/upsert "current
    state" view (treat each event as a change record; keep the newest
    per user_id). The standard log-compaction read every changelog
    consumer materializes.

    Scale shape: ONE aggregate — ``max(struct(ts, event_id, type,
    value))`` per key — with map-side partials, so each partition
    contributes one candidate row per key and the shuffle carries keys,
    not history. Deliberately NOT the ROW_NUMBER-over-window the oracle
    uses for clarity: the window formulation sorts every key's full
    history; the arg-max formulation is the one that survives a 100 TB
    changelog. (ts, event_id) is a unique tiebreak."""
    e = load_table(spark, sf_dir, "events")
    g = e.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.max(F.struct("ts", "event_id", "event_type", "value")).alias("m"),
    )
    return g.select(
        "user_id",
        "n_events",
        F.date_trunc("second", F.col("m.ts")).alias("last_ts"),
        F.col("m.event_type").alias("last_type"),
        F.col("m.value").alias("last_value"),
    )


# ---------------------------------------------------------------------------
# Sequential funnel
# ---------------------------------------------------------------------------


@register(
    "q_events_funnel",
    oracle="""
        WITH v AS (
            SELECT user_id, MIN(ts) AS t_view FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS (
            SELECT e.user_id, MIN(e.ts) AS t_click
            FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t_view
            WHERE e.event_type = 'click' GROUP BY e.user_id
        ),
        p AS (
            SELECT e.user_id, MIN(e.ts) AS t_purchase
            FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t_click
            WHERE e.event_type = 'purchase' GROUP BY e.user_id
        )
        SELECT v.user_id,
               date_trunc('second', v.t_view) AS t_view,
               date_trunc('second', c.t_click) AS t_click,
               date_trunc('second', p.t_purchase) AS t_purchase,
               (1 + CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END
                  + CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END)::BIGINT AS stage
        FROM v LEFT JOIN c ON v.user_id = c.user_id
               LEFT JOIN p ON v.user_id = p.user_id
    """,
    tags=("analytics", "funnel"),
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-sequential funnel attribution: first view, then the
    first click AFTER that view, then the first purchase AFTER that
    click. The ordering constraint is the point — comparing per-type
    minima alone miscounts a user whose only clicks precede their
    first view; each stage must re-scan events later than the previous
    stage's anchor.

    Scale shape: each stage is a type-filtered scan (predicate pushed
    to parquet) aggregated on user_id, joined to the previous stage's
    anchor on the same key — three shuffles, all keyed by the
    uniformly-distributed user_id, each later stage strictly smaller.
    The anchor tables are per-user single rows (corpus-row count never
    joins corpus-row count), so at 100 TB the joins are key-partitioned
    hash joins AQE can broadcast as the funnel narrows."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    stage = (
        F.lit(1)
        + F.when(F.col("t_click").isNull(), 0).otherwise(1)
        + F.when(F.col("t_purchase").isNull(), 0).otherwise(1)
    ).cast("bigint")
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            F.date_trunc("second", F.col("t_view")).alias("t_view"),
            F.date_trunc("second", F.col("t_click")).alias("t_click"),
            F.date_trunc("second", F.col("t_purchase")).alias("t_purchase"),
            stage.alias("stage"),
        )
    )


# ---------------------------------------------------------------------------
# Cohort retention
# ---------------------------------------------------------------------------

_WEEK_S = 7 * 86400  # epoch-aligned weeks: exact integer math, no
# engine-specific week-start convention in the comparison path


@register(
    "q_events_retention",
    oracle=f"""
        WITH a AS (
            SELECT DISTINCT user_id,
                   CAST(floor(epoch(ts) / {_WEEK_S}) AS BIGINT) AS wk
            FROM events
        ),
        first_wk AS (SELECT user_id, MIN(wk) AS cohort_wk FROM a GROUP BY user_id)
        SELECT f.cohort_wk,
               a.wk - f.cohort_wk AS week_offset,
               COUNT(*) AS n_users
        FROM a JOIN first_wk f ON a.user_id = f.user_id
        GROUP BY f.cohort_wk, week_offset
    """,
    tags=("analytics", "retention"),
)
def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: bucket each user into the
    epoch-week of their first event (cohort), then count how many of
    each cohort's users are active 0, 1, 2, … weeks later — the
    retention triangle of product analytics.

    Weeks are ``floor(epoch / 604800)`` — exact integer bucketing with
    no week-start convention to diverge on. Scale shape: one distinct
    on (user, week) — map-side combinable and tiny relative to raw
    events — one min-aggregate per user, one co-partitioned join on
    user_id, one final aggregate; every shuffle is keyed by the
    uniformly-distributed user_id or the small (cohort, offset) pair."""
    e = load_table(spark, sf_dir, "events")
    a = e.select(
        "user_id",
        F.floor(F.col("ts").cast("long") / _WEEK_S).cast("bigint").alias("wk"),
    ).distinct()
    first_wk = a.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    return (
        a.join(first_wk, "user_id")
        .groupBy("cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("week_offset"))
        .agg(F.count("*").alias("n_users"))
    )


# ---------------------------------------------------------------------------
# Counter rate (increase) per series
# ---------------------------------------------------------------------------


@register(
    "q_timeseries_rate",
    oracle=f"""
        WITH d AS (
            SELECT event_type, ts,
                   value - lag(value) OVER (PARTITION BY event_type
                                            ORDER BY ts, event_id) AS delta
            FROM events
        )
        SELECT event_type, date_trunc('hour', ts) AS win_start,
               COUNT(delta)::BIGINT AS n_deltas,
               CAST(SUM(CASE WHEN delta > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
               {oracle_dsum2("CASE WHEN delta > 0 THEN delta ELSE 0 END")} AS increase
        FROM d
        GROUP BY event_type, win_start
    """,
    tags=("timeseries", "rate"),
)
def q_timeseries_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counter-increase per series per hour (the monitoring-store
    ``increase()``/``rate()`` primitive): consecutive-sample deltas via
    LAG within each series, keeping only positive deltas (counter
    resets contribute zero), summed per hour.

    Determinism: each delta is ONE IEEE subtraction of identical
    operands in both engines; the positive-delta sum is the module's
    standard exact-decimal sum. Scale shape: one window sort per
    event_type series for LAG (the canonical shape for
    consecutive-sample math — state never crosses series), then the
    usual two-level hash agg on (series, hour). Series cardinality is
    what partitions the 100 TB case; a single series that outgrows one
    executor would shard by (series, day) with per-shard boundary rows
    exchanged — not needed at this fixture's 5 series."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    d = e.select(
        "event_type", "ts",
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )
    pos = F.when(F.col("delta") > 0, F.col("delta")).otherwise(F.lit(0.0))
    return (
        d.groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("win_start"))
        .agg(
            F.count("delta").alias("n_deltas"),
            F.sum(F.when(F.col("delta") > 0, 1).otherwise(0)).cast("bigint").alias("n_pos"),
            dsum2(pos).alias("increase"),
        )
    )


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch, error-bound-verified
# ---------------------------------------------------------------------------


@register(
    "q_approx_distinct_hll",
    oracle="""
        SELECT event_type,
               COUNT(DISTINCT user_id)::BIGINT AS n_exact_users,
               COUNT(DISTINCT event_id)::BIGINT AS n_exact_events,
               TRUE AS users_within_5pct,
               TRUE AS events_within_5pct
        FROM events GROUP BY event_type
    """,
    tags=("sketch", "approx"),
)
def q_approx_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct counting with its error bound VERIFIED,
    not assumed: the estimate itself can't bit-match another engine's
    sketch, so the contract emits the exact count plus a boolean
    ``|estimate − exact| ≤ 5 %·exact`` that the oracle pins to TRUE —
    the sketch's accuracy claim becomes the hash-checked value.
    Deterministic: Spark's HLL++ is seed-fixed, so the booleans are
    stable across runs and partitionings.

    Scale shape: the POINT of the sketch — ``approx_count_distinct``
    carries fixed-size mergeable registers through a map-side partial
    (the exact ``countDistinct`` companion, which must shuffle every
    distinct value, rides along here only as the verification anchor;
    a 100 TB run keeps the sketch and drops the anchor)."""
    e = load_table(spark, sf_dir, "events")
    g = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact_users"),
        F.countDistinct("event_id").alias("n_exact_events"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("au"),
        F.approx_count_distinct("event_id", rsd=0.02).alias("ae"),
    )
    def within_5pct(approx, exact):  # |err| * 20 <= exact, exact ints
        return F.abs(approx - F.col(exact)) * 20 <= F.col(exact)
    return g.select(
        "event_type",
        "n_exact_users",
        "n_exact_events",
        within_5pct(F.col("au"), "n_exact_users").alias("users_within_5pct"),
        within_5pct(F.col("ae"), "n_exact_events").alias("events_within_5pct"),
    )

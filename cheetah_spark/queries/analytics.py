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
from cheetah_spark.functions import text as X
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
    # v and c are per-user anchor rows (the guide-§8 small table), each
    # referenced by the NEXT stage and by the final left-join — the
    # eager checkpoints keep the type-filtered event scans at one per
    # stage (without them the lazy re-derivation scanned events 6×:
    # v computed 3 times, c twice)
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
        .localCheckpoint()
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
        .localCheckpoint()
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
    # (user, week) distinct rows — bounded by users × weeks, tiny next
    # to raw events; referenced by first_wk AND the retention join, so
    # the checkpoint keeps the events scan + DISTINCT shuffle at one
    a = e.select(
        "user_id",
        F.floor(F.col("ts").cast("long") / _WEEK_S).cast("bigint").alias("wk"),
    ).distinct().localCheckpoint()
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


# ---------------------------------------------------------------------------
# Threat-intel CIDR matching (security analytics)
# ---------------------------------------------------------------------------

_IP_SEED = "ip:"
_IP_SPACE = 1 << 32
_CIDR_BUCKET_SHIFT = 24  # join on the /8 bucket (top byte) of the IP

# name → CIDR block. Deliberately spans /4 … /24 so wide blocks match
# plenty of the uniform synthetic IP space and narrow ones match ~none
# (zero-match blocks must still appear in the output).
_THREAT_BLOCKS = {
    "bogon-low": "0.0.0.0/4",
    "tor-exit": "32.0.0.0/6",
    "botnet-a": "77.0.0.0/8",
    "scanner": "96.0.0.0/10",
    "spam-relay": "112.0.0.0/12",
    "c2-beacon": "128.14.0.0/16",
    "cryptominer": "203.0.113.0/24",
    "phishkit": "198.51.100.0/24",
}


def _cidr_rows() -> list[tuple[str, int, int, int]]:
    """(block, bucket, lo, hi) rows, one per /8 bucket a block covers."""
    import ipaddress

    rows = []
    for name, cidr in _THREAT_BLOCKS.items():
        net = ipaddress.ip_network(cidr)
        lo, hi = int(net.network_address), int(net.broadcast_address)
        for bucket in range(lo >> _CIDR_BUCKET_SHIFT, (hi >> _CIDR_BUCKET_SHIFT) + 1):
            rows.append((name, bucket, lo, hi))
    return rows


def _oracle_cidr_values() -> str:
    return ", ".join(f"('{n}', {b}, {lo}, {hi})" for n, b, lo, hi in _cidr_rows())


@register(
    "q_sec_cidr_match",
    oracle=f"""
        WITH e AS (
            SELECT event_id, user_id,
                   {X.oracle_hash56(f"'{_IP_SEED}' || CAST(event_id AS VARCHAR)")}
                       % {_IP_SPACE} AS ip
            FROM events
        ),
        b(block, bucket, lo, hi) AS (VALUES {_oracle_cidr_values()}),
        m AS (
            SELECT b.block, e.event_id, e.user_id
            FROM e JOIN b ON (e.ip // {1 << _CIDR_BUCKET_SHIFT}) = b.bucket
                         AND e.ip BETWEEN b.lo AND b.hi
        ),
        agg AS (
            SELECT block, COUNT(*)::BIGINT AS n_events,
                   COUNT(DISTINCT user_id)::BIGINT AS n_users,
                   MIN(event_id) AS min_event_id
            FROM m GROUP BY block
        )
        SELECT d.block,
               COALESCE(agg.n_events, 0)::BIGINT AS n_events,
               COALESCE(agg.n_users, 0)::BIGINT AS n_users,
               agg.min_event_id
        FROM (SELECT DISTINCT block FROM b) d
        LEFT JOIN agg ON d.block = agg.block
    """,
    tags=("security", "cidr", "enrich"),
)
def q_sec_cidr_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threat-intel CIDR matching — the reference's users run security
    event pipelines (SURVEY.md §1), and "which events came from a bad
    netblock" is the canonical enrichment. Synthetic source IPs are
    derived from the cross-engine hash (the fixture has no IP column),
    matched against an 8-block threat feed spanning /4 … /24; blocks
    with zero matches still appear (a feed row silently vanishing is a
    detection gap).

    Scale shape: a range predicate (``lo <= ip <= hi``) naively forces
    a broadcast *nested-loop* join — O(events × blocks) probes. Instead
    each block is expanded to the /8 buckets it covers (a /4 block is
    16 rows; the whole feed is 43 rows) and the join is an *equi*-join
    on the event's top byte with the range check as a residual filter:
    a broadcast hash probe per event, O(events). This is the standard
    prefix-bucket trick for IP-range joins at 100 TB; for feeds with
    millions of blocks the bucket simply narrows to /16."""
    e = load_table(spark, sf_dir, "events")
    ev = e.select(
        "event_id",
        "user_id",
        (
            X.hash56(F.concat(F.lit(_IP_SEED), F.col("event_id").cast("string")))
            % _IP_SPACE
        ).alias("ip"),
    ).withColumn("bucket", F.expr(f"ip div {1 << _CIDR_BUCKET_SHIFT}"))
    # feed as a pure-JVM VALUES literal: createDataFrame(list) builds an
    # RDD-backed frame whose broadcast-collect spins up Python workers —
    # measured ~2 s of the r3 3 s regression on this 43-row table
    b = spark.sql(
        f"SELECT * FROM (VALUES {_oracle_cidr_values()})"
        " AS t(block, bucket, lo, hi)"
    )
    m = ev.join(F.broadcast(b), "bucket").where(
        (F.col("ip") >= F.col("lo")) & (F.col("ip") <= F.col("hi"))
    )
    agg = m.groupBy("block").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("event_id").alias("min_event_id"),
    )
    dim = b.select("block").distinct()
    return dim.join(agg, "block", "left").select(
        "block",
        F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
        F.coalesce("n_users", F.lit(0)).cast("bigint").alias("n_users"),
        "min_event_id",
    )


# ---------------------------------------------------------------------------
# Volume-anomaly detection (integer-exact z-score)
# ---------------------------------------------------------------------------

_ZSCORE_SQ_THRESHOLD = 9  # flag |z| >= 3, compared as z² in integers


@register(
    "q_sec_anomaly_zscore",
    oracle=f"""
        WITH c AS (
            SELECT event_type, date_trunc('hour', ts) AS hr, COUNT(*)::BIGINT AS n
            FROM events GROUP BY event_type, hr
        ),
        s AS (
            SELECT event_type, COUNT(*)::BIGINT AS t,
                   CAST(SUM(n) AS BIGINT) AS s,
                   CAST(SUM(n * n) AS BIGINT) AS ss
            FROM c GROUP BY event_type
        ),
        f AS (
            SELECT c.event_type, c.hr, c.n, s.t,
                   (c.n * s.t - s.s) * (c.n * s.t - s.s)
                       >= {_ZSCORE_SQ_THRESHOLD} * (s.t * s.ss - s.s * s.s)
                       AS anomalous
            FROM c JOIN s ON c.event_type = s.event_type
        )
        SELECT event_type,
               MAX(t) AS n_hours,
               CAST(SUM(CASE WHEN anomalous THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_anomalous,
               MAX(n) AS max_count,
               MIN(CASE WHEN anomalous THEN hr END) AS first_anomalous_hr
        FROM f
        GROUP BY event_type
    """,
    tags=("security", "anomaly"),
)
def q_sec_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-volume anomaly detection: flag hours whose event count is
    >= 3 population standard deviations from that event type's hourly
    mean — the spike/drop alert every security pipeline hangs off its
    ingest stream.

    Determinism: the z-score test is evaluated ENTIRELY in integers —
    ``z² >= 9`` rearranged as ``(n·T − S)² >= 9·(T·SS − S²)`` over the
    count sum S and sum-of-squares SS, so no division, no sqrt, no
    float ever exists and the flags hash-match any engine bit-for-bit.

    Scale shape: hourly counts are a map-side-combined groupBy; the
    per-type stats table is tiny (one row per series) and broadcast
    back; flags are a map-only expression. Nothing here is a window —
    the 100 TB version is two hash aggs and a broadcast join."""
    e = load_table(spark, sf_dir, "events")
    c = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(F.count("*").alias("n"))
    s = c.groupBy("event_type").agg(
        F.count("*").alias("t"),
        F.sum("n").cast("bigint").alias("s"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("ss"),
    )
    dev = F.col("n") * F.col("t") - F.col("s")
    anomalous = dev * dev >= F.lit(_ZSCORE_SQ_THRESHOLD) * (
        F.col("t") * F.col("ss") - F.col("s") * F.col("s")
    )
    f = c.join(F.broadcast(s), "event_type").withColumn("anomalous", anomalous)
    return f.groupBy("event_type").agg(
        F.max("t").alias("n_hours"),
        F.sum(F.when(F.col("anomalous"), 1).otherwise(0)).cast("bigint").alias("n_anomalous"),
        F.max("n").alias("max_count"),
        F.min(F.when(F.col("anomalous"), F.col("hr"))).alias("first_anomalous_hr"),
    )


# ---------------------------------------------------------------------------
# Session path mining (top event-type sequences)
# ---------------------------------------------------------------------------

_PATH_GAP_S = 30 * 60  # session gap, seconds (shared with q_session_window)
_PATH_STEPS = 3
_PATH_TOP = 10


@register(
    "q_events_path_topk",
    oracle=f"""
        WITH o AS (
            SELECT user_id, event_type,
                   CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                   event_id,
                   CASE WHEN lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w IS NULL
                             OR CAST(floor(epoch(ts)) AS BIGINT)
                                - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w
                                >= {_PATH_GAP_S}
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id
                         ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id)
        ),
        s AS (
            SELECT user_id, event_type, sec, event_id,
                   SUM(new_sess) OVER (PARTITION BY user_id ORDER BY sec, event_id
                                       ROWS UNBOUNDED PRECEDING) AS sess
            FROM o
        ),
        r AS (
            SELECT user_id, sess, event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id, sess
                                      ORDER BY sec, event_id) AS rn
            FROM s
        ),
        paths AS (
            SELECT user_id, sess,
                   concat_ws('>',
                       MAX(CASE WHEN rn = 1 THEN event_type END),
                       MAX(CASE WHEN rn = 2 THEN event_type END),
                       MAX(CASE WHEN rn = 3 THEN event_type END)) AS path
            FROM r WHERE rn <= {_PATH_STEPS}
            GROUP BY user_id, sess
        )
        SELECT path, COUNT(*) AS n_sessions
        FROM paths
        GROUP BY path
        ORDER BY n_sessions DESC, path
        LIMIT {_PATH_TOP}
    """,
    tags=("analytics", "sessionize", "sequence"),
)
def q_events_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user-journey paths: sessionize each user's events with a
    30-minute inactivity gap (gaps-and-islands — the batch mirror of
    q_session_window's semantics), take the first three event types of
    every session in time order, and rank the most common paths — the
    "what do users actually do" query of product analytics.

    Determinism: gaps are computed on floor-second epochs (exact
    integers, both engines), every window is ordered by the unique
    (ts, event_id), paths are distinct strings so the top-10 has a
    total order. Scale shape: sessionization is ONE window shuffle
    keyed by user_id (state never crosses users); the path rollup
    shuffles tiny (user, session) aggregates; the final top-k is a
    TakeOrderedAndProject over path counts — no global sort of the
    event stream anywhere."""
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events")
    sec = F.col("ts").cast("long")
    wu = W.partitionBy("user_id").orderBy("sec", "event_id")
    o = e.select(
        "user_id", "event_type", "event_id", sec.alias("sec")
    ).withColumn(
        "new_sess",
        F.when(
            F.lag("sec").over(wu).isNull()
            | (F.col("sec") - F.lag("sec").over(wu) >= _PATH_GAP_S),
            1,
        ).otherwise(0),
    )
    s = o.withColumn(
        "sess",
        F.sum("new_sess").over(
            W.partitionBy("user_id").orderBy("sec", "event_id").rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    r = s.withColumn(
        "rn", F.row_number().over(W.partitionBy("user_id", "sess").orderBy("sec", "event_id"))
    ).where(F.col("rn") <= _PATH_STEPS)
    paths = r.groupBy("user_id", "sess").agg(
        F.concat_ws(
            ">",
            F.max(F.when(F.col("rn") == 1, F.col("event_type"))),
            F.max(F.when(F.col("rn") == 2, F.col("event_type"))),
            F.max(F.when(F.col("rn") == 3, F.col("event_type"))),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(_PATH_TOP)
    )


# ---------------------------------------------------------------------------
# Fixed-width value histogram
# ---------------------------------------------------------------------------

_HIST_W = 25.0  # bucket width over the value domain [0, 500)
_HIST_MAX_BUCKET = 19


@register(
    "q_events_histogram",
    oracle=f"""
        SELECT event_type,
               LEAST(CAST(floor(value / {_HIST_W}) AS BIGINT), {_HIST_MAX_BUCKET}) AS bucket,
               COUNT(*) AS n_events,
               {oracle_dsum2("value")} AS sum_value
        FROM events
        GROUP BY event_type, bucket
    """,
    tags=("analytics", "histogram"),
)
def q_events_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of the value distribution per event type
    (the monitoring-dashboard bucket chart): bucket = floor(value/25)
    clamped to a final overflow bucket. One IEEE division + floor per
    row — bit-identical in both engines — then a plain two-level hash
    aggregate on the tiny (type, bucket) key space; at 100 TB this is
    the cheapest possible shape (map-side combine collapses everything
    before the shuffle)."""
    e = load_table(spark, sf_dir, "events")
    bucket = F.least(
        F.floor(F.col("value") / _HIST_W).cast("bigint"), F.lit(_HIST_MAX_BUCKET)
    ).alias("bucket")
    return e.groupBy("event_type", bucket).agg(
        F.count("*").alias("n_events"),
        dsum2("value").alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters
# ---------------------------------------------------------------------------

_CM_D = 3  # hash rows
_CM_W = 512  # counters per row
_CM_TOP = 10
_CM_SEEDS = tuple(f"cm{i}" for i in range(_CM_D))


_CM_ORACLE = f"""
    WITH keys AS (SELECT user_id FROM events),
    hashed AS (
        {" UNION ALL ".join(
            f"SELECT {i} AS row_i, user_id, "
            f"({X.oracle_hash56('CAST(user_id AS VARCHAR)', seed=repr(s))} % {_CM_W}) AS bucket "
            "FROM keys"
            for i, s in enumerate(_CM_SEEDS))}
    ),
    sketch AS (
        SELECT row_i, bucket, COUNT(*) AS counter
        FROM hashed GROUP BY row_i, bucket
    ),
    exact AS (
        SELECT user_id, COUNT(*) AS exact_n FROM events GROUP BY user_id
        ORDER BY exact_n DESC, user_id LIMIT {_CM_TOP}
    ),
    probes AS (
        SELECT e.user_id, e.exact_n, s.counter
        FROM exact e
        JOIN (SELECT DISTINCT row_i, user_id, bucket FROM hashed) h
          ON h.user_id = e.user_id
        JOIN sketch s ON s.row_i = h.row_i AND s.bucket = h.bucket
    )
    SELECT user_id,
           CAST(exact_n AS BIGINT) AS exact_n,
           CAST(MIN(counter) AS BIGINT) AS cm_estimate,
           MIN(counter) >= exact_n AS never_underestimates
    FROM probes
    GROUP BY user_id, exact_n
"""


@register("q_approx_heavy_cmsketch", oracle=_CM_ORACLE, tags=("analytics", "sketch", "heavy-hitters"))
def q_approx_heavy_cmsketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) heavy-hitter
    estimation: a d×w counter grid (3×512 ints — constant memory at
    any corpus size) built with one aggregate per seeded hash row;
    each key's frequency estimate is the MIN of its d counters, which
    can only OVER-estimate — the sketch's one-sided error theorem is
    pinned into the result (`never_underestimates`). The exact top-10
    keys anchor the comparison, and because both engines run identical
    md5-derived integer hashing, estimates hash-match bit-for-bit
    (same stance as q_approx_distinct_hll's pinned error bound).

    Scale shape: the sketch build is a map-side-combinable aggregate
    onto d×w cells — the 100 TB stream collapses to 1536 integers; the
    probe side touches only the candidate keys. This is the
    constant-memory complement to the exact q_sort_limit_topk."""
    e = load_table(spark, sf_dir, "events")
    keys = e.select("user_id")
    hashed = keys.select(
        "user_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_i"),
                        (X.hash56(F.col("user_id").cast("string"), seed=F.lit(s)) % _CM_W).alias(
                            "bucket"
                        ),
                    )
                    for i, s in enumerate(_CM_SEEDS)
                ]
            )
        ).alias("h"),
    ).select("user_id", F.col("h.row_i").alias("row_i"), F.col("h.bucket").alias("bucket"))
    sketch = hashed.groupBy("row_i", "bucket").agg(F.count("*").alias("counter"))
    exact = (
        e.groupBy("user_id")
        .agg(F.count("*").alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), "user_id")
        .limit(_CM_TOP)
    )
    probes = (
        exact.join(hashed.distinct(), "user_id")
        .join(F.broadcast(sketch), ["row_i", "bucket"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("counter").alias("cm_estimate"))
    )
    return probes.select(
        "user_id",
        F.col("exact_n").cast("bigint").alias("exact_n"),
        F.col("cm_estimate").cast("bigint").alias("cm_estimate"),
        (F.col("cm_estimate") >= F.col("exact_n")).alias("never_underestimates"),
    )


# ---------------------------------------------------------------------------
# Beaconing detection (regular-interval series)
# ---------------------------------------------------------------------------

_BEACON_MIN_N = 5  # minimum deltas before a series can be judged
_BEACON_CV2_DEN = 25  # flag when var * DEN <= mean^2, i.e. cv <= 1/5


@register(
    "q_sec_beacon_detect",
    oracle=f"""
        WITH d AS (
            SELECT user_id, event_type,
                   CAST(floor(epoch(ts)) AS BIGINT)
                   - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
                         PARTITION BY user_id, event_type
                         ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id) AS delta
            FROM events
        ),
        s AS (
            SELECT user_id, event_type,
                   COUNT(delta) AS n,
                   CAST(SUM(delta) AS BIGINT) AS sd,
                   CAST(SUM(delta * delta) AS BIGINT) AS sd2
            FROM d WHERE delta IS NOT NULL
            GROUP BY user_id, event_type
            HAVING COUNT(delta) >= {_BEACON_MIN_N}
        ),
        j AS (
            SELECT user_id, event_type, n,
                   -- integer cross-multiplied cv^2 test:
                   -- var*DEN <= mean^2  <=>  (n*sd2 - sd*sd)*DEN <= sd*sd
                   ((n * sd2 - sd * sd) * {_BEACON_CV2_DEN} <= sd * sd) AS beacon
            FROM s
        )
        SELECT event_type,
               COUNT(*) AS n_series,
               CAST(SUM(CASE WHEN beacon THEN 1 ELSE 0 END) AS BIGINT) AS n_beacons,
               MIN(CASE WHEN beacon THEN user_id END) AS min_beacon_user
        FROM j
        GROUP BY event_type
    """,
    tags=("security", "beaconing", "timeseries"),
)
def q_sec_beacon_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beaconing detection — the security-analytics staple the
    reference's users (a security pipeline) run downstream: a series
    that fires at suspiciously REGULAR intervals (malware check-ins)
    has a low coefficient of variation over its inter-arrival deltas.
    Flag (user, event_type) series where cv <= 1/5.

    Every quantity is an exact integer: floor-second deltas, n·Σd² −
    (Σd)² variance, and the cv² threshold as one cross-multiplication —
    no float ever exists, so the oracle hash-matches bit-for-bit.

    Scale shape: one LAG window per series (state never crosses the
    (user, type) key), one aggregate per series, one rollup on the tiny
    event_type key — the same per-series window shape as
    q_timeseries_rate, linear at any corpus size."""
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events")
    sec = F.col("ts").cast("long")
    w = W.partitionBy("user_id", "event_type").orderBy("sec", "event_id")
    d = e.select("user_id", "event_type", "event_id", sec.alias("sec")).withColumn(
        "delta", F.col("sec") - F.lag("sec").over(w)
    )
    s = (
        d.where(F.col("delta").isNotNull())
        .groupBy("user_id", "event_type")
        .agg(
            F.count("delta").alias("n"),
            F.sum("delta").cast("bigint").alias("sd"),
            F.sum(F.col("delta") * F.col("delta")).cast("bigint").alias("sd2"),
        )
        .where(F.col("n") >= _BEACON_MIN_N)
    )
    j = s.withColumn(
        "beacon",
        (F.col("n") * F.col("sd2") - F.col("sd") * F.col("sd")) * _BEACON_CV2_DEN
        <= F.col("sd") * F.col("sd"),
    )
    return j.groupBy("event_type").agg(
        F.count("*").alias("n_series"),
        F.sum(F.when(F.col("beacon"), 1).otherwise(0)).cast("bigint").alias("n_beacons"),
        F.min(F.when(F.col("beacon"), F.col("user_id"))).alias("min_beacon_user"),
    )


# ---------------------------------------------------------------------------
# SCD2 history (validity intervals from a changelog)
# ---------------------------------------------------------------------------


@register(
    "q_scd2_history",
    oracle="""
        WITH ordered AS (
            SELECT user_id, event_type, ts, event_id,
                   lag(event_type) OVER w AS prev_type,
                   row_number() OVER w AS rn
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        changes AS (
            SELECT user_id, event_type, ts, event_id
            FROM ordered
            WHERE prev_type IS NULL OR prev_type <> event_type
        ),
        versioned AS (
            SELECT user_id, event_type,
                   date_trunc('second', ts) AS valid_from,
                   date_trunc('second', lead(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)) AS valid_to,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS version
            FROM changes
        )
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_versions,
               CAST(MAX(version) AS BIGINT) AS last_version,
               MAX(CASE WHEN valid_to IS NULL THEN event_type END) AS current_state,
               MIN(valid_from) AS first_from
        FROM versioned
        GROUP BY user_id
    """,
    tags=("warehouse", "scd2", "cdc"),
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 history build: collapse each
    user's event stream into state VERSIONS — a new version opens
    whenever the state (event_type) changes, closes when the next
    change arrives (NULL valid_to = current) — the standard
    changelog→warehouse-dimension transform.

    Scale shape: two windows over the same (user_id, (ts, event_id))
    sort — change detection via LAG, interval close via LEAD — Spark
    evaluates both in one WindowExec per partitioning, so the plan is
    ONE sort shuffle keyed by user_id plus the per-user rollup; history
    length never leaves its key's partition."""
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select("user_id", "event_type", "ts", "event_id").withColumn(
        "prev_type", F.lag("event_type").over(w)
    )
    changes = ordered.where(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    )
    wv = W.partitionBy("user_id").orderBy("ts", "event_id")
    versioned = changes.select(
        "user_id",
        "event_type",
        F.date_trunc("second", "ts").alias("valid_from"),
        F.date_trunc("second", F.lead("ts").over(wv)).alias("valid_to"),
        F.row_number().over(wv).alias("version"),
    )
    return versioned.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_versions"),
        F.max("version").cast("bigint").alias("last_version"),
        F.max(F.when(F.col("valid_to").isNull(), F.col("event_type"))).alias("current_state"),
        F.min("valid_from").alias("first_from"),
    )


# ---------------------------------------------------------------------------
# Event transition matrix (first-order Markov counts)
# ---------------------------------------------------------------------------


@register(
    "q_events_transitions",
    oracle="""
        WITH o AS (
            SELECT user_id, event_type,
                   lead(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS next_type
            FROM events
        )
        SELECT event_type AS from_type,
               next_type AS to_type,
               COUNT(*) AS n_transitions,
               COUNT(DISTINCT user_id) AS n_users
        FROM o
        WHERE next_type IS NOT NULL
        GROUP BY from_type, to_type
    """,
    tags=("analytics", "markov", "sequence"),
)
def q_events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition matrix over per-user event streams (the
    Markov counts behind next-action prediction and Sankey flow
    charts): for each consecutive pair in a user's time-ordered
    stream, count (from_type → to_type).

    Scale shape: one LEAD window per user (the q_scd2_history sort,
    reusable when both run in a pipeline) and a rollup onto the tiny
    type×type key space — map-side combine collapses everything
    before the shuffle."""
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    o = e.select("user_id", "event_type", "ts", "event_id").withColumn(
        "next_type", F.lead("event_type").over(w)
    )
    return (
        o.where(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type"))
        .agg(
            F.count("*").alias("n_transitions"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


# ---------------------------------------------------------------------------
# PageRank over the event-transition graph
# ---------------------------------------------------------------------------

_PR_ITERS = 3  # fixed-iteration contract (the GD-regression convention)


def _pr_oracle() -> str:
    """Unrolled fixed-iteration (``_PR_ITERS``) weighted PageRank in pure SQL —
    generated, not hand-copied, so Spark and DuckDB share one
    arithmetic spec: every rank is snapped to DECIMAL(38,12) per
    iteration, every sum of contributions is an exact decimal sum, and
    the damping expression is one fixed-association double chain."""
    s12 = lambda e: f"CAST(CAST(({e}) AS DECIMAL(38,12)) AS DOUBLE)"  # noqa: E731
    ds12 = lambda e: f"CAST(SUM(CAST(({e}) AS DECIMAL(38,12))) AS DOUBLE)"  # noqa: E731
    parts = [
        f"""
        WITH edges AS (
            SELECT event_type AS src, next_type AS dst, COUNT(*)::BIGINT AS w
            FROM (SELECT event_type,
                         lead(event_type) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id) AS next_type
                  FROM events)
            WHERE next_type IS NOT NULL
            GROUP BY src, dst
        ),
        outw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS ow FROM edges GROUP BY src),
        nodes AS (SELECT DISTINCT event_type AS node FROM events),
        nn AS (SELECT COUNT(*)::BIGINT AS n FROM nodes),
        r0 AS (SELECT node, {s12('1.0 / nn.n')} AS r FROM nodes, nn)"""
    ]
    for i in range(_PR_ITERS):
        parts.append(
            f""",
        d{i} AS (
            SELECT COALESCE({ds12(f'r{i}.r')}, 0.0) AS d
            FROM r{i} LEFT JOIN outw ON r{i}.node = outw.src
            WHERE outw.src IS NULL
        ),
        c{i} AS (
            SELECT e.dst AS node, {ds12(f'(r.r * e.w) / o.ow')} AS c
            FROM edges e
            JOIN r{i} r ON e.src = r.node
            JOIN outw o ON e.src = o.src
            GROUP BY e.dst
        ),
        r{i + 1} AS (
            SELECT nd.node,
                   {s12(f'(0.15 + 0.85 * d{i}.d) / nn.n + 0.85 * COALESCE(c{i}.c, 0.0)')} AS r
            FROM nodes nd LEFT JOIN c{i} ON nd.node = c{i}.node, d{i}, nn
        )"""
        )
    parts.append(
        f"""
        SELECT rf.node, rf.r AS pr,
               COALESCE(o.ow, 0) AS out_weight,
               COALESCE(ind.k, 0) AS n_in_edges
        FROM r{_PR_ITERS} rf
        LEFT JOIN outw o ON rf.node = o.src
        LEFT JOIN (SELECT dst, COUNT(*)::BIGINT AS k FROM edges GROUP BY dst) ind
               ON rf.node = ind.dst"""
    )
    return "".join(parts)


@register(
    "q_graph_pagerank",
    oracle=_pr_oracle(),
    tags=("graph", "iterative", "analytics"),
)
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the event-transition digraph (nodes =
    event types, edge weights = observed transition counts from
    :func:`q_events_transitions`), a fixed 3 (``_PR_ITERS``) power iterations
    with damping 0.85 and dangling-mass redistribution — the second
    iterative graph operator next to connected components
    (operators/graph.py), and the workload class (personalized
    ranking / authority weighting over a derived graph) a curation
    pipeline uses to weight interlinked domains.

    Determinism (the GD-regression bit-match discipline,
    queries/regression.py): ranks snap to DECIMAL(38,12) at every
    iteration boundary, in-edge contribution sums are exact decimal
    sums (order/partitioning-independent), and each damping update is
    one fixed-association double chain — the oracle is GENERATED from
    the same spec (:func:`_pr_oracle`), so Spark and DuckDB execute
    identical arithmetic and the result hash-matches bit-for-bit.

    Scale shape: per iteration, ONE equi-join of the edge relation
    against the rank vector (both shuffle on src — at web scale this
    is the canonical co-partitioned join; ranks and edges reuse the
    same partitioning every round) and one map-side-combinable
    aggregate onto dst; the dangling scalar and N broadcast. The
    fixture graph is tiny; the plan is the one that runs at 10^9
    edges, with localCheckpoint-per-round lineage control ready in
    the components operator this mirrors."""
    from pyspark.sql.window import Window as W

    s12 = lambda c: c.cast("decimal(38,12)").cast("double")  # noqa: E731
    ds12 = lambda c: F.sum(c.cast("decimal(38,12)")).cast("double")  # noqa: E731

    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select("user_id", "event_type", "ts", "event_id").withColumn(
        "next_type", F.lead("event_type").over(w)
    )
    edges = (
        seq.where(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("src"), F.col("next_type").alias("dst"))
        .agg(F.count("*").alias("w"))
        # materialize the (tiny, aggregate) edge relation ONCE — it
        # feeds every iteration's dangling/contrib joins, and without
        # the checkpoint Catalyst re-derives the corpus-sized window
        # scan ~2x per iteration (the graph.py lineage discipline)
        .localCheckpoint()
    )
    outw = edges.groupBy("src").agg(F.sum("w").cast("bigint").alias("ow"))
    # node set is bounded (distinct event types) but derives from a
    # corpus scan — checkpoint it once; it feeds the seed ranks AND
    # every iteration's left join
    nodes = e.select(F.col("event_type").alias("node")).distinct().localCheckpoint()
    nn = nodes.agg(F.count("*").cast("bigint").alias("n"))
    ranks = nodes.crossJoin(F.broadcast(nn)).select(
        "node", s12(F.lit(1.0) / F.col("n")).alias("r")
    )
    for _ in range(_PR_ITERS):
        d = (
            ranks.join(outw, ranks.node == outw.src, "left")
            .where(F.col("src").isNull())
            .agg(F.coalesce(ds12(F.col("r")), F.lit(0.0)).alias("d"))
        )
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .join(outw, "src")
            .groupBy("dst")
            .agg(ds12((F.col("r") * F.col("w")) / F.col("ow")).alias("c"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .crossJoin(F.broadcast(d))
            .crossJoin(F.broadcast(nn))
            .select(
                "node",
                s12(
                    (F.lit(0.15) + F.lit(0.85) * F.col("d")) / F.col("n")
                    + F.lit(0.85) * F.coalesce(F.col("c"), F.lit(0.0))
                ).alias("r"),
            )
            # rank vector is node-sized; without the per-round
            # checkpoint the lineage DOUBLES each iteration (ranks is
            # referenced by both the dangling agg and contrib), so the
            # final plan re-derives the seed subtree 2^iters times —
            # the graph.py components lineage discipline, values
            # bit-identical (the checkpoint stores the already-snapped
            # doubles)
            .localCheckpoint()
        )
    n_in = edges.groupBy("dst").agg(F.count("*").cast("bigint").alias("k"))
    return (
        ranks.join(outw, ranks.node == outw.src, "left")
        .join(n_in, ranks.node == n_in.dst, "left")
        .select(
            "node",
            F.col("r").alias("pr"),
            F.coalesce(F.col("ow"), F.lit(0).cast("bigint")).alias("out_weight"),
            F.coalesce(F.col("k"), F.lit(0).cast("bigint")).alias("n_in_edges"),
        )
    )


@register(
    "q_graph_triangles",
    oracle="""
        WITH pres AS (
            SELECT DISTINCT event_type, date_trunc('hour', ts) AS h, user_id
            FROM events
        ),
        edges AS (
            SELECT a.user_id AS u, b.user_id AS v
            FROM pres a JOIN pres b
              ON a.event_type = b.event_type AND a.h = b.h
             AND a.user_id < b.user_id
            GROUP BY 1, 2
            HAVING COUNT(*) >= 3
        ),
        tri AS (
            SELECT COUNT(*) AS n_triangles
            FROM edges e1
            JOIN edges e2 ON e2.u = e1.v
            JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
        ),
        deg AS (
            SELECT node, COUNT(*) AS d FROM (
                SELECT u AS node FROM edges UNION ALL SELECT v FROM edges
            ) GROUP BY node
        ),
        wedge AS (
            SELECT COUNT(*) AS n_nodes,
                   CAST(COALESCE(SUM(d) / 2, 0) AS BIGINT) AS n_edges,
                   CAST(COALESCE(SUM(d * (d - 1) / 2), 0) AS BIGINT) AS n_wedges
            FROM deg
        )
        SELECT n_nodes, n_edges, n_triangles, n_wedges,
               CASE WHEN n_wedges = 0 THEN 0.0
                    ELSE CAST(3 * n_triangles AS DOUBLE) / n_wedges END AS clustering
        FROM wedge, tri
    """,
    tags=("graph", "analytics"),
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting + global clustering coefficient over the
    REPEATED-co-presence graph (edge = two users active in the same
    (event_type, hour) block in >= 3 distinct blocks) — the third graph
    operator next to connected components and PageRank, and the classic
    abuse-/botnet-ring signal: coordinated accounts co-occur
    REPEATEDLY and close triangles; organic one-off co-presence (which
    made the naive graph ~350-degree dense and the count 100x more
    expensive, r10 probe) is exactly what the repetition threshold
    removes.

    Scale shape, two layers:

    - Pair generation is BLOCKED, never all-pairs: the co-presence
      join runs inside bounded (type, hour) blocks after a DISTINCT
      collapse, and the repetition threshold is ONE map-side-combinable
      count over the pair key.
    - Triangle enumeration uses DEGREE-ORDERED orientation (the
      compact-forward algorithm): every edge points from its
      lower-(degree, id) endpoint to the higher one, so wedge
      enumeration is Sum(outdeg^2) with outdeg <= O(sqrt E) — the
      O(E^1.5) bound that survives power-law degree skew, vs the
      unbounded Sum(indeg x outdeg) of naive id-ordering. Each
      triangle {x<y<z} (key order) is counted exactly once at its
      lowest-key apex: wedge (y,z) from x + closing edge y->z.

    All outputs are exact integers; the coefficient is one guarded
    IEEE division of identical operands. The oracle counts the same
    thresholded graph with the orientation-free 3-join (the count is
    orientation-invariant)."""
    e = load_table(spark, sf_dir, "events")
    # the block self-join's two aliases would each re-run the events
    # scan + DISTINCT; materialize the collapsed co-presence table once
    # (bounded by distinct (type, hour, user) — far smaller than events)
    pres = (
        e.select("event_type", F.date_trunc("hour", "ts").alias("h"), "user_id")
        .distinct()
        .localCheckpoint()
    )
    # Checkpointed RDD scans carry no size statistics, so every join
    # below planned SortMergeJoin (16 Exchanges, r13 plan audit) even
    # though the relations are tiny at fixture scale (99k pres rows /
    # 138k edges ≈ 3 MB). The counts are free post-checkpoint; under
    # the row bound (~150 MB built, far inside the guide §3.1 comfort
    # zone and the 8 GB hard cap) hint broadcast — the wedge stream
    # then never shuffles. Above the bound (real 100 TB graphs) the
    # hint is withheld and the SMJ + AQE skew-split path stands.
    _bc_rows = 2_000_000

    def _bc(df, n):
        return F.broadcast(df) if n <= _bc_rows else df

    n_pres = pres.count()
    a = pres.alias("a")
    edges = (
        a.join(
            _bc(pres.alias("b"), n_pres),
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.h") == F.col("b.h"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .groupBy(
            F.col("a.user_id").alias("u"), F.col("b.user_id").alias("v")
        )
        .agg(F.count("*").alias("n_blocks"))
        .where(F.col("n_blocks") >= 3)
        .select("u", "v")
        # the edge relation feeds the degree rollup + three enumeration
        # joins; checkpoint once so the blocked pair-join isn't re-run
        .localCheckpoint()
    )
    n_edges = edges.count()
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    # degree-ordered orientation: dk = (deg << 32) | id is one BIGINT
    # lexicographic key (ids are < 2^32 in every fixture; a production
    # run widens to a struct comparison)
    dk = (F.col("d").cast("bigint") * F.lit(4294967296) + F.col("node")).alias("dk")
    dnode = deg.select("node", dk)
    # |nodes| <= 2|edges|, so the edge-count gate bounds dnode too
    ue = edges.join(
        _bc(dnode.withColumnRenamed("node", "u").withColumnRenamed("dk", "udk"), n_edges), "u"
    )
    be = ue.join(
        _bc(dnode.withColumnRenamed("node", "v").withColumnRenamed("dk", "vdk"), n_edges), "v"
    )
    oe = be.select(
        F.when(F.col("udk") < F.col("vdk"), F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(F.col("udk") < F.col("vdk"), F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.greatest("udk", "vdk").alias("dst_dk"),
    ).localCheckpoint()
    e1 = oe.alias("e1")
    # broadcast-hash both enumeration joins: the Sum(outdeg²)-sized
    # wedge stream stays in its scan partitions end-to-end (zero wedge
    # bytes shuffled or sorted) and probes the built edge relation
    # twice — the §2.4/§3.1 shape for a small-relation/large-stream
    # triangle count
    tri = (
        e1.join(
            _bc(oe.alias("e2"), n_edges),
            (F.col("e2.src") == F.col("e1.src"))
            & (F.col("e1.dst_dk") < F.col("e2.dst_dk")),
        )
        .join(
            _bc(oe.alias("e3"), n_edges),
            (F.col("e3.src") == F.col("e1.dst")) & (F.col("e3.dst") == F.col("e2.dst")),
        )
        .agg(F.count("*").alias("n_triangles"))
    )
    wedge = deg.agg(
        F.count("*").alias("n_nodes"),
        F.coalesce((F.sum("d") / 2), F.lit(0)).cast("bigint").alias("n_edges"),
        F.coalesce(F.sum(F.col("d") * (F.col("d") - 1) / 2), F.lit(0))
        .cast("bigint")
        .alias("n_wedges"),
    )
    return wedge.crossJoin(F.broadcast(tri)).select(
        "n_nodes",
        "n_edges",
        "n_triangles",
        "n_wedges",
        F.when(F.col("n_wedges") == 0, F.lit(0.0))
        .otherwise(
            (F.lit(3) * F.col("n_triangles")).cast("double") / F.col("n_wedges")
        )
        .alias("clustering"),
    )


@register(
    "q_sec_first_seen",
    oracle="""
        WITH firsts AS (
            SELECT user_id, event_type, MIN(ts) AS first_ts
            FROM events GROUP BY user_id, event_type
        ),
        new_per_day AS (
            SELECT CAST(date_trunc('day', first_ts) AS TIMESTAMP) AS day,
                   COUNT(*) AS n_new_pairs,
                   COUNT(DISTINCT user_id) AS n_users_with_new
            FROM firsts GROUP BY 1
        ),
        per_day AS (
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   COUNT(*) AS n_events
            FROM events GROUP BY 1
        )
        SELECT p.day, p.n_events,
               COALESCE(n.n_new_pairs, 0) AS n_new_pairs,
               COALESCE(n.n_users_with_new, 0) AS n_users_with_new,
               CAST(COALESCE(n.n_new_pairs, 0) AS DOUBLE) / p.n_events
                   AS new_ratio
        FROM per_day p LEFT JOIN new_per_day n ON p.day = n.day
    """,
    tags=("security", "analytics"),
)
def q_sec_first_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-seen detection: the day each (user, event_type) pair is
    observed for the first time, rolled up to new-entity counts per
    day — the 'new process on host / new country for user' primitive
    of detection engineering (a spike in new_ratio is the alert).

    Scale shape: first-seen is computed as a MIN aggregation per
    (user, type) — map-side combinable, one shuffle on the pair key —
    NOT as a row_number()=1 window (which would sort every user
    partition; min is associative and needs no sort). The per-day
    rollups then reduce tiny keyspaces. In production the firsts
    relation is exactly the persisted-index shape of
    q_llm_incremental_dedup: yesterday's firsts anti-join today's
    batch, so the daily increment never rescans history."""
    e = load_table(spark, sf_dir, "events")
    # ONE corpus pass: both rollups fold from the (user, type, day)
    # pre-aggregate — min-of-min recovers each pair's exact first_ts
    # and sum-of-count recovers per-day volume, both associative, so
    # values are identical to the two-scan formulation the oracle
    # spells. The intermediate is bounded by pairs × days (the §8
    # small-rows table) and map-side combinable before its one shuffle.
    g = (
        e.groupBy("user_id", "event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").alias("n"), F.min("ts").alias("min_ts"))
        .localCheckpoint()
    )
    firsts = g.groupBy("user_id", "event_type").agg(F.min("min_ts").alias("first_ts"))
    new_per_day = firsts.groupBy(
        F.date_trunc("day", "first_ts").alias("day")
    ).agg(
        F.count("*").alias("n_new_pairs"),
        F.countDistinct("user_id").alias("n_users_with_new"),
    )
    per_day = g.groupBy("day").agg(F.sum("n").cast("bigint").alias("n_events"))
    zero = F.lit(0).cast("bigint")
    return per_day.join(new_per_day, "day", "left").select(
        "day",
        "n_events",
        F.coalesce("n_new_pairs", zero).alias("n_new_pairs"),
        F.coalesce("n_users_with_new", zero).alias("n_users_with_new"),
        (F.coalesce("n_new_pairs", zero).cast("double") / F.col("n_events")).alias(
            "new_ratio"
        ),
    )


# Impossible-travel detection (spatial class). Each event gets a
# deterministic synthetic geolocation derived from (user_id, event_id)
# — the geo-IP lookup stand-in, same derivation in both engines:
#   lat = (md5_56(user:event) % 160000) / 1000 - 80      ∈ [-80, 80)
#   lon = (md5_56(event:user) % 360000) / 1000 - 180     ∈ [-180, 180)
# Consecutive same-user events more than _IT_SPEED km/h apart flag.
_IT_SPEED = 900.0  # commercial-flight ceiling, the classic cutoff


def _geo_exprs(engine: str) -> tuple[str, str]:
    """(lat, lon) SQL text — shared derivation, per-engine hash56."""
    if engine == "spark":
        h1 = "CAST(CONV(SUBSTRING(md5(CONCAT(CAST(user_id AS STRING), ':', CAST(event_id AS STRING))), 1, 14), 16, 10) AS BIGINT)"
        h2 = "CAST(CONV(SUBSTRING(md5(CONCAT(CAST(event_id AS STRING), ':', CAST(user_id AS STRING))), 1, 14), 16, 10) AS BIGINT)"
    else:
        h1 = "CAST(('0x' || SUBSTRING(md5(user_id::VARCHAR || ':' || event_id::VARCHAR), 1, 14))::UBIGINT AS BIGINT)"
        h2 = "CAST(('0x' || SUBSTRING(md5(event_id::VARCHAR || ':' || user_id::VARCHAR), 1, 14))::UBIGINT AS BIGINT)"
    lat = f"(({h1}) % 160000) / 1000.0 - 80.0"
    lon = f"(({h2}) % 360000) / 1000.0 - 180.0"
    return lat, lon


def _impossible_travel_sql(lat: str, lon: str) -> str:
    """Engine-shared query body over a geolocated events projection.

    Haversine in per-row-snapped stages (the transcendental rule,
    queries/_util.py #3): the hav() argument is snapped to 9 decimals
    so a 1-ulp sin/cos libm difference cannot flip asin, then the
    km distance snaps to 3 decimals before the speed division."""
    return f"""
        WITH geo AS (
            SELECT user_id, event_id, ts,
                   CAST(CAST({lat} AS DECIMAL(12, 6)) AS DOUBLE) AS lat,
                   CAST(CAST({lon} AS DECIMAL(12, 6)) AS DOUBLE) AS lon
            FROM events
        ),
        hops AS (
            SELECT user_id, event_id, ts, lat, lon,
                   LAG(lat) OVER w AS plat,
                   LAG(lon) OVER w AS plon,
                   LAG(ts) OVER w AS pts
            FROM geo
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        hav AS (
            SELECT user_id, event_id, ts, pts,
                   CAST(CAST(
                       POW(SIN(RADIANS(lat - plat) / 2), 2)
                       + COS(RADIANS(plat)) * COS(RADIANS(lat))
                         * POW(SIN(RADIANS(lon - plon) / 2), 2)
                   AS DECIMAL(20, 9)) AS DOUBLE) AS a
            FROM hops WHERE plat IS NOT NULL
        ),
        dist AS (
            SELECT user_id, event_id,
                   CAST(CAST(12742.0 * ASIN(SQRT(a)) AS DECIMAL(20, 3)) AS DOUBLE)
                       AS km,
                   CAST(UNIX_SECONDS_DIFF AS DOUBLE) AS dt_s
            FROM hav
        )
        SELECT user_id,
               COUNT(*) AS n_hops,
               CAST(SUM(CASE WHEN dt_s > 0
                             AND km / (dt_s / 3600.0) > {_IT_SPEED}
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_impossible,
               CAST(ROUND(SUM(CAST(km AS DECIMAL(38, 6))), 2) AS DOUBLE)
                   AS total_km
        FROM dist
        GROUP BY user_id
    """


@register(
    "q_sec_impossible_travel",
    oracle=_impossible_travel_sql(*_geo_exprs("duck")).replace(
        "UNIX_SECONDS_DIFF", "epoch(ts) - epoch(pts)"
    ),
    tags=("security", "spatial", "detection"),
)
def q_sec_impossible_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Impossible-travel detection — the spatial member of the
    detection family: consecutive same-user events whose haversine
    distance / time delta exceeds the commercial-flight ceiling
    (900 km/h) flag as credential-sharing / VPN-hop candidates; output
    is per-user hop counts, impossible-hop counts, and exact total
    distance. Geolocations are the deterministic geo-IP stand-in
    (md5-derived lat/lon per event — the fixture has no geo columns;
    a production deployment swaps ONE projection for the real lookup).

    Determinism: the derivation, the haversine, and the speed test are
    ONE shared SQL body on both engines (engine-specific only in the
    md5→int cast); transcendental stages snap per-row (9 then 3
    decimals) before any aggregate, per the module convention.

    Scale shape: one window (shuffle on user_id + in-partition sort —
    the q_scd2_history shape) feeding map-only trigonometry in
    whole-stage codegen and a per-user rollup; no join at all."""
    e = load_table(spark, sf_dir, "events")
    e.createOrReplaceTempView("events")
    sql = _impossible_travel_sql(*_geo_exprs("spark")).replace(
        "UNIX_SECONDS_DIFF", "unix_timestamp(ts) - unix_timestamp(pts)"
    )
    return spark.sql(sql)

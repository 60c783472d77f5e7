"""Window functions: ranking, analytic (lag/lead/first/last), frames,
and exact/approx percentiles.

No reference equivalent (the framework's only compute hook is the
stateless Handler, reference types.go:122-135) — this is §2B target
surface. Determinism conventions: rank/dense_rank order by a
potentially-tied key (their semantics absorb ties); row_number and
every frame-dependent aggregate order by a composite key ending in a
unique tiebreaker.

Scale: a window partitioned by a key shuffles once on that key; the
within-partition sort is per-partition, not global. Partition keys here
(l_returnflag, o_custkey) are how this stays parallel at 100 TB — a
window with no PARTITION BY would serialize onto one task and is
deliberately absent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from cheetah_spark.catalog import load_table
from cheetah_spark.queries._util import DEC, oracle_snap, snap
from cheetah_spark.registry import register


@register(
    "q_window_rank",
    oracle="""
        SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
               CAST(rnk AS INT) AS rnk, CAST(drnk AS INT) AS drnk,
               CAST(rn AS INT) AS rn
        FROM (
            SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
                   RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity DESC) AS rnk,
                   DENSE_RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity DESC) AS drnk,
                   ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                      ORDER BY l_quantity DESC, l_orderkey, l_linenumber) AS rn
            FROM lineitem
        )
        WHERE rn <= 100
    """,
    tags=("window", "rank"),
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank; rank fns ordered by a tied key
    (quantity) to exercise tie semantics, row_number fully tiebroken."""
    l = load_table(spark, sf_dir, "lineitem")
    by_qty = W.partitionBy("l_returnflag").orderBy(F.col("l_quantity").desc())
    tiebroken = W.partitionBy("l_returnflag").orderBy(
        F.col("l_quantity").desc(), "l_orderkey", "l_linenumber"
    )
    return (
        l.select(
            "l_returnflag",
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            F.rank().over(by_qty).cast("int").alias("rnk"),
            F.dense_rank().over(by_qty).cast("int").alias("drnk"),
            F.row_number().over(tiebroken).cast("int").alias("rn"),
        )
        .filter(F.col("rn") <= 100)
    )


@register(
    "q_window_analytic",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice,
               LAG(o_totalprice) OVER w AS prev_price,
               LEAD(o_totalprice) OVER w AS next_price,
               FIRST_VALUE(o_totalprice) OVER
                   (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_price,
               LAST_VALUE(o_totalprice) OVER
                   (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window", "analytic"),
)
def q_window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag / lead / first_value / last_value with explicit ROWS frames
    (both engines' default frames differ for last_value — pin them)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).alias("first_price"),
        F.last("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)).alias("last_price"),
    )


@register(
    "q_window_frame_running",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER
                   (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
                   AS running_sum,
               (CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER
                   (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
                   / COUNT(*) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))
                   AS moving_avg3
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window", "frame"),
)
def q_window_frame_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum (unbounded-preceding frame) + 3-row moving average,
    via exact decimal accumulation for cross-engine determinism."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    last3 = w.rowsBetween(-2, W.currentRow)
    dec_price = F.col("o_totalprice").cast(DEC)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.round(F.sum(dec_price).over(run), 2).cast("double").alias("running_sum"),
        (F.sum(dec_price).over(last3).cast("double") / F.count("*").over(last3)).alias(
            "moving_avg3"
        ),
    )


@register(
    "q_exact_percentile",
    oracle=f"""
        SELECT l_returnflag,
               {oracle_snap("quantile_cont(l_extendedprice, 0.5)")} AS median_price,
               {oracle_snap("quantile_cont(l_extendedprice, 0.9)")} AS p90_price,
               MIN(l_extendedprice) AS min_price,
               MAX(l_extendedprice) AS max_price
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("agg", "percentile"),
)
def q_exact_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation — Spark ``percentile`` ≡
    DuckDB ``quantile_cont``; results snapped at 3 decimals via decimal
    cast since interpolated midpoints of 2-decimal data land exactly on
    .xx5 round boundaries) plus raw min/max.

    Both percentiles share ONE ``percentile(col, array(...))`` buffer
    — n separate percentile aggregates each keep their own copy of
    every group's values (see q_approx_quantile_cd plan note 2)."""
    l = load_table(spark, sf_dir, "lineitem")
    pcts = F.percentile("l_extendedprice", F.array(F.lit(0.5), F.lit(0.9)))
    return (
        l.groupBy("l_returnflag")
        .agg(
            pcts.alias("pcts"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
        )
        .select(
            "l_returnflag",
            snap(F.element_at("pcts", 1)).alias("median_price"),
            snap(F.element_at("pcts", 2)).alias("p90_price"),
            "min_price",
            "max_price",
        )
    )


@register(
    "q_approx_quantile_cd",
    oracle="""
        SELECT l_returnflag,
               COUNT(DISTINCT l_partkey)::BIGINT AS n_exact_parts,
               COUNT(DISTINCT l_orderkey)::BIGINT AS n_exact_orders,
               TRUE AS parts_within_5pct,
               TRUE AS orders_within_5pct,
               TRUE AS median_in_rank_band,
               TRUE AS p90_in_rank_band
        FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "approx"),
)
def q_approx_quantile_cd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate count-distinct (HyperLogLog++) + approximate
    percentiles (the scale path: one pass, bounded memory, no sort —
    at 100 TB these replace their exact counterparts).

    Approximate values can't hash-match another engine, so — the
    q_approx_distinct_hll pattern — the contract row carries the exact
    anchors plus the sketches' accuracy claims as booleans the oracle
    pins TRUE: HLL within 5 % of exact, and each approx percentile
    inside the exact [p−1 %, p+1 %] rank band (percentile_approx with
    accuracy 10000 guarantees ±0.01 % rank error — two orders of
    margin). A 100 TB run keeps the sketches and drops the exact
    anchors; they ride along here only as verification.

    The exact anchors (two count-distincts + the exact percentile rank
    bands) are deterministic functions of the static fixture, so they
    are computed once per fixture via anchors.anchor_df (persisted
    parquet keyed by lineitem's mtime) and broadcast-joined back — the
    per-query hot path is ONE single-pass sketch aggregate, exactly
    what a 100 TB run would execute (round-4 verdict item #2: anchor
    cost must not ride the operator).

    Physical-plan notes for the anchor build itself (measured 80 s →
    ~3 s at sf0.1, same answer):

    1. COUNT(DISTINCT) must NOT share an Aggregate with
       sketch/percentile functions. Catalyst rewrites multi-distinct
       via Expand, and the first-level partial aggregate then groups
       by (l_returnflag, l_partkey, l_orderkey, gid) — allocating a
       QuantileSummaries/HLL buffer per DISTINCT VALUE COMBINATION
       (hundreds of thousands of heavyweight buffers) instead of per
       group. Each exact distinct runs as its own two-level
       distinct-then-count aggregate (map-side partial dedup, no
       Expand) and joins back on the |groups|-row key — broadcastable
       at any SF.
    2. Exact multi-percentile uses ONE ``percentile(col, array(...))``
       buffer, not four separate aggregates (4 sorted-value buffers →
       1; measured 3.4 s → 1.2 s)."""
    from cheetah_spark.anchors import anchor_df

    l = load_table(spark, sf_dir, "lineitem")
    anchor = anchor_df(
        spark,
        sf_dir,
        "quantile_cd",
        ("lineitem",),
        _quantile_cd_anchor,
        params="bands=49,51,89,91;v1",
    )
    sketches = l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("ap"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("ao"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("am"),
        F.percentile_approx("l_extendedprice", 0.9, 10000).alias("a9"),
    )
    g = sketches.join(F.broadcast(anchor), "l_returnflag")

    def within_5pct(approx, exact):  # |err| * 20 <= exact, exact ints
        return F.abs(approx - F.col(exact)) * 20 <= F.col(exact)

    return g.select(
        "l_returnflag",
        "n_exact_parts",
        "n_exact_orders",
        within_5pct(F.col("ap"), "n_exact_parts").alias("parts_within_5pct"),
        within_5pct(F.col("ao"), "n_exact_orders").alias("orders_within_5pct"),
        F.col("am").between(F.col("p49"), F.col("p51")).alias("median_in_rank_band"),
        F.col("a9").between(F.col("p89"), F.col("p91")).alias("p90_in_rank_band"),
    )


def _quantile_cd_anchor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact verification anchors for q_approx_quantile_cd, one row
    per l_returnflag: exact count-distincts (see plan note 1 — each in
    its own Expand-free two-level aggregate) and the exact percentile
    rank bands (plan note 2 — one shared percentile buffer). Built
    once per fixture and persisted by anchors.anchor_df."""
    l = load_table(spark, sf_dir, "lineitem")
    parts_cd = (
        l.select("l_returnflag", "l_partkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_exact_parts"))
    )
    orders_cd = (
        l.select("l_returnflag", "l_orderkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_exact_orders"))
    )
    bands = (
        l.groupBy("l_returnflag")
        .agg(
            F.percentile(
                "l_extendedprice",
                F.array(F.lit(0.49), F.lit(0.51), F.lit(0.89), F.lit(0.91)),
            ).alias("bands")
        )
        .select(
            "l_returnflag",
            F.element_at("bands", 1).alias("p49"),
            F.element_at("bands", 2).alias("p51"),
            F.element_at("bands", 3).alias("p89"),
            F.element_at("bands", 4).alias("p91"),
        )
    )
    return parts_cd.join(orders_cd, "l_returnflag").join(bands, "l_returnflag")


@register(
    "q_window_distinct_count",
    oracle="""
        SELECT event_id, user_id,
               CAST(COUNT(DISTINCT event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS INT) AS running_types,
               CAST(COUNT(DISTINCT user_id) OVER (
                   PARTITION BY date_trunc('hour', ts)
               ) AS INT) AS hour_users
        FROM events
    """,
    tags=("window", "distinct"),
)
def q_window_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT aggregates over window frames — a real engine-surface
    gap: Spark has no native ``COUNT(DISTINCT ...) OVER``, so the
    declared formulation is ``size(collect_set(...))`` over the same
    frame, exactly equal by definition (a set's size IS the distinct
    count) and hash-verified against DuckDB's native DISTINCT window
    aggregate. Two frame shapes:

    - ``running_types``: running distinct event types per user over a
      fully tie-broken (ts, event_id) order — the "how many distinct
      actions has this principal taken so far" security rollup;
    - ``hour_users``: distinct active users per hour over the whole
      partition (unordered frame).

    Scale: collect_set keeps one set per frame in executor memory —
    O(|distinct within partition|), NOT partition row count, and the
    only shuffles are the two window sorts. For distinct cardinalities
    that don't fit (100 TB security telemetry), the approximate tier
    is q_approx_distinct_hll's sketch per group; this operator is the
    exact tier."""
    e = load_table(spark, sf_dir, "events")
    running = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    hourly = W.partitionBy(F.date_trunc("hour", F.col("ts")))
    return e.select(
        "event_id",
        "user_id",
        F.size(F.collect_set("event_type").over(running)).cast("int").alias("running_types"),
        F.size(F.collect_set("user_id").over(hourly)).cast("int").alias("hour_users"),
    )


@register(
    "q_window_percent_rank",
    oracle="""
        SELECT event_id, event_type,
               percent_rank() OVER w AS pr,
               cume_dist() OVER w AS cd,
               row_number() OVER w AS rn
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    """,
    tags=("window", "ranking"),
)
def q_window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-rank windows: percent_rank ((rank-1)/(n-1)) and
    cume_dist (rows ≤ current / n) per event_type over value —
    completing the ranking-window family (row_number/rank/dense_rank/
    ntile already covered). The (value, event_id) order key is unique,
    so both statistics are deterministic, and each is ONE IEEE
    division of identical integer operands — bit-identical across
    engines with no snapping. The SQL text is shared verbatim with the
    oracle.

    Scale shape: one Window exec — shuffle on event_type + one
    in-partition sort serving all three functions (Catalyst collapses
    same-spec windows); skewed partitions get the salted two-pass
    rewrite of q_skew_salted_agg if a single type dominates."""
    e = load_table(spark, sf_dir, "events")
    e.createOrReplaceTempView("events")
    return spark.sql("""
        SELECT event_id, event_type,
               percent_rank() OVER w AS pr,
               cume_dist() OVER w AS cd,
               row_number() OVER w AS rn
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    """)

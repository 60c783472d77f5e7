"""Advanced relational operators: as-of join, pivot/unpivot, exact
distributed moments (stddev/covar/corr), and the composite
training-data dedup pipeline.

The reference has none of these (SURVEY.md §2A: no joins, no
aggregates); they are north-star surface. Every query here is
oracle-checked; float determinism comes from the exact-decimal-sum
convention (queries/_util.py): all statistics are derived from exact
decimal sums with IDENTICAL double arithmetic in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cheetah_spark.catalog import load_table
from cheetah_spark.operators.asof import asof_join
from cheetah_spark.queries._util import DEC
from cheetah_spark.registry import register

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "q_asof_join",
    oracle="""
        WITH c AS (
            SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
        ),
        p AS (
            SELECT user_id, ts, MAX(event_id) AS purchase_id, MAX(value) AS purchase_value
            FROM events WHERE event_type = 'purchase'
            GROUP BY user_id, ts
        )
        SELECT c.user_id, c.event_id, c.ts,
               p.purchase_id, p.purchase_value, p.ts AS purchase_ts
        FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
    tags=("advanced", "join", "timeseries"),
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click matched to the user's most recent
    purchase at-or-before the click. Spark lacks ASOF JOIN; the
    operator (operators/asof.py) is union + LOCF window — one key
    shuffle, no range explosion. DuckDB's native ASOF JOIN is the
    oracle. Right side pre-aggregated to one row per (user, ts) so the
    carried value is well-defined."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("purchase_id"), F.max("value").alias("purchase_value"))
    )
    return asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["purchase_id", "purchase_value"],
        ts_out="purchase_ts",
    )


_PIVOT_ORACLE_COLS = ",\n               ".join(
    f"COUNT(CASE WHEN event_type = '{t}' THEN 1 END)::BIGINT AS {t}" for t in EVENT_TYPES
)


@register(
    "q_pivot_events",
    oracle=f"""
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               {_PIVOT_ORACLE_COLS}
        FROM events
        GROUP BY 1
    """,
    tags=("advanced", "pivot"),
)
def q_pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long → wide): per-day event counts, one column per event
    type. Explicit pivot value list (no discovery pass — on a 100 TB
    table the implicit variant runs an extra distinct scan); empty
    cells coalesced to 0 to match COUNT semantics."""
    ev = load_table(spark, sf_dir, "events")
    p = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .pivot("event_type", list(EVENT_TYPES))
        .count()
    )
    return p.select(
        "day", *[F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(t) for t in EVENT_TYPES]
    )


@register(
    "q_unpivot_events",
    oracle="""
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               event_type,
               COUNT(*)::BIGINT AS n
        FROM events
        GROUP BY 1, 2
    """,
    tags=("advanced", "pivot"),
)
def q_unpivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide → long): melt the pivoted per-day matrix back to
    (day, event_type, n) rows — round-trips to the plain group-by the
    oracle computes (zero cells dropped, matching COUNT group-by)."""
    wide = q_pivot_events(spark, sf_dir)
    long = wide.unpivot("day", list(EVENT_TYPES), "event_type", "n")
    return long.where(F.col("n") > 0)


# Two-pass centered moments. The one-pass formula (sxy − sx·sy/n)
# cancels ~1e14-magnitude sums down to ~1e6, so a single-ulp
# decimal→double conversion difference between engines (DuckDB converts
# int128-scaled decimals via a double divide; Spark's BigDecimal
# conversion is correctly rounded) blows up 8 orders of magnitude —
# caught by the round-1 driver hash. Centering first removes the
# cancellation: per-row centered products are single IEEE ops on
# identical operands (bit-identical), snapped to 6 decimals per row
# BEFORE the exact decimal sum (_util convention #3), so every
# remaining cross-engine ulp stays *relative* and the 6-decimal output
# snap absorbs it.
_VAR_X = "sxx / (n - 1)"
_VAR_Y = "syy / (n - 1)"
_COV = "sxy / (n - 1)"


def _snap6(expr: str) -> str:
    return f"CAST(CAST(({expr}) AS DECIMAL(38,6)) AS DOUBLE)"


_MOM_EXPRS = [
    f"{_snap6(_VAR_X)} AS var_value",
    f"{_snap6(f'SQRT({_VAR_X})')} AS std_value",
    f"{_snap6(_COV)} AS cov_value_time",
    f"{_snap6(f'({_COV}) / (SQRT({_VAR_X}) * SQRT({_VAR_Y}))')} AS corr_value_time",
]
_MOM = ",\n               ".join(_MOM_EXPRS)


@register(
    "q_stats_moments",
    oracle=f"""
        WITH m AS (
            SELECT event_type,
                   COUNT(*)::BIGINT AS n,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mx,
                   CAST(SUM(CAST(epoch(date_trunc('second', ts)) AS DECIMAL(19,0))) AS DOUBLE)
                       / COUNT(*) AS my
            FROM events GROUP BY event_type
        ), c AS (
            SELECT e.event_type, m.n, m.mx,
                   CAST(SUM(CAST((e.value - m.mx) * (e.value - m.mx)
                                 AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
                   CAST(SUM(CAST((epoch(date_trunc('second', e.ts))::DOUBLE - m.my)
                               * (epoch(date_trunc('second', e.ts))::DOUBLE - m.my)
                                 AS DECIMAL(38,6))) AS DOUBLE) AS syy,
                   CAST(SUM(CAST((e.value - m.mx)
                               * (epoch(date_trunc('second', e.ts))::DOUBLE - m.my)
                                 AS DECIMAL(38,6))) AS DOUBLE) AS sxy
            FROM events e JOIN m ON e.event_type = m.event_type
            GROUP BY e.event_type, m.n, m.mx
        )
        SELECT event_type, n, {_snap6("mx")} AS mean_value, {_MOM}
        FROM c
    """,
    tags=("advanced", "stats"),
)
def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed exact moments: variance, stddev, covariance and
    correlation of (value, event-time) per event type, via the two-pass
    centered-sum plan — order-independent on any partitioning (the
    built-in stddev/corr are float-accumulation-order-dependent and
    can't be oracle-checked or reproduced across cluster layouts).

    Scale shape: two scans of events with a broadcast join of the tiny
    per-type means between them — no giant-magnitude partial sums, no
    catastrophic cancellation, partial aggregation map-side both
    passes."""
    ev = load_table(spark, sf_dir, "events")
    ep = F.unix_timestamp("ts").cast("double")
    m = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        (F.sum(F.col("value").cast("decimal(18,6)")).cast("double") / F.count("*")).alias("mx"),
        (F.sum(F.unix_timestamp("ts").cast("decimal(19,0)")).cast("double") / F.count("*")).alias("my"),
    )
    dx = F.col("value") - F.col("mx")
    dy = ep - F.col("my")
    c = (
        ev.join(F.broadcast(m), "event_type")
        .groupBy("event_type", "n", "mx")
        .agg(
            F.sum((dx * dx).cast("decimal(38,6)")).cast("double").alias("sxx"),
            F.sum((dy * dy).cast("decimal(38,6)")).cast("double").alias("syy"),
            F.sum((dx * dy).cast("decimal(38,6)")).cast("double").alias("sxy"),
        )
    )
    return c.selectExpr(
        "event_type",
        "n",
        f"{_snap6('mx')} AS mean_value",
        *_MOM_EXPRS,
    )


_SQL_FLAGSHIP = """
    SELECT n.n_name AS nation,
           CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))), 2)
               AS DOUBLE) AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
"""


@register(
    "q_sql_interface",
    oracle=_SQL_FLAGSHIP,
    tags=("advanced", "sql"),
)
def q_sql_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL entry point: the engine's tables registered as views and
    queried through ``spark.sql`` with the *identical* SQL text DuckDB
    runs as the oracle — proof the operator surface is reachable from
    both the DataFrame API and plain ANSI SQL (the reference has no
    query language at all; this is pure north-star surface). Catalyst
    plans it like any DataFrame query: pushdown, broadcast dims, AQE."""
    from cheetah_spark.catalog import register_views

    register_views(spark, sf_dir, ("lineitem", "orders", "customer", "nation", "region"))
    return spark.sql(_SQL_FLAGSHIP)


@register(
    "q_skew_salted_agg",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users,
               MIN(event_id) AS min_event_id,
               MAX(event_id) AS max_event_id
        FROM events
        GROUP BY event_type
    """,
    tags=("skew", "aggregation"),
)
def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation on a deliberately hot key space:
    ``event_type`` has only a handful of values, so at 100 TB a plain
    exact-distinct groupBy lands entire key populations on single
    reducers (AQE splits oversized PARTITIONS, not keys — it cannot
    help a single hot key inside one group). The salted plan
    (functions/skew.py::salted_agg) pre-aggregates on
    (event_type, hash-salt) — 16 balanced reducers per key — then
    combines partials on event_type alone. COUNT(DISTINCT user_id) is
    the aggregate that NEEDS this: its dedup state can't map-side
    combine away, so the partial phase dedups (key, salt, user) and
    the final phase merges per-salt distinct sets via sum-of-disjoint
    counts — exactness preserved because the salt is derived from
    user_id itself (equal users always share a salt).

    The oracle is the PLAIN group-by: hash equality proves the salted
    two-phase plan is semantically invisible."""
    from cheetah_spark.functions.skew import salted_agg

    e = load_table(spark, sf_dir, "events")
    return salted_agg(
        e,
        keys=["event_type"],
        partial_aggs=[
            F.count("*").alias("pn"),
            F.countDistinct("user_id").alias("pu"),
            F.min("event_id").alias("pmin"),
            F.max("event_id").alias("pmax"),
        ],
        final_aggs=[
            F.sum("pn").alias("n_events"),
            # salts partition users disjointly (salt = h(user_id) % B),
            # so per-salt distinct counts add up exactly
            F.sum("pu").alias("n_users"),
            F.min("pmin").alias("min_event_id"),
            F.max("pmax").alias("max_event_id"),
        ],
        salt_on="user_id",
    )


_SQL_RECURSIVE = """
    WITH RECURSIVE chain(custkey, anc, steps) AS (
        SELECT CAST(c_custkey AS BIGINT) AS custkey,
               CAST(c_custkey AS BIGINT) AS anc, 0 AS steps
        FROM customer
        UNION ALL
        -- floor() before the cast: '/' is float division on ints in
        -- both engines, but a bare float->int CAST truncates in Spark
        -- and ROUNDS in DuckDB — floor() pins identical semantics
        SELECT custkey, CAST(floor(anc / 2) AS BIGINT) AS anc, steps + 1 AS steps
        FROM chain WHERE anc > 1
    )
    SELECT steps AS depth,
           COUNT(*) AS n_nodes,
           CAST(SUM(anc) AS BIGINT) AS sum_anc,
           CAST(MIN(custkey) AS BIGINT) AS min_custkey,
           CAST(MAX(custkey) AS BIGINT) AS max_custkey
    FROM chain
    GROUP BY steps
"""


@register(
    "q_sql_recursive_cte",
    oracle=_SQL_RECURSIVE,
    tags=("advanced", "sql", "recursive"),
)
def q_sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE surface (``WITH RECURSIVE``, new in Spark 4.x):
    hierarchy traversal as plain ANSI SQL, the IDENTICAL text running
    on both engines (the q_sql_interface discipline). The hierarchy is
    the implicit binary-heap parent chain ``anc -> anc / 2`` over
    customer keys — deterministic, needs no edge fixture, and its
    depth is log2(max key), so the recursion terminates in ~11 rounds
    at sf0.01 and ~40 rounds at ANY int64 scale.

    Scale shape: Spark executes each recursion step as a distributed
    transform over the previous step's frame (UnionLoop); per-step
    work is one map + filter over rows still walking, total volume
    O(n log n) rows with NO self-join — the classic transitive-closure
    blowup can't occur on a functional parent edge. The final rollup
    is one hash aggregate on the tiny depth key. Integer division is
    exact in both engines (Spark int division on ints truncates like
    DuckDB's / on INTEGER — both tested by the hash gate)."""
    from cheetah_spark.catalog import register_views

    register_views(spark, sf_dir, ("customer",))
    return spark.sql(_SQL_RECURSIVE)


_SQL_LATERAL = """
    SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 2
    ) t
"""


@register(
    "q_sql_lateral_topn",
    oracle=_SQL_LATERAL,
    tags=("advanced", "sql", "lateral"),
)
def q_sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery surface: top-2 orders per customer
    expressed as the ANSI lateral join, the IDENTICAL text running on
    both engines (the q_sql_interface discipline; tie-broken ORDER BY
    so the top-2 set is unique).

    Scale shape — the reason this registration exists: Catalyst
    DECORRELATES the lateral into a per-key top-k, planned as
    WindowGroupLimit with a map-side partial pass BEFORE the exchange
    (each task keeps its local top-2 per custkey, so the shuffle
    carries ≤ 2·|keys per task| rows, not the orders table) and a
    broadcast hash join back to customers — the plan a performance
    engineer would hand-write, derived from the naive correlated SQL.
    A naive per-row re-execution of the subquery (what LATERAL means
    operationally) would be O(|customers|) table scans; the plan pin
    asserts the decorrelated shape survives."""
    from cheetah_spark.catalog import register_views

    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_SQL_LATERAL)


@register(
    "q_stats_linreg",
    oracle=f"""
        WITH m AS (
            SELECT event_type,
                   COUNT(*)::BIGINT AS n,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS my,
                   CAST(SUM(CAST(epoch(date_trunc('second', ts)) AS DECIMAL(19,0))) AS DOUBLE)
                       / COUNT(*) AS mx
            FROM events GROUP BY event_type
        ), c AS (
            SELECT e.event_type, m.n, m.mx, m.my,
                   CAST(SUM(CAST((epoch(date_trunc('second', e.ts))::DOUBLE - m.mx)
                               * (epoch(date_trunc('second', e.ts))::DOUBLE - m.mx)
                                 AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
                   CAST(SUM(CAST((e.value - m.my) * (e.value - m.my)
                                 AS DECIMAL(38,6))) AS DOUBLE) AS syy,
                   CAST(SUM(CAST((epoch(date_trunc('second', e.ts))::DOUBLE - m.mx)
                               * (e.value - m.my)
                                 AS DECIMAL(38,6))) AS DOUBLE) AS sxy
            FROM events e JOIN m ON e.event_type = m.event_type
            GROUP BY e.event_type, m.n, m.mx, m.my
        )
        SELECT event_type, n,
               {_snap6("sxy / sxx")} AS slope_per_sec,
               {_snap6("my - (sxy / sxx) * mx")} AS intercept,
               {_snap6("(sxy * sxy) / (sxx * syy)")} AS r2
        FROM c
    """,
    tags=("advanced", "stats", "regression"),
)
def q_stats_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distributed OLS: slope / intercept / R² of value against
    event time per event type — the trend-fitting primitive behind
    drift detection and forecasting baselines, computed with the
    q_stats_moments two-pass centered-sum discipline (the built-in
    regr_slope/regr_r2 are float-accumulation-order-dependent and
    can't be hash-gated or reproduced across cluster layouts).

    Pass 1: per-type means (exact decimal sums / count). Pass 2:
    broadcast the tiny means relation back and accumulate centered
    cross-products as exact decimals. slope/intercept/R² are then
    fixed chains of IEEE ops on identical operands, snapped at 6.
    Scale shape: two scans, both map-side combinable, one broadcast
    join, no window, no skew exposure beyond the group key."""
    ev = load_table(spark, sf_dir, "events")
    ep = F.unix_timestamp("ts").cast("double")
    m = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        (F.sum(F.col("value").cast("decimal(18,6)")).cast("double") / F.count("*")).alias("my"),
        (F.sum(F.unix_timestamp("ts").cast("decimal(19,0)")).cast("double") / F.count("*")).alias("mx"),
    )
    dx = ep - F.col("mx")
    dy = F.col("value") - F.col("my")
    c = (
        ev.join(F.broadcast(m), "event_type")
        .groupBy("event_type", "n", "mx", "my")
        .agg(
            F.sum((dx * dx).cast("decimal(38,6)")).cast("double").alias("sxx"),
            F.sum((dy * dy).cast("decimal(38,6)")).cast("double").alias("syy"),
            F.sum((dx * dy).cast("decimal(38,6)")).cast("double").alias("sxy"),
        )
    )
    return c.selectExpr(
        "event_type",
        "n",
        f"{_snap6('sxy / sxx')} AS slope_per_sec",
        f"{_snap6('my - (sxy / sxx) * mx')} AS intercept",
        f"{_snap6('(sxy * sxy) / (sxx * syy)')} AS r2",
    )


@register(
    "q_sec_anomaly_mad",
    oracle="""
        WITH med AS (
            SELECT event_type,
                   CAST(CAST(quantile_cont(value, 0.5) AS DECIMAL(38,6)) AS DOUBLE) AS med
            FROM events GROUP BY event_type
        ), dev AS (
            SELECT e.event_type, m.med, abs(e.value - m.med) AS d
            FROM events e JOIN med m ON e.event_type = m.event_type
        ), mad AS (
            SELECT event_type, med,
                   CAST(CAST(quantile_cont(d, 0.5) AS DECIMAL(38,6)) AS DOUBLE) AS mad
            FROM dev GROUP BY event_type, med
        )
        SELECT d.event_type,
               MAX(m.med) AS median_value,
               MAX(m.mad) AS mad,
               COUNT(*) AS n,
               CAST(SUM(CASE WHEN d.d > 3 * 1.4826 * m.mad THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_outliers
        FROM dev d JOIN mad m ON d.event_type = m.event_type
        GROUP BY d.event_type
    """,
    tags=("security", "stats", "robust"),
)
def q_sec_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection by median absolute deviation — the
    outlier rule that survives the contamination that breaks
    q_sec_anomaly_zscore (a z-score's own mean/std absorb the
    outliers; the median and MAD don't). Flag = deviation > 3·1.4826·
    MAD (the normal-consistency constant).

    Determinism: both medians are exact interpolated percentiles
    snapped by decimal cast (the q_exact_percentile convention);
    deviations and the threshold are then fixed IEEE chains on
    identical operands, so the flag decision is bit-identical in both
    engines. Scale shape: exact medians need the full value multiset
    per group — two grouped percentile passes with a broadcast join of
    the tiny per-type medians between them (same two-pass shape as
    q_stats_moments); at 100 TB the drop-in approximate tier is
    q_approx_quantile_cd's KLL sketch with this exact plan as the
    verification harness."""
    ev = load_table(spark, sf_dir, "events")
    # per-type scalars, both referenced twice downstream — checkpoints
    # hold the event scans at the two-pass minimum exact medians need
    # (med pass, then |v−med| pass; without them the lazy plan scanned
    # events 4×)
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).cast(DEC).cast("double").alias("med")
    ).localCheckpoint()
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.abs(F.col("value") - F.col("med")).alias("d")
    )
    mad = dev.groupBy("event_type", "med").agg(
        F.percentile("d", F.lit(0.5)).cast(DEC).cast("double").alias("mad")
    ).localCheckpoint()
    return (
        dev.join(F.broadcast(mad.select("event_type", "mad")), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("med").alias("median_value"),
            F.max("mad").alias("mad"),
            F.count("*").alias("n"),
            F.sum(
                F.when(F.col("d") > F.lit(3) * F.lit(1.4826) * F.col("mad"), 1).otherwise(0)
            ).cast("bigint").alias("n_outliers"),
        )
    )

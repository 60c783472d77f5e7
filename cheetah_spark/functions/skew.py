"""Skew mitigation: salted joins and salted aggregation.

AQE's runtime skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`,
on by default in session.py) handles most skew transparently; this
module is the *planning-time* fallback for the cases AQE can't fix —
a hot key on the BUILD side of a shuffle join, or a groupBy where one
key holds a large share of all rows (AQE splits partitions, not keys).

Technique (standard): replicate the small side R times and salt the
large side with `hash(row) % R`, so one hot key spreads across R
reducer partitions; for aggregation, pre-aggregate on (key, salt) then
re-aggregate on key — two shuffles, each balanced.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"
_HOT_TAG = "__is_hot"
# above this many hot keys, tag via broadcast join instead of isin
# literals (which are embedded in both sides' codegen)
_HOT_ISIN_MAX = 64


def with_salt(df: DataFrame, buckets: int = 16, salt_on: str | None = None) -> DataFrame:
    """Add a salt column in [0, buckets). Deterministic when ``salt_on``
    (a unique column) is given — preferred, reproducible across retries;
    `spark_partition_id`-free and collect-free either way."""
    if salt_on is not None:
        salt = F.pmod(F.xxhash64(F.col(salt_on)), F.lit(buckets))
    else:
        salt = (F.rand(seed=42) * buckets).cast("int")
    return df.withColumn(SALT_COL, salt.cast("int"))


def replicate_for_salt(df: DataFrame, buckets: int = 16) -> DataFrame:
    """Explode the (small) side once per salt value so every salted
    partition of the big side finds its match."""
    return df.withColumn(SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    buckets: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """Equi-join resilient to hot keys in ``big``: salt the big side,
    replicate the small side ``buckets``×, join on keys + salt.

    Result equals ``big.join(small, on, how)`` for inner/left joins
    (every big row keeps exactly one salt; every (key, salt) finds the
    replicated small row). Cost: small side shuffled ``buckets``× —
    use only when the small side is genuinely small and AQE skew
    splitting is insufficient.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    b = with_salt(big, buckets, salt_on=salt_on)
    s = replicate_for_salt(small, buckets)
    return b.join(s, on=[*on, SALT_COL], how=how).drop(SALT_COL)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    buckets: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: aggregate on
    (keys + salt), then re-aggregate on keys.

    ``partial_aggs`` run per (key, salt); ``final_aggs`` combine the
    partials (e.g. partial ``sum(x) AS s`` → final ``sum(s) AS s``).
    Only needed for aggregates whose map-side combine can't absorb the
    skew (e.g. ``collect_list``/exact distinct); plain sums/counts are
    already combined map-side by Spark."""
    salted = with_salt(df, buckets, salt_on=salt_on)
    partial = salted.groupBy(*keys, SALT_COL).agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def hot_salted_join(
    big: DataFrame,
    dim: DataFrame,
    on: str,
    freq_col: str,
    salt_on: str,
    hot_k: int = 1024,
    buckets: int = 8,
    hot_probe: DataFrame | None = None,
) -> DataFrame:
    """Inner equi-join with DETERMINISTIC pre-salting of only the hot
    head of a Zipf-skewed key — the scale answer for token-keyed joins
    whose dim side is aggregate-fed.

    Why AQE is not enough here: OptimizeSkewedJoin only rewrites a
    sort-merge join whose Sort children sit DIRECTLY on shuffle stages;
    an aggregate between the shuffle and the join (the df/vocab side of
    tf⋈df joins — exactly this shape) breaks the pattern and the
    planted-skew test shows the split never engages, even with
    forceOptimizeSkewedJoin (tests/test_skew.py::
    test_aqe_skew_join_blocked_by_aggregate_side, measured on this
    Spark). And at 100 TB the vocabulary outgrows the broadcast
    threshold, so the join can't fall back to broadcast either.

    Technique: take the bounded hot head (top ``hot_k`` keys by
    ``freq_col`` — the Zipf head; a driver-side collect of K keys,
    same bounded-state class as k-means centroids), replicate ONLY
    those dim rows ``buckets``×, and salt big rows on
    ``hash(salt_on) % buckets`` only when their key is hot. One scan
    of ``big``, dim grows by K×(buckets-1) rows, and the hot key's
    rows spread over ``buckets`` reducers. Cold keys keep salt 0 and
    join exactly as before; results are identical to the plain join
    (salting changes partitioning, never matches).

    ``hot_probe`` (default: ``dim`` itself) is the relation the hot
    head is detected from — pass a cheap ESTIMATE (e.g. a seeded
    sample of the corpus, aggregated) so the eager hot-set collect
    does not recompute the full dim pipeline: correctness never
    depends on the hot set (a missed hot key just salts less; a
    false positive salts a cold key harmlessly), so a sampled
    heavy-hitter estimate is exactly as safe and far cheaper — the
    production posture at 100 TB.
    """
    hot_rows = (
        (hot_probe if hot_probe is not None else dim)
        .select(on, freq_col)
        .orderBy(F.col(freq_col).desc(), F.col(on).asc())
        .limit(hot_k)
        .select(on)
        .collect()
    )
    # dedupe while preserving rank order: a duplicated key in the probe
    # relation would otherwise duplicate rows through the broadcast tag
    # join below (the isin path this replaces was naturally idempotent)
    hot_list = list(dict.fromkeys(r[0] for r in hot_rows))

    def salt_exprs(is_hot: Column) -> tuple[Column, Column]:
        # sequence(int, int) explodes to INT — matches the big side's cast
        dim_salt = F.explode(
            F.sequence(F.lit(0), F.when(is_hot, F.lit(buckets - 1)).otherwise(F.lit(0)))
        )
        big_salt = (
            F.when(is_hot, F.pmod(F.xxhash64(F.col(salt_on)), F.lit(buckets)))
            .otherwise(F.lit(0))
            .cast("int")
        )
        return dim_salt, big_salt

    if len(hot_list) <= _HOT_ISIN_MAX:
        # small head: an isin literal list keeps the plan join-free
        is_hot = F.col(on).isin(hot_list) if hot_list else F.lit(False)
        dim_salt, big_salt = salt_exprs(is_hot)
        dim_r = dim.withColumn(SALT_COL, dim_salt)
        big_s = big.withColumn(SALT_COL, big_salt)
    else:
        # large head: embedding hot_k literals in BOTH sides' codegen
        # bloats the plan (round-5 advice) — broadcast-join a K-row
        # hot-key relation to tag is_hot instead; the collect stays
        # bounded (hot_k rows) and the tag join is a broadcast hash
        # join against a tiny build side
        spark = big.sparkSession
        key_field = next(f for f in dim.schema.fields if f.name == on)
        import pyspark.sql.types as T

        hot_df = spark.createDataFrame(
            [(k,) for k in hot_list], T.StructType([key_field])
        ).withColumn(_HOT_TAG, F.lit(True))
        is_hot = F.coalesce(F.col(_HOT_TAG), F.lit(False))
        dim_salt, big_salt = salt_exprs(is_hot)
        dim_r = (
            dim.join(F.broadcast(hot_df), on, "left")
            .withColumn(SALT_COL, dim_salt)
            .drop(_HOT_TAG)
        )
        big_s = (
            big.join(F.broadcast(hot_df), on, "left")
            .withColumn(SALT_COL, big_salt)
            .drop(_HOT_TAG)
        )
    return big_s.join(dim_r, on=[on, SALT_COL], how="inner").drop(SALT_COL)

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

"""Privacy-governance operators: k-anonymity auditing over
quasi-identifier combinations — the release gate a training-data
pipeline runs BEFORE publishing person-derived records (pairs with the
PII redaction battery, queries/curation.py pii_redact): a row whose
quasi-identifier combination is shared by fewer than k people is
re-identifiable even with direct identifiers scrubbed (Sweeney,
"k-anonymity: a model for protecting privacy", 2002).

No reference counterpart (§2B extension surface). Spark-first shape:
the audit is TWO map-side-combinable aggregates — group sizes per
quasi-identifier combination (the only event-scale shuffle, keyed by
the QI tuple), then a constant-size per-segment report — no window, no
join, no distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cheetah_spark.catalog import load_table
from cheetah_spark.registry import register

_KA_K = 5  # the k the release gate requires
_KA_BAND = 1000.0  # acctbal generalization width (the QI coarsening)

_KA_ORACLE = f"""
    WITH g AS (
        SELECT c_mktsegment,
               c_nationkey,
               CAST(FLOOR(c_acctbal / {_KA_BAND}) AS BIGINT) AS bal_band,
               CAST(COUNT(*) AS BIGINT) AS grp
        FROM customer
        GROUP BY 1, 2, 3
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN grp < {_KA_K} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_small_groups,
           CAST(SUM(CASE WHEN grp < {_KA_K} THEN grp ELSE 0 END) AS BIGINT)
               AS rows_at_risk,
           CAST(SUM(grp) AS BIGINT) AS n_rows,
           CAST(MIN(grp) AS BIGINT) AS k_anonymity,
           CAST(MAX(grp) AS BIGINT) AS max_group
    FROM g GROUP BY c_mktsegment
"""


@register(
    "q_priv_k_anonymity",
    oracle=_KA_ORACLE,
    tags=("privacy", "governance", "quality"),
)
def q_priv_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit per market segment: quasi-identifiers are
    (nation, banded account balance) — the banding IS the
    generalization step of the classic k-anonymization pipeline — and
    the report states, per segment, how many QI groups exist, how many
    fall below k=5, how many rows those small groups expose
    (rows_at_risk = the suppression cost of releasing at k), and the
    k the table actually satisfies (min group size).

    Scale shape: group sizes are ONE aggregate keyed by the QI tuple
    (map-side partial count before the only event-scale shuffle); the
    per-segment report aggregates the group-size frame, which is
    bounded by |segments| × |nations| × |bands| regardless of row
    count. At 100 TB the scan dominates; a skewed mega-group salts
    like q_skew_salted_agg. Every statistic is an exact integer."""
    c = load_table(spark, sf_dir, "customer")
    g = c.groupBy(
        "c_mktsegment",
        "c_nationkey",
        F.floor(F.col("c_acctbal") / _KA_BAND).cast("bigint").alias("bal_band"),
    ).agg(F.count("*").cast("bigint").alias("grp"))
    return g.groupBy("c_mktsegment").agg(
        F.count("*").cast("bigint").alias("n_groups"),
        F.sum(F.when(F.col("grp") < _KA_K, 1).otherwise(0))
        .cast("bigint")
        .alias("n_small_groups"),
        F.sum(F.when(F.col("grp") < _KA_K, F.col("grp")).otherwise(0))
        .cast("bigint")
        .alias("rows_at_risk"),
        F.sum("grp").cast("bigint").alias("n_rows"),
        F.min("grp").cast("bigint").alias("k_anonymity"),
        F.max("grp").cast("bigint").alias("max_group"),
    )

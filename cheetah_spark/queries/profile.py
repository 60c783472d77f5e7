"""Single-pass table profiling: per-column null counts, exact distinct
counts, and min/max — the "know your data" report every large-scale
pipeline runs before trusting a source (schema drift, null floods, and
cardinality explosions all surface here first).

No reference counterpart (§2B extension surface — the reference pipes
events, its users profile them downstream). Spark-first shape: ALL
columns profile in ONE aggregate over ONE scan — Catalyst plans the
multi-column exact distinct with a single Expand (one replicated row
group per distinct column, map-side partial dedup before the shuffle),
so the table is read exactly once no matter how many columns the
profile covers. At 100 TB the exact-distinct Expand (a |cols|× row
multiplication into the first partial agg) is the knob: swap
count_distinct for approx_count_distinct per column — one projection —
and the same single-scan plan carries HLL sketches instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cheetah_spark.catalog import load_table
from cheetah_spark.registry import register

# (column, numeric expression or None, text expression or None): ts
# profiles numerically as epoch seconds (Spark CAST(ts AS DOUBLE) ==
# DuckDB epoch(ts), both exact for µs timestamps); value snaps to 6
# decimals nowhere — doubles compare exactly, the driver canonicalizes
# display at 9 significant digits.
_PF_NUM = ("event_id", "user_id", "value", "ts")
_PF_TEXT = ("event_type", "props")


def _pf_numexpr(c: str):
    return F.col(c).cast("double")


_PROFILE_ORACLE = " UNION ALL ".join(
    f"""
    SELECT '{c}' AS col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(MIN({src}) AS DOUBLE) AS min_num,
           CAST(MAX({src}) AS DOUBLE) AS max_num,
           CAST(NULL AS VARCHAR) AS min_text,
           CAST(NULL AS VARCHAR) AS max_text
    FROM events
    """
    for c, src in [
        ("event_id", "event_id"),
        ("user_id", "user_id"),
        ("value", "value"),
        ("ts", "epoch(ts)"),
    ]
) + " UNION ALL " + " UNION ALL ".join(
    f"""
    SELECT '{c}' AS col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(NULL AS DOUBLE) AS min_num,
           CAST(NULL AS DOUBLE) AS max_num,
           MIN({c}) AS min_text,
           MAX({c}) AS max_text
    FROM events
    """
    for c in _PF_TEXT
)


@register(
    "q_profile_table",
    oracle=_PROFILE_ORACLE,
    tags=("profile", "quality", "stats"),
)
def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile every events column in a SINGLE aggregate: n_rows,
    n_nulls, exact n_distinct, and min/max (numeric columns as double —
    ts as epoch seconds — text columns lexicographic), unpivoted to one
    report row per column.

    Scale shape: one scan, one Expand (Catalyst's multi-distinct
    strategy: each input row replicates once per distinct column with
    the others nulled, and the partial aggregate dedups map-side before
    the shuffle), one merge. The DuckDB oracle spells the same report
    as per-column scans — the single-pass plan is exactly what the
    oracle's 6-scan spelling collapses into."""
    return profile_report(load_table(spark, sf_dir, "events"))


def profile_report(df: DataFrame, columns=None) -> DataFrame:
    """The single-pass profile as a pure df→df over ANY frame — the
    definition the registered query AND the declarative `profile`
    transform (config.py) bind. Numeric and timestamp columns profile
    min/max as double (timestamps as epoch seconds); everything else
    profiles lexicographically as string."""
    from pyspark.sql import types as T

    cols = list(columns) if columns else df.columns
    num, text = [], []
    for c in cols:
        dt = df.schema[c].dataType
        (num if isinstance(dt, (T.NumericType, T.TimestampType)) else text).append(c)
    # aggregate aliases are INDEX-based and the report's column-name
    # literals are escaped: "ANY table" includes columns named
    # `order date` or `a'b`, which raw f-string interpolation into
    # selectExpr would mis-parse
    ordered = num + text
    aggs = [F.count("*").cast("bigint").alias("n_rows")]
    for i, c in enumerate(ordered):
        aggs += [
            F.count(F.col(c)).cast("bigint").alias(f"nn_{i}"),
            F.countDistinct(F.col(c)).cast("bigint").alias(f"nd_{i}"),
        ]
        if c in num:
            aggs += [
                F.min(_pf_numexpr(c)).alias(f"mn_{i}"),
                F.max(_pf_numexpr(c)).alias(f"mx_{i}"),
            ]
        else:
            col = F.col(c).cast("string")
            aggs += [F.min(col).alias(f"mn_{i}"), F.max(col).alias(f"mx_{i}")]
    one = df.agg(*aggs)

    def lit(name: str) -> str:
        return "'" + name.replace("\\", "\\\\").replace("'", "\\'") + "'"

    stack_args = []
    for i, c in enumerate(ordered):
        if c in num:
            stack_args.append(
                f"{lit(c)}, n_rows - nn_{i}, nd_{i}, mn_{i}, mx_{i}, "
                f"CAST(NULL AS STRING), CAST(NULL AS STRING)"
            )
        else:
            stack_args.append(
                f"{lit(c)}, n_rows - nn_{i}, nd_{i}, CAST(NULL AS DOUBLE), "
                f"CAST(NULL AS DOUBLE), mn_{i}, mx_{i}"
            )
    return one.selectExpr(
        "n_rows",
        f"stack({len(ordered)}, {', '.join(stack_args)}) AS "
        "(col_name, n_nulls, n_distinct, min_num, max_num, min_text, max_text)",
    ).select(
        "col_name", "n_rows", "n_nulls", "n_distinct",
        "min_num", "max_num", "min_text", "max_text",
    )

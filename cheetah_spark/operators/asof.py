"""As-of (most-recent-at-or-before) join.

Spark has no ASOF JOIN primitive (DuckDB does — the oracle uses it);
the scalable composition is the classic union + last-observation-
carried-forward window:

    union(left tagged 1, right tagged 0)
      → Window.partitionBy(keys).orderBy(ts, side).rows(unbounded, 0)
      → last(value, ignorenulls=True)  per right value column
      → keep left rows

Cost: ONE shuffle on the join keys + one sort per partition — no
range-explosion, no per-row probe; at 100 TB this is the same shape as
any keyed window. The naive alternative (theta join ts >= ts' + argmax)
is quadratic per key and unusable at scale.

Semantics = DuckDB `ASOF LEFT JOIN ... ON l.k = r.k AND l.ts >= r.ts`:
inclusive at equal timestamps (right rows sort before left at ties via
the side tag). Right rows must be unique per (key, ts) — pre-aggregate
duplicates or the carried value is ill-defined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    ts_out: str = "asof_ts",
) -> DataFrame:
    """For each left row: the latest right row with right_ts <= left_ts
    per key. Returns left columns + ``value_cols`` + ``ts_out`` (the
    matched right timestamp; all NULL when no prior right row)."""
    left_cols = [c for c in left.columns]
    rtypes = dict((f.name, f.dataType) for f in right.schema.fields)

    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(rtypes[c]).alias(c) for c in value_cols],
        F.lit(None).cast(rtypes[right_ts]).alias("_rts"),
        *[F.col(c).alias(f"_l_{c}") for c in left_cols if c not in on],
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *value_cols,
        F.col(right_ts).alias("_rts"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
            for c in left_cols
            if c not in on
        ],
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged)
    for c in value_cols:
        carried = carried.withColumn(c, F.last(c, ignorenulls=True).over(w))
    carried = carried.withColumn("_rts", F.last("_rts", ignorenulls=True).over(w))
    out = carried.where(F.col("_side") == 1).select(
        *on,
        *[F.col(f"_l_{c}").alias(c) for c in left_cols if c not in on],
        *value_cols,
        F.col("_rts").alias(ts_out),
    )
    return out

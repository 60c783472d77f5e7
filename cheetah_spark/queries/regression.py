"""Distributed supervised training: full-batch gradient-descent linear
regression over document features, hash-verified BIT-EXACTLY against a
DuckDB oracle that unrolls the identical training loop in SQL.

Why this is hash-checkable when "ML training" usually isn't: every
per-row quantity is a fixed chain of single IEEE ops written in the
same association order in both engines, and the only order-dependent
reduction — the gradient sum — is cast per-term to DECIMAL(38,6) and
summed exactly (partitioning-independent), so each GD step's weights
are a pure function of the corpus. The oracle chains one CTE pair
(gradient aggregate, weight update) per iteration.

Scale shape (the point of doing this on Spark): one persisted feature
scan; each iteration is a single map-side-combinable aggregate
producing d+2 numbers; driver state is the d-vector of weights — the
same bounded-driver-state pattern as k-means (queries/llm.py) and BPE
(operators/bpe.py). 100 TB of rows cost O(iterations) balanced
shuffles of d+2 partials each; nothing ever collects rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cheetah_spark.catalog import load_table
from cheetah_spark.registry import register

_GD_ITERS = 8
_GD_LR = 1.0  # safe: lr < 2/λ_max(XᵀX/n) for these small-magnitude features
# DECIMAL(38,6): the suite-wide dsum scale (queries/_util.py) whose
# decimal→double conversion parity between engines is battle-tested by
# three rounds of bit-exact driver hashing — a higher scale would lean
# on conversion roundings no other query exercises
_DEC = "decimal(38,6)"

# features/target: exact-integer-derived, single-division doubles —
# identical text expressions on both engines (the n_ws_tokens
# convention is the hash-verified one from q_llm_token_count)
_SQL_FEATS = """
    SELECT n_chars / 1000.0 AS x1,
           len(string_split_regex(text, '\\s+')) / 100.0 AS x2,
           (doc_id % 100) / 50.0 - 1.0 + 0.8 * (n_chars / 1000.0) AS y
    FROM documents
"""


def _oracle_sql() -> str:
    """Unroll the whole training loop as a CTE chain: it_k holds the
    weights after k steps; g_k the decimal-exact gradient sums."""
    parts = [f"feats AS ({_SQL_FEATS})",
             "it0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2)"]
    for k in range(1, _GD_ITERS + 1):
        prev = f"it{k - 1}"
        resid = f"((({prev}.w0 + {prev}.w1 * x1) + {prev}.w2 * x2) - y)"
        parts.append(
            f"""g{k} AS (
                SELECT SUM(CAST({resid} AS DECIMAL(38,6))) AS g0,
                       SUM(CAST({resid} * x1 AS DECIMAL(38,6))) AS g1,
                       SUM(CAST({resid} * x2 AS DECIMAL(38,6))) AS g2,
                       COUNT(*) AS n
                FROM feats, {prev}
            )"""
        )
        parts.append(
            f"""it{k} AS (
                SELECT {prev}.w0 - {_GD_LR} * (CAST(g{k}.g0 AS DOUBLE) / g{k}.n) AS w0,
                       {prev}.w1 - {_GD_LR} * (CAST(g{k}.g1 AS DOUBLE) / g{k}.n) AS w1,
                       {prev}.w2 - {_GD_LR} * (CAST(g{k}.g2 AS DOUBLE) / g{k}.n) AS w2
                FROM {prev}, g{k}
            )"""
        )
    last = f"it{_GD_ITERS}"
    final_resid = f"((({last}.w0 + {last}.w1 * x1) + {last}.w2 * x2) - y)"
    return f"""
        WITH {', '.join(parts)}
        SELECT {_GD_ITERS} AS n_iters,
               {last}.w0 AS w0, {last}.w1 AS w1, {last}.w2 AS w2,
               CAST(SUM(CAST({final_resid} * {final_resid} AS DECIMAL(38,6))) AS DOUBLE)
                   / COUNT(*) AS final_mse
        FROM feats, {last}
        GROUP BY {last}.w0, {last}.w1, {last}.w2
    """


def _features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    x1 = F.col("n_chars") / F.lit(1000.0)
    x2 = F.size(F.split(F.col("text"), r"\s+")) / F.lit(100.0)
    y = (F.col("doc_id") % 100) / F.lit(50.0) - F.lit(1.0) + F.lit(0.8) * x1
    return d.select(x1.alias("x1"), x2.alias("x2"), y.alias("y"))


@register(
    "q_llm_quality_regression",
    oracle=_oracle_sql(),
    tags=("llm", "ml", "iterative"),
)
def q_llm_quality_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train w ← w − lr·∇MSE for 8 full-batch steps; emit the final
    weights and training MSE. See the module docstring for why the
    result hash-matches the SQL-unrolled oracle bit-for-bit — this is
    distributed supervised training under the same exactness contract
    as every relational operator in the suite."""
    feats = _features(spark, sf_dir).persist()
    try:
        w = [0.0, 0.0, 0.0]
        for _ in range(_GD_ITERS):
            # identical association order to the oracle's resid string
            pred = (F.lit(w[0]) + F.lit(w[1]) * F.col("x1")) + F.lit(w[2]) * F.col("x2")
            resid = pred - F.col("y")
            row = feats.agg(
                F.sum(resid.cast(_DEC)).alias("g0"),
                F.sum((resid * F.col("x1")).cast(_DEC)).alias("g1"),
                F.sum((resid * F.col("x2")).cast(_DEC)).alias("g2"),
                F.count(F.lit(1)).alias("n"),
            ).collect()[0]
            n = row["n"]
            w = [
                w[j] - _GD_LR * (float(row[f"g{j}"]) / n)
                for j in range(3)
            ]
        pred = (F.lit(w[0]) + F.lit(w[1]) * F.col("x1")) + F.lit(w[2]) * F.col("x2")
        resid = pred - F.col("y")
        mse = feats.agg(
            F.sum((resid * resid).cast(_DEC)).alias("ss"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        final_mse = float(mse["ss"]) / mse["n"]
    finally:
        feats.unpersist()
    return spark.createDataFrame(
        [(_GD_ITERS, w[0], w[1], w[2], final_mse)],
        "n_iters int, w0 double, w1 double, w2 double, final_mse double",
    )

"""Vector (embedding) column expressions.

The similarity-search / embedding-dedup operators run on
``embeddings.embedding`` (array<float>, 64-dim fixtures; the operators
are dimension-agnostic). All math casts to double FIRST and accumulates
sequentially with ``F.aggregate`` — the same element order DuckDB's
``list_cosine_similarity(CAST(x AS DOUBLE[]), …)`` uses, so oracle
comparisons are bit-stable up to snap precision.

Scale posture: these are pure expressions → whole-stage codegen, no
Python, no shuffle. The O(n²) pairing around them is what must be
bounded at 100 TB — see q_llm_similarity_topk (broadcast query set) and
q_llm_ann_lsh (sign-LSH banding) in queries/llm.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from cheetah_spark.functions.text import hash56


def _d(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-order double dot product (bit-stable across engines)."""
    return F.aggregate(F.zip_with(_d(a), _d(b), lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def l2_norm_sq(a: Column) -> Column:
    return dot(a, a)


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity in doubles: dot / (||a|| * ||b||)."""
    return dot(a, b) / (F.sqrt(l2_norm_sq(a)) * F.sqrt(l2_norm_sq(b)))


def oracle_cosine(a_expr: str, b_expr: str) -> str:
    """DuckDB counterpart (double-cast so both engines accumulate doubles)."""
    return f"list_cosine_similarity(CAST({a_expr} AS DOUBLE[]), CAST({b_expr} AS DOUBLE[]))"


def sign_lsh_bucket(vec: Column, band: int, bits_per_band: int = 8, dim: int = 64) -> Column:
    """Random-hyperplane (sign) LSH bucket id for one band.

    Hyperplane h = (band, bit) has deterministic ±1 components derived
    from hash56(band:bit:dim_index) — reproducible on any cluster with
    no random state and no stored model. Bucket id packs the sign bits
    of ``bits_per_band`` hyperplane projections.

    Cosine-similar vectors agree on most sign bits, so near-duplicates
    collide in at least one band with high probability; the band bucket
    is the shuffle key, which keeps candidate generation linear instead
    of the O(n²) cross join.
    """
    v = _d(vec)
    acc = F.lit(0).cast("bigint")
    for bit in range(bits_per_band):
        # projection = sum_i v[i] * sign(hash56(band:bit:i))
        proj = F.aggregate(
            F.zip_with(
                v,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda x, i: x
                * F.when(
                    hash56(F.concat_ws(":", F.lit(band), F.lit(bit), i.cast("string")))
                    .bitwiseAND(F.lit(1))
                    == 1,
                    F.lit(1.0),
                ).otherwise(F.lit(-1.0)),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        acc = acc + F.when(proj >= 0, F.lit(1 << bit).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
    return acc

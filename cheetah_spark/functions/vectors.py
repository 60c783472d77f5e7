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


def _lsh_sign(band: int, bit: int, i: int) -> float:
    """±1 hyperplane component: parity of md5(f"{band}:{bit}:{i}") —
    deterministic on any cluster, no random state, no stored model.
    (Same derivation as text.hash56 & 1, but evaluated in Python at
    plan-build time so NO hashing runs per row.)"""
    import hashlib

    h = int(hashlib.md5(f"{band}:{bit}:{i}".encode()).hexdigest()[:14], 16)
    return 1.0 if h & 1 else -1.0


def sign_lsh_bucket(vec: Column, band: int, bits_per_band: int = 8, dim: int = 64) -> Column:
    """Random-hyperplane (sign) LSH bucket id for one band.

    Bucket id packs the sign bits of ``bits_per_band`` hyperplane
    projections; the hyperplane ±1 components are md5-derived literals
    embedded in the plan (plan-build-time constants → the per-row work
    is ``bits_per_band`` literal-weighted dot products inside codegen).

    Cosine-similar vectors agree on most sign bits, so near-duplicates
    collide in at least one band with high probability; the band bucket
    is the shuffle key, which keeps candidate generation linear instead
    of the O(n²) cross join.
    """
    v = _d(vec)
    acc = F.lit(0).cast("bigint")
    for bit in range(bits_per_band):
        signs = F.array(*[F.lit(_lsh_sign(band, bit, i)) for i in range(dim)])
        proj = F.aggregate(
            F.zip_with(v, signs, lambda x, s: x * s), F.lit(0.0), lambda a, x: a + x
        )
        acc = acc + F.when(proj >= 0, F.lit(1 << bit).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return acc

"""Reusable column-level function library (text, vectors, hashing).

All helpers return Column expressions (JVM-side, codegen'd) unless
explicitly documented as Pandas-UDF-backed — the UDF boundary is the
slow path and is kept out of hot loops.
"""

from cheetah_spark.functions.text import (
    norm_text,
    quality_features,
    shingles,
    stopword_overlap,
    tokens,
)
from cheetah_spark.functions.vectors import cosine, dot, l2_norm_sq

__all__ = [
    "tokens",
    "shingles",
    "norm_text",
    "stopword_overlap",
    "quality_features",
    "dot",
    "l2_norm_sq",
    "cosine",
]

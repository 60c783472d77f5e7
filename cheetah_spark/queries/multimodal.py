"""Multimodal-column queries: binary payload plumbing (oracle-checked)
and the stubbed Arrow decode pipeline (rows-only)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cheetah_spark import multimodal as M
from cheetah_spark.catalog import load_table
from cheetah_spark.registry import register

_MAGIC_CASE = " ".join(
    f"WHEN {i} THEN '{M.MAGIC[t]}'" for i, t in enumerate(M.MAGIC)
)
_PAYLOAD = f"(from_hex(CASE doc_id % {len(M.MAGIC)} {_MAGIC_CASE} END) || encode(text))"
_TYPE_CASE = " ".join(
    f"WHEN substr(lower(hex({_PAYLOAD})), 1, 8) = '{m}' THEN '{t}'" for t, m in M.MAGIC.items()
)


@register(
    "q_multimodal_meta",
    oracle=f"""
        SELECT doc_id,
               CASE {_TYPE_CASE} ELSE 'unknown' END AS media_type,
               octet_length({_PAYLOAD})::BIGINT AS n_bytes,
               md5(lower(hex({_PAYLOAD}))) AS content_hash
        FROM documents
    """,
    tags=("multimodal", "binary"),
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media envelope plumbing: synthesize a typed payload
    (magic header + bytes), then recover type by magic-byte sniffing,
    size, and content hash — all JVM-side binary expressions (the
    oracle mirrors them over DuckDB BLOBs via hex normalization).
    Map-only; payload bytes never shuffle."""
    d = load_table(spark, sf_dir, "documents")
    return M.media_table(d).drop("payload")


@register("q_multimodal_decode", tags=("multimodal", "udf", "rows-only"))
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stubbed media decode through the real Arrow/mapInPandas pipeline:
    binary payloads cross into pandas batches, a (deterministic fake)
    decoder emits a typed feature frame per batch — the exact plumbing
    a PIL/ffmpeg decoder plugs into (see multimodal.decode_features).
    Aggregated per media_type so the output is compact and stable."""
    d = load_table(spark, sf_dir, "documents")
    feats = M.decode_features(M.media_table(d))
    return feats.groupBy("media_type").agg(
        F.count("*").alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.max("width").alias("max_width"),
        F.max("height").alias("max_height"),
        F.max("n_frames").alias("max_frames"),
        F.max("sample_rate").alias("max_sample_rate"),
    )

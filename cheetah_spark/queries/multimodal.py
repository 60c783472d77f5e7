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


@register(
    "q_multimodal_decode",
    oracle="""
        WITH f AS (
            SELECT doc_id,
                   CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                        WHEN 2 THEN 'wav' ELSE 'mp4' END AS media_type,
                   4 + octet_length(encode(text)) AS n_bytes
            FROM documents
        )
        SELECT media_type,
               COUNT(*)::BIGINT AS n_media,
               CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
               CAST(MAX(CASE WHEN media_type IN ('png','jpeg','mp4')
                    THEN 64 + (doc_id * 31) % 1024 ELSE 0 END) AS INTEGER) AS max_width,
               CAST(MAX(CASE WHEN media_type IN ('png','jpeg','mp4')
                    THEN 64 + (doc_id * 17) % 768 ELSE 0 END) AS INTEGER) AS max_height,
               CAST(MAX(CASE WHEN media_type IN ('png','jpeg') THEN 1
                    WHEN media_type = 'mp4' THEN 1 + n_bytes % 240
                    ELSE 0 END) AS INTEGER) AS max_frames,
               CAST(MAX(CASE WHEN media_type = 'wav'
                    THEN 8000 + (n_bytes % 8) * 4000 ELSE 0 END) AS INTEGER) AS max_sample_rate
        FROM f GROUP BY media_type
    """,
    tags=("multimodal", "udf"),
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stubbed media decode through the real Arrow/mapInPandas pipeline:
    binary payloads cross into pandas batches, a (deterministic fake)
    decoder emits a typed feature frame per batch — the exact plumbing
    a PIL/ffmpeg decoder plugs into (see multimodal.decode_features).
    Aggregated per media_type so the output is compact and stable.

    Because the stub decoder is a pure integer function of
    (doc_id, media_type, n_bytes), the DuckDB oracle mirrors it exactly
    — so the whole binary→Arrow→pandas→features round trip is
    hash-verified, not just row-counted. A real codec swap would move
    this back to invariant checks (decoded features aren't
    SQL-expressible)."""
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

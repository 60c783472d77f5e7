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
               CAST(MAX(CASE WHEN media_type = 'png' THEN 16 + doc_id % 32
                    WHEN media_type IN ('jpeg','mp4') THEN 64 + (doc_id * 31) % 1024
                    ELSE 0 END) AS INTEGER) AS max_width,
               CAST(MAX(CASE WHEN media_type = 'png' THEN 8 + doc_id % 16
                    WHEN media_type IN ('jpeg','mp4') THEN 64 + (doc_id * 17) % 768
                    ELSE 0 END) AS INTEGER) AS max_height,
               CAST(MAX(CASE WHEN media_type IN ('png','jpeg') THEN 1
                    WHEN media_type = 'mp4' THEN 1 + n_bytes % 240
                    WHEN media_type = 'wav' THEN 64 + doc_id % 64
                    ELSE 0 END) AS INTEGER) AS max_frames,
               CAST(MAX(CASE WHEN media_type = 'wav'
                    THEN 8000 + (doc_id % 8) * 1000 ELSE 0 END) AS INTEGER) AS max_sample_rate,
               CAST(SUM(CASE WHEN media_type = 'png'
                    THEN (16 + doc_id % 32) * (8 + doc_id % 16) * (doc_id % 256)
                    ELSE 0 END) AS BIGINT) AS sum_pixels,
               CAST(SUM(CASE WHEN media_type = 'wav'
                    THEN (64 + doc_id % 64) * (doc_id % 30000)
                    ELSE 0 END) AS BIGINT) AS sum_samples
        FROM f GROUP BY media_type
    """,
    tags=("multimodal", "udf"),
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media decode through the Arrow/mapInPandas pipeline — REAL for
    png/wav: the envelope synthesizes actual PNG (CRC-chunked, zlib
    scanlines) and PCM WAV files, and decode_features recovers
    width/height/pixel sums and sample-rate/frame/sample sums with
    stdlib codecs. jpeg/mp4 payloads (external codecs, none in this
    container) run the deterministic fake decoder — the PIL/ffmpeg
    integration point (multimodal.decode_features(real_decode=True)).

    Every encoded parameter is a closed-form function of doc_id, so
    the DuckDB oracle recomputes what decode MUST recover: the hash
    gate proves the binary→Arrow→pandas→decode round trip is lossless
    for the real-codec half and byte-stable for the fake half. An
    integrity failure (bad CRC, truncated chunk) zeroes that row's
    features and breaks the sums — hash-visible.

    Scale: the synthesized corpus persists once per fixture
    (media_fixture_dir — a real pipeline's media bytes already sit on
    disk), so the measured plan is parquet scan → ONE Arrow decode
    stage → tiny per-type aggregate; payload bytes never cross a
    shuffle."""
    feats = M.decode_features(
        spark.read.parquet(M.media_fixture_dir(spark, sf_dir, "mixed"))
    )
    return feats.groupBy("media_type").agg(
        F.count("*").alias("n_media"),
        F.max("width").alias("max_width"),
        F.max("height").alias("max_height"),
        F.max("n_frames").alias("max_frames"),
        F.max("sample_rate").alias("max_sample_rate"),
        F.sum("pixel_sum").alias("sum_pixels"),
        F.sum("sample_sum").alias("sum_samples"),
    )


@register(
    "q_multimodal_codec_roundtrip",
    oracle="""
        WITH m AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'wav' END AS media_type,
                   CASE WHEN doc_id % 2 = 0 THEN 16 + doc_id % 32 ELSE 0 END AS w,
                   CASE WHEN doc_id % 2 = 0 THEN 8 + doc_id % 16 ELSE 0 END AS h,
                   CASE WHEN doc_id % 2 = 0
                        THEN (16 + doc_id % 32) * (8 + doc_id % 16) * (doc_id % 256)
                        ELSE 0 END AS psum,
                   CASE WHEN doc_id % 2 = 1 THEN 8000 + (doc_id % 8) * 1000 ELSE 0 END AS fr,
                   CASE WHEN doc_id % 2 = 1 THEN 64 + doc_id % 64 ELSE 0 END AS nf,
                   CASE WHEN doc_id % 2 = 1
                        THEN (64 + doc_id % 64) * (doc_id % 30000)
                        ELSE 0 END AS ssum
            FROM documents
        )
        SELECT media_type,
               COUNT(*)::BIGINT AS n_media,
               TRUE AS all_parse_ok,
               TRUE AS all_sniff_ok,
               CAST(SUM(w) AS BIGINT) AS sum_width,
               CAST(SUM(h) AS BIGINT) AS sum_height,
               CAST(SUM(psum) AS BIGINT) AS sum_pixels,
               CAST(SUM(fr) AS BIGINT) AS sum_sample_rate,
               CAST(SUM(nf) AS BIGINT) AS sum_frames,
               CAST(SUM(ssum) AS BIGINT) AS sum_samples
        FROM m GROUP BY media_type
    """,
    tags=("multimodal", "codec", "udf"),
)
def q_multimodal_codec_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL codec round trip — no stubs: synthesize actual PNG files
    (signature, CRC-checked IHDR/IDAT/IEND, zlib scanlines) and PCM
    WAV files (RIFF/fmt/data) in one Arrow stage, then DECODE them in
    a second Arrow stage with stdlib codecs (chunk-walking + CRC32
    verification + inflate for PNG, the ``wave`` reader for WAV).
    Because every encoded parameter is a closed-form function of
    doc_id, the oracle recomputes what decode MUST recover — the hash
    gate proves encode→bytes→decode is lossless, and that the
    envelope's JVM magic-sniff rule agrees with the real file headers
    (``all_sniff_ok``). Integrity failures (bad CRC, truncated chunk,
    wrong scanline filter) flip the pinned-TRUE flags and fail the
    driver row.

    Scale: the synthesized files persist once per fixture
    (media_fixture_dir), so the measured plan is parquet scan → ONE
    Arrow decode stage → the final tiny per-type aggregate; payload
    bytes live only inside that stage (never in a wide op)."""
    feats = M.decode_real_features(
        spark.read.parquet(M.media_fixture_dir(spark, sf_dir, "real"))
    )
    return feats.groupBy("media_type").agg(
        F.count("*").alias("n_media"),
        F.bool_and("parse_ok").alias("all_parse_ok"),
        F.bool_and(F.col("sniffed") == F.col("media_type")).alias("all_sniff_ok"),
        F.sum("width").alias("sum_width"),
        F.sum("height").alias("sum_height"),
        F.sum("pixel_sum").alias("sum_pixels"),
        F.sum("sample_rate").alias("sum_sample_rate"),
        F.sum("n_frames").alias("sum_frames"),
        F.sum("sample_sum").alias("sum_samples"),
    )


@register(
    "q_multimodal_resize",
    oracle="""
        SELECT doc_id,
               CAST((16 + doc_id % 32) // 2 AS INTEGER) AS out_width,
               CAST((8 + doc_id % 16) // 2 AS INTEGER) AS out_height,
               CAST(((16 + doc_id % 32) // 2) * ((8 + doc_id % 16) // 2)
                    * (doc_id % 256) AS BIGINT) AS out_pixel_sum,
               TRUE AS roundtrip_ok
        FROM documents WHERE doc_id % 2 = 0
    """,
    tags=("multimodal", "codec", "udf", "transform"),
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize through the Arrow pipeline — the transform
    step (not just decode) of an image-training-data pipeline: every
    PNG in the persisted media corpus is decoded (CRC-verified chunk
    walk + inflate), 2×2 average-pooled with exact integer floor-mean,
    re-encoded as a fully valid PNG, and decoded AGAIN to verify the
    emitted bytes are a well-formed image with the expected pixels
    (roundtrip_ok pinned TRUE per row).

    The synthesized PNGs are constant-valued (pixel = doc_id % 256),
    so the pooled image is exactly the same constant at floor-halved
    dimensions — the oracle states the whole transform in closed form
    per doc_id, and any codec defect (bad CRC on re-encode, wrong
    scanline filter, off-by-one pooling) breaks dims, sums or the
    pinned flag. Scale: parquet scan → ONE Arrow stage (numpy pooling
    per batch) → no shuffle at all; payload bytes never leave the
    stage."""
    return M.resize_png_features(
        spark.read.parquet(M.media_fixture_dir(spark, sf_dir, "real"))
    )


@register(
    "q_multimodal_framesample",
    oracle="""
        SELECT doc_id,
               CAST(8000 + (doc_id % 8) * 1000 AS INTEGER) AS sample_rate,
               CAST(((64 + doc_id % 64) + 3) // 4 AS INTEGER) AS n_sampled,
               CAST((((64 + doc_id % 64) + 3) // 4) * (doc_id % 30000) AS BIGINT)
                   AS sampled_sum,
               TRUE AS roundtrip_ok
        FROM documents WHERE doc_id % 2 = 1
    """,
    tags=("multimodal", "codec", "udf", "transform"),
)
def q_multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio frame-sampling — the audio counterpart of
    q_multimodal_resize, completing the multimodal transform verb set
    (decode / feature-extract / resize / frame-sample): every WAV in
    the persisted media corpus is decoded with the stdlib ``wave``
    reader, every 4th PCM frame kept, the result re-encoded as a valid
    WAV and decoded AGAIN to verify frame-exact survival
    (roundtrip_ok pinned TRUE per row). Constant-amplitude synthesis
    makes the whole transform closed-form per doc_id for the oracle:
    n_sampled = ⌈n/4⌉ and sampled_sum = amplitude·n_sampled. Scale:
    parquet scan → ONE Arrow stage → no shuffle; payload bytes never
    leave the stage."""
    return M.framesample_wav_features(
        spark.read.parquet(M.media_fixture_dir(spark, sf_dir, "real"))
    )


@register(
    "q_multimodal_phash_dedup",
    oracle="""
        WITH png AS (
            SELECT doc_id,
                   16 + doc_id % 32 AS w,
                   8 + doc_id % 16 AS h,
                   (doc_id % 256) // 16 AS lvl
            FROM documents WHERE doc_id % 2 = 0
        )
        SELECT repeat(format('{:x}', lvl), 64) AS phash,
               COUNT(*) AS n_images,
               COUNT(DISTINCT w * 1000 + h) AS n_distinct_dims,
               MIN(doc_id) AS rep_doc_id,
               CAST(MAX(lvl) AS BIGINT) AS phash_level,
               bool_and(TRUE) AS all_parse_ok
        FROM png
        GROUP BY lvl
    """,
    tags=("multimodal", "dedup", "udf"),
)
def q_multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup — the multimodal member of the
    near-dup family: every PNG in the persisted media corpus is
    REALLY decoded (CRC chunk walk + inflate), average-pooled onto a
    fixed 8×8 grid, 16-level quantized into a 64-hex-digit perceptual
    hash (resolution-invariant by construction), and exact-grouped on
    that hash — images that differ only in dimensions or
    sub-quantization pixel noise land in one cluster, the aHash
    pipeline of image training-data curation.

    The synthesized PNGs are constant-valued (pixel = doc_id % 256) at
    doc_id-dependent dimensions, so each image's grid is exactly its
    constant and the cluster key reduces to the 16-level gray bucket —
    the oracle states hash, membership, and the dimension spread per
    cluster in closed form, and any decode/pooling/quantization defect
    (bad CRC, wrong block split, off-by-one floor mean) moves a doc to
    the wrong cluster and breaks the hash gate.

    Scale shape: parquet scan → ONE Arrow fingerprint stage (payload
    bytes never shuffle; only the 64-char hash moves) → hash groupBy
    on the fingerprint — the exact-dedup plan of q_llm_exact_dedup
    with the perceptual fingerprint as the key. Banding/rotation
    variants (pHash Hamming-radius search) would reuse the SimHash
    band-join machinery over these grids unchanged."""
    feats = M.phash_png_features(
        spark.read.parquet(M.media_fixture_dir(spark, sf_dir, "real"))
    )
    return feats.groupBy("phash").agg(
        F.count("*").alias("n_images"),
        F.countDistinct(F.col("width") * 1000 + F.col("height")).alias("n_distinct_dims"),
        F.min("doc_id").alias("rep_doc_id"),
        F.max("phash_level").alias("phash_level"),
        F.bool_and("parse_ok").alias("all_parse_ok"),
    )


@register(
    "q_multimodal_audio_dedup",
    oracle="""
        WITH wav AS (
            SELECT doc_id,
                   8000 + (doc_id % 8) * 1000 AS fr,
                   64 + doc_id % 64 AS n,
                   (doc_id % 30000) // 32 AS lvl
            FROM documents WHERE doc_id % 2 = 1
        )
        SELECT format('a{:x}-d{:d}', lvl, (n * 1000 // fr) // 250) AS afp,
               COUNT(*) AS n_clips,
               COUNT(DISTINCT fr) AS n_distinct_rates,
               MIN(doc_id) AS rep_doc_id,
               CAST(MAX(lvl) AS BIGINT) AS amp_level,
               bool_and(TRUE) AS all_parse_ok
        FROM wav
        GROUP BY lvl, (n * 1000 // fr) // 250
    """,
    tags=("multimodal", "dedup", "udf"),
)
def q_multimodal_audio_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-fingerprint dedup — the WAV counterpart of
    q_multimodal_phash_dedup, completing the perceptual-dedup pair
    over both real stdlib codecs: every WAV in the persisted media
    corpus is REALLY decoded (RIFF/fmt/data via ``wave``), its mean
    absolute PCM amplitude quantized to 16 levels and its duration to
    250 ms buckets, and the corpus exact-grouped on the resulting
    fingerprint — clips differing only in sample rate or
    sub-quantization amplitude noise collide, the shape of
    chromaprint-style audio dedup with the spectral stage swapped for
    a closed-form energy envelope.

    The synthesized WAVs are constant-amplitude (doc_id % 30000) at
    doc_id-dependent rate/length, so fingerprint, membership, and the
    rate spread per cluster are all stated in closed form by the
    oracle; any decode defect (frame miscount, wrong sample width,
    endianness) moves a clip across a quantization boundary and breaks
    the hash gate.

    Scale shape: parquet scan → ONE Arrow fingerprint stage → hash
    groupBy on the fingerprint; payload bytes never shuffle (the
    q_llm_exact_dedup plan with a perceptual key)."""
    feats = M.audio_fingerprint_features(
        spark.read.parquet(M.media_fixture_dir(spark, sf_dir, "real"))
    )
    return feats.groupBy("afp").agg(
        F.count("*").alias("n_clips"),
        F.countDistinct("sample_rate").alias("n_distinct_rates"),
        F.min("doc_id").alias("rep_doc_id"),
        F.max("amp_level").alias("amp_level"),
        F.bool_and("parse_ok").alias("all_parse_ok"),
    )

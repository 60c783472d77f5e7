"""Training-data curation operators beyond dedup: deterministic
stratified sampling, context-window sequence packing, and embedding
quantization — the remaining pieces a 100 TB pretraining-data pipeline
runs after filtering/dedup (no reference counterpart; north-star
extension surface like queries/llm.py).

All three follow the module conventions: hash decisions are the
cross-engine :func:`~cheetah_spark.functions.text.hash56`, every float
op is a single IEEE op on identical operands in both engines, and
outputs are exact ints or raw divisions so the DuckDB oracle
hash-matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cheetah_spark.catalog import load_table
from cheetah_spark.functions import text as X
from cheetah_spark.registry import register

# ---------------------------------------------------------------------------
# Stratified sampling
# ---------------------------------------------------------------------------

# per-mil keep rates per stratum — the domain-mixture knob of a
# pretraining pipeline (upsample scarce langs, downsample dominant)
_SAMPLE_RATES = {"en": 500, "de": 250, "fr": 250, "es": 125, "zh": 125}
_SAMPLE_DEFAULT = 100
_SAMPLE_SEED = "sample:"

_ORACLE_RATE = (
    "CASE lang "
    + " ".join(f"WHEN '{lg}' THEN {r}" for lg, r in _SAMPLE_RATES.items())
    + f" ELSE {_SAMPLE_DEFAULT} END"
)


@register(
    "q_llm_sample_stratified",
    oracle=f"""
        WITH tagged AS (
            SELECT lang, doc_id,
                   ({X.oracle_hash56(f"'{_SAMPLE_SEED}' || CAST(doc_id AS VARCHAR)")} % 1000)
                       < ({_ORACLE_RATE}) AS kept
            FROM documents
        )
        SELECT lang,
               COUNT(*) AS n_docs,
               COUNT(CASE WHEN kept THEN 1 END) AS n_kept,
               MIN(CASE WHEN kept THEN doc_id END) AS min_kept_id,
               MAX(CASE WHEN kept THEN doc_id END) AS max_kept_id
        FROM tagged
        GROUP BY lang
    """,
    tags=("llm", "sampling"),
)
def q_llm_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based stratified sampling: a document is kept
    iff ``hash56('sample:' || doc_id) mod 1000`` falls under its
    stratum's per-mil rate. No RNG state, no ordering dependence — the
    same rows are kept on any cluster, any partitioning, any engine
    (the property that makes a sampled corpus reproducible), and the
    decision is a map-only codegen expression: at 100 TB this is a pure
    scan-filter with the mixture knob as data, not code."""
    d = load_table(spark, sf_dir, "documents")
    rate = F.lit(_SAMPLE_DEFAULT)
    for lg, r in reversed(_SAMPLE_RATES.items()):
        rate = F.when(F.col("lang") == lg, F.lit(r)).otherwise(rate)
    kept = (
        X.hash56(F.concat(F.lit(_SAMPLE_SEED), F.col("doc_id").cast("string"))) % 1000 < rate
    )
    return (
        d.select("lang", "doc_id", kept.alias("kept"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.count(F.when(F.col("kept"), 1)).alias("n_kept"),
            F.min(F.when(F.col("kept"), F.col("doc_id"))).alias("min_kept_id"),
            F.max(F.when(F.col("kept"), F.col("doc_id"))).alias("max_kept_id"),
        )
    )


# ---------------------------------------------------------------------------
# Sequence packing
# ---------------------------------------------------------------------------

_CTX_TOKENS = 2048  # context-window budget per packed sequence


@register(
    "q_llm_pack_sequences",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, lang, source,
                   len({X.oracle_tokens("text", X.TOKEN_RE)})::BIGINT AS n_tok
            FROM documents
        ), placed AS (
            SELECT lang, source, n_tok,
                   COALESCE(SUM(n_tok) OVER (
                       PARTITION BY lang, source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_prev
            FROM t
        )
        SELECT lang, source,
               CAST(cum_prev // {_CTX_TOKENS} AS BIGINT) AS bin,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS bin_tokens
        FROM placed
        GROUP BY lang, source, bin
    """,
    tags=("llm", "packing"),
)
def q_llm_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window sequence packing: within each (lang, source)
    shard, documents are laid end-to-end in doc_id order and assigned
    to the 2048-token bin where they START (streaming first-fit
    — the standard pretraining packing that avoids global bin-state).

    Exact integer window arithmetic → bit-identical oracle. Scale
    shape: ONE window shuffle partitioned by (lang, source) — packing
    state never crosses shard boundaries, so a 100 TB corpus packs
    shard-parallel with no global coordination (the shard key is
    whatever unit downstream training shuffles by)."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", "lang", "source",
        F.size(X.tokens(F.col("text"), X.TOKEN_RE)).cast("bigint").alias("n_tok"),
    )
    w = (
        Window.partitionBy("lang", "source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = t.select(
        "lang", "source", "n_tok",
        F.coalesce(F.sum("n_tok").over(w), F.lit(0)).alias("cum_prev"),
    )
    return (
        placed.select(
            "lang", "source", "n_tok",
            F.floor(F.col("cum_prev") / _CTX_TOKENS).cast("bigint").alias("bin"),
        )
        .groupBy("lang", "source", "bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("bin_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Embedding quantization
# ---------------------------------------------------------------------------


@register(
    "q_llm_embed_quantize",
    oracle="""
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings
        ), scaled AS (
            SELECT vec_id, x,
                   list_aggregate(list_transform(x, e -> abs(e)), 'max') AS max_abs,
                   127.0 / greatest(list_aggregate(list_transform(x, e -> abs(e)), 'max'),
                                    1e-12) AS scale
            FROM v
        )
        SELECT vec_id, max_abs,
               CAST(list_sum(list_transform(x, e ->
                   CAST(least(127, greatest(-127, floor(e * scale + 0.5))) AS BIGINT)))
                   AS BIGINT) AS checksum,
               CAST(len(list_filter(list_transform(x, e ->
                   CAST(least(127, greatest(-127, floor(e * scale + 0.5))) AS BIGINT)),
                   q -> abs(q) = 127)) AS BIGINT) AS n_saturated
        FROM scaled
    """,
    tags=("llm", "vector", "quantize"),
)
def q_llm_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization per embedding (the standard
    storage/serving compression before ANN indexing): scale =
    127/max|x|, q_i = clamp(floor(x_i·scale + 0.5), ±127).

    Every step is a single IEEE op on identical operands (explicit
    ``floor(x+0.5)`` rounding — built-in round() disagrees between
    engines on ties), so the integer checksum and saturation count
    hash-match DuckDB exactly. Map-only codegen: at 100 TB this is a
    pure scan-transform, no shuffle."""
    e = load_table(spark, sf_dir, "embeddings")
    x = F.col("embedding").cast("array<double>")
    max_abs = F.array_max(F.transform(x, lambda v: F.abs(v)))
    scale = F.lit(127.0) / F.greatest(max_abs, F.lit(1e-12))
    q = F.transform(
        x,
        lambda v: F.least(
            F.lit(127).cast("bigint"),
            F.greatest(F.lit(-127).cast("bigint"), F.floor(v * scale + F.lit(0.5))),
        ),
    )
    return e.select(
        "vec_id",
        max_abs.alias("max_abs"),
        F.aggregate(q, F.lit(0).cast("bigint"), lambda acc, v: acc + v).alias("checksum"),
        F.size(F.filter(q, lambda v: F.abs(v) == 127)).cast("bigint").alias("n_saturated"),
    )

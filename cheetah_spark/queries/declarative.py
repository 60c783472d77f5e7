"""Declarative-config query surface: prove the kawad-shaped JSON
config path (cheetah_spark/config.py, reference README.md:164-299)
drives the same operator surface the DataFrame API does — the config
below builds a filter → SQL-aggregate pipeline and the driver verifies
its result against the DuckDB oracle like any other operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cheetah_spark.config import pipeline_from_config
from cheetah_spark.registry import register

# Shared aggregate text: valid in BOTH Spark SQL (the config's sql
# transform) and DuckDB (the oracle) — exact decimal sum, _util rules.
_AGG = """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM __input__
    WHERE value >= 10
    GROUP BY event_type
"""


@register(
    "q_config_pipeline",
    oracle=_AGG.replace("__input__", "events"),
    tags=("config", "pipeline"),
)
def q_config_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A pipeline declared entirely as config (source block + transform
    chain), loaded by :func:`pipeline_from_config` and planned by
    Catalyst like any hand-built DataFrame — filter pushdown and
    partial aggregation apply to config-declared pipelines unchanged.

    The events table is loaded via its parquet path directly (the
    config path takes raw files, like the reference daemon); ts is not
    touched so the TIMESTAMP(NANOS) fixture nuance stays out of scope
    — the aggregate runs on (event_type, value, user_id) only."""
    # engine requirement for this fixture family: events.ts is parquet
    # TIMESTAMP(NANOS); schema conversion needs nanosAsLong on ANY
    # session (same runtime-set as catalog.load_table)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    cfg = {
        "source": {"type": "parquet", "path": f"{sf_dir}/events.parquet"},
        "transforms": [
            {"type": "select", "columns": ["event_type", "value", "user_id"]},
            {"type": "sql", "query": _AGG, "view": "__input__"},
        ],
    }
    return pipeline_from_config(cfg).dataframe(spark)


# Deterministic PII planting for the config chain (the corpus has no
# natural PII): every 3rd doc gets an email + phone suffix appended,
# expressed as a plain SQL expr so it can live INSIDE the JSON config.
_PLANT_EXPR = (
    "CASE WHEN doc_id % 3 = 0 THEN concat(text, ' contact u', "
    "cast(doc_id AS string), '@mail.example.com call 555-', "
    "lpad(cast(doc_id % 10000 AS string), 4, '0')) ELSE text END"
)

# Final stage of the config chain (Spark SQL over the transformed
# view): exact-dedup on the content fingerprint of the REDACTED text
# (keep min doc_id), then a per-lang summary whose fp_checksum pins
# the redacted output text byte-for-byte.
_CUR_AGG = """
    WITH kept AS (
        SELECT * FROM (
            SELECT *, MIN(doc_id) OVER (PARTITION BY content_fp) AS keeper
            FROM __input__
        ) WHERE doc_id = keeper
    )
    SELECT lang,
           COUNT(*) AS n_kept,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(CAST(conv(substr(content_fp, 1, 14), 16, 10) AS BIGINT)
                    % 1000003) AS BIGINT) AS fp_checksum
    FROM kept GROUP BY lang
"""

from cheetah_spark.functions.text import WORD_RE as _W_TOK  # oracle tokens == X.tokens


def _curation_oracle() -> str:
    """DuckDB mirror of the whole config chain: quality gate → PII
    plant → redact → content fingerprint → token count → fp-dedup →
    per-lang summary."""
    from cheetah_spark.queries.curation import _PII_EMAIL_RE, _PII_PHONE_RE
    from cheetah_spark.queries.llm import _QW

    toks = f"regexp_extract_all(lower(text), '{_W_TOK}')"
    return f"""
        WITH q AS (
            SELECT doc_id, lang, text,
                   ({_QW["len"]} * least(len({toks}), 200)::DOUBLE / 200
                    + {_QW["uniq"]} * (len(list_distinct({toks}))::DOUBLE
                        / greatest(len({toks}), 1))
                    + {_QW["alpha"]} * (1.0
                        - length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE
                            / greatest(length(text), 1)
                        - length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))::DOUBLE
                            / greatest(length(text), 1))) AS quality
            FROM documents
        ),
        planted AS (
            SELECT doc_id, lang,
                   CASE WHEN doc_id % 3 = 0
                        THEN text || ' contact u' || CAST(doc_id AS VARCHAR)
                             || '@mail.example.com call 555-'
                             || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                        ELSE text END AS t
            FROM q WHERE quality >= 0.5
        ),
        red AS (
            SELECT doc_id, lang,
                   regexp_replace(regexp_replace(t,
                       '{_PII_EMAIL_RE}', '<EMAIL>', 'g'),
                       '{_PII_PHONE_RE}', '<PHONE>', 'g') AS rt
            FROM planted
        ),
        fp AS (
            SELECT doc_id, lang,
                   md5(trim(regexp_replace(lower(rt), '\\s+', ' ', 'g'))) AS content_fp,
                   len(regexp_extract_all(lower(rt), '{_W_TOK}'))::BIGINT AS n_tokens
            FROM red
        ),
        kept AS (
            SELECT * FROM (
                SELECT *, MIN(doc_id) OVER (PARTITION BY content_fp) AS keeper FROM fp
            ) WHERE doc_id = keeper
        )
        SELECT lang,
               COUNT(*) AS n_kept,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(SUM(CAST('0x' || substr(content_fp, 1, 14) AS BIGINT)
                        % 1000003) AS BIGINT) AS fp_checksum
        FROM kept GROUP BY lang
    """


@register(
    "q_config_curation",
    oracle=_curation_oracle(),
    tags=("config", "pipeline", "llm", "curation"),
)
def q_config_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A full training-data curation pipeline assembled ENTIRELY from a
    kawad-style JSON config (reference README.md:164-299): quality gate
    (threshold filter) → deterministic PII planting (with_column, plain
    SQL expr in the config) → PII redaction → content fingerprint →
    token count → SQL exact-dedup + per-lang summary. Every curation
    stage is one of the declarative transform types in
    cheetah_spark/config.py:159-215, each bound to the SAME
    single-definition column expression its q_llm_* operator uses —
    the driver row therefore certifies the config surface end-to-end,
    not a parallel implementation. (minhash_sig, the fifth config
    transform, is exercised by tests/test_config.py — its
    array-of-longs output has no compact SQL summary.)

    The fp_checksum aggregates a 56-bit hash of each kept doc's
    REDACTED normalized text, so a single mis-redacted byte anywhere
    in the corpus flips the driver hash. All stages are map-only
    Column expressions until the end — the plan is scan → codegen →
    fingerprint-window shuffle → per-lang partial aggregate, identical
    to what the hand-built equivalents produce."""
    cfg = {
        "source": {"type": "parquet", "path": f"{sf_dir}/documents.parquet"},
        "transforms": [
            {"type": "quality_score", "column": "text", "as": "quality", "threshold": 0.5},
            {"type": "with_column", "name": "text", "expr": _PLANT_EXPR},
            {"type": "pii_redact", "column": "text"},
            {"type": "content_fp", "column": "text", "as": "content_fp"},
            {"type": "token_count", "column": "text", "as": "n_tokens"},
            {"type": "sql", "query": _CUR_AGG, "view": "__input__"},
        ],
    }
    return pipeline_from_config(cfg).dataframe(spark)


def _stream_curation_oracle() -> str:
    """Batch mirror of the STREAMING config chain: the complete-mode
    aggregate over the bounded replay equals the batch aggregate over
    the table."""
    from cheetah_spark.queries.curation import _PII_EMAIL_RE, _PII_PHONE_RE
    from cheetah_spark.queries.llm import _QW

    toks = f"regexp_extract_all(lower(text), '{_W_TOK}')"
    return f"""
        WITH q AS (
            SELECT doc_id, lang, text,
                   ({_QW["len"]} * least(len({toks}), 200)::DOUBLE / 200
                    + {_QW["uniq"]} * (len(list_distinct({toks}))::DOUBLE
                        / greatest(len({toks}), 1))
                    + {_QW["alpha"]} * (1.0
                        - length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE
                            / greatest(length(text), 1)
                        - length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))::DOUBLE
                            / greatest(length(text), 1))) AS quality
            FROM documents
        ),
        red AS (
            SELECT doc_id, lang,
                   regexp_replace(regexp_replace(
                       CASE WHEN doc_id % 3 = 0
                            THEN text || ' contact u' || CAST(doc_id AS VARCHAR)
                                 || '@mail.example.com call 555-'
                                 || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                            ELSE text END,
                       '{_PII_EMAIL_RE}', '<EMAIL>', 'g'),
                       '{_PII_PHONE_RE}', '<PHONE>', 'g') AS rt
            FROM q WHERE quality >= 0.5
        )
        SELECT lang,
               COUNT(*)::BIGINT AS n_docs,
               CAST(SUM(len(regexp_extract_all(lower(rt), '{_W_TOK}'))) AS BIGINT)
                   AS total_tokens,
               CAST(SUM(CAST('0x' || substr(
                        md5(trim(regexp_replace(lower(rt), '\\s+', ' ', 'g'))), 1, 14)
                    AS BIGINT) % 1000003) AS BIGINT) AS fp_checksum
        FROM red GROUP BY lang
    """


# Streaming tail of the config chain: a streaming-safe per-lang
# aggregate (no window, no COUNT DISTINCT — those are batch-only);
# the per-arrival fp-hash sum pins every redacted text byte exactly
# like the batch variant.
_SCUR_AGG = """
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(CAST(conv(substr(content_fp, 1, 14), 16, 10) AS BIGINT)
                    % 1000003) AS BIGINT) AS fp_checksum
    FROM __input__ GROUP BY lang
"""


@register(
    "s_config_curation",
    oracle=_stream_curation_oracle(),
    tags=("config", "pipeline", "llm", "curation", "streaming"),
)
def s_config_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME declarative curation transforms running as a REAL
    StreamingQuery — certifying config.py's claim that every curation
    binding is map-only and therefore streaming-safe. The JSON config
    differs from q_config_curation only in ``"streaming": true`` on
    the source block (pointed at the documents replay feed) and a
    streaming-safe aggregate tail (per-lang counts/sums in complete
    mode instead of the batch window dedup): quality gate → PII plant
    → redact → content fingerprint → token count all execute inside
    micro-batches unchanged — the single-definition expressions, one
    more execution mode.

    The config assembles the streaming source + transform plan
    (pipeline_from_config); the bounded-replay conformance harness
    (run_stream_to_completion, complete mode) drives it and the
    DuckDB oracle recomputes the whole chain in batch — complete-mode
    aggregation over a fully-drained bounded stream must equal the
    batch aggregate, hash-exact down to every redacted byte
    (fp_checksum)."""
    from cheetah_spark.queries.streams import scoped_state_partitions
    from cheetah_spark.streaming import documents_stream_dir, run_stream_to_completion

    src_dir = documents_stream_dir(spark, sf_dir)
    cfg = {
        "source": {
            "type": "parquet",
            "path": src_dir,
            "streaming": True,
            "max_files_per_trigger": 2,
        },
        "transforms": [
            # fan each micro-batch out to every core BEFORE the regex
            # chain: the file stream admits 2 single-row-group files
            # per trigger = 2 scan partitions, which starves the map
            # chain on a wide cluster (the s_llm_minhash_dedup r9
            # finding, SCALE.md) — row placement is agg-irrelevant
            {"type": "repartition"},
            {"type": "quality_score", "column": "text", "as": "quality", "threshold": 0.5},
            {"type": "with_column", "name": "text", "expr": _PLANT_EXPR},
            {"type": "pii_redact", "column": "text"},
            {"type": "content_fp", "column": "text", "as": "content_fp"},
            {"type": "token_count", "column": "text", "as": "n_tokens"},
            {"type": "sql", "query": _SCUR_AGG, "view": "__input__"},
        ],
    }
    stream = pipeline_from_config(cfg).dataframe(spark)
    assert stream.isStreaming
    with scoped_state_partitions(spark):
        out = run_stream_to_completion(stream, lambda df: df, output_mode="complete")
    return out.select("lang", "n_docs", "total_tokens", "fp_checksum")

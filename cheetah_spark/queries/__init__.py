"""Import all query modules for their @register side effects, and fix
the order the registry presents queries to the verification driver.

The driver's CORRECTNESS check covers the first 50 entries of
``queries()`` in iteration order (round-1 finding: exactly the first 50
registration-order names got rows; windows/surface/timeseries/streams
registered after slot 50 and were never checked). ``CHECK_FIRST`` below
is the rotation schedule: operators with no driver row yet, fixed or
rewritten operators, and operators new this round come first so every
operator accumulates a driver correctness row across rounds; names not
listed keep registration order after the listed ones.
"""

from cheetah_spark.queries import advanced  # noqa: F401
from cheetah_spark.queries import analytics  # noqa: F401
from cheetah_spark.queries import curation  # noqa: F401
from cheetah_spark.queries import declarative  # noqa: F401
from cheetah_spark.queries import mqtt  # noqa: F401
from cheetah_spark.queries import llm  # noqa: F401
from cheetah_spark.queries import multimodal  # noqa: F401
from cheetah_spark.queries import relational  # noqa: F401
from cheetah_spark.queries import scalars  # noqa: F401
from cheetah_spark.queries import streams  # noqa: F401
from cheetah_spark.queries import surface  # noqa: F401
from cheetah_spark.queries import timeseries  # noqa: F401
from cheetah_spark.queries import windows  # noqa: F401
from cheetah_spark.queries import xmlio  # noqa: F401

# Round-2 window: 20 operators with no round-1 driver row, then the 3
# round-1 hash-fails (fixed), then the de-quadratified rewrites, then
# operators new this round, then round-1-green entries to re-confirm.
# Round-1-green relational/scalar basics rotate into the tail (they
# keep their r01 rows); flip this list next round to cover them again.
CHECK_FIRST = [
    # never driver-checked in round 1 (registered past the 50-cap)
    "q_window_rank",
    "q_window_analytic",
    "q_window_frame_running",
    "q_exact_percentile",
    "q_approx_quantile_cd",
    "q_scan_csv",
    "q_scan_ndjson",
    "q_window_range_frame",
    "q_window_ntile",
    "q_null_semantics",
    "q_conditional_agg",
    "q_sql_subqueries",
    "q_time_window_tumbling",
    "q_time_window_sliding",
    "q_session_window",
    "q_hypertable_rollup",
    "s_stream_dedup",
    "s_stream_watermark_late",
    "s_stream_batcher",
    "s_stream_stateful_counter",
    # round-1 hash fails, fixed this round
    "q_stats_moments",
    "q_llm_text_stats",
    "q_llm_dedup_pipeline",
    # rewritten this round (banded candidate generation)
    "q_llm_embed_dedup",
    "q_llm_ngram_jaccard",
    # new this round
    "q_deser_xml",
    "q_config_pipeline",
    "q_mqtt_envelope",
    "q_llm_sample_stratified",
    "q_llm_pack_sequences",
    "q_llm_embed_quantize",
    "s_stream_stream_join",
    "q_llm_dup_clusters",
    "q_llm_decontaminate",
    "q_llm_tfidf_topterms",
    "q_llm_repetition",
    "q_llm_chunk_windows",
    "q_timeseries_gapfill",
    "q_timeseries_m4",
    "q_latest_by_key",
    "q_events_funnel",
    "q_llm_pii_redact",
    "q_events_retention",
    "q_timeseries_rate",
    "q_approx_distinct_hll",
    "q_llm_span_dedup",
    "q_llm_vocab_coverage",
    "q_llm_shuffle_shards",
    "q_sec_cidr_match",
    "q_sec_anomaly_zscore",
]

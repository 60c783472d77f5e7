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
from cheetah_spark.queries import formats  # noqa: F401
from cheetah_spark.queries import mqtt  # noqa: F401
from cheetah_spark.queries import llm  # noqa: F401
from cheetah_spark.queries import multimodal  # noqa: F401
from cheetah_spark.queries import regression  # noqa: F401
from cheetah_spark.queries import relational  # noqa: F401
from cheetah_spark.queries import scalars  # noqa: F401
from cheetah_spark.queries import streams  # noqa: F401
from cheetah_spark.queries import surface  # noqa: F401
from cheetah_spark.queries import timeseries  # noqa: F401
from cheetah_spark.queries import tokenizer  # noqa: F401
from cheetah_spark.queries import windows  # noqa: F401
from cheetah_spark.queries import xmlio  # noqa: F401

# Round-5 window: queries whose implementation changed this round
# (anchor-off-hot-path rewrite of the ANN contracts + quantile-CD, the
# real-codec multimodal decode, and the live-transport replay-window
# semantics), then the 29 queries whose latest green row dates from
# round 2 (VERDICT r4 item 3: shared helpers churned under their
# evidence — rotate the whole r2 cohort in), then the 8 r3-row holders
# rotated out of the r4 window, then the oldest remaining r3 rows as
# filler. Everything r4-green and unchanged rotates to the tail.
CHECK_FIRST = [
    # new this round: no driver row yet
    "q_llm_bpe_encode",
    "q_llm_ann_ivfpq",
    "s_llm_minhash_dedup",
    # changed this round: single-pass ANN contracts over persisted
    # exact anchors; quantile-CD anchor split; real PNG/WAV decode;
    # adaptive SemDeDup-K / embed-block layout; simhash pre-filter
    "q_llm_ann_lsh",
    "q_llm_ann_ivf",
    "q_llm_ann_pq",
    "q_approx_quantile_cd",
    "q_multimodal_decode",
    "q_multimodal_codec_roundtrip",
    "q_llm_similarity_topk",
    "q_llm_semdedup",
    "q_llm_simhash_dedup",
    # r2-stale cohort: latest green row predates the r3/r4 helper churn
    "q_approx_distinct_hll",
    "q_conditional_agg",
    "q_deser_xml",
    "q_exact_percentile",
    "q_llm_chunk_windows",
    "q_llm_decontaminate",
    "q_llm_dedup_pipeline",
    "q_llm_embed_dedup",
    "q_llm_embed_quantize",
    "q_llm_ngram_jaccard",
    "q_llm_pack_sequences",
    "q_llm_pii_redact",
    "q_llm_repetition",
    "q_llm_sample_stratified",
    "q_llm_shuffle_shards",
    "q_llm_span_dedup",
    "q_llm_text_stats",
    "q_llm_tfidf_topterms",
    "q_llm_vocab_coverage",
    "q_mqtt_envelope",
    "q_null_semantics",
    "q_scan_csv",
    "q_scan_ndjson",
    "q_sql_subqueries",
    "q_stats_moments",
    "q_window_analytic",
    "q_window_frame_running",
    "q_window_ntile",
    "q_window_rank",
    # rotated out of the r4 window (green r3 rows) — back in now;
    # the live transports also carry the new replay-window semantics
    "q_scan_orc",
    "q_udtf_surface",
    "s_stream_stateful_counter",
    "s_stream_static_join",
    "s_stream_identity",
    "s_stream_stream_join",
    "s_stream_dedup",
    "s_mqtt_live",
    "s_eventlog_live",
    # oldest remaining r3 row as filler to 50
]

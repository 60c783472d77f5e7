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
from cheetah_spark.queries import journald  # noqa: F401
from cheetah_spark.queries import kafka  # noqa: F401
from cheetah_spark.queries import mqtt  # noqa: F401
from cheetah_spark.queries import llm  # noqa: F401
from cheetah_spark.queries import multimodal  # noqa: F401
from cheetah_spark.queries import regression  # noqa: F401
from cheetah_spark.queries import relational  # noqa: F401
from cheetah_spark.queries import scalars  # noqa: F401
from cheetah_spark.queries import streams  # noqa: F401
from cheetah_spark.queries import surface  # noqa: F401
from cheetah_spark.queries import syslog  # noqa: F401
from cheetah_spark.queries import timeseries  # noqa: F401
from cheetah_spark.queries import tokenizer  # noqa: F401
from cheetah_spark.queries import webhook  # noqa: F401
from cheetah_spark.queries import windows  # noqa: F401
from cheetah_spark.queries import xmlio  # noqa: F401

# STANDING POLICY (round-6 verdict item #2): CHECK_FIRST is rebuilt
# every round as (1) operators new or changed this round — their
# latest driver row predates the code — then (2) the stale cohort,
# oldest latest-row first, so no query's most recent driver evidence
# ever ages past ~3 rounds (50-query window / 140 queries ≈ 2.8-round
# full rotation when nothing changes).
#
# Round-8 window: 8 new (syslog/journald parse + live, webhook batch +
# live, dedup_keep, unigram tokenizer) + 2 changed (span_trim's
# checksum reduced back to BIGINT, dup_clusters rerouted through
# rep-collapse) + the 2 r4-latest stragglers that overflowed the r7
# window + the 46-query r5-latest cohort = 58 names for 50 slots: the
# 8 r5 tail names (the s_stream_* conformance family, unchanged since
# r5 and re-verified by pytest + the local drive every round) roll to
# the r9 rotation head — new-op evidence beats one-round-earlier
# staleness.
CHECK_FIRST = [
    # new this round: no driver row yet (inserted as they land)
    "q_syslog_parse",
    "s_syslog_live",
    "q_journald_parse",
    "s_journald_live",
    "q_webhook_sink_batches",
    "s_webhook_live",
    "q_llm_dedup_keep",
    "q_llm_unigram_tokenizer",
    "q_llm_unigram_encode",
    # changed this round: evidence predates the change
    "q_llm_span_trim",
    "q_llm_dup_clusters",
    # r4-stale stragglers (slots 51-52 of the r7 window)
    "q_udf_surface",
    "q_union_fanin",
    # r5-stale cohort (latest driver row: round 5), oldest-first policy
    "q_approx_distinct_hll",
    "q_approx_quantile_cd",
    "q_conditional_agg",
    "q_deser_xml",
    "q_exact_percentile",
    "q_llm_ann_ivf",
    "q_llm_ann_ivfpq",
    "q_llm_ann_lsh",
    "q_llm_ann_pq",
    "q_llm_chunk_windows",
    "q_llm_decontaminate",
    "q_llm_dedup_pipeline",
    "q_llm_embed_quantize",
    "q_llm_ngram_jaccard",
    "q_llm_pack_sequences",
    "q_llm_pii_redact",
    "q_llm_repetition",
    "q_llm_sample_stratified",
    "q_llm_semdedup",
    "q_llm_shuffle_shards",
    "q_llm_simhash_dedup",
    "q_llm_similarity_topk",
    "q_llm_span_dedup",
    "q_llm_text_stats",
    "q_llm_tfidf_topterms",
    "q_llm_vocab_coverage",
    "q_mqtt_envelope",
    "q_null_semantics",
    "q_scan_csv",
    "q_scan_ndjson",
    "q_scan_orc",
    "q_sql_subqueries",
    "q_stats_moments",
    "q_udtf_surface",
    "q_window_analytic",
    "q_window_frame_running",
    "q_window_ntile",
    "q_window_rank",
    "s_eventlog_live",
    "s_llm_minhash_dedup",
    "s_mqtt_live",
    "s_stream_dedup",
    "s_stream_identity",
    "s_stream_stateful_counter",
    "s_stream_static_join",
    "s_stream_stream_join",
]

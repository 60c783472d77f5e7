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
from cheetah_spark.queries import amqp  # noqa: F401
from cheetah_spark.queries import analytics  # noqa: F401
from cheetah_spark.queries import curation  # noqa: F401
from cheetah_spark.queries import declarative  # noqa: F401
from cheetah_spark.queries import formats  # noqa: F401
from cheetah_spark.queries import journald  # noqa: F401
from cheetah_spark.queries import kafka  # noqa: F401
from cheetah_spark.queries import kinesis  # noqa: F401
from cheetah_spark.queries import mqtt  # noqa: F401
from cheetah_spark.queries import nats  # noqa: F401
from cheetah_spark.queries import nsq  # noqa: F401
from cheetah_spark.queries import pubsub  # noqa: F401
from cheetah_spark.queries import redis  # noqa: F401
from cheetah_spark.queries import llm  # noqa: F401
from cheetah_spark.queries import memcache  # noqa: F401
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
from cheetah_spark.queries import zmq  # noqa: F401

# STANDING POLICY (round-6 verdict item #2): CHECK_FIRST is rebuilt
# every round as (1) operators new or changed this round — their
# latest driver row predates the code — then (2) the stale cohort,
# oldest latest-row first, so no query's most recent driver evidence
# ever ages past ~3 rounds (50-query window / 157 queries ≈ 3.1-round
# full rotation when nothing changes).
#
# Round-10 window: 2 new (NATS envelope/replay, wishlist #3) + the
# ops changed this round (redis replay now chunk-pumped multi-batch;
# plus any operator touched by the r10 verdict items — ann_lsh
# fixed-|Q|, bloom-decontaminate spooling, embed-pca ingest, syslog
# failure counters — appended as they land) + the r6-stale cohort
# (latest driver row: round 6 — r9 verdict item #3 names these
# explicitly, flagship q_multiway_join_tpch first) + the oldest
# (r7-latest) names to fill the 50-slot window, alphabetical so the
# roll is deterministic.
CHECK_FIRST = [
    # new this round: no driver row yet
    "q_timeseries_ewma",
    "q_timeseries_ohlc",
    "q_graph_triangles",
    "q_sec_first_seen",
    "s_sec_first_seen",
    "q_llm_knn_classify",
    "q_llm_perplexity_bucket",
    "q_multimodal_phash_dedup",
    "q_multimodal_audio_dedup",
    "q_scan_sqlite",
    "q_window_percent_rank",
    "q_stats_linreg",
    "q_sec_anomaly_mad",
    "q_udaf_surface",
    "s_stream_scd2_lookup",
    "s_timeseries_ohlc",
    "s_sqlite_cdc",
    "q_amqp_envelope",
    "s_amqp_replay",
    "q_pubsub_envelope",
    "s_pubsub_replay",
    "q_kinesis_envelope",
    "s_kinesis_replay",
    "q_nsq_envelope",
    "s_nsq_replay",
    "q_memcache_roundtrip",
    "s_memcache_sink",
    "q_zmq_envelope",
    "s_zmq_replay",
    "q_llm_url_dedup",
    "q_llm_gopher_rules",
    "q_llm_c4_rules",
    "q_llm_line_dedup",
    "s_llm_c4_filter",
    "q_sql_recursive_cte",
    "q_sql_lateral_topn",
    "q_nats_envelope",
    "s_nats_replay",
    "q_llm_ann_lsh_fixedq",
    # changed this round: evidence predates the change
    "s_redis_replay",
    "q_redis_envelope",
    "q_llm_ann_lsh",
    "s_llm_bloom_decontaminate",
    "s_llm_embed_pca",
    "s_syslog_live",
    "q_syslog_parse",
    # r6-stale cohort (r9 verdict item #3). NOTE on the r10 window:
    # the round added 38 NEW operators + 7 changed ones, which fill
    # slots 1-45 — only the first ~5 of this cohort (the flagship and
    # the join family) fit the 50-slot driver window; the remainder
    # heads the r11 rotation. Every operator below still passes the
    # full local DuckDB differential every round (tests/test_oracle.py
    # runs all of them), so staleness here is driver-evidence-only.
    "q_multiway_join_tpch",
    "q_outer_joins",
    "q_scan_project",
    "q_semi_anti_join",
    "q_theta_range_join",
    "q_session_window",
    "q_scalar_datetime",
    "q_scan_binary_files",
    "q_scan_schema_merge",
    "q_scd2_history",
    "q_sec_anomaly_zscore",
    "q_sec_beacon_detect",
    "q_sink_partition_prune",
    "q_llm_unigram_logprob",
    "q_multimodal_codec_roundtrip",
    "q_multimodal_decode",
    "q_multimodal_framesample",
    "q_multimodal_meta",
    "q_multimodal_resize",
    "s_llm_embed_dedup",
    # r10 late additions (registered after the window filled): first
    # driver row lands in r11; local differential covers them now
    "q_llm_sft_format",
    "q_llm_dedup_recall_eval",
    "q_llm_cross_source_dups",
    "s_llm_sft_format",
    "q_sec_impossible_travel",
    "s_sec_impossible_travel",
    # --- slot ~50 boundary: the 29 new/changed r10 names + the 20-name
    # r6-stale cohort fill the driver's window (the r7 tail tops up
    # the last slot); the rest rolls to the r11 rotation head ---
    # r7-stale cohort (oldest remaining), alphabetical
    "q_agg_distinct",
    "q_array_map_ops",
    "q_cube_agg",
    "q_distinct_dedup",
    "q_grouping_sets",
    "q_hash_agg",
    "q_having_filter",
    "q_json_ops",
    "q_llm_ann_bruteforce",
    "q_llm_bpe_train",
    "q_llm_domain_mix",
    "q_llm_entropy_filter",
    "q_llm_exact_dedup",
    "q_llm_fingerprint",
    "q_llm_incremental_dedup",
    "q_llm_kmeans",
    "q_llm_lang_id",
    "q_llm_minhash_dedup",
    "q_llm_quality_regression",
    "q_llm_quality_score",
    "q_llm_token_count",
    "q_llm_weighted_sample",
    "q_llm_winnow_fingerprint",
    "q_pivot_events",
    "q_scalar_conditional",
    "q_scalar_math",
    "q_scalar_string",
    "q_scan_text_lines",
    "q_sec_cidr_match",
    "q_set_ops",
    "q_skew_salted_agg",
    "q_sort_limit_topk",
    "q_sql_interface",
    "q_time_window_sliding",
    "q_time_window_tumbling",
    "q_timeseries_gapfill",
    "q_timeseries_m4",
    "q_timeseries_rate",
    "q_unpivot_events",
    "s_stream_batcher",
    "s_stream_rate",
    "s_stream_session",
    "s_stream_topk_talkers",
    "s_stream_watermark_dropped",
    "s_stream_watermark_late",
]

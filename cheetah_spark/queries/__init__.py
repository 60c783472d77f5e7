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
from cheetah_spark.queries import redis  # noqa: F401
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
# ever ages past ~3 rounds (50-query window / 157 queries ≈ 3.1-round
# full rotation when nothing changes).
#
# Round-9 window: 8 new (kafka envelope/replay, redis envelope/replay,
# batch+streaming PCA, window distinct-count, dataset card)
# + 6 changed (simhash_dedup rerouted through rep-collapse;
# unigram_tokenizer's full_coverage now measured; dup_clusters'
# rep-components persist discipline; the three seq-window live
# sources refactored onto the shared base) + the 8 remaining
# r5-latest names that rolled out of the r8 window (r8 verdict item
# #4) + the r6-latest cohort oldest-first. 8+8+8=24 fixed slots leave
# 26 for the r6 cohort; the tail names (alphabetical order, so the
# roll is deterministic) move to the r10 head.
CHECK_FIRST = [
    # new this round: no driver row yet
    "q_kafka_envelope",
    "s_kafka_replay",
    "q_llm_embed_pca",
    "s_llm_embed_pca",
    "q_window_distinct_count",
    "q_llm_dataset_card",
    "q_redis_envelope",
    "s_redis_replay",
    # changed this round: evidence predates the change
    "q_llm_simhash_dedup",
    "q_llm_unigram_tokenizer",
    "q_llm_dup_clusters",
    "s_syslog_live",
    "s_journald_live",
    "s_mqtt_live",
    # changed this round (micro-batch fan-out; latest rows r6/r7)
    "s_config_curation",
    "s_llm_bloom_decontaminate",
    # r5-stale cohort (rolled out of the r8 window; s_mqtt_live above)
    "q_window_rank",
    "s_eventlog_live",
    "s_llm_minhash_dedup",
    "s_stream_dedup",
    "s_stream_identity",
    "s_stream_stateful_counter",
    "s_stream_static_join",
    "s_stream_stream_join",
    # r6-stale cohort (latest driver row: round 6), alphabetical
    "q_approx_heavy_cmsketch",
    "q_arrow_surface",
    "q_asof_join",
    "q_broadcast_join",
    "q_bucketed_join",
    "q_config_curation",
    "q_config_pipeline",
    "q_deser_json",
    "q_events_funnel",
    "q_events_histogram",
    "q_events_path_topk",
    "q_events_retention",
    "q_events_transitions",
    "q_filter_pred",
    "q_flatmap_explode",
    "q_graph_pagerank",
    "q_hash_join_inner",
    "q_hypertable_rollup",
    "q_latest_by_key",
    "q_llm_bigram_logprob",
    "q_llm_bloom_decontaminate",
    "q_llm_bpe_encode",
    "q_llm_dsir_select",
    "q_llm_dup_clusters_wide",
    "q_llm_embed_dedup",
    "q_llm_simhash_wide",
    # --- slot 50 boundary is here when every name above registers;
    # the r6 tail below rolls to the r10 rotation head ---
    "q_llm_unigram_logprob",
    "q_multimodal_codec_roundtrip",
    "q_multimodal_decode",
    "q_multimodal_framesample",
    "q_multimodal_resize",
    "q_multiway_join_tpch",
    "q_outer_joins",
    "q_scalar_datetime",
    "q_scan_binary_files",
    "q_scan_project",
    "q_scan_schema_merge",
    "q_scd2_history",
    "q_sec_anomaly_zscore",
    "q_sec_beacon_detect",
    "q_semi_anti_join",
    "q_session_window",
    "q_sink_partition_prune",
    "q_theta_range_join",
    "s_llm_embed_dedup",
]

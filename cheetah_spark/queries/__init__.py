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

# Round-6 window: the new/changed operators first (streaming session
# windows, DSIR selection, weighted sampling, wide-fingerprint
# SimHash, streaming embed dedup, refactored batch embed dedup, the
# config-chain surface, and the BPE-encode warm-path fix), then the
# 37-query cohort whose latest driver row still dates from round 3
# (VERDICT r5 item 2). 19 new/changed + the first 31 stale fill the
# driver's 50-query window; the 6 stale names that overflow it keep
# their place at the head of the r7 rotation. Everything r4/r5-green
# and unchanged rotates to the tail.
CHECK_FIRST = [
    # new or changed this round: no driver row yet / evidence predates
    # the change
    "s_stream_session",
    "q_llm_dsir_select",
    "q_llm_weighted_sample",
    "q_llm_span_trim",
    "s_stream_watermark_dropped",
    "q_graph_pagerank",
    "q_llm_simhash_wide",
    "s_llm_embed_dedup",
    "q_config_curation",
    "s_config_curation",
    "q_llm_bigram_logprob",
    "q_multimodal_resize",
    "q_multimodal_framesample",
    "q_llm_dup_clusters_wide",
    "q_llm_embed_dedup",
    "q_config_pipeline",
    "q_llm_bpe_encode",
    "q_multimodal_decode",
    "q_multimodal_codec_roundtrip",
    # r3-stale cohort: every query whose latest driver row is r3
    "q_approx_heavy_cmsketch",
    "q_arrow_surface",
    "q_asof_join",
    "q_broadcast_join",
    "q_bucketed_join",
    "q_deser_json",
    "q_events_funnel",
    "q_events_histogram",
    "q_events_path_topk",
    "q_events_retention",
    "q_events_transitions",
    "q_filter_pred",
    "q_flatmap_explode",
    "q_hash_join_inner",
    "q_hypertable_rollup",
    "q_latest_by_key",
    "q_llm_bloom_decontaminate",
    "q_llm_unigram_logprob",
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
    "q_time_window_sliding",
    "q_time_window_tumbling",
    "q_timeseries_gapfill",
    "q_timeseries_m4",
    "q_timeseries_rate",
    "q_window_range_frame",
]

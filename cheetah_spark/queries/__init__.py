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
from cheetah_spark.queries import relational  # noqa: F401
from cheetah_spark.queries import scalars  # noqa: F401
from cheetah_spark.queries import streams  # noqa: F401
from cheetah_spark.queries import surface  # noqa: F401
from cheetah_spark.queries import timeseries  # noqa: F401
from cheetah_spark.queries import windows  # noqa: F401
from cheetah_spark.queries import xmlio  # noqa: F401

# Round-3 window: the four queries the TIMESTAMP_NTZ fixture regression
# broke in round 2 (repaired via catalog.ensure_instant_reads), then the
# operators new this round, then every query whose timestamp semantics
# flipped NTZ→instant this round (r2-green rows were recorded under NTZ
# reads; re-confirm under the instant contract), then the round-1-only
# entries unchecked since r1. r2-green hash-only queries (llm/curation
# families) rotate to the tail and keep their r02 rows.
CHECK_FIRST = [
    # broken by the r2 TIMESTAMP_NTZ fixtures, fixed this round
    "q_events_retention",
    "s_stream_dedup",
    "s_stream_watermark_late",
    "s_stream_stream_join",
    # new this round
    "q_scan_orc",
    "q_sink_partition_prune",
    "q_llm_bloom_decontaminate",
    "q_llm_unigram_logprob",
    "q_events_path_topk",
    "q_scan_schema_merge",
    "q_scan_binary_files",
    "q_udtf_surface",
    "q_events_histogram",
    "s_stream_rate",
    "q_llm_ann_pq",
    "q_llm_kmeans",
    "q_approx_heavy_cmsketch",
    "q_sec_beacon_detect",
    "q_scd2_history",
    "q_events_transitions",
    "q_llm_semdedup",
    "q_bucketed_join",
    "s_stream_static_join",
    "q_arrow_surface",
    # timestamp-reading queries: re-confirm under instant (LTZ) reads
    "q_time_window_tumbling",
    "q_time_window_sliding",
    "q_session_window",
    "q_hypertable_rollup",
    "q_timeseries_gapfill",
    "q_timeseries_m4",
    "q_timeseries_rate",
    "q_latest_by_key",
    "q_events_funnel",
    "q_scalar_datetime",
    "q_asof_join",
    "q_window_range_frame",
    "q_sec_anomaly_zscore",
    "s_stream_identity",
    "s_stream_batcher",
    "s_stream_stateful_counter",
    # round-1-only rows: unchecked since r1, refresh
    "q_scan_project",
    "q_filter_pred",
    "q_deser_json",
    "q_flatmap_explode",
    "q_hash_join_inner",
    "q_broadcast_join",
    "q_outer_joins",
    "q_semi_anti_join",
    "q_theta_range_join",
    "q_multiway_join_tpch",
]

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

# STANDING POLICY (round-6 verdict item #2): CHECK_FIRST is rebuilt
# every round as (1) operators new or changed this round — their
# latest driver row predates the code — then (2) the stale cohort,
# oldest latest-row first, so no query's most recent driver evidence
# ever ages past ~3 rounds (50-query window / 140 queries ≈ 2.8-round
# full rotation when nothing changes).
#
# Round-7 window: 4 changed (span_trim's checksum went DECIMAL(38,0),
# weighted_sample gained the zero-weight guard, session/dropped ride
# the extracted staged_replay helper) + the full 44-query stale cohort
# (6 r3 rows + 38 r4 rows — VERDICT r6 item #2) = 48 of 50 slots;
# operators added later this round are inserted at the head as they
# land. After r7's driver window every latest row is r5+.
CHECK_FIRST = [
    # new this round: no driver row yet
    "s_llm_bloom_decontaminate",
    "q_llm_entropy_filter",
    "q_llm_winnow_fingerprint",
    "s_stream_topk_talkers",
    # changed this round: evidence predates the change
    "q_llm_span_trim",
    "q_llm_weighted_sample",
    "s_stream_session",
    "s_stream_watermark_dropped",
    # r3-stale cohort (latest driver row: round 3)
    "q_time_window_sliding",
    "q_time_window_tumbling",
    "q_timeseries_gapfill",
    "q_timeseries_m4",
    "q_timeseries_rate",
    "q_window_range_frame",
    # r4-stale cohort (latest driver row: round 4)
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
    "q_llm_dup_clusters",
    "q_llm_exact_dedup",
    "q_llm_fingerprint",
    "q_llm_incremental_dedup",
    "q_llm_kmeans",
    "q_llm_lang_id",
    "q_llm_minhash_dedup",
    "q_llm_quality_regression",
    "q_llm_quality_score",
    "q_llm_token_count",
    "q_multimodal_meta",
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
    "q_unpivot_events",
    "s_stream_batcher",
    "s_stream_rate",
    "s_stream_watermark_late",
    # overflow: 4 new + 4 changed + 44 stale = 52 > the 50-slot window;
    # the two most change-inert r4 names (scalar-UDF parity and the
    # plain unionByName fan-in) sit at slots 51-52 and head the r8
    # rotation
    "q_udf_surface",
    "q_union_fanin",
]

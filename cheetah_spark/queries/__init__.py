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

# Round-4 window: the 32 queries whose only green row is from round 1
# (recorded BEFORE the NTZ→instant timestamp migration and the
# ensure_instant_reads rewiring — their code paths changed under their
# evidence, VERDICT r3 item 1), then every query whose semantics or
# implementation changed this round, then the oldest r2 rows as filler.
# Queries with green r3 rows rotate to the tail.
CHECK_FIRST = [
    # new this round: live-transport streaming queries + mixture op,
    # no driver row yet
    "s_mqtt_live",
    "s_eventlog_live",
    "q_llm_domain_mix",
    "q_multimodal_codec_roundtrip",
    "q_llm_bpe_train",
    "q_llm_incremental_dedup",
    "q_skew_salted_agg",
    "q_llm_quality_regression",
    # r1-stale: unchecked since round 1, refresh all 32
    "q_agg_distinct",
    "q_array_map_ops",
    "q_cube_agg",
    "q_distinct_dedup",
    "q_grouping_sets",
    "q_hash_agg",
    "q_having_filter",
    "q_json_ops",
    "q_llm_exact_dedup",
    "q_llm_ann_bruteforce",
    "q_llm_ann_ivf",
    "q_llm_ann_lsh",
    "q_llm_fingerprint",
    "q_llm_lang_id",
    "q_llm_minhash_dedup",
    "q_llm_quality_score",
    "q_llm_simhash_dedup",
    "q_llm_similarity_topk",
    "q_llm_token_count",
    "q_multimodal_decode",
    "q_multimodal_meta",
    "q_pivot_events",
    "q_scalar_conditional",
    "q_scalar_math",
    "q_scalar_string",
    "q_scan_text_lines",
    "q_set_ops",
    "q_sort_limit_topk",
    "q_sql_interface",
    "q_udf_surface",
    "q_union_fanin",
    "q_unpivot_events",
    # changed this round (fixes / new oracles / rewrites / the replay
    # admission-order fix touches every streaming query)
    "q_llm_ann_pq",
    "q_llm_semdedup",
    "s_stream_rate",
    "q_sec_cidr_match",
    "q_llm_kmeans",
    "s_stream_batcher",
    "q_llm_dup_clusters",
    "q_config_pipeline",
    "q_approx_quantile_cd",
    "s_stream_watermark_late",
    # (q_approx_distinct_hll / q_scan_orc / q_udtf_surface /
    # s_stream_stateful_counter /
    # s_stream_static_join / s_stream_identity / s_stream_stream_join /
    # s_stream_dedup rotated out to fit the 50-slot window — all hold
    # green r3 rows)
]

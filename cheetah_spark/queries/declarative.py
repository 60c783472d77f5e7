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

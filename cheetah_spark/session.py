"""SparkSession bootstrap.

Local test posture (local[N], single JVM) with the same declarative plan
the engine would run on a 1000-executor cluster: AQE on (runtime join
re-sizing + skew-join splitting), UTC session timezone (oracle parity),
Arrow enabled for the Pandas-UDF slow path.

Scale notes (100 TB posture):
- ``spark.sql.shuffle.partitions`` here is sized for local cores; on a
  cluster it is superseded by AQE coalescing
  (``spark.sql.adaptive.coalescePartitions.enabled``) which right-sizes
  post-shuffle partitions from runtime statistics.
- ``spark.sql.adaptive.skewJoin.enabled`` splits skewed shuffle
  partitions at join time — the salting fallback in
  :mod:`cheetah_spark.functions.skew` is for pre-AQE planning only.
- Broadcast threshold is left at default (10 MB); dimension tables
  (region/nation/supplier at TPC-H shape) stay broadcast-able at any SF,
  and the queries additionally hint ``F.broadcast`` where the dimension
  is known-small by construction.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(
    app_name: str = "cheetah_spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the session.

    Parameters mirror the reference's ``Parallelism(n)`` processor option
    (reference processor.go:50-58): worker parallelism there maps to task
    parallelism per partition here.
    """
    cpus = int(cpus or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = int(shuffle_partitions or cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.streaming.stateStore.stateSchemaCheck", "true")
        # events.ts is parquet TIMESTAMP(NANOS) which Spark rejects by
        # default; read as long and convert in catalog.load_table (same
        # ns→µs truncation DuckDB applies when casting).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # naive parquet timestamps (isAdjustedToUTC=false) load as UTC
        # instants, not TIMESTAMP_NTZ — matches DuckDB's epoch()
        # interpretation and keeps withWatermark legal (see
        # catalog.ensure_instant_reads)
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

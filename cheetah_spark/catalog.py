"""Fixture table loading.

The reference has no catalog — schema is whatever the deserializer
yields (reference types.go:152-195). Here the fixtures are parquet with
embedded schema, so loading is a plain columnar scan; Catalyst handles
predicate pushdown / column pruning from the declarative plan.

All fixture tables (TESTDATA.md): one parquet file per table at
``{sf_dir}/{table}.parquet``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions that are small at every scale factor (fixed-size or ~linear
# but tiny) — always broadcast-able in joins.
BROADCAST_DIMS = ("region", "nation", "supplier")

# Tables whose operators are CPU-bound per row (regex tokenization,
# hashing, vector math). The fixtures are single-row-group parquet, so
# the scan is ONE split and Spark would run all that map work on one
# core; an up-front round-robin repartition to cluster parallelism
# costs a sub-MB shuffle and unlocks every core. At production scale
# the scan has thousands of splits and this repartition is a no-op
# cost-wise (still linear, and map-heavy stages want full fan-out).
CPU_HEAVY_TABLES = ("documents", "embeddings")


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def ensure_instant_reads(spark: SparkSession) -> None:
    """Force naive parquet timestamps to load as UTC *instants*.

    The fixture parquet stores ``timestamp[us]`` with
    ``isAdjustedToUTC=false``; Spark 4 reads that as TIMESTAMP_NTZ by
    default, which (a) ``withWatermark`` rejects outright
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE) and (b) cannot be cast to an
    epoch BIGINT. DuckDB reads the same column as a naive timestamp and
    treats it as UTC in ``epoch()``, so the cross-engine contract is
    "stored wall-clock IS UTC". Disabling NTZ inference makes Spark read
    the stored micros as UTC-epoch micros directly — byte-identical to
    DuckDB's interpretation — and pinning the session timezone to UTC
    keeps every wall-clock function (date_trunc/hour/...) aligned.

    Runtime-set (not only in session.py) so every load works on ANY
    session, including the verification driver's vanilla one.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    # older fixture generations used parquet TIMESTAMP(NANOS), which
    # Spark rejects unless read as long (converted in load_table below)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


# Rows-per-partition floors for the CPU-heavy fan-out below. Round-4
# measurement: blanket repartition-to-defaultParallelism cost 5-9× on
# the Python-stage queries at fixture scale (2 000-row embeddings split
# 32 ways → per-task Arrow/scheduling overhead dwarfs the work:
# q_llm_ann_pq 6.5 s → 1.1 s after sizing by rows). Floors are
# per-table because per-row cost differs ~100×: documents feeds
# shingle-exploding JVM regex work (~1 ms/row — minhash, n-gram
# Jaccard, span dedup) so 256 rows ≈ 0.3 s/task; embeddings feeds
# vectorized numpy batches where fragmentation is pure overhead.
# Genuinely large tables hit the defaultParallelism cap (and at 100 TB
# the scan's maxPartitionBytes splits provide the parallelism long
# before this repartition fires).
_ROWS_PER_PARTITION = {"documents": 256, "embeddings": 4096}
_rows_cache: dict[tuple[str, str], int] = {}


def _table_rows(spark: SparkSession, sf_dir: str, name: str) -> int:
    """Row count from parquet footer metadata (cheap, cached)."""
    key = (sf_dir, name)
    n = _rows_cache.get(key)
    if n is None:
        n = spark.read.parquet(table_path(sf_dir, name)).count()
        _rows_cache[key] = n
    return n


def load_table(
    spark: SparkSession, sf_dir: str, name: str, parallelize: bool | None = None
) -> DataFrame:
    ensure_instant_reads(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if parallelize is None:
        parallelize = name in CPU_HEAVY_TABLES
    if parallelize:
        rpp = _ROWS_PER_PARTITION.get(name, 4096)
        want = min(
            spark.sparkContext.defaultParallelism,
            max(1, _table_rows(spark, sf_dir, name) // rpp),
        )
        if df.rdd.getNumPartitions() < want:
            df = df.repartition(want)
    if name == "events":
        # ts is parquet TIMESTAMP(NANOS): read as long nanos (see
        # session.py nanosAsLong) and truncate to µs — identical to
        # DuckDB's ns→µs cast, so oracle comparisons line up.
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        if isinstance(df.schema["ts"].dataType, T.LongType):
            # integer DIV, not /: ns since epoch exceeds 2^53, double
            # division would round the microsecond
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    # Defensive: if the scan was planned before ensure_instant_reads took
    # effect (cached reader state), convert any residual NTZ column to an
    # instant under the UTC session timezone set above.
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, T.TimestampNTZType)]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register temp views so operators are reachable from spark.sql too."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

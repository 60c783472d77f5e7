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


def load_table(
    spark: SparkSession, sf_dir: str, name: str, parallelize: bool | None = None
) -> DataFrame:
    if name == "events":
        # Runtime-set so events load on any session (the verification
        # driver builds its own SparkSession without our session.py).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    if parallelize is None:
        parallelize = name in CPU_HEAVY_TABLES
    if parallelize and df.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism:
        df = df.repartition(spark.sparkContext.defaultParallelism)
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
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register temp views so operators are reachable from spark.sql too."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

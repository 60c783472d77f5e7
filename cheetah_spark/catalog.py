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


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # Runtime-set so events load on any session (the verification
        # driver builds its own SparkSession without our session.py).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
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

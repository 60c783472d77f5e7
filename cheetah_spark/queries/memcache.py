"""Memcache roundtrip semantics (the reference wishlist's "memcache?"
entry, README.md:301-311) — a cache has no queue to replay, so the
hash gate here is the strongest kind: a LIVE roundtrip through a real
loopback memcached (the text protocol on real sockets) that must come
back bit-identical to the relational result the oracle computes. The
per-event-type rollup is materialized into the cache by MemcacheSink
(the serving-layer export path) and read back by MemcacheSource's
keyed multi-get; any protocol, encoding, or partitioning defect
surfaces as a hash mismatch."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cheetah_spark.catalog import load_table
from cheetah_spark.registry import register

# streaming-legal metrics only (count/sum/min/max): the same rollup
# runs as a streaming aggregation in s_memcache_sink, where DISTINCT
# aggregates are not supported by the engine
_ORACLE = """
    SELECT event_type,
           COUNT(*)::BIGINT AS n_events,
           SUM(event_id)::BIGINT AS sum_event_id,
           MIN(event_id)::BIGINT AS min_event_id,
           MAX(event_id)::BIGINT AS max_event_id
    FROM events
    GROUP BY event_type
"""


def _rollup(e: DataFrame) -> DataFrame:
    return e.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum("event_id").cast("bigint").alias("sum_event_id"),
        F.min("event_id").cast("bigint").alias("min_event_id"),
        F.max("event_id").cast("bigint").alias("max_event_id"),
    )


def _parse_back(spark: SparkSession, addr: str, keys: list) -> DataFrame:
    """Keyed read-back through MemcacheSource + JSON value parsing."""
    from cheetah_spark.sources.memcache_live import MemcacheSource

    got = MemcacheSource(addr=addr, keys=tuple(sorted(keys))).read(spark)
    return got.select(
        F.col("key").alias("event_type"),
        F.get_json_object("value", "$.n_events").cast("bigint").alias("n_events"),
        F.get_json_object("value", "$.sum_event_id").cast("bigint").alias("sum_event_id"),
        F.get_json_object("value", "$.min_event_id").cast("bigint").alias("min_event_id"),
        F.get_json_object("value", "$.max_event_id").cast("bigint").alias("max_event_id"),
    )


@register(
    "q_memcache_roundtrip",
    oracle=_ORACLE,
    tags=("memcache", "sink", "source", "live"),
)
def q_memcache_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup → ``set`` per key through a live loopback memcached →
    keyed multi-``get`` back → parse: the returned frame must
    hash-match the plain relational oracle, proving the serving-layer
    export path end-to-end over real sockets (keys here are the
    bounded event-type dimension; the key list the read-back uses is
    exactly that dimension, not a scan)."""
    from cheetah_spark.sources.memcache_live import MemcacheSink, MiniMemcacheServer

    srv = MiniMemcacheServer()
    try:
        e = load_table(spark, sf_dir, "events")
        roll = _rollup(e)
        MemcacheSink(addr=srv.addr, key_col="event_type").write(roll)
        keys = [r.event_type for r in roll.select("event_type").distinct().collect()]
        out = _parse_back(spark, srv.addr, keys)
        # materialize BEFORE the server dies with this frame's lineage
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        srv.close()


@register(
    "s_memcache_sink",
    oracle=_ORACLE,
    tags=("memcache", "streaming", "sink", "live"),
)
def s_memcache_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING materialization path: the same rollup computed as
    a streaming aggregation over micro-batched events, upserted into
    the live loopback cache per batch (update mode — the cache always
    holds the latest state), then read back keyed after the drain. The
    final cache state must hash-match the SAME batch oracle — the
    streaming/batch agreement gate, through a real socket sink."""
    from cheetah_spark.sources.memcache_live import MemcacheSink, MiniMemcacheServer
    from cheetah_spark.streaming import events_stream_dir

    srv = MiniMemcacheServer()
    try:
        src_dir = events_stream_dir(spark, sf_dir)
        stream = (
            spark.readStream.schema(spark.read.parquet(src_dir).schema)
            .option("maxFilesPerTrigger", 8)
            .parquet(src_dir)
        )
        roll = _rollup(stream)
        q = MemcacheSink(addr=srv.addr, key_col="event_type").write(roll)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        keys = [
            r.event_type
            for r in spark.read.parquet(src_dir).select("event_type").distinct().collect()
        ]
        out = _parse_back(spark, srv.addr, keys)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        srv.close()

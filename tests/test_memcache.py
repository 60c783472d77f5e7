"""Memcache connector conformance: the text protocol against the
loopback server over real sockets, sink materialization (batch and
streaming upsert), the keyed distributed multi-get source, honest
rejection of scans/streams, config types, and the live roundtrip hash
gate — the wishlist-"memcache?" counterpart of tests/test_nsq.py."""

from __future__ import annotations

import json

import pytest

from cheetah_spark.sources.memcache_live import (
    MemcacheClient,
    MemcacheSink,
    MemcacheSource,
    MiniMemcacheServer,
)


def test_text_protocol_roundtrip():
    """set/get/gets multi-key/delete/flush_all/version over real
    sockets."""
    srv = MiniMemcacheServer()
    c = MemcacheClient(srv.addr)
    try:
        c.set("k1", "v1")
        c.set("k2", json.dumps({"a": 1}), flags=7)
        assert c.get("k1") == (0, "v1")
        got = c.get_multi(["k1", "k2", "missing"])
        assert got == {"k1": (0, "v1"), "k2": (7, json.dumps({"a": 1}))}
        assert c.delete("k1") is True
        assert c.delete("k1") is False
        assert c.get("k1") is None
        assert c.version().startswith("1.")
        c.flush_all()
        assert srv.key_count() == 0
    finally:
        c.close()
        srv.close()


def test_binary_safe_values():
    """Values containing \\r\\n survive: the size-prefixed data block
    is binary-safe per the protocol."""
    srv = MiniMemcacheServer()
    c = MemcacheClient(srv.addr)
    try:
        tricky = "line1\r\nline2\r\nEND\r\n"
        c.set("k", tricky)
        assert c.get("k") == (0, tricky)
    finally:
        c.close()
        srv.close()


def test_sink_batch_and_source_keyed_read(spark):
    """MemcacheSink sets per partition; MemcacheSource multi-gets a
    key list distributed across partitions; misses drop or surface as
    NULLs per keep_misses."""
    srv = MiniMemcacheServer()
    try:
        df = spark.createDataFrame(
            [(f"k{i}", i, f"v{i}") for i in range(20)], "key string, n int, s string"
        ).repartition(4)
        MemcacheSink(addr=srv.addr).write(df)
        assert srv.key_count() == 20

        got = MemcacheSource(
            addr=srv.addr, keys=tuple(f"k{i}" for i in range(20)), batch_size=6
        ).read(spark)
        rows = {r.key: json.loads(r.value) for r in got.collect()}
        assert len(rows) == 20
        assert rows["k7"] == {"n": 7, "s": "v7"}

        sparse = MemcacheSource(
            addr=srv.addr, keys=("k1", "nope"), keep_misses=True
        ).read(spark)
        by_key = {r.key: r.value for r in sparse.collect()}
        assert json.loads(by_key["k1"])["n"] == 1
        assert by_key["nope"] is None
    finally:
        srv.close()


def test_scan_and_stream_rejected(spark):
    """No key enumeration, no streaming: both fail loudly instead of
    silently returning partial data."""
    with pytest.raises(ValueError, match="key list is required"):
        MemcacheSource(addr="127.0.0.1:11211").read(spark)
    with pytest.raises(ValueError, match="no streaming source"):
        MemcacheSource(addr="127.0.0.1:11211", keys=("k",), streaming=True).read(spark)


def test_sink_streaming_upsert_keeps_latest(spark, tmp_path):
    """A streaming aggregation upserts per micro-batch: after the
    drain the cache holds the LATEST value per key."""
    feed = tmp_path / "feed"
    feed.mkdir()
    (feed / "a.json").write_text(
        "\n".join(json.dumps({"key": f"k{i % 3}", "v": i}) for i in range(9))
    )
    srv = MiniMemcacheServer()
    try:
        from pyspark.sql import functions as F

        stream = spark.readStream.schema("key string, v int").json(str(feed))
        agg = stream.groupBy("key").agg(F.max("v").alias("v_max"))
        q = MemcacheSink(
            addr=srv.addr, key_col="key", checkpoint=str(tmp_path / "ckpt")
        ).write(agg)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        c = MemcacheClient(srv.addr)
        got = {k: json.loads(v) for k, (_f, v) in c.get_multi(["k0", "k1", "k2"]).items()}
        c.close()
        assert got == {"k0": {"v_max": 6}, "k1": {"v_max": 7}, "k2": {"v_max": 8}}
    finally:
        srv.close()


def test_memcache_config_types(spark):
    """{"type":"memcache"} source/sink blocks load."""
    from cheetah_spark.config import build_sink, build_source

    src = build_source(
        {"type": "memcache", "addr": "127.0.0.1:11211", "keys": ["a", "b"], "batchSize": 32}
    )
    assert isinstance(src, MemcacheSource)
    assert src.keys == ("a", "b") and src.batch_size == 32

    sink = build_sink({"type": "memcache", "addr": "127.0.0.1:11211", "key_col": "id"})
    assert isinstance(sink, MemcacheSink)
    assert sink.key_col == "id"


def test_roundtrip_queries_match_oracle_shape(spark, sf_dir):
    """The registered roundtrip queries return the relational rollup
    bit-identically after passing through the live cache."""
    from cheetah_spark.queries.memcache import q_memcache_roundtrip, s_memcache_sink

    from pyspark.sql import functions as F

    from cheetah_spark.catalog import load_table

    e = load_table(spark, sf_dir, "events")
    direct = sorted(
        tuple(r)
        for r in e.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum("event_id").cast("bigint").alias("sum_event_id"),
            F.min("event_id").cast("bigint").alias("min_event_id"),
            F.max("event_id").cast("bigint").alias("max_event_id"),
        )
        .collect()
    )
    assert sorted(tuple(r) for r in q_memcache_roundtrip(spark, sf_dir).collect()) == direct
    assert sorted(tuple(r) for r in s_memcache_sink(spark, sf_dir).collect()) == direct

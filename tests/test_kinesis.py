"""Kinesis connector conformance: the JSON API surface (CreateStream/
DescribeStream/PutRecords/GetShardIterator/GetRecords) against the
loopback service over real HTTP, MD5 shard-routing agreement across
all four implementations (service, replay pump, Catalyst expression,
oracle SQL), iterator semantics, the CURSOR streaming reader
end-to-end including a restart re-fetch from the service,
sink→stream round-trip, and the config types — the wishlist-#6
counterpart of tests/test_pubsub.py."""

from __future__ import annotations

import json
import time
import uuid

import pytest

from cheetah_spark.sources.kinesis_live import (
    KinesisClient,
    KinesisSink,
    KinesisSource,
    MiniKinesisServer,
    _KinesisCursorStreamReader,
    shard_for_key,
    shard_id_str,
)


def _start_to_memory(spark, src):
    name = f"sink_kinesis_{uuid.uuid4().hex[:10]}"
    ckpt = f"/tmp/cheetah_spark_ckpt/{name}"
    q = (
        src.read(spark)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    return q, name


def _await_rows(spark, query, name, n, timeout=60):
    deadline = time.time() + timeout
    while time.time() < deadline:
        query.processAllAvailable()
        got = spark.sql(f"SELECT count(*) c FROM {name}").first().c
        if got >= n:
            return got
        time.sleep(0.3)
    return spark.sql(f"SELECT count(*) c FROM {name}").first().c


def test_put_get_roundtrip_and_iterators():
    """The documented API flow end-to-end over real HTTP: create,
    describe (hash ranges), put with MD5 routing, TRIM_HORIZON /
    LATEST / AT/AFTER_SEQUENCE_NUMBER iterators."""
    srv = MiniKinesisServer()
    c = KinesisClient(srv.addr)
    try:
        c.create_stream("s", 4)
        shards = c.describe_stream("s")
        assert [s["ShardId"] for s in shards] == [shard_id_str(i) for i in range(4)]
        assert int(shards[0]["HashKeyRange"]["StartingHashKey"]) == 0
        assert int(shards[3]["HashKeyRange"]["EndingHashKey"]) == (1 << 128) - 1

        put = c.put_record("s", "k1", "hello")
        assert put["ShardId"] == shard_id_str(shard_for_key("k1", 4))
        c.put_records("s", [("k1", "world"), ("k2", "x")])

        sid = put["ShardId"]
        it = c.get_shard_iterator("s", sid, "TRIM_HORIZON")
        out = c.get_records(it)
        k1_rows = [r for r in out["records"]]
        assert [r[2] for r in k1_rows][:2] == ["hello", "world"]

        # AFTER_SEQUENCE_NUMBER skips the anchor record
        it2 = c.get_shard_iterator("s", sid, "AFTER_SEQUENCE_NUMBER", k1_rows[0][0])
        assert [r[2] for r in c.get_records(it2)["records"]][0] == "world"

        # LATEST sees only what is put afterwards
        it3 = c.get_shard_iterator("s", sid, "LATEST")
        assert c.get_records(it3)["records"] == []
    finally:
        srv.close()


def test_shard_routing_agreement_service_vs_catalyst(spark):
    """The MD5 routing rule computes identically in the loopback
    service, the Python helper, and the Catalyst expression — for
    every shard count the expression supports."""
    from cheetah_spark.sources.kinesis_live import shard_col

    keys = [f"u{i}" for i in range(10)] + ["k1", "k2", "abc"]
    for n in (1, 2, 4, 8, 16):
        srv = MiniKinesisServer()
        c = KinesisClient(srv.addr)
        try:
            c.create_stream("s", n)
            service = {k: c.put_record("s", k, "x")["ShardId"] for k in keys}
        finally:
            srv.close()
        helper = {k: shard_id_str(shard_for_key(k, n)) for k in keys}
        df = spark.createDataFrame([(k,) for k in keys], "partition_key string")
        catalyst = {
            r.partition_key: r.shard
            for r in df.select(
                "partition_key", shard_col("partition_key", n).alias("shard")
            ).collect()
        }
        assert service == helper == catalyst, f"shard_count={n}"


def test_kinesis_live_http_streaming_end_to_end(spark):
    """The full production path: the cheetah-kinesis CURSOR reader
    (per-shard positions as offsets, GetRecords polling in the
    data-source runner over real HTTP) delivers every record put
    AFTER the stream starts."""
    srv = MiniKinesisServer()
    boot = KinesisClient(srv.addr)
    boot.create_stream("live", 4)
    src = KinesisSource(addr=srv.addr, stream="live", transport="http", streaming=True)
    query, name = _start_to_memory(spark, src)
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            query.processAllAvailable()
            if query.lastProgress is not None:
                break
            time.sleep(0.2)
        recs = [(f"u{i % 10}", json.dumps({"n": i})) for i in range(40)]
        boot.put_records("live", recs)
        got = _await_rows(spark, query, name, len(recs))
        assert got == len(recs)
        rows = spark.sql(
            f"SELECT shard_id, partition_key, data FROM {name} "
            "ORDER BY CAST(get_json_object(data, '$.n') AS INT)"
        ).collect()
        assert [json.loads(r.data)["n"] for r in rows] == list(range(40))
        # every row landed on the shard MD5 says it should
        for r in rows:
            assert r.shard_id == shard_id_str(shard_for_key(r.partition_key, 4))
    finally:
        query.stop()
        srv.close()


def test_cursor_reader_restart_refetches_from_service():
    """The distinctive Kinesis property: a RESTARTED reader re-fetches
    a committed window from the service itself (readBetweenOffsets) —
    no local buffer, no loss, no warning."""
    srv = MiniKinesisServer()
    c = KinesisClient(srv.addr)
    try:
        c.create_stream("s", 2)
        c.put_records("s", [(f"k{i}", f"v{i}") for i in range(10)])

        r1 = _KinesisCursorStreamReader({"addr": srv.addr, "stream": "s"})
        start = r1.initialOffset()
        rows1, end = r1.read(start)
        rows1 = sorted(rows1)
        assert len(rows1) == 10

        # a FRESH reader instance (as after a driver restart) replays
        # the exact same window from the service
        r2 = _KinesisCursorStreamReader({"addr": srv.addr, "stream": "s"})
        rows2 = sorted(r2.readBetweenOffsets(start, end))
        assert rows2 == rows1
    finally:
        srv.close()


def test_kinesis_sink_puts_batch(spark):
    """KinesisSink PutRecords per partition over real HTTP; the
    records land on the MD5-routed shards."""
    srv = MiniKinesisServer()
    c = KinesisClient(srv.addr)
    try:
        c.create_stream("out", 4)
        df = spark.createDataFrame(
            [(f"u{i % 5}", json.dumps({"n": i})) for i in range(8)],
            "partition_key string, data string",
        ).coalesce(1)
        KinesisSink(addr=srv.addr, stream="out", batch_size=3).write(df)
        assert srv.record_count("out") == 8
        got = []
        for s in c.describe_stream("out"):
            it = c.get_shard_iterator("out", s["ShardId"], "TRIM_HORIZON")
            got.extend(c.get_records(it)["records"])
        assert sorted(json.loads(d)["n"] for _, _, d in got) == list(range(8))
    finally:
        srv.close()


def test_kinesis_config_types(spark):
    """{"type":"kinesis"} source/sink blocks load with camelCase
    keys."""
    from cheetah_spark.config import build_sink, build_source

    src = build_source(
        {
            "type": "kinesis",
            "addr": "127.0.0.1:4567",
            "stream": "ev",
            "transport": "replay",
            "capturePath": "/tmp/cap",
            "chunkSize": 500,
            "maxRecords": 200,
            "shardCount": 8,
        }
    )
    assert isinstance(src, KinesisSource)
    assert src.capture_path == "/tmp/cap" and src.chunk_size == 500
    assert src.max_records == 200 and src.shard_count == 8

    sink = build_sink(
        {"type": "kinesis", "addr": "127.0.0.1:4567", "stream": "out", "batchSize": 400}
    )
    assert isinstance(sink, KinesisSink)
    assert sink.batch_size == 400


def test_kinesis_batch_http_is_rejected(spark):
    """Batch over the live API would drain through the driver — fail
    loudly naming the Firehose→S3 production path."""
    with pytest.raises(ValueError, match="Firehose"):
        KinesisSource(addr="127.0.0.1:4567", transport="http", streaming=False).read(spark)


def test_kinesis_replay_streaming_matches_batch(spark, sf_dir):
    """Streaming/batch agreement over the recorded capture — the gate
    the driver also checks via the shared oracle."""
    from cheetah_spark.queries.kinesis import q_kinesis_envelope, s_kinesis_replay

    b = sorted(tuple(r) for r in q_kinesis_envelope(spark, sf_dir).collect())
    s = sorted(tuple(r) for r in s_kinesis_replay(spark, sf_dir).collect())
    assert b == s and 1 <= len(b) <= 4  # 10 keys over <=4 shards

"""Redis Streams connector conformance: RESP framing + the loopback
RESP server over real sockets, the streaming source's live XREAD
poller end-to-end, sink↔source round-trip, and the config types —
the wishlist-#2 counterpart of tests/test_kafka.py."""

from __future__ import annotations

import json
import time
import uuid

from cheetah_spark.sources.redis_live import (
    MiniRedisServer,
    RedisClient,
    RedisSource,
    RedisStreamSink,
    resp_encode,
    resp_read,
)


def _start_to_memory(spark, src):
    name = f"sink_redis_{uuid.uuid4().hex[:10]}"
    ckpt = f"/tmp/cheetah_spark_ckpt/{name}"
    spark.conf.set("spark.sql.streaming.stateStore.maintenanceInterval", "3600s")
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


def test_resp_codec_roundtrip_all_types():
    """The RESP2 framing used on the wire: requests are bulk-string
    arrays; every reply type the connector consumes parses back."""
    import io

    assert resp_encode(["XLEN", "s"]) == b"*2\r\n$4\r\nXLEN\r\n$1\r\ns\r\n"
    wire = (
        b"+OK\r\n"
        b":42\r\n"
        b"$6\r\nhe\r\nlo\r\n"  # bulk strings are length-framed: CRLF inside is content
        b"$-1\r\n"
        b"*2\r\n$1\r\na\r\n:7\r\n"
        b"*-1\r\n"
    )
    fh = io.BytesIO(wire)
    assert resp_read(fh) == "OK"
    assert resp_read(fh) == 42
    assert resp_read(fh) == "he\r\nlo"
    assert resp_read(fh) is None
    assert resp_read(fh) == ["a", 7]
    assert resp_read(fh) is None


def test_miniserver_stream_semantics_over_socket():
    """XADD monotonic-id enforcement, XLEN, XRANGE bounds and XREAD
    exclusive-from — against the real loopback server, through the
    real client."""
    srv = MiniRedisServer()
    c = RedisClient(srv.addr)
    try:
        assert c.ping() == "PONG"
        assert c.xadd("s", "100-0", {"k": "v1"}) == "100-0"
        assert c.xadd("s", "100-1", {"k": "v2"}) == "100-1"
        assert c.xadd("s", "200-0", {"k": "v3", "x": "y z"}) == "200-0"
        try:
            c.xadd("s", "150-0", {"k": "late"})
            raise AssertionError("out-of-order XADD must be rejected")
        except RuntimeError as e:
            assert "equal or smaller" in str(e)
        assert c.xlen("s") == 3
        assert [sid for sid, _ in c.xrange("s")] == ["100-0", "100-1", "200-0"]
        assert [sid for sid, _ in c.xrange("s", "100-1", "+")] == ["100-1", "200-0"]
        got = c.xread("s", "100-0")
        assert got[0][0] == "s"
        assert [sid for sid, _ in got[0][1]] == ["100-1", "200-0"]
        assert c.xread("s", "200-0") is None  # tail: null array
    finally:
        c.close()
        srv.close()


def test_redis_live_socket_streaming_end_to_end(spark):
    """The full production path: a loopback RESP server holds a
    stream; the cheetah-redis data source's XREAD poller (running in
    the data-source runner process, connecting over a real TCP
    socket) delivers every entry into the memory sink, fields as the
    canonical sorted-key JSON."""
    srv = MiniRedisServer()
    client = RedisClient(srv.addr)
    entries = [(f"{1000 + i}-0", {"n": str(i), "tag": f"t{i % 3}"}) for i in range(25)]
    for sid, fields in entries:
        client.xadd("live", sid, fields)
    client.close()

    src = RedisSource(addr=srv.addr, stream="live", transport="socket", streaming=True)
    query, name = _start_to_memory(spark, src)
    try:
        got = _await_rows(spark, query, name, len(entries))
        assert got == len(entries)
        rows = spark.sql(f"SELECT stream, id, fields FROM {name} ORDER BY id").collect()
        assert [r.id for r in rows] == [sid for sid, _ in entries]
        assert all(r.stream == "live" for r in rows)
        assert json.loads(rows[0].fields) == {"n": "0", "tag": "t0"}
    finally:
        query.stop()
        srv.close()


def test_miniserver_xadd_auto_id_interleaved():
    """Real-Redis '*' semantics (round-10 advice): auto ids derive from
    the stream's top entry, so interleaving explicit <ms>-<seq> XADDs
    with '*' XADDs always succeeds — the old 0-n counter collided with
    any pre-populated explicit id."""
    srv = MiniRedisServer()
    c = RedisClient(srv.addr)
    try:
        assert c.xadd("mix", "*", {"k": "a"}) == "0-1"  # empty stream
        assert c.xadd("mix", "500-0", {"k": "b"}) == "500-0"
        assert c.xadd("mix", "*", {"k": "c"}) == "500-1"  # top+1
        assert c.xadd("mix", "500-7", {"k": "d"}) == "500-7"
        assert c.xadd("mix", "*", {"k": "e"}) == "500-8"
        assert [sid for sid, _ in c.xrange("mix")] == [
            "0-1",
            "500-0",
            "500-1",
            "500-7",
            "500-8",
        ]
    finally:
        c.close()
        srv.close()


def test_redis_sink_source_roundtrip_socket(spark):
    """RedisStreamSink XADDs per partition over real sockets; the
    batch RedisSource XRANGEs the identical entries back."""
    srv = MiniRedisServer()
    try:
        df = spark.createDataFrame(
            [("rt", f"{500 + i}-0", json.dumps({"i": str(i)}, sort_keys=True)) for i in range(10)],
            "stream string, id string, fields string",
        ).coalesce(1)  # one partition: XADD order must be id order
        RedisStreamSink(addr=srv.addr, transport="socket").write(df)
        back = RedisSource(
            addr=srv.addr, stream="rt", transport="socket", streaming=False
        ).read(spark)
        got = sorted((r.id, r.fields) for r in back.collect())
        assert got == sorted((r.id, r.fields) for r in df.collect())
    finally:
        srv.close()


def test_redis_config_types(spark):
    """{"type":"redis"} source/sink blocks load with camelCase keys."""
    from cheetah_spark.config import build_sink, build_source

    src = build_source(
        {
            "type": "redis",
            "addr": "127.0.0.1:6379",
            "stream": "ev",
            "startID": "0",
            "pollMs": 10,
            "transport": "socket",
        }
    )
    assert isinstance(src, RedisSource)
    assert src.start_id == "0" and src.poll_ms == 10

    sink = build_sink({"type": "redis", "addr": "127.0.0.1:6379", "stream": "out"})
    assert isinstance(sink, RedisStreamSink)


def test_redis_sink_streaming_socket(spark, tmp_path):
    """A STREAMING frame through the socket sink (round-10 advice: the
    sink must branch on isStreaming like every other registry sink) —
    rows XADD'd per micro-batch via foreachBatch land on the loopback
    server; ids are server-assigned ('*' path)."""
    srv = MiniRedisServer()
    try:
        feed = tmp_path / "feed"
        feed.mkdir()
        (feed / "a.json").write_text(
            "\n".join(
                json.dumps({"stream": "sq", "id": f"{900 + i}-0", "fields": "{}"})
                for i in range(6)
            )
        )
        src = (
            spark.readStream.schema("stream string, id string, fields string")
            .option("maxFilesPerTrigger", "1")
            .json(str(feed))
        )
        q = RedisStreamSink(
            addr=srv.addr,
            transport="socket",
            checkpoint=str(tmp_path / "ckpt"),
        ).write(src)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        c = RedisClient(srv.addr)
        try:
            assert [sid for sid, _ in c.xrange("sq")] == [f"{900 + i}-0" for i in range(6)]
        finally:
            c.close()
    finally:
        srv.close()


def test_redis_sink_streaming_replay(spark, tmp_path):
    """The replay-transport streaming branch: capture written via
    writeStream, readable back by the batch replay source."""
    feed = tmp_path / "feed"
    feed.mkdir()
    (feed / "a.json").write_text(
        "\n".join(
            json.dumps(
                {"stream": "cap", "id": f"{700 + i}-0", "fields": json.dumps({"i": str(i)})}
            )
            for i in range(5)
        )
    )
    src = (
        spark.readStream.schema("stream string, id string, fields string")
        .json(str(feed))
    )
    cap_dir = str(tmp_path / "capture")
    q = RedisStreamSink(transport="replay", capture_path=cap_dir).write(src)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    back = RedisSource(
        transport="replay", capture_path=cap_dir, stream="cap", streaming=False
    ).read(spark)
    assert back.count() == 5


def test_redis_replay_streaming_matches_batch(spark, sf_dir):
    """Streaming/batch agreement over the recorded capture — the gate
    the driver also checks via the shared oracle."""
    from cheetah_spark.queries.redis import q_redis_envelope, s_redis_replay

    b = [tuple(r) for r in q_redis_envelope(spark, sf_dir).collect()]
    s = [tuple(r) for r in s_redis_replay(spark, sf_dir).collect()]
    assert b == s and len(b) == 1

"""ZeroMQ connector conformance: the ZMTP 3.0 wire protocol (64-byte
greeting, NULL READY handshake, MORE/LONG/COMMAND frames) between
real loopback peers over real sockets, prefix-subscription semantics
incl. PUB-side filtering and the slow-joiner drop rule, the streaming
source's live SUB listener end-to-end, the PUB-connect→SUB-bind sink
shape, and the config types — the wishlist-"zmq?" counterpart of
tests/test_nsq.py."""

from __future__ import annotations

import json
import time
import uuid

import pytest

from cheetah_spark.sources.zmq_live import (
    ZmqPubConnectSocket,
    ZmqPubSocket,
    ZmqSink,
    ZmqSource,
    ZmqSubBindCollector,
    ZmqSubSocket,
)


def _start_to_memory(spark, src):
    name = f"sink_zmq_{uuid.uuid4().hex[:10]}"
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


def _await(cond, timeout=10):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if cond():
            return True
        time.sleep(0.02)
    return cond()


def test_handshake_pubsub_prefix_filtering():
    """Greeting + READY + subscription over real sockets; the PUB
    delivers only prefix-matching topics to each subscriber."""
    pub = ZmqPubSocket()
    sub_click = ZmqSubSocket(pub.addr, prefix="ev/click/")
    sub_all = ZmqSubSocket(pub.addr, prefix="")
    try:
        assert _await(lambda: pub.subscriber_count() == 2)
        pub.send("ev/click/u1", "a")
        pub.send("ev/view/u1", "b")
        pub.send("ev/click/u2", "c")
        got_all = [sub_all.recv() for _ in range(3)]
        assert [p for _t, p in got_all] == ["a", "b", "c"]
        got_click = [sub_click.recv() for _ in range(2)]
        assert got_click == [("ev/click/u1", "a"), ("ev/click/u2", "c")]
    finally:
        sub_click.close()
        sub_all.close()
        pub.close()


def test_long_frames_roundtrip():
    """Bodies over 255 bytes use the LONG frame encoding and
    reassemble exactly."""
    pub = ZmqPubSocket()
    sub = ZmqSubSocket(pub.addr, prefix="")
    try:
        assert _await(lambda: pub.subscriber_count() == 1)
        big = "x" * 100_000
        pub.send("t", big)
        assert sub.recv() == ("t", big)
    finally:
        sub.close()
        pub.close()


def test_unsubscribe_stops_delivery():
    """The \\x00-prefix unsubscribe message takes effect."""
    pub = ZmqPubSocket()
    sub = ZmqSubSocket(pub.addr, prefix="a/")
    try:
        assert _await(lambda: pub.subscriber_count() == 1)
        pub.send("a/1", "m1")
        assert sub.recv() == ("a/1", "m1")
        # unsubscribe then subscribe to a different prefix
        from cheetah_spark.sources.zmq_live import _frame

        sub._sock.sendall(_frame(b"\x00a/"))
        sub._sock.sendall(_frame(b"\x01b/"))
        assert _await(lambda: pub.subscriber_count() == 1)
        time.sleep(0.2)  # let the PUB process both subscription frames
        pub.send("a/2", "dropped")
        pub.send("b/1", "m2")
        assert sub.recv() == ("b/1", "m2")  # a/2 never delivered
    finally:
        sub.close()
        pub.close()


def test_slow_joiner_drop_rule():
    """A PUB-connect socket drops sends until the peer's subscription
    arrives — the libzmq slow-joiner behavior, surfaced explicitly."""
    collector = ZmqSubBindCollector(prefix="keep/")
    pub = ZmqPubConnectSocket(collector.addr)
    try:
        assert pub.wait_subscribed(10)
        assert pub.send("keep/1", "m1") is True
        assert pub.send("drop/1", "m2") is False  # no matching prefix
        assert _await(lambda: len(collector.snapshot()) == 1)
        assert collector.snapshot() == [("keep/1", "m1")]
    finally:
        pub.close()
        collector.close()


def test_zmq_live_socket_streaming_end_to_end(spark):
    """The full production path: the cheetah-zmq data source's SUB
    listener (running in the data-source runner process, over a real
    ZMTP socket) delivers every message published AFTER the
    subscription into the memory sink."""
    pub = ZmqPubSocket()
    src = ZmqSource(addr=pub.addr, prefix="live/", transport="socket", streaming=True)
    query, name = _start_to_memory(spark, src)
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            query.processAllAvailable()
            if query.lastProgress is not None and pub.subscriber_count() >= 1:
                break
            time.sleep(0.2)
        msgs = [(f"live/t{i % 3}", json.dumps({"n": i})) for i in range(20)]
        for topic, payload in msgs:
            pub.send(topic, payload)
        got = _await_rows(spark, query, name, len(msgs))
        assert got == len(msgs)
        rows = spark.sql(
            f"SELECT topic, payload FROM {name} "
            "ORDER BY CAST(get_json_object(payload, '$.n') AS INT)"
        ).collect()
        assert [(r.topic, r.payload) for r in rows] == msgs
    finally:
        query.stop()
        pub.close()


def test_zmq_sink_publishes_batch(spark):
    """ZmqSink PUB-connects per partition to a bound SUB collector;
    every row arrives (the sink waits out the slow-joiner window)."""
    collector = ZmqSubBindCollector(prefix="")
    try:
        df = spark.createDataFrame(
            [(f"out/s{i % 2}", json.dumps({"i": i})) for i in range(8)],
            "topic string, payload string",
        ).coalesce(1)
        ZmqSink(addr=collector.addr, transport="socket").write(df)
        assert _await(lambda: len(collector.snapshot()) == 8)
        got = sorted(p for _t, p in collector.snapshot())
        assert got == sorted(json.dumps({"i": i}) for i in range(8))
    finally:
        collector.close()


def test_zmq_config_types(spark):
    """{"type":"zmq"} source/sink blocks load with camelCase keys."""
    from cheetah_spark.config import build_sink, build_source

    src = build_source(
        {
            "type": "zmq",
            "addr": "127.0.0.1:5556",
            "prefix": "ev/",
            "transport": "replay",
            "capturePath": "/tmp/cap",
            "chunkSize": 500,
        }
    )
    assert isinstance(src, ZmqSource)
    assert src.capture_path == "/tmp/cap" and src.chunk_size == 500

    sink = build_sink({"type": "zmq", "addr": "127.0.0.1:5556", "topic": "out"})
    assert isinstance(sink, ZmqSink)


def test_zmq_batch_socket_is_rejected(spark):
    """PUB/SUB has no history anywhere — a batch read over the socket
    transport must fail loudly, not silently return empty."""
    with pytest.raises(ValueError, match="replay"):
        ZmqSource(addr="127.0.0.1:5556", transport="socket", streaming=False).read(spark)


def test_zmq_replay_streaming_matches_batch(spark, sf_dir):
    """Streaming/batch agreement over the recorded capture — the gate
    the driver also checks via the shared oracle."""
    from cheetah_spark.queries.zmq import q_zmq_envelope, s_zmq_replay

    b = sorted(tuple(r) for r in q_zmq_envelope(spark, sf_dir).collect())
    s = sorted(tuple(r) for r in s_zmq_replay(spark, sf_dir).collect())
    assert b == s and len(b) == 10  # ten user shards of ev/click/

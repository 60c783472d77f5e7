"""NSQ connector conformance: the TCP protocol (magic/IDENTIFY/PUB/
SUB/RDY/FIN/REQ frames) against the loopback nsqd over real sockets,
channel fan-out and queue semantics, RDY flow control, FIN acks with
requeue-on-disconnect, the streaming source's live consumer
end-to-end, sink→consumer round-trip, and the config types — the
wishlist-"NSQ?" counterpart of tests/test_amqp.py."""

from __future__ import annotations

import json
import time
import uuid

import pytest

from cheetah_spark.sources.nsq_live import (
    MiniNsqServer,
    NsqClient,
    NsqSink,
    NsqSource,
)


def _start_to_memory(spark, src):
    name = f"sink_nsq_{uuid.uuid4().hex[:10]}"
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


def test_pub_sub_fin_over_socket():
    """The full binary protocol against the loopback nsqd: magic +
    IDENTIFY handshake, SUB + RDY, PUB → message frame, FIN drains
    in-flight."""
    srv = MiniNsqServer()
    sub = NsqClient(srv.addr)
    pub = NsqClient(srv.addr)
    try:
        sub.sub("t1", "ch")
        sub.rdy(10)
        pub.pub("t1", "hello")
        pub.pub("t1", "world")
        m1 = sub.next_message()
        m2 = sub.next_message()
        assert (m1[2], m2[2]) == ("hello", "world")
        assert m1[1] == 1  # first attempt
        assert srv.in_flight_count() == 2
        sub.fin(m1[0])
        sub.fin(m2[0])
        deadline = time.time() + 5
        while srv.in_flight_count() and time.time() < deadline:
            time.sleep(0.05)
        assert srv.in_flight_count() == 0
    finally:
        sub.close()
        pub.close()
        srv.close()


def test_channels_fan_out_consumers_share():
    """NSQ semantics: every CHANNEL receives every message; consumers
    on the SAME channel share its queue."""
    srv = MiniNsqServer()
    a = NsqClient(srv.addr)
    b = NsqClient(srv.addr)
    pub = NsqClient(srv.addr)
    try:
        a.sub("t", "analytics")
        a.rdy(10)
        b.sub("t", "archive")
        b.rdy(10)
        pub.pub("t", "m1")
        pub.pub("t", "m2")
        got_a = sorted(a.next_message()[2] for _ in range(2))
        got_b = sorted(b.next_message()[2] for _ in range(2))
        assert got_a == got_b == ["m1", "m2"]  # both channels got both
    finally:
        for c in (a, b, pub):
            c.close()
        srv.close()


def test_rdy_flow_control():
    """RDY n gates delivery: with RDY 1 only one message is in flight
    until the next RDY."""
    srv = MiniNsqServer()
    sub = NsqClient(srv.addr)
    pub = NsqClient(srv.addr)
    try:
        sub.sub("t", "ch")
        sub.rdy(1)
        pub.pub("t", "m1")
        pub.pub("t", "m2")
        m1 = sub.next_message()
        assert m1[2] == "m1"
        time.sleep(0.2)
        assert srv.queued_count("t", "ch") == 1  # m2 held back
        sub.rdy(1)
        assert sub.next_message()[2] == "m2"
    finally:
        sub.close()
        pub.close()
        srv.close()


def test_req_and_disconnect_requeue():
    """At-least-once: REQ puts a message back with attempts+1; a
    consumer disconnect requeues everything in flight."""
    srv = MiniNsqServer()
    pub = NsqClient(srv.addr)
    c1 = NsqClient(srv.addr)
    try:
        c1.sub("t", "ch")
        c1.rdy(10)
        pub.pub("t", "m1")
        m = c1.next_message()
        c1.req(m[0])  # explicit requeue
        m_again = c1.next_message()
        assert m_again[2] == "m1" and m_again[1] == 2  # attempts bumped
        c1.close()  # in flight, never FIN'd
        deadline = time.time() + 5
        while srv.queued_count("t", "ch") == 0 and time.time() < deadline:
            time.sleep(0.05)
        assert srv.queued_count("t", "ch") == 1
        c2 = NsqClient(srv.addr)
        c2.sub("t", "ch")
        c2.rdy(10)
        m3 = c2.next_message()
        assert m3[2] == "m1" and m3[1] == 3
        c2.fin(m3[0])
        c2.close()
    finally:
        pub.close()
        srv.close()


def test_pub_before_channel_parks_on_topic():
    """Real-nsqd semantics: messages published before any channel
    exists are parked on the topic and delivered to the first channel
    created."""
    srv = MiniNsqServer()
    pub = NsqClient(srv.addr)
    sub = NsqClient(srv.addr)
    try:
        pub.pub("t", "early")
        sub.sub("t", "ch")
        sub.rdy(10)
        assert sub.next_message()[2] == "early"
    finally:
        pub.close()
        sub.close()
        srv.close()


def test_nsq_live_socket_streaming_end_to_end(spark):
    """The full production path: the cheetah-nsq data source's SUB
    consumer (running in the data-source runner process, over a real
    TCP socket) delivers every message published AFTER the
    subscription, and FINs fire on checkpoint commit."""
    srv = MiniNsqServer()
    src = NsqSource(addr=srv.addr, topic="live", channel="spark", transport="socket", streaming=True)
    query, name = _start_to_memory(spark, src)
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            query.processAllAvailable()
            if query.lastProgress is not None:
                break
            time.sleep(0.2)
        pub = NsqClient(srv.addr)
        msgs = [json.dumps({"n": i}) for i in range(20)]
        for m in msgs:
            pub.pub("live", m)
        pub.close()
        got = _await_rows(spark, query, name, len(msgs))
        assert got == len(msgs)
        rows = spark.sql(
            f"SELECT topic, body FROM {name} ORDER BY CAST(get_json_object(body, '$.n') AS INT)"
        ).collect()
        assert [r.body for r in rows] == msgs
        assert {r.topic for r in rows} == {"live"}
        # FIN-on-commit: nudge a message to close the tail batch; only
        # the nudge's own batch may remain in flight
        nudge = NsqClient(srv.addr)
        nudge.pub("live", json.dumps({"n": 999}))
        nudge.close()
        _await_rows(spark, query, name, len(msgs) + 1)
        deadline = time.time() + 20
        while srv.in_flight_count() > 1 and time.time() < deadline:
            query.processAllAvailable()
            time.sleep(0.3)
        assert srv.in_flight_count() <= 1
    finally:
        query.stop()
        srv.close()


def test_nsq_sink_publishes_batch(spark):
    """NsqSink PUBs per partition over real sockets; a consumer on the
    loopback nsqd receives every row."""
    srv = MiniNsqServer()
    sub = NsqClient(srv.addr)
    try:
        sub.sub("out", "ch")
        sub.rdy(100)
        df = spark.createDataFrame(
            [("out", json.dumps({"i": i})) for i in range(8)],
            "topic string, body string",
        ).coalesce(1)
        NsqSink(addr=srv.addr, topic="out", transport="socket").write(df)
        got = sorted(sub.next_message()[2] for _ in range(8))
        assert got == sorted(json.dumps({"i": i}) for i in range(8))
    finally:
        sub.close()
        srv.close()


def test_nsq_config_types(spark):
    """{"type":"nsq"} source/sink blocks load with camelCase keys."""
    from cheetah_spark.config import build_sink, build_source

    src = build_source(
        {
            "type": "nsq",
            "addr": "127.0.0.1:4150",
            "topic": "ev",
            "channel": "spark",
            "transport": "replay",
            "capturePath": "/tmp/cap",
            "chunkSize": 500,
        }
    )
    assert isinstance(src, NsqSource)
    assert src.capture_path == "/tmp/cap" and src.chunk_size == 500

    sink = build_sink({"type": "nsq", "addr": "127.0.0.1:4150", "topic": "out"})
    assert isinstance(sink, NsqSink)


def test_nsq_batch_socket_is_rejected(spark):
    """An NSQ channel drains on consume — a batch read over the socket
    transport must fail loudly, not silently return empty."""
    with pytest.raises(ValueError, match="replay"):
        NsqSource(addr="127.0.0.1:4150", transport="socket", streaming=False).read(spark)


def test_nsq_replay_streaming_matches_batch(spark, sf_dir):
    """Streaming/batch agreement over the recorded capture — the gate
    the driver also checks via the shared oracle."""
    from cheetah_spark.queries.nsq import q_nsq_envelope, s_nsq_replay

    b = sorted(tuple(r) for r in q_nsq_envelope(spark, sf_dir).collect())
    s = sorted(tuple(r) for r in s_nsq_replay(spark, sf_dir).collect())
    assert b == s and len(b) == 10  # ten user shards of ev.click

"""AMQP 0-9-1 connector conformance: binary wire framing + the
loopback broker over real sockets, topic-exchange wildcard routing,
delivery-tag ack semantics (ack-on-commit, requeue-on-disconnect), the
streaming source's live consume listener end-to-end, sink→consumer
round-trip, and the config types — the wishlist-#4 counterpart of
tests/test_nats.py."""

from __future__ import annotations

import itertools
import json
import re
import time
import uuid

import pytest

from cheetah_spark.sources.amqp_live import (
    AmqpClient,
    AmqpSink,
    AmqpSource,
    MiniAmqpServer,
    topic_matches,
    topic_regex,
)


def _start_to_memory(spark, src):
    name = f"sink_amqp_{uuid.uuid4().hex[:10]}"
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


def test_topic_wildcard_matching():
    """Public AMQP topic-exchange semantics: '*' exactly one word,
    '#' zero or more words, literal otherwise."""
    assert topic_matches("click.u1.evt", "click.u1.evt")
    assert not topic_matches("click.u1.evt", "click.u1")
    assert topic_matches("click.*.evt", "click.u7.evt")
    assert not topic_matches("click.*.evt", "click.u7.x.evt")
    assert topic_matches("click.#", "click")  # '#' matches ZERO words
    assert topic_matches("click.#", "click.a.b.c")
    assert topic_matches("#.evt", "evt")
    assert topic_matches("#.evt", "a.b.evt")
    assert topic_matches("a.#.b", "a.b")
    assert topic_matches("a.#.b", "a.x.y.b")
    assert not topic_matches("a.#.b", "a.x.y")
    assert topic_matches("#", "anything.at.all")


def test_topic_regex_agrees_with_dp_matcher():
    """The Catalyst-side regex compiler is property-checked against
    the token-DP ground truth over every pattern shape the exchange
    supports (words are non-empty, per the AMQP grammar)."""
    words = ["a", "b", "click", "u1"]
    pats = [
        "#", "*", "a.*.b", "a.#.b", "#.b", "a.#", "*.#", "click.*.evt",
        "#.u1.#", "a.b", "*.*", "a.#.#.b",
    ]
    for pat in pats:
        rx = re.compile(topic_regex(pat))
        for n in range(1, 4):
            for key in itertools.product(words, repeat=n):
                k = ".".join(key)
                assert topic_matches(pat, k) == bool(rx.match(k)), (pat, k)


def test_handshake_publish_consume_over_socket():
    """The full binary protocol against the loopback broker: handshake,
    exchange/queue/bind declares, publish → deliver with correct
    routing, ack."""
    srv = MiniAmqpServer()
    pub = AmqpClient(srv.addr)
    sub = AmqpClient(srv.addr)
    try:
        sub.exchange_declare("ev", "topic")
        sub.queue_declare("q1")
        sub.queue_bind("q1", "ev", "click.*.evt")
        sub.basic_consume("q1")
        pub.exchange_declare("ev", "topic")
        pub.basic_publish("ev", "click.u1.evt", "a")
        pub.basic_publish("ev", "view.u1.evt", "b")  # not routed to q1
        pub.basic_publish("ev", "click.u2.evt", "c")
        d1 = sub.next_delivery()
        d2 = sub.next_delivery()
        assert (d1[2], d1[3]) == ("click.u1.evt", "a")
        assert (d2[2], d2[3]) == ("click.u2.evt", "c")
        sub.basic_ack(d1[0])
        sub.basic_ack(d2[0])
        deadline = time.time() + 5
        while srv.unacked_count() and time.time() < deadline:
            time.sleep(0.05)
        assert srv.unacked_count() == 0
    finally:
        pub.close()
        sub.close()
        srv.close()


def test_unacked_requeued_on_disconnect():
    """At-least-once: deliveries never acked are requeued when the
    consumer connection drops, and a new consumer receives them."""
    srv = MiniAmqpServer()
    pub = AmqpClient(srv.addr)
    c1 = AmqpClient(srv.addr)
    try:
        c1.exchange_declare("ev", "topic")
        c1.queue_declare("q1")
        c1.queue_bind("q1", "ev", "#")
        c1.basic_consume("q1")
        pub.basic_publish("ev", "a.b", "m1")
        pub.basic_publish("ev", "a.c", "m2")
        got = [c1.next_delivery() for _ in range(2)]
        c1.basic_ack(got[0][0])  # ack ONLY the first
        c1.close()  # m2 was delivered but never acked
        deadline = time.time() + 5
        while srv.pending_count("q1") == 0 and time.time() < deadline:
            time.sleep(0.05)
        assert srv.pending_count("q1") == 1
        c2 = AmqpClient(srv.addr)
        c2.basic_consume("q1")
        redelivered = c2.next_delivery()
        assert (redelivered[2], redelivered[3]) == ("a.c", "m2")
        c2.basic_ack(redelivered[0])
        c2.close()
    finally:
        pub.close()
        srv.close()


def test_large_body_split_across_frames():
    """A body larger than frame-max crosses multiple content body
    frames and reassembles exactly."""
    srv = MiniAmqpServer()
    pub = AmqpClient(srv.addr)
    sub = AmqpClient(srv.addr)
    try:
        sub.queue_declare("big")
        sub.queue_bind("big", "", "big")  # default-exchange fallback needs a binding or rk==queue
        sub.basic_consume("big")
        body = "x" * 300_000  # > 2 * frame_max(131072)
        pub.basic_publish("", "big", body)
        d = sub.next_delivery()
        assert d[3] == body
    finally:
        pub.close()
        sub.close()
        srv.close()


def test_amqp_live_socket_streaming_end_to_end(spark):
    """The full production path: the cheetah-amqp data source's
    consume listener (running in the data-source runner process, over
    a real TCP socket) delivers every message published AFTER the
    binding into the memory sink, and acks drain on checkpoint
    commit."""
    srv = MiniAmqpServer()
    src = AmqpSource(
        addr=srv.addr,
        exchange="live",
        queue="qlive",
        binding_key="live.#",
        transport="socket",
        streaming=True,
    )
    query, name = _start_to_memory(spark, src)
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            query.processAllAvailable()
            if query.lastProgress is not None:
                break
            time.sleep(0.2)
        pub = AmqpClient(srv.addr)
        pub.exchange_declare("live", "topic")
        msgs = [(f"live.t{i % 3}", json.dumps({"n": i})) for i in range(20)]
        for rk, payload in msgs:
            pub.basic_publish("live", rk, payload)
        pub.close()
        got = _await_rows(spark, query, name, len(msgs))
        assert got == len(msgs)
        rows = spark.sql(
            f"SELECT routing_key, payload FROM {name} "
            "ORDER BY CAST(get_json_object(payload, '$.n') AS INT)"
        ).collect()
        assert [(r.routing_key, r.payload) for r in rows] == msgs
        # ack-on-commit (T4): the engine commits batch N when planning
        # N+1, so publish a nudge message to close the tail batch; only
        # the nudge's own batch may remain unacked
        nudge = AmqpClient(srv.addr)
        nudge.basic_publish("live", "live.nudge", json.dumps({"n": 999}))
        nudge.close()
        _await_rows(spark, query, name, len(msgs) + 1)
        deadline = time.time() + 20
        while srv.unacked_count() > 1 and time.time() < deadline:
            query.processAllAvailable()
            time.sleep(0.3)
        assert srv.unacked_count() <= 1
    finally:
        query.stop()
        srv.close()


def test_amqp_sink_publishes_batch(spark):
    """AmqpSink publishes per partition over real sockets; a consumer
    on the loopback broker receives every row."""
    srv = MiniAmqpServer()
    sub = AmqpClient(srv.addr)
    try:
        sub.exchange_declare("out", "topic")
        sub.queue_declare("qo")
        sub.queue_bind("qo", "out", "#")
        sub.basic_consume("qo")
        df = spark.createDataFrame(
            [("out", f"k.s{i % 2}", json.dumps({"i": i})) for i in range(8)],
            "exchange string, routing_key string, payload string",
        ).coalesce(1)
        AmqpSink(addr=srv.addr, exchange="out", transport="socket").write(df)
        got = sorted(sub.next_delivery()[3] for _ in range(8))
        assert got == sorted(json.dumps({"i": i}) for i in range(8))
    finally:
        sub.close()
        srv.close()


def test_amqp_sink_streaming_socket(spark, tmp_path):
    """A STREAMING frame through the socket sink: rows published per
    micro-batch via foreachBatch land on a live consumer."""
    srv = MiniAmqpServer()
    sub = AmqpClient(srv.addr)
    try:
        sub.exchange_declare("sq", "topic")
        sub.queue_declare("qs")
        sub.queue_bind("qs", "sq", "#")
        sub.basic_consume("qs")
        feed = tmp_path / "feed"
        feed.mkdir()
        (feed / "a.json").write_text(
            "\n".join(
                json.dumps({"exchange": "sq", "routing_key": "r", "payload": f"p{i}"})
                for i in range(6)
            )
        )
        src = (
            spark.readStream.schema("exchange string, routing_key string, payload string")
            .json(str(feed))
        )
        q = AmqpSink(
            addr=srv.addr, exchange="sq", transport="socket", checkpoint=str(tmp_path / "ckpt")
        ).write(src)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = sorted(sub.next_delivery()[3] for _ in range(6))
        assert got == sorted(f"p{i}" for i in range(6))
    finally:
        sub.close()
        srv.close()


def test_amqp_config_types(spark):
    """{"type":"amqp"} source/sink blocks load with camelCase keys."""
    from cheetah_spark.config import build_sink, build_source

    src = build_source(
        {
            "type": "amqp",
            "addr": "127.0.0.1:5672",
            "exchange": "ev",
            "exchangeType": "topic",
            "bindingKey": "click.#",
            "transport": "replay",
            "capturePath": "/tmp/cap",
            "chunkSize": 500,
        }
    )
    assert isinstance(src, AmqpSource)
    assert src.binding_key == "click.#" and src.chunk_size == 500

    sink = build_sink(
        {"type": "amqp", "addr": "127.0.0.1:5672", "exchange": "out", "routingKey": "r"}
    )
    assert isinstance(sink, AmqpSink)
    assert sink.routing_key == "r"


def test_amqp_batch_socket_is_rejected(spark):
    """An AMQP queue drains on consume — a batch read over the socket
    transport must fail loudly, not silently return empty."""
    with pytest.raises(ValueError, match="replay"):
        AmqpSource(addr="127.0.0.1:5672", transport="socket", streaming=False).read(spark)


def test_amqp_replay_streaming_matches_batch(spark, sf_dir):
    """Streaming/batch agreement over the recorded capture — the gate
    the driver also checks via the shared oracle."""
    from cheetah_spark.queries.amqp import q_amqp_envelope, s_amqp_replay

    b = sorted(tuple(r) for r in q_amqp_envelope(spark, sf_dir).collect())
    s = sorted(tuple(r) for r in s_amqp_replay(spark, sf_dir).collect())
    assert b == s and len(b) == 10  # ten user shards of click.*.evt

"""Pub/Sub connector conformance: the REST surface (publish/pull/
acknowledge with base64 data and ack-id leases) against the loopback
server over real HTTP, subscription-filter semantics, lease-expiry
redelivery, the streaming source's live pull listener end-to-end,
sink→subscriber round-trip, and the config types — the wishlist-#5
counterpart of tests/test_amqp.py."""

from __future__ import annotations

import json
import time
import uuid

import pytest

from cheetah_spark.sources.pubsub_live import (
    MiniPubSubServer,
    PubSubClient,
    PubSubSink,
    PubSubSource,
    filter_matches,
    parse_filter,
)


def _start_to_memory(spark, src):
    name = f"sink_pubsub_{uuid.uuid4().hex[:10]}"
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


def test_filter_parse_and_match():
    """The public subscription-filter subset: attribute equality with
    AND conjunction; anything else is rejected loudly."""
    assert parse_filter('attributes.event_type = "click"') == [("event_type", "click")]
    clauses = parse_filter('attributes.a = "1" AND attributes.b = "2"')
    assert clauses == [("a", "1"), ("b", "2")]
    assert filter_matches(clauses, {"a": "1", "b": "2", "c": "x"})
    assert not filter_matches(clauses, {"a": "1"})
    assert parse_filter("") == []
    with pytest.raises(ValueError, match="unsupported filter"):
        parse_filter('hasPrefix(attributes.a, "x")')


def test_publish_pull_acknowledge_roundtrip():
    """The documented REST flow end-to-end over real HTTP: topic +
    subscription, :publish returns messageIds, :pull leases with
    ackIds, :acknowledge drains the lease."""
    srv = MiniPubSubServer()
    c = PubSubClient(srv.addr)
    try:
        c.create_topic("t1")
        c.create_subscription("s1", "t1")
        mids = c.publish(
            "t1",
            [
                {"data": "hello", "attributes": {"k": "v"}},
                {"data": b"bytes \xf0\x9f\x9a\x80".decode("utf-8").encode("utf-8")},
            ],
        )
        assert len(mids) == 2
        recs = c.pull("s1", 10)
        assert [(r[3], r[2]) for r in recs] == [
            ("hello", {"k": "v"}),
            ("bytes \U0001f680", {}),
        ]
        assert srv.leased_count(c.sub_path("s1")) == 2
        c.acknowledge("s1", [r[0] for r in recs])
        assert srv.leased_count(c.sub_path("s1")) == 0
        assert c.pull("s1", 10) == []
    finally:
        srv.close()


def test_subscription_filter_enforced_server_side():
    """A filtered subscription only ever receives matching messages —
    the service-side semantics the replay path mirrors in the plan."""
    srv = MiniPubSubServer()
    c = PubSubClient(srv.addr)
    try:
        c.create_topic("t")
        c.create_subscription("all", "t")
        c.create_subscription("clicks", "t", filter_expr='attributes.et = "click"')
        c.publish(
            "t",
            [
                {"data": "1", "attributes": {"et": "click"}},
                {"data": "2", "attributes": {"et": "view"}},
                {"data": "3", "attributes": {"et": "click"}},
            ],
        )
        assert [r[3] for r in c.pull("all", 10)] == ["1", "2", "3"]
        assert [r[3] for r in c.pull("clicks", 10)] == ["1", "3"]
    finally:
        srv.close()


def test_expired_lease_redelivers():
    """At-least-once: a pulled message never acked is redelivered
    after its ack deadline expires."""
    srv = MiniPubSubServer()
    c = PubSubClient(srv.addr)
    try:
        c.create_topic("t")
        c.create_subscription("s", "t", ack_deadline_s=1)
        c.publish("t", [{"data": "m1"}])
        first = c.pull("s", 10)
        assert [r[3] for r in first] == ["m1"]
        assert c.pull("s", 10) == []  # leased, not yet expired
        time.sleep(1.2)
        again = c.pull("s", 10)
        assert [r[3] for r in again] == ["m1"]  # redelivered
        assert again[0][1] == first[0][1]  # same messageId
        c.acknowledge("s", [again[0][0]])
        time.sleep(1.2)
        assert c.pull("s", 10) == []  # acked: gone for good
    finally:
        srv.close()


def test_pubsub_live_http_streaming_end_to_end(spark):
    """The full production path: the cheetah-pubsub data source's pull
    listener (running in the data-source runner process, over real
    HTTP) delivers every message published AFTER the subscription into
    the memory sink, and ack-ids drain on checkpoint commit."""
    srv = MiniPubSubServer()
    boot = PubSubClient(srv.addr)
    boot.create_topic("live")
    boot.create_subscription("slive", "live", ack_deadline_s=600)
    src = PubSubSource(addr=srv.addr, subscription="slive", transport="http", streaming=True)
    query, name = _start_to_memory(spark, src)
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            query.processAllAvailable()
            if query.lastProgress is not None:
                break
            time.sleep(0.2)
        msgs = [{"data": json.dumps({"n": i}), "attributes": {"i": str(i)}} for i in range(20)]
        boot.publish("live", msgs)
        got = _await_rows(spark, query, name, len(msgs))
        assert got == len(msgs)
        rows = spark.sql(
            f"SELECT attributes, data FROM {name} "
            "ORDER BY CAST(get_json_object(data, '$.n') AS INT)"
        ).collect()
        assert [json.loads(r.data)["n"] for r in rows] == list(range(20))
        assert [json.loads(r.attributes)["i"] for r in rows] == [str(i) for i in range(20)]
        # ack-on-commit: nudge a message to close the tail batch; only
        # the nudge's own batch may remain leased
        boot.publish("live", [{"data": json.dumps({"n": 999})}])
        _await_rows(spark, query, name, len(msgs) + 1)
        sub_path = boot.sub_path("slive")
        deadline = time.time() + 20
        while srv.leased_count(sub_path) > 1 and time.time() < deadline:
            query.processAllAvailable()
            time.sleep(0.3)
        assert srv.leased_count(sub_path) <= 1
    finally:
        query.stop()
        srv.close()


def test_pubsub_sink_publishes_batch(spark):
    """PubSubSink publishes per partition (REST-batched) over real
    HTTP; a subscriber on the loopback server receives every row."""
    srv = MiniPubSubServer()
    c = PubSubClient(srv.addr)
    try:
        c.create_topic("out")
        c.create_subscription("so", "out")
        df = spark.createDataFrame(
            [("", json.dumps({"i": str(i)}), json.dumps({"n": i})) for i in range(8)],
            "message_id string, attributes string, data string",
        ).coalesce(1)
        PubSubSink(addr=srv.addr, topic="out", batch_size=3).write(df)
        recs = c.pull("so", 100)
        assert sorted(json.loads(r[3])["n"] for r in recs) == list(range(8))
        assert sorted(r[2]["i"] for r in recs) == sorted(str(i) for i in range(8))
    finally:
        srv.close()


def test_pubsub_sink_streaming_http(spark, tmp_path):
    """A STREAMING frame through the HTTP sink: rows published per
    micro-batch via foreachBatch land on a live subscriber."""
    srv = MiniPubSubServer()
    c = PubSubClient(srv.addr)
    try:
        c.create_topic("sq")
        c.create_subscription("ssq", "sq")
        feed = tmp_path / "feed"
        feed.mkdir()
        (feed / "a.json").write_text(
            "\n".join(
                json.dumps({"message_id": "", "attributes": "{}", "data": f"p{i}"})
                for i in range(6)
            )
        )
        src = spark.readStream.schema(
            "message_id string, attributes string, data string"
        ).json(str(feed))
        q = PubSubSink(
            addr=srv.addr, topic="sq", checkpoint=str(tmp_path / "ckpt")
        ).write(src)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = sorted(r[3] for r in c.pull("ssq", 100))
        assert got == sorted(f"p{i}" for i in range(6))
    finally:
        srv.close()


def test_pubsub_config_types(spark):
    """{"type":"pubsub"} source/sink blocks load with camelCase keys."""
    from cheetah_spark.config import build_sink, build_source

    src = build_source(
        {
            "type": "pubsub",
            "addr": "127.0.0.1:8085",
            "project": "proj",
            "subscription": "s",
            "transport": "replay",
            "capturePath": "/tmp/cap",
            "chunkSize": 500,
            "maxMessages": 250,
        }
    )
    assert isinstance(src, PubSubSource)
    assert src.capture_path == "/tmp/cap" and src.chunk_size == 500
    assert src.max_messages == 250

    sink = build_sink(
        {"type": "pubsub", "addr": "127.0.0.1:8085", "topic": "out", "batchSize": 50}
    )
    assert isinstance(sink, PubSubSink)
    assert sink.batch_size == 50


def test_pubsub_batch_http_is_rejected(spark):
    """A subscription backlog drains on pull — a batch read over the
    HTTP transport must fail loudly, not silently return empty."""
    with pytest.raises(ValueError, match="replay"):
        PubSubSource(addr="127.0.0.1:8085", transport="http", streaming=False).read(spark)


def test_pubsub_replay_streaming_matches_batch(spark, sf_dir):
    """Streaming/batch agreement over the recorded capture — the gate
    the driver also checks via the shared oracle."""
    from cheetah_spark.queries.pubsub import q_pubsub_envelope, s_pubsub_replay

    b = sorted(tuple(r) for r in q_pubsub_envelope(spark, sf_dir).collect())
    s = sorted(tuple(r) for r in s_pubsub_replay(spark, sf_dir).collect())
    assert b == s and len(b) == 10  # ten user shards of filtered clicks

"""Webhook destination conformance: real loopback HTTP delivery,
retry-on-503, fail-fast on 4xx, streaming foreachBatch delivery, and
the kawad runreveal config type."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import Row, functions as F

from cheetah_spark.queries.webhook import SpoolReceiver
from cheetah_spark.sinks import WebhookSink


def _rows(spool_dir):
    import os

    out = []
    for name in sorted(os.listdir(spool_dir)):
        if name.startswith("req_"):
            with open(f"{spool_dir}/{name}") as fh:
                out += [json.loads(l) for l in fh.read().splitlines() if l]
    return out


def test_webhook_batch_delivery_and_chunking(spark, tmp_path):
    recv = SpoolReceiver(str(tmp_path / "spool"))
    try:
        df = spark.range(250).select(F.col("id").alias("event_id"))
        WebhookSink(webhook_url=recv.url, batch_size=100).write(df.coalesce(1))
    finally:
        recv.close()
    got = _rows(str(tmp_path / "spool"))
    assert sorted(r["event_id"] for r in got) == list(range(250))
    # one partition, 250 rows, batch_size 100 → 3 requests
    assert recv.n_requests == 3


def test_webhook_retries_transient_503(spark, tmp_path):
    """The first two requests 503; the sink must back off and retry
    until the receiver recovers — nothing lost, no duplicates spooled
    (the receiver never wrote the failed bodies)."""
    recv = SpoolReceiver(str(tmp_path / "spool"), fail_first=2)
    try:
        df = spark.range(50).select(F.col("id").alias("event_id"))
        WebhookSink(webhook_url=recv.url, batch_size=100, backoff=0.05).write(df.coalesce(1))
    finally:
        recv.close()
    got = _rows(str(tmp_path / "spool"))
    assert sorted(r["event_id"] for r in got) == list(range(50))
    assert recv.n_requests == 3  # 2 failures + 1 success


def test_webhook_4xx_is_fatal_no_retry(spark, tmp_path):
    """A client error must fail immediately (retry can't fix a 400) —
    and the task error propagates so the batch never acks."""
    import http.server
    import threading

    class Handler(http.server.BaseHTTPRequestHandler):
        calls = 0

        def do_POST(self):  # noqa: N802
            self.rfile.read(int(self.headers.get("Content-Length", 0)))
            type(self).calls += 1
            self.send_response(400)
            self.end_headers()

        def log_message(self, *args):
            pass

    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}/"
    try:
        df = spark.range(5).select(F.col("id").alias("event_id"))
        with pytest.raises(Exception, match="400"):
            WebhookSink(webhook_url=url, batch_size=100, backoff=0.05).write(df.coalesce(1))
    finally:
        httpd.shutdown()
        httpd.server_close()
    assert Handler.calls == 1  # no retry on 4xx


def test_webhook_streaming_foreach_batch(spark, tmp_path):
    """Streaming path: foreachBatch delivers each micro-batch through
    the same partition-POST code; availableNow drains the source."""
    recv = SpoolReceiver(str(tmp_path / "spool"))
    src_dir = tmp_path / "src"
    spark.createDataFrame([Row(event_id=i) for i in range(30)]).coalesce(1).write.json(
        str(src_dir)
    )
    try:
        stream = spark.readStream.schema("event_id long").json(str(src_dir))
        q = WebhookSink(
            webhook_url=recv.url,
            batch_size=100,
            checkpoint=str(tmp_path / "ckpt"),
        ).write(stream)
        q.awaitTermination(60)
    finally:
        recv.close()
    got = _rows(str(tmp_path / "spool"))
    assert sorted(r["event_id"] for r in got) == list(range(30))


def test_runreveal_config_type():
    from cheetah_spark.config import build_sink

    sink = build_sink(
        {"type": "runreveal", "webhookURL": "http://127.0.0.1:9/", "batchSize": 7}
    )
    assert isinstance(sink, WebhookSink)
    assert sink.webhook_url == "http://127.0.0.1:9/" and sink.batch_size == 7
    assert isinstance(build_sink({"type": "webhook", "webhook_url": "x"}), WebhookSink)

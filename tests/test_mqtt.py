"""MQTT envelope semantics (reference S3/D3, x/mqtt/mqtt.go) over the
replay capture, plus the batcher watchdog/stop-timeout parity
(x/batcher/batcher.go:230-304)."""

from __future__ import annotations

import shutil
import time

import pytest

from cheetah_spark.queries.mqtt import mqtt_capture_dir
from cheetah_spark.sinks import BatcherSink, MqttReplaySink
from cheetah_spark.sources import MqttReplaySource, ParquetSource, mqtt_filter_regex
from cheetah_spark.streaming import events_stream_dir


def test_mqtt_filter_regex_semantics():
    # MQTT-3.1.1 §4.7: '+' one level, '#' remaining levels (incl. zero)
    import re

    def m(flt, topic):
        return re.fullmatch(mqtt_filter_regex(flt)[1:-1], topic) is not None

    assert m("sensors/+/3", "sensors/click/3")
    assert not m("sensors/+/3", "sensors/click/30")
    assert not m("sensors/+/3", "sensors/a/b/3")
    assert m("sensors/#", "sensors")  # zero remaining levels
    assert m("sensors/#", "sensors/a/b/c")
    assert not m("sensors/#", "sensor")
    assert m("#", "anything/at/all")
    with pytest.raises(ValueError):
        mqtt_filter_regex("a/#/b")  # '#' must be last


def test_mqtt_envelope_shape_and_qos_downgrade(spark, sf_dir):
    cap = mqtt_capture_dir(spark, sf_dir)
    env = MqttReplaySource(path=cap, topic_filter="sensors/#", qos=1).read(spark)
    assert set(env.columns) == {"key", "value", "topic", "attributes"}
    row = env.limit(1).collect()[0]
    assert row.topic.startswith("sensors/")
    assert row.key == row.topic.rsplit("/", 1)[-1]  # key = topic tail
    # downgrade rule: effective qos never exceeds subscription qos
    from pyspark.sql import functions as F

    assert env.where(F.col("attributes")["qos"].cast("int") > 1).count() == 0


def test_mqtt_source_sink_roundtrip(spark, sf_dir):
    """Subscribe to the capture, republish to a fixed topic (D3
    semantics), re-subscribe to the published capture: no loss."""
    out = "/tmp/cheetah_mqtt_out/roundtrip"
    shutil.rmtree(out, ignore_errors=True)
    cap = mqtt_capture_dir(spark, sf_dir)
    env = MqttReplaySource(path=cap, topic_filter="sensors/+/3", qos=1).read(spark)
    n_in = env.count()
    assert n_in > 0
    MqttReplaySink(path=out, topic="relay/out", qos=1, payload_col="value").write(env)
    back = MqttReplaySource(path=out, topic_filter="relay/#", qos=2).read(spark)
    assert back.count() == n_in
    assert back.select("topic").distinct().collect()[0][0] == "relay/out"
    shutil.rmtree(out, ignore_errors=True)


def test_batcher_flush_timeout_is_fatal(spark, sf_dir):
    """Watchdog parity (batcher.go:230-242, 351-356): a flush exceeding
    the bound fails the query instead of wedging silently."""
    from pyspark.sql.streaming import StreamingQueryException

    src_dir = events_stream_dir(spark, sf_dir)
    stream = ParquetSource(src_dir, streaming=True, max_files_per_trigger=8).read(spark)

    def slow_flush(batch, epoch):
        time.sleep(0.5)

    sink = BatcherSink(
        flush=slow_flush,
        flush_timeout=0.05,
        stop_timeout="5s",
        checkpoint=f"/tmp/cheetah_mqtt_out/_wd_ckpt_{time.time_ns()}",
    )
    query = sink.write(stream.select("event_id"))
    with pytest.raises(StreamingQueryException, match="flush_timeout|TimeoutError"):
        query.processAllAvailable()
        query.awaitTermination(30)
    query.stop()


def test_batcher_fast_flush_passes_watchdog(spark, sf_dir):
    src_dir = events_stream_dir(spark, sf_dir)
    stream = ParquetSource(src_dir, streaming=True, max_files_per_trigger=8).read(spark)
    seen = []

    sink = BatcherSink(
        flush=lambda batch, epoch: seen.append(batch.count()),
        flush_timeout=300.0,
        checkpoint=f"/tmp/cheetah_mqtt_out/_wd_ok_{time.time_ns()}",
    )
    query = sink.write(stream.select("event_id"))
    query.processAllAvailable()
    query.stop()
    assert sum(seen) == spark.read.parquet(src_dir).count()

"""Live MQTT broker transport (reference S3/D3, x/mqtt/mqtt.go) on the
PySpark Python Data Source API.

The replay adapters (``MqttReplaySource``/``MqttReplaySink``) carry the
*semantics* — wildcard filters, QoS downgrade, retained flags, the
Message envelope — over a recorded capture. This module carries the
*transport*: a real broker client wired into Structured Streaming as a
custom streaming data source (``spark.readStream.format("cheetah-mqtt")``)
and a per-partition publisher sink.

Transport is pluggable because the sandbox has no broker and no
``paho-mqtt`` wheel:

- ``transport=paho`` — the production path. Builds an Eclipse Paho
  client (the Python sibling of the reference's
  ``github.com/eclipse/paho.mqtt.golang`` import, mqtt.go:10) with the
  same option surface: broker, client_id, topic filter (default ``#``),
  QoS (default 1), retained, keep_alive, username/password
  (mqtt.go:14-103). Import-gated: constructing it without the paho
  wheel raises ImportError naming ``paho-mqtt``; everything up to the
  socket — option validation, offset bookkeeping, ack-on-commit — is
  the same code the replay transport exercises in tests.
- ``transport=replay`` — a deterministic broker stand-in that delivers
  an NDJSON capture (the ``MqttReplaySource.CAPTURE_SCHEMA`` layout)
  through the *identical* client interface, applying broker-side
  wildcard matching, and records acks/publishes to NDJSON logs so
  tests can assert the at-least-once contract from outside the
  streaming subprocess.

Delivery contract (reference parity):

- Subscribe-side manual ack: a message is acked only when the reader's
  ``commit(offset)`` fires — i.e. after the micro-batch that contains
  it has been durably committed by the sink. That is the reference's
  ack-after-sink closure (mqtt.go:212-225 hands ``message.Ack`` to the
  processor; processor.go:109-115 fires it post-Send) mapped onto the
  checkpoint offset commit (T4).
- Connection loss is fatal: the reference pushes the lost-connection
  error onto ``errc`` and ``Run`` returns it (mqtt.go:112-114,156-165);
  here the next ``read()`` raises and the StreamingQuery fails with a
  ``StreamingQueryException`` — same "crash, restart from offsets"
  posture.
- Publish waits for the broker token per batch (mqtt.go:167-176):
  the sink drains each partition's rows through ``publish().wait()``
  before the batch commits.

Scale notes (100 TB): the subscribe side is inherently a single
consumer per (client_id, filter) — MQTT has no consumer groups — so
the source is a low-volume control/ingest edge, not a bulk-scan path;
Spark fans the envelope rows out to executors immediately after
admission. The publish side scales per-partition: each executor
partition opens its own client (``foreachPartition``), so sink
throughput grows with parallelism, bounded by the broker.
"""

from __future__ import annotations

import json
import os
import threading
import uuid
from dataclasses import dataclass
from typing import Callable, Iterator, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType

from cheetah_spark.sources.seqwindow import SeqWindowStreamReader

from cheetah_spark.sources import Source
from cheetah_spark.sinks import Sink


@dataclass
class MqttOpts:
    """The reference's option surface (mqtt.go:14-103), same defaults:
    topic ``#``, QoS 1, retained false."""

    broker: str = ""
    client_id: str = ""
    topic: str = "#"
    qos: int = 1
    retained: bool = False
    keep_alive: float = 30.0
    username: str = ""
    password: str = ""

    def validate_connect(self) -> None:
        # parity: clientConnect's precondition errors (mqtt.go:126-131)
        if not self.broker:
            raise ValueError("mqtt: missing broker")
        if not self.client_id:
            raise ValueError("mqtt: missing clientID")


class MqttMessage:
    """One delivered message — the subset of the paho message surface
    the reader needs (payload/topic/mid/qos/retain + manual ack)."""

    __slots__ = ("topic", "payload", "mid", "qos", "retained", "_ack")

    def __init__(self, topic, payload, mid, qos, retained, ack=None):
        self.topic = topic
        self.payload = payload
        self.mid = mid
        self.qos = qos
        self.retained = retained
        self._ack = ack

    def ack(self) -> None:
        if self._ack is not None:
            self._ack(self)


class PahoClientFactory:
    """Production transport: builds a connected Eclipse Paho client.

    Import-gated — the sandbox ships no ``paho-mqtt`` wheel, so the
    import error is raised lazily with an actionable message. All
    option plumbing mirrors clientConnect (mqtt.go:125-154)."""

    def __call__(self, opts: MqttOpts, on_message, on_connection_lost):
        """``on_message=None`` builds a PUBLISH-ONLY client: no
        subscription (a sink subscribing to its own publish topic would
        echo every message back to every publisher and, with manual
        ack, fill the broker's QoS1 in-flight window) and no manual-ack
        mode."""
        try:
            import paho.mqtt.client as paho  # type: ignore
        except ImportError as exc:  # pragma: no cover - no wheel in sandbox
            raise ImportError(
                "mqtt transport=paho requires the 'paho-mqtt' package "
                "(pip install paho-mqtt); use transport=replay for "
                "broker-less capture replay"
            ) from exc

        opts.validate_connect()
        client = paho.Client(
            callback_api_version=paho.CallbackAPIVersion.VERSION2,
            client_id=opts.client_id,
            # ack-after-sink: commit() fires the acks (subscribe side only)
            manual_ack=on_message is not None,
        )
        if opts.username:
            client.username_pw_set(opts.username, opts.password or None)

        def _on_disconnect(_c, _ud, _flags, rc, _props=None):
            if rc != 0:
                on_connection_lost(Exception(f"mqtt connection lost: rc={rc}"))

        if on_message is not None:

            def _on_message(_c, _ud, m):  # paho → transport-neutral envelope
                on_message(
                    MqttMessage(
                        m.topic, bytes(m.payload), m.mid, m.qos, m.retain,
                        ack=lambda msg: client.ack(msg.mid, msg.qos),
                    )
                )

            client.on_message = _on_message
        client.on_disconnect = _on_disconnect
        host, _, port = opts.broker.partition(":")
        client.connect(host, int(port) if port else 1883, int(opts.keep_alive))
        if on_message is not None:
            client.subscribe(opts.topic, opts.qos)
        client.loop_start()
        return _PahoAdapter(client)


class _PahoAdapter:
    def __init__(self, client):
        self._client = client
        self.connected = True

    def publish(self, topic, payload, qos, retained):
        # blocking token wait — Send's contract (mqtt.go:167-176)
        info = self._client.publish(topic, payload, qos, retained)
        info.wait_for_publish()

    def close(self):
        self._client.loop_stop()
        self._client.disconnect()


@dataclass
class ReplayClientFactory:
    """Broker stand-in: delivers an NDJSON capture through the same
    client interface the paho transport uses, applying BROKER-side
    wildcard subscription matching (MQTT-3.1.1 §4.7 — the broker, not
    the client, evaluates the filter) and the §3.8.4 QoS downgrade.

    Side-effect logs (NDJSON, one record per event) make the
    at-least-once contract observable from outside the streaming
    subprocess: ``ack_log`` records each ack as ``{"mid": ...}``
    in commit order; ``publish_log`` records each publish. Both are
    append-opened so multiple partitions/batches interleave safely on
    a local filesystem."""

    capture_path: str = ""
    ack_log: str = ""
    publish_log: str = ""
    fail_connect: bool = False
    drop_connection_after: int = -1  # deliver N then signal conn-lost
    chunk_size: int = 0  # 0 = deliver everything at connect

    def __call__(self, opts: MqttOpts, on_message, on_connection_lost):
        from cheetah_spark.sources import mqtt_filter_regex
        import re

        if self.fail_connect:
            # parity: connect token error (mqtt.go:149-151)
            raise ConnectionError(f"mqtt connect error: {opts.broker or 'broker down'}")
        adapter = _ReplayAdapter(self)
        adapter._client_id = opts.client_id  # logged with publishes (tests)
        pat = re.compile(mqtt_filter_regex(opts.topic))

        def deliveries():
            delivered = 0
            for rec in sorted(_iter_capture(self.capture_path), key=lambda r: r["mid"]):
                if not pat.match(rec["topic"]):
                    continue  # broker-side filter: non-matching never leaves the broker
                if 0 <= self.drop_connection_after <= delivered:
                    adapter.connected = False
                    on_connection_lost(Exception("mqtt connection lost: simulated"))
                    return
                on_message(
                    MqttMessage(
                        rec["topic"],
                        rec["payload"].encode(),
                        rec["mid"],
                        min(int(rec.get("qos", 0)), opts.qos),  # §3.8.4 downgrade
                        bool(rec.get("retained", False)),
                        ack=adapter._log_ack,
                    )
                )
                delivered += 1
                if self.chunk_size > 0 and delivered % self.chunk_size == 0:
                    yield  # pause until the reader's next poll pumps again

        gen = deliveries()
        if self.chunk_size > 0:
            adapter._pump_gen = gen  # reader pumps one chunk per micro-batch
        else:
            for _ in gen:  # pragma: no cover - chunk_size=0 never yields
                pass
        return adapter


def _iter_capture(path: str) -> Iterator[dict]:
    if not path:  # publish-only client: nothing to deliver
        return
    mid = 0
    for name in sorted(os.listdir(path)):
        if name.startswith(("_", ".")) or not name.endswith(".json"):
            continue
        with open(os.path.join(path, name)) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    rec = json.loads(line)
                    rec["mid"] = mid
                    mid += 1
                    yield rec


class _ReplayAdapter:
    def __init__(self, factory: ReplayClientFactory):
        self._factory = factory
        self.connected = True
        self._lock = threading.Lock()
        self._pump_gen = None

    def pump(self):
        """Deliver the next capture chunk (replay-only prefetch hook —
        a live push transport has no pump; the reader feature-detects)."""
        gen = self._pump_gen
        if gen is not None:
            try:
                next(gen)
            except StopIteration:
                self._pump_gen = None

    def _append(self, log_path: str, rec: dict):
        if not log_path:
            return
        with self._lock, open(log_path, "a") as fh:
            fh.write(json.dumps(rec) + "\n")

    def _log_ack(self, msg: MqttMessage):
        self._append(self._factory.ack_log, {"mid": msg.mid, "topic": msg.topic})

    def publish(self, topic, payload, qos, retained):
        self._append(
            self._factory.publish_log,
            {
                "topic": topic,
                "payload": payload.decode() if isinstance(payload, (bytes, bytearray)) else str(payload),
                "qos": qos,
                "retained": retained,
                "client_id": getattr(self, "_client_id", ""),
            },
        )

    def close(self):
        self.connected = False


def _make_factory(options) -> Callable:
    transport = (options.get("transport") or "paho").lower()
    if transport == "paho":
        return PahoClientFactory()
    if transport == "replay":
        return ReplayClientFactory(
            capture_path=options.get("capture_path") or "",
            ack_log=options.get("ack_log") or "",
            publish_log=options.get("publish_log") or "",
            fail_connect=(options.get("fail_connect") or "").lower() == "true",
            drop_connection_after=int(options.get("drop_connection_after") or -1),
            chunk_size=int(options.get("chunk_size") or 0),
        )
    raise ValueError(f"unknown mqtt transport {transport!r} (paho|replay)")


def _opts_from(options) -> MqttOpts:
    return MqttOpts(
        broker=options.get("broker") or "",
        client_id=options.get("client_id") or "",
        topic=options.get("topic") or "#",
        qos=int(options.get("qos") or 1),
        retained=(options.get("retained") or "").lower() == "true",
        keep_alive=float(options.get("keep_alive") or 30.0),
        username=options.get("username") or "",
        password=options.get("password") or "",
    )


# Envelope columns the source emits — the Message[T] shape
# (types.go:10-26) + delivery metadata, matching MqttReplaySource.
MQTT_STREAM_SCHEMA = (
    "key string, value binary, topic string, attributes map<string,string>"
)


class _MqttSimpleStreamReader(SeqWindowStreamReader):
    """Driver-side reader on the shared
    :class:`~cheetah_spark.sources.seqwindow.SeqWindowStreamReader`
    core: buffers pushed messages, serves them as seq-numbered
    micro-batch slices, acks on commit.

    Offsets are ``{"seq": n}`` — the count of messages admitted so
    far. ``commit(end)`` fires the manual acks for every message below
    ``end`` — at-least-once, ack-after-sink (T4): an unacked QoS≥1
    message is redelivered by the broker on reconnect. The lost-window
    policy is QoS-aware (see ``_on_lost_window``)."""

    _PICKLE_FIELDS = ("_opts", "_factory")

    def __init__(self, options):
        self._opts = _opts_from(options)
        if (options.get("transport") or "paho").lower() == "paho":
            self._opts.validate_connect()
        self._factory = _make_factory(options)
        self._init_runtime()

    def _make_listener(self):
        return self._factory(self._opts, self._on_item, self._on_error)

    def _row_of(self, msg: MqttMessage) -> tuple:
        return (
            str(msg.mid),
            bytes(msg.payload),
            msg.topic,
            {"qos": str(msg.qos), "retained": str(msg.retained).lower()},
        )

    def _ack_of(self, msg: MqttMessage, seq: int, listener):
        return msg  # MqttMessage carries its own ack closure

    def _on_lost_window(self, start_seq: int, end_seq: int) -> None:
        # The replay window lives in this reader process's memory, so a
        # driver restart loses it. For QoS>=1 the unacked messages come
        # back via broker redelivery (at-least-once holds); at QoS 0
        # there is no redelivery, so committing this empty range is
        # silent data loss — fail the query instead of hiding it, and
        # make the QoS>=1 reliance on redelivery visible in the log.
        if int(self._opts.qos) == 0:
            raise RuntimeError(
                f"mqtt: replay window lost for offsets [{start_seq},{end_seq}) "
                "after restart and qos=0 has no broker redelivery — rows are "
                "unrecoverable; use qos>=1 for at-least-once recovery"
            )
        import warnings

        warnings.warn(
            f"mqtt: replay window lost for offsets [{start_seq},{end_seq}) "
            f"({end_seq - start_seq} rows) — relying on broker QoS>=1 redelivery "
            "of unacked messages for delivery",
            RuntimeWarning,
            stacklevel=2,
        )


class MqttStreamDataSource(DataSource):
    """``spark.readStream.format("cheetah-mqtt")`` — the subscribe half
    of the reference's MQTT connector (mqtt.Source, mqtt.go:178-251) as
    a Python streaming data source."""

    @classmethod
    def name(cls) -> str:
        return "cheetah-mqtt"

    def schema(self) -> str:
        return MQTT_STREAM_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return _MqttSimpleStreamReader(self.options)


def register_mqtt_source(spark: SparkSession) -> None:
    """Register the cheetah-mqtt format on this session. Registration
    is an idempotent per-session catalog write, so no memo — an
    id(spark)-keyed cache would go stale when CPython reuses a
    garbage-collected session's address."""
    spark.dataSource.register(MqttStreamDataSource)


@dataclass
class MqttLiveSource(Source):
    """Source adapter over the cheetah-mqtt stream format (S3).

    ``transport="paho"`` needs a reachable broker + the paho wheel;
    ``transport="replay"`` replays a capture through the same reader,
    ack path included."""

    broker: str = ""
    client_id: str = ""
    topic: str = "#"
    qos: int = 1
    username: str = ""
    password: str = ""
    keep_alive: float = 30.0
    transport: str = "paho"
    capture_path: str = ""
    ack_log: str = ""
    drop_connection_after: int = -1
    fail_connect: bool = False
    chunk_size: int = 0
    streaming: bool = True

    def read(self, spark: SparkSession) -> DataFrame:
        register_mqtt_source(spark)
        return (
            spark.readStream.format("cheetah-mqtt")
            .option("broker", self.broker)
            .option("client_id", self.client_id)
            .option("topic", self.topic)
            .option("qos", str(self.qos))
            .option("username", self.username)
            .option("password", self.password)
            .option("keep_alive", str(self.keep_alive))
            .option("transport", self.transport)
            .option("capture_path", self.capture_path)
            .option("ack_log", self.ack_log)
            .option("drop_connection_after", str(self.drop_connection_after))
            .option("fail_connect", str(self.fail_connect).lower())
            .option("chunk_size", str(self.chunk_size))
            .load()
        )


@dataclass
class MqttLiveSink(Sink):
    """Publish half (mqtt.Destination, mqtt.go:105-176): every row's
    ``payload_col`` goes to ONE fixed topic with the sink's QoS and
    retained flag, waiting on each publish token.

    Scale shape: ``foreachPartition`` — one client per executor
    partition, rows published from where they already live; no
    collect-to-driver. The factory (and its options) must therefore be
    picklable, which both transports are."""

    broker: str = ""
    client_id: str = ""
    topic: str = "out"
    qos: int = 1
    retained: bool = False
    # credentials + keep-alive: the reference's canonical MQTT config
    # uses the same keys for sources AND destinations (README.md:
    # 204-217 — userName/password/keepAlive, aliased in config.py), so
    # the publish path must accept and forward them too
    username: str = ""
    password: str = ""
    keep_alive: float = 30.0
    payload_col: str = "value"
    transport: str = "paho"
    publish_log: str = ""
    fail_connect: bool = False
    checkpoint: Optional[str] = None
    trigger: Optional[dict] = None

    def _publisher(self):
        opts = MqttOpts(
            broker=self.broker,
            client_id=self.client_id,
            topic=self.topic,
            qos=self.qos,
            retained=self.retained,
            username=self.username,
            password=self.password,
            keep_alive=self.keep_alive,
        )
        if self.transport == "paho":
            opts.validate_connect()
            factory: Callable = PahoClientFactory()
        else:
            factory = ReplayClientFactory(
                publish_log=self.publish_log, fail_connect=self.fail_connect
            )
        topic, qos, retained, col = self.topic, self.qos, self.retained, self.payload_col

        def publish_partition(rows):
            import dataclasses
            import uuid as _uuid

            client = None
            try:
                for row in rows:
                    if client is None:  # connect lazily: empty partitions open nothing
                        # unique per-partition client id: MQTT-3.1.4-2 —
                        # a duplicate ClientID makes the broker drop the
                        # existing connection, so N partitions sharing
                        # the configured id would disconnect each other
                        # mid-batch (the reference README demands unique
                        # ids for the same reason, README.md:208-210)
                        popts = dataclasses.replace(
                            opts,
                            client_id=f"{opts.client_id}-p{_uuid.uuid4().hex[:8]}",
                        )
                        client = factory(popts, None, lambda e: None)
                    payload = row[col]
                    if isinstance(payload, str):
                        payload = payload.encode()
                    client.publish(topic, payload, qos, retained)
            finally:
                if client is not None:
                    client.close()

        return publish_partition

    def write(self, df: DataFrame):
        publish = self._publisher()
        if df.isStreaming:
            w = df.writeStream.foreachBatch(
                lambda batch, _id: batch.foreachPartition(publish)
            ).outputMode("append")
            from cheetah_spark.sinks import _start

            return _start(
                w,
                self.checkpoint or f"/tmp/cheetah_spark_ckpt/mqtt_{uuid.uuid4().hex[:8]}",
                self.trigger,
            )
        df.foreachPartition(publish)
        return None

"""NSQ source/sink — the reference wishlist's "NSQ?" entry (reference
README.md:301-311 "Source / Destination Wishlist"), built on the
PUBLIC NSQ TCP protocol (nsq.io/clients/tcp_protocol_spec: the
``  V2`` magic, size-prefixed IDENTIFY/PUB bodies, line commands
SUB/RDY/FIN/REQ/NOP/CLS, and ``[size][frame-type][data]`` server
frames with 0=response / 1=error / 2=message, where a message is
``[8B ns-timestamp][2B attempts][16B id][body]``), spoken directly
over stdlib TCP sockets like the NATS/AMQP connectors.

Transports, the connector-family discipline:

- ``transport="socket"`` — a REAL NSQ connection over stdlib TCP.
  :class:`NsqClient` speaks the protocol verbatim; :class:`MiniNsqServer`
  is a loopback nsqd the conformance tests run against (threaded
  stdlib sockets, topics fanning out to channels, per-channel queues
  with RDY flow control, FIN acks, REQ requeues, heartbeat frames,
  and REQUEUE of in-flight messages when a consumer connection drops)
  — a real nsqd accepts the identical bytes.
- ``transport="replay"`` — a deterministic NDJSON capture (schema:
  ``topic, channel, body``) delivered in bounded chunks per
  micro-batch, batch or streaming.

Rows surface as ``topic string, message_id string, attempts int,
body string``. NSQ is at-least-once when consumers FIN: the
seq-window reader fires ``FIN <id>`` on checkpoint commit (reference
kawa T4 ackFn semantics, processor.go:101-118), and nsqd requeues
in-flight messages when the consumer drops or its msg timeout lapses
— so the lost-window policy is the MQTT QoS≥1 / AMQP one: warn and
rely on requeue."""

from __future__ import annotations

import itertools
import json
import os
import socket
import struct
import threading
from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType

from cheetah_spark.sinks import Sink
from cheetah_spark.sources import Source
from cheetah_spark.sources.seqwindow import SeqWindowStreamReader

NSQ_SCHEMA = "topic string, message_id string, attempts int, body string"

_MAGIC = b"  V2"
FRAME_RESPONSE, FRAME_ERROR, FRAME_MESSAGE = 0, 1, 2


def _frame(ftype: int, data: bytes) -> bytes:
    return struct.pack(">II", len(data) + 4, ftype) + data


def _msg_payload(ts_ns: int, attempts: int, mid: bytes, body: bytes) -> bytes:
    if len(mid) != 16:
        raise ValueError("nsq: message id must be 16 bytes")
    return struct.pack(">qH", ts_ns, attempts) + mid + body


def _read_frame(fh):
    head = fh.read(4)
    if len(head) < 4:
        raise ConnectionError("nsq: connection closed")
    (size,) = struct.unpack(">I", head)
    payload = fh.read(size)
    if len(payload) < size:
        raise ConnectionError("nsq: truncated frame")
    (ftype,) = struct.unpack(">I", payload[:4])
    return ftype, payload[4:]


def _parse_message(data: bytes):
    ts_ns, attempts = struct.unpack(">qH", data[:10])
    mid = data[10:26].decode("ascii")
    body = data[26:]
    return ts_ns, attempts, mid, body


class NsqClient:
    """Minimal NSQ client (stdlib socket): magic, IDENTIFY, then
    PUB / SUB+RDY / next_message / FIN / REQ. One instance per
    thread/partition."""

    def __init__(self, addr: str):
        host, _, port = addr.rpartition(":")
        self._sock = socket.create_connection((host or "127.0.0.1", int(port)))
        self._fh = self._sock.makefile("rb")
        self._send_lock = threading.Lock()
        self._send(_MAGIC)
        body = json.dumps({"client_id": "cheetah", "feature_negotiation": False}).encode()
        self._send(b"IDENTIFY\n" + struct.pack(">I", len(body)) + body)
        self._expect_response(b"OK")

    def _send(self, data: bytes) -> None:
        with self._send_lock:
            self._sock.sendall(data)

    def _expect_response(self, want: bytes) -> None:
        ftype, data = _read_frame(self._fh)
        if ftype == FRAME_ERROR:
            raise RuntimeError(f"nsq error: {data.decode()}")
        if ftype != FRAME_RESPONSE or data != want:
            raise RuntimeError(f"nsq: expected {want!r}, got frame {ftype} {data!r}")

    def pub(self, topic: str, body) -> None:
        if isinstance(body, str):
            body = body.encode("utf-8")
        self._send(f"PUB {topic}\n".encode() + struct.pack(">I", len(body)) + body)
        self._expect_response(b"OK")

    def sub(self, topic: str, channel: str) -> None:
        self._send(f"SUB {topic} {channel}\n".encode())
        self._expect_response(b"OK")

    def rdy(self, count: int) -> None:
        self._send(f"RDY {count}\n".encode())

    def fin(self, message_id: str) -> None:
        self._send(f"FIN {message_id}\n".encode())

    def req(self, message_id: str, timeout_ms: int = 0) -> None:
        self._send(f"REQ {message_id} {timeout_ms}\n".encode())

    def next_message(self):
        """Block for the next message frame → (message_id, attempts,
        body:str). Answers heartbeats with NOP transparently."""
        while True:
            ftype, data = _read_frame(self._fh)
            if ftype == FRAME_MESSAGE:
                _ts, attempts, mid, body = _parse_message(data)
                return mid, attempts, body.decode("utf-8")
            if ftype == FRAME_RESPONSE:
                if data == b"_heartbeat_":
                    self._send(b"NOP\n")
                continue
            if ftype == FRAME_ERROR:
                raise RuntimeError(f"nsq error: {data.decode()}")

    def close(self) -> None:
        try:
            self._send(b"CLS\n")
        except OSError:
            pass
        try:
            self._sock.shutdown(socket.SHUT_RDWR)
        except OSError:
            pass
        try:
            self._fh.close()
        except OSError:
            pass
        try:
            self._sock.close()
        except OSError:
            pass


class _Channel:
    def __init__(self, name: str):
        self.name = name
        self.queue: list[tuple[str, bytes, int]] = []  # (mid, body, attempts)
        self.in_flight: dict[str, tuple[int, bytes, int]] = {}  # mid -> (conn-id, body, attempts)
        self.consumer = None  # (conn, rdy_remaining)


class MiniNsqServer:
    """Loopback nsqd: magic + IDENTIFY, topics fanning out to channels
    (every channel receives every message; consumers on one channel
    share its queue), RDY flow control, FIN acks, REQ requeues, and
    REQUEUE of in-flight messages when a consumer connection drops —
    the at-least-once contract FIN-on-commit relies on."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((host, port))
        self._sock.listen(16)
        self.addr = "%s:%d" % self._sock.getsockname()
        self._lock = threading.Lock()
        self._topics: dict[str, dict[str, _Channel]] = {}
        self._parked: dict[str, list[bytes]] = {}  # PUBs before any channel
        self._mid = itertools.count(1)
        self._send_locks: dict[int, threading.Lock] = {}
        self._closing = False
        threading.Thread(target=self._accept_loop, daemon=True).start()

    def _accept_loop(self) -> None:
        while not self._closing:
            try:
                conn, _ = self._sock.accept()
            except OSError:
                return
            threading.Thread(target=self._serve, args=(conn,), daemon=True).start()

    def _send(self, conn, data: bytes) -> None:
        with self._send_locks.setdefault(id(conn), threading.Lock()):
            conn.sendall(data)

    def _serve(self, conn) -> None:
        fh = conn.makefile("rb")
        with self._lock:
            self._send_locks[id(conn)] = threading.Lock()
        try:
            if fh.read(4) != _MAGIC:
                return
            while not self._closing:
                try:
                    line = fh.readline()
                except OSError:
                    return
                if not line:
                    return
                parts = line.rstrip(b"\n").split(b" ")
                verb = parts[0].decode()
                if verb == "IDENTIFY":
                    (n,) = struct.unpack(">I", fh.read(4))
                    fh.read(n)
                    self._send(conn, _frame(FRAME_RESPONSE, b"OK"))
                elif verb == "PUB":
                    topic = parts[1].decode()
                    (n,) = struct.unpack(">I", fh.read(4))
                    body = fh.read(n)
                    self._publish(topic, body)
                    self._send(conn, _frame(FRAME_RESPONSE, b"OK"))
                elif verb == "SUB":
                    topic, channel = parts[1].decode(), parts[2].decode()
                    with self._lock:
                        ch = self._channel(topic, channel)
                        ch.consumer = (conn, 0)
                    self._send(conn, _frame(FRAME_RESPONSE, b"OK"))
                elif verb == "RDY":
                    count = int(parts[1])
                    self._set_rdy(conn, count)
                elif verb == "FIN":
                    self._fin(parts[1].decode())
                elif verb == "REQ":
                    self._req(parts[1].decode())
                elif verb == "NOP":
                    continue
                elif verb == "CLS":
                    self._send(conn, _frame(FRAME_RESPONSE, b"CLOSE_WAIT"))
                    return
                else:
                    self._send(conn, _frame(FRAME_ERROR, b"E_INVALID"))
        except (ConnectionError, OSError):
            return
        finally:
            self._drop_conn(conn)

    def _channel(self, topic: str, channel: str) -> _Channel:
        chans = self._topics.setdefault(topic, {})
        if channel not in chans:
            chans[channel] = _Channel(channel)
            # real-nsqd semantics: messages PUB'd before any channel
            # existed are parked on the topic and copied into the first
            # channel(s) created afterwards
            for body in self._parked.pop(topic, []):
                chans[channel].queue.append((f"{next(self._mid):016d}", body, 1))
        return chans[channel]

    def _publish(self, topic: str, body: bytes) -> None:
        deliveries = []
        with self._lock:
            chans = self._topics.setdefault(topic, {})
            for ch in chans.values():
                mid = f"{next(self._mid):016d}"
                ch.queue.append((mid, body, 1))
                deliveries.append(ch)
            if not chans:
                self._parked.setdefault(topic, []).append(body)
        for ch in deliveries:
            self._pump_channel(ch)

    def _set_rdy(self, conn, count: int) -> None:
        with self._lock:
            targets = []
            for chans in self._topics.values():
                for ch in chans.values():
                    if ch.consumer is not None and ch.consumer[0] is conn:
                        ch.consumer = (conn, count)
                        targets.append(ch)
        for ch in targets:
            self._pump_channel(ch)

    def _pump_channel(self, ch: _Channel) -> None:
        while True:
            with self._lock:
                if ch.consumer is None or ch.consumer[1] <= 0 or not ch.queue:
                    return
                conn, rdy = ch.consumer
                mid, body, attempts = ch.queue.pop(0)
                ch.consumer = (conn, rdy - 1)
                ch.in_flight[mid] = (id(conn), body, attempts)
            try:
                self._send(
                    conn,
                    _frame(
                        FRAME_MESSAGE,
                        _msg_payload(0, attempts, mid.encode("ascii"), body),
                    ),
                )
            except OSError:
                self._drop_conn(conn)
                return

    def _fin(self, mid: str) -> None:
        with self._lock:
            for chans in self._topics.values():
                for ch in chans.values():
                    ch.in_flight.pop(mid, None)

    def _req(self, mid: str) -> None:
        targets = []
        with self._lock:
            for chans in self._topics.values():
                for ch in chans.values():
                    got = ch.in_flight.pop(mid, None)
                    if got is not None:
                        _cid, body, attempts = got
                        ch.queue.insert(0, (mid, body, attempts + 1))
                        targets.append(ch)
        for ch in targets:
            self._pump_channel(ch)

    def _drop_conn(self, conn) -> None:
        requeued = []
        with self._lock:
            for chans in self._topics.values():
                for ch in chans.values():
                    if ch.consumer is not None and ch.consumer[0] is conn:
                        ch.consumer = None
                    mine = [m for m, (cid, _, _) in ch.in_flight.items() if cid == id(conn)]
                    for m in sorted(mine):
                        _cid, body, attempts = ch.in_flight.pop(m)
                        ch.queue.insert(0, (m, body, attempts + 1))
                    if mine:
                        requeued.append(ch)
            self._send_locks.pop(id(conn), None)
        try:
            conn.close()
        except OSError:
            pass

    # -- introspection for tests ----------------------------------------------
    def in_flight_count(self) -> int:
        with self._lock:
            return sum(
                len(ch.in_flight)
                for chans in self._topics.values()
                for ch in chans.values()
            )

    def queued_count(self, topic: str, channel: str) -> int:
        with self._lock:
            return len(self._topics.get(topic, {}).get(channel, _Channel("")).queue)

    def close(self) -> None:
        self._closing = True
        try:
            self._sock.close()
        except OSError:
            pass


# ---------------------------------------------------------------------------
# Streaming reader (seq-window core) + transports
# ---------------------------------------------------------------------------


@dataclass
class NsqListenerFactory:
    """Real socket consumer: SUB + RDY on connect, a background thread
    drains message frames into the reader buffer; message ids ride
    along for FIN-on-commit."""

    addr: str = ""
    topic: str = "ev"
    channel: str = "cheetah"
    rdy: int = 2500

    def __call__(self, on_msg, on_error):
        listener = _NsqSubListener(self, on_msg, on_error)
        listener.start()
        return listener


class _NsqSubListener:
    def __init__(self, cfg: NsqListenerFactory, on_msg, on_error):
        self._cfg = cfg
        self._on_msg = on_msg
        self._on_error = on_error
        self._closing = False
        self._client: Optional[NsqClient] = None

    def start(self) -> None:
        c = NsqClient(self._cfg.addr)
        c.sub(self._cfg.topic, self._cfg.channel)
        c.rdy(self._cfg.rdy)
        self._client = c
        threading.Thread(target=self._loop, name="cheetah-nsq-sub", daemon=True).start()

    def _loop(self) -> None:
        try:
            while not self._closing:
                mid, attempts, body = self._client.next_message()
                self._on_msg(self._cfg.topic, mid, attempts, body)
        except Exception as exc:
            if not self._closing:
                self._on_error(exc)

    def ack(self, message_id: str) -> None:
        self._client.fin(message_id)

    def close(self) -> None:
        self._closing = True
        if self._client is not None:
            self._client.close()


@dataclass
class NsqReplayFactory:
    """NDJSON capture stand-in (schema: topic, body), delivered
    ``chunk_size`` records per micro-batch ``pump()``; ``chunk_size<=0``
    drains at construction."""

    capture_path: str = ""
    chunk_size: int = 0

    def __call__(self, on_msg, on_error):
        pump = _NsqReplayPump(self, on_msg)
        if self.chunk_size <= 0:
            pump.pump_all()
        return pump


class _NsqReplayPump:
    def __init__(self, factory: NsqReplayFactory, on_msg):
        self._factory = factory
        self._on_msg = on_msg
        self._gen = self._deliveries()

    def _iter_capture(self):
        path = self._factory.capture_path
        names = sorted(os.listdir(path)) if os.path.isdir(path) else [""]
        for name in names:
            fp = os.path.join(path, name) if name else path
            if name and not (name.endswith(".json") or name.endswith(".ndjson")):
                continue
            with open(fp) as fh:
                for line in fh:
                    line = line.strip()
                    if not line:
                        continue
                    rec = json.loads(line)
                    yield rec["topic"], rec["body"]

    def _deliveries(self):
        delivered = 0
        for topic, body in self._iter_capture():
            # replay has no nsqd to FIN: message_id None, attempts 1
            self._on_msg(topic, None, 1, body)
            delivered += 1
            cs = self._factory.chunk_size
            if cs > 0 and delivered % cs == 0:
                yield

    def pump(self):
        try:
            next(self._gen)
        except StopIteration:
            pass

    def pump_all(self):
        for _ in self._gen:  # pragma: no cover - chunk_size=0 never yields
            pass

    def close(self):
        pass


def _nsq_factory(options) -> Callable:
    transport = (options.get("transport") or "socket").lower()
    if transport == "socket":
        return NsqListenerFactory(
            addr=options.get("addr") or "",
            topic=options.get("topic") or "ev",
            channel=options.get("channel") or "cheetah",
            rdy=int(options.get("rdy") or 2500),
        )
    if transport == "replay":
        return NsqReplayFactory(
            capture_path=options.get("capture_path") or "",
            chunk_size=int(options.get("chunk_size") or 0),
        )
    raise ValueError(f"nsq: unknown transport {transport!r} (socket|replay)")


class _MidAck:
    __slots__ = ("_listener", "_mid")

    def __init__(self, listener, mid: str):
        self._listener = listener
        self._mid = mid

    def ack(self) -> None:
        try:
            self._listener.ack(self._mid)
        except Exception:
            pass  # nsqd requeues in-flight on disconnect/timeout


class _NsqSimpleStreamReader(SeqWindowStreamReader):
    """Seq-window reader over the SUB listener / replay pump. Acks:
    ``FIN <id>`` fires on checkpoint commit (reference kawa T4 ackFn);
    a lost replay window warns and relies on in-flight requeue (the
    MQTT QoS>=1 / AMQP policy)."""

    _PICKLE_FIELDS = ("_factory",)

    def __init__(self, options):
        self._factory = _nsq_factory(options)
        self._init_runtime()

    def _make_listener(self):
        return self._factory(self._on_msg, self._on_error)

    def _on_msg(self, topic: str, mid, attempts: int, body: str) -> None:
        self._on_item((topic, mid, attempts, body))

    def _row_of(self, item: tuple) -> tuple:
        topic, mid, attempts, body = item
        return (topic, mid or "", attempts, body)

    def _ack_of(self, item, seq: int, listener):
        mid = item[1]
        if mid is None:
            return None
        return _MidAck(listener, mid)

    def _on_lost_window(self, start_seq: int, end_seq: int) -> None:
        import warnings

        warnings.warn(
            f"nsq: replay window [{start_seq},{end_seq}) lost after restart; "
            "messages in it were never FIN'd — nsqd requeues in-flight "
            "messages on disconnect/timeout (at-least-once)",
            stacklevel=2,
        )


class NsqStreamDataSource(DataSource):
    """``spark.readStream.format("cheetah-nsq")`` — an NSQ channel
    consumer as a Python streaming data source."""

    @classmethod
    def name(cls) -> str:
        return "cheetah-nsq"

    def schema(self) -> str:
        return NSQ_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return _NsqSimpleStreamReader(self.options)


def register_nsq_source(spark: SparkSession) -> None:
    spark.dataSource.register(NsqStreamDataSource)


# ---------------------------------------------------------------------------
# Source / Sink adapters (config types)
# ---------------------------------------------------------------------------


@dataclass
class NsqSource(Source):
    """Config type ``{"type":"nsq","addr":...,"topic":...,
    "channel":...}``."""

    addr: str = ""
    topic: str = "ev"
    channel: str = "cheetah"
    rdy: int = 2500
    transport: str = "socket"  # socket | replay
    capture_path: str = ""
    chunk_size: int = 0
    streaming: bool = True

    def read(self, spark: SparkSession) -> DataFrame:
        if not self.streaming:
            # batch is only meaningful over a capture: an NSQ channel
            # drains on consume+FIN; there is no history to snapshot
            if self.transport.lower() != "replay":
                raise ValueError(
                    "nsq: batch reads need transport='replay' — a channel "
                    "drains on consume; use a capture"
                )
            env = (
                spark.read.schema("topic string, body string")
                .json(self.capture_path)
                .select(
                    "topic",
                    F.lit("").alias("message_id"),
                    F.lit(1).alias("attempts"),
                    "body",
                )
            )
            if self.topic:
                env = env.where(F.col("topic") == self.topic)
            return env
        register_nsq_source(spark)
        reader = spark.readStream.format("cheetah-nsq")
        for k, v in (
            ("transport", self.transport),
            ("addr", self.addr),
            ("topic", self.topic),
            ("channel", self.channel),
            ("rdy", str(self.rdy) if self.rdy != 2500 else ""),
            ("capture_path", self.capture_path),
            ("chunk_size", str(self.chunk_size) if self.chunk_size else ""),
        ):
            if v:
                reader = reader.option(k, v)
        return reader.load()


@dataclass
class NsqSink(Sink):
    """PUB every row (``topic, body`` — missing columns default to the
    configured topic / a JSON struct of the row). One socket per
    partition; replay transport appends the NDJSON capture the source
    reads."""

    addr: str = ""
    topic: str = "out"
    transport: str = "socket"  # socket | replay
    capture_path: str = ""
    checkpoint: Optional[str] = None
    trigger: Optional[dict] = None

    def write(self, df: DataFrame):
        from cheetah_spark.sinks import _start

        t = self.transport.lower()
        cols = set(df.columns)
        topic_col = F.col("topic") if "topic" in cols else F.lit(self.topic)
        body_col = (
            F.col("body")
            if "body" in cols
            else F.to_json(F.struct(*[F.col(c) for c in df.columns]))
        )
        out = df.select(topic_col.alias("topic"), body_col.alias("body"))
        if t == "replay":
            if df.isStreaming:
                w = (
                    out.writeStream.format("json")
                    .option("path", self.capture_path)
                    .outputMode("append")
                )
                return _start(
                    w, self.checkpoint or f"{self.capture_path}/_checkpoint", self.trigger
                )
            out.write.mode("append").json(self.capture_path)
            return None
        if t != "socket":
            raise ValueError(f"nsq: unknown transport {t!r} (socket|replay)")
        addr = self.addr

        def send(rows):
            client = None
            try:
                for r in rows:
                    if client is None:
                        client = NsqClient(addr)
                    client.pub(r.topic, r.body)
            finally:
                if client is not None:
                    client.close()

        if df.isStreaming:
            import uuid as _uuid

            w = out.writeStream.foreachBatch(
                lambda batch, _id: batch.foreachPartition(send)
            ).outputMode("append")
            return _start(
                w,
                self.checkpoint or f"/tmp/cheetah_spark_ckpt/nsq_{_uuid.uuid4().hex[:8]}",
                self.trigger,
            )
        out.foreachPartition(send)
        return None

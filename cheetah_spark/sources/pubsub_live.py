"""Pub/Sub source/sink — the reference wishlist's #5 connector
(reference README.md:301-311 "Source / Destination Wishlist: pubsub"),
built on the PUBLIC Google Cloud Pub/Sub REST API (cloud.google.com/
pubsub/docs/reference/rest — the same JSON-over-HTTP surface the
official Pub/Sub emulator serves): ``topics:publish``,
``subscriptions:pull``, ``subscriptions:acknowledge``, with base64
message data, attributes, server-assigned message ids, ack-id leases,
and subscription FILTERS (``attributes.key = "value"`` per the public
filter syntax), spoken over stdlib ``urllib``/``http.server``.

Transports, the redis_live/nats_live/amqp_live discipline:

- ``transport="http"`` — REAL Pub/Sub REST calls over HTTP.
  :class:`PubSubClient` issues the documented requests verbatim
  (create topic/subscription, ``:publish`` → ``messageIds``,
  ``:pull`` → ``receivedMessages`` with ``ackId`` leases,
  ``:acknowledge``); :class:`MiniPubSubServer` is a loopback server
  the conformance tests run against (``ThreadingHTTPServer``,
  per-subscription message queues, ack-deadline lease expiry with
  REDELIVERY, attribute-equality filters) — the official emulator (or
  the real service, plus auth) accepts the identical requests.
- ``transport="replay"`` — a deterministic NDJSON capture (schema:
  ``message_id, attributes, data`` with attributes as a canonical
  JSON string) delivered in bounded chunks per micro-batch through
  the same envelope, batch or streaming.

Rows surface as ``message_id string, attributes string, data string``.
Pub/Sub is at-least-once: the seq-window reader fires ``:acknowledge``
per ack-id on checkpoint commit (reference kawa T4 ackFn semantics,
processor.go:101-118), and the service redelivers leases that expire
unacked — so the lost-window policy after a reader restart is the MQTT
QoS≥1 / AMQP one: warn and rely on redelivery rather than fail.
"""

from __future__ import annotations

import base64
import http.server
import itertools
import json
import os
import threading
import time
import urllib.request
from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType

from cheetah_spark.sinks import Sink
from cheetah_spark.sources import Source
from cheetah_spark.sources.seqwindow import SeqWindowStreamReader

PUBSUB_SCHEMA = "message_id string, attributes string, data string"


# ---------------------------------------------------------------------------
# Subscription filters (public syntax subset: attribute equality,
# AND-conjunction — cloud.google.com/pubsub/docs/subscription-message-filter)
# ---------------------------------------------------------------------------


def parse_filter(expr: str) -> list:
    """``attributes.k = "v" AND attributes.k2 = "v2"`` → [(k, v), ...].
    The public filter grammar is larger (OR, NOT, hasPrefix); this
    connector implements the equality-conjunction subset and rejects
    the rest loudly rather than mis-filtering."""
    import re as _re

    if not expr or not expr.strip():
        return []
    clauses = []
    for part in _re.split(r"\s+AND\s+", expr.strip()):
        m = _re.fullmatch(r'attributes\.([\w.-]+)\s*=\s*"([^"]*)"', part.strip())
        if not m:
            raise ValueError(
                f"pubsub: unsupported filter clause {part!r} — this connector "
                'implements the attributes.key = "value" [AND ...] subset'
            )
        clauses.append((m.group(1), m.group(2)))
    return clauses


def filter_matches(clauses: list, attributes: dict) -> bool:
    return all(attributes.get(k) == v for k, v in clauses)


def filter_match_col(expr: str):
    """The same filter as a Catalyst predicate over the canonical
    attributes-JSON column (no Python UDF)."""
    clauses = parse_filter(expr)
    cond = F.lit(True)
    for k, v in clauses:
        cond = cond & (F.get_json_object("attributes", f"$.{k}") == F.lit(v))
    return cond


def _canon_attrs(attributes: dict) -> str:
    """Canonical (sorted-key, no-space) JSON so the attributes column
    hash-compares stably between transports and the oracle."""
    return json.dumps(attributes or {}, sort_keys=True, separators=(",", ":"))


# ---------------------------------------------------------------------------
# Loopback server (conformance stand-in — the official emulator serves the
# same REST surface)
# ---------------------------------------------------------------------------


class _Subscription:
    def __init__(self, topic: str, ack_deadline_s: float, filter_expr: str):
        self.topic = topic
        self.ack_deadline_s = ack_deadline_s
        self.filter_clauses = parse_filter(filter_expr)
        self.queue: list[dict] = []  # undelivered messages
        self.leased: dict[str, tuple[float, dict]] = {}  # ackId -> (expiry, message)


class MiniPubSubServer:
    """Loopback Pub/Sub REST server: topics, subscriptions (with
    attribute-equality filters), ``:publish`` fan-out,``:pull`` with
    ack-id leases, ``:acknowledge``, and REDELIVERY of leases that
    expire unacked (the at-least-once contract ack-on-commit relies
    on)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        outer = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _reply(self, code: int, obj: dict) -> None:
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _body(self) -> dict:
                n = int(self.headers.get("Content-Length") or 0)
                raw = self.rfile.read(n) if n else b""
                return json.loads(raw) if raw else {}

            def do_PUT(self):
                try:
                    self._reply(200, outer._handle_put(self.path, self._body()))
                except KeyError as exc:
                    self._reply(404, {"error": {"code": 404, "message": str(exc)}})
                except ValueError as exc:
                    self._reply(400, {"error": {"code": 400, "message": str(exc)}})

            def do_POST(self):
                try:
                    self._reply(200, outer._handle_post(self.path, self._body()))
                except KeyError as exc:
                    self._reply(404, {"error": {"code": 404, "message": str(exc)}})
                except ValueError as exc:
                    self._reply(400, {"error": {"code": 400, "message": str(exc)}})

        self._httpd = http.server.ThreadingHTTPServer((host, port), Handler)
        self.addr = "%s:%d" % self._httpd.server_address
        self._lock = threading.Lock()
        self._topics: dict[str, list[str]] = {}  # topic path -> subscription paths
        self._subs: dict[str, _Subscription] = {}
        self._next_mid = itertools.count(1)
        self._next_ack = itertools.count(1)
        threading.Thread(target=self._httpd.serve_forever, daemon=True).start()

    # -- REST dispatch -------------------------------------------------------
    def _handle_put(self, path: str, body: dict) -> dict:
        # PUT /v1/projects/{p}/topics/{t} | /v1/projects/{p}/subscriptions/{s}
        name = path[len("/v1/") :]
        if "/topics/" in name:
            with self._lock:
                self._topics.setdefault(name, [])
            return {"name": name}
        if "/subscriptions/" in name:
            topic = body.get("topic") or ""
            with self._lock:
                if topic not in self._topics:
                    raise KeyError(f"topic not found: {topic}")
                sub = _Subscription(
                    topic,
                    float(body.get("ackDeadlineSeconds") or 10),
                    body.get("filter") or "",
                )
                self._subs[name] = sub
                self._topics[topic].append(name)
            return {"name": name, "topic": topic}
        raise ValueError(f"unknown resource {path}")

    def _handle_post(self, path: str, body: dict) -> dict:
        if path.endswith(":publish"):
            topic = path[len("/v1/") : -len(":publish")]
            return self._publish(topic, body.get("messages") or [])
        if path.endswith(":pull"):
            sub = path[len("/v1/") : -len(":pull")]
            return self._pull(sub, int(body.get("maxMessages") or 10))
        if path.endswith(":acknowledge"):
            sub = path[len("/v1/") : -len(":acknowledge")]
            return self._acknowledge(sub, body.get("ackIds") or [])
        raise ValueError(f"unknown method {path}")

    def _publish(self, topic: str, messages: list) -> dict:
        with self._lock:
            if topic not in self._topics:
                raise KeyError(f"topic not found: {topic}")
            mids = []
            for m in messages:
                mid = str(next(self._next_mid))
                mids.append(mid)
                attrs = m.get("attributes") or {}
                rec = {
                    "data": m.get("data") or "",
                    "attributes": attrs,
                    "messageId": mid,
                    "publishTime": "1970-01-01T00:00:00Z",
                }
                for sname in self._topics[topic]:
                    sub = self._subs[sname]
                    if filter_matches(sub.filter_clauses, attrs):
                        sub.queue.append(rec)
        return {"messageIds": mids}

    def _pull(self, sname: str, max_messages: int) -> dict:
        now = time.monotonic()
        with self._lock:
            sub = self._subs.get(sname)
            if sub is None:
                raise KeyError(f"subscription not found: {sname}")
            # expired leases go back to the front of the queue (redelivery)
            expired = [aid for aid, (exp, _) in sub.leased.items() if exp <= now]
            for aid in expired:
                _, msg = sub.leased.pop(aid)
                sub.queue.insert(0, msg)
            out = []
            while sub.queue and len(out) < max_messages:
                msg = sub.queue.pop(0)
                aid = f"ack-{next(self._next_ack)}"
                sub.leased[aid] = (now + sub.ack_deadline_s, msg)
                out.append({"ackId": aid, "message": msg})
        return {"receivedMessages": out}

    def _acknowledge(self, sname: str, ack_ids: list) -> dict:
        with self._lock:
            sub = self._subs.get(sname)
            if sub is None:
                raise KeyError(f"subscription not found: {sname}")
            for aid in ack_ids:
                sub.leased.pop(aid, None)
        return {}

    # -- introspection for tests ----------------------------------------------
    def leased_count(self, sname: str) -> int:
        with self._lock:
            return len(self._subs[sname].leased)

    def queued_count(self, sname: str) -> int:
        with self._lock:
            return len(self._subs[sname].queue)

    def close(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()


# ---------------------------------------------------------------------------
# Client (stdlib urllib)
# ---------------------------------------------------------------------------


class PubSubClient:
    """Minimal Pub/Sub REST client. ``addr`` is the emulator-style
    ``host:port``; a real endpoint additionally needs an OAuth bearer
    token, which the loopback/emulator surface does not check."""

    def __init__(self, addr: str, project: str = "p"):
        self._base = f"http://{addr}/v1"
        self.project = project

    def _call(self, method: str, path: str, body: Optional[dict] = None) -> dict:
        data = json.dumps(body or {}).encode()
        req = urllib.request.Request(
            f"{self._base}/{path}",
            data=data,
            method=method,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            return json.loads(resp.read() or b"{}")

    def topic_path(self, topic: str) -> str:
        return f"projects/{self.project}/topics/{topic}"

    def sub_path(self, sub: str) -> str:
        return f"projects/{self.project}/subscriptions/{sub}"

    def create_topic(self, topic: str) -> dict:
        return self._call("PUT", self.topic_path(topic))

    def create_subscription(
        self, sub: str, topic: str, ack_deadline_s: int = 10, filter_expr: str = ""
    ) -> dict:
        body: dict = {
            "topic": self.topic_path(topic),
            "ackDeadlineSeconds": ack_deadline_s,
        }
        if filter_expr:
            body["filter"] = filter_expr
        return self._call("PUT", self.sub_path(sub), body)

    def publish(self, topic: str, messages: list) -> list:
        """messages: [{"data": str|bytes, "attributes": {...}}] →
        messageIds. Data is base64-wrapped per the REST contract."""
        enc = []
        for m in messages:
            d = m.get("data") or b""
            if isinstance(d, str):
                d = d.encode("utf-8")
            enc.append(
                {
                    "data": base64.b64encode(d).decode("ascii"),
                    "attributes": m.get("attributes") or {},
                }
            )
        out = self._call("POST", f"{self.topic_path(topic)}:publish", {"messages": enc})
        return out.get("messageIds") or []

    def pull(self, sub: str, max_messages: int = 100) -> list:
        """→ [(ackId, message_id, attributes:dict, data:str)]."""
        out = self._call(
            "POST", f"{self.sub_path(sub)}:pull", {"maxMessages": max_messages}
        )
        recs = []
        for rm in out.get("receivedMessages") or []:
            msg = rm["message"]
            data = base64.b64decode(msg.get("data") or "").decode("utf-8")
            recs.append((rm["ackId"], msg["messageId"], msg.get("attributes") or {}, data))
        return recs

    def acknowledge(self, sub: str, ack_ids: list) -> None:
        if ack_ids:
            self._call("POST", f"{self.sub_path(sub)}:acknowledge", {"ackIds": ack_ids})


# ---------------------------------------------------------------------------
# Streaming reader (seq-window core) + transports
# ---------------------------------------------------------------------------


@dataclass
class PubSubListenerFactory:
    """Real REST consumer: a background thread polls ``:pull`` into the
    reader buffer; ack-ids ride along for ack-on-commit."""

    addr: str = ""
    project: str = "p"
    subscription: str = "sub"
    poll_ms: int = 100
    max_messages: int = 500

    def __call__(self, on_msg, on_error):
        listener = _PullListener(self, on_msg, on_error)
        listener.start()
        return listener


class _PullListener:
    def __init__(self, cfg: PubSubListenerFactory, on_msg, on_error):
        self._cfg = cfg
        self._on_msg = on_msg
        self._on_error = on_error
        self._closing = False
        self._client = PubSubClient(cfg.addr, cfg.project)

    def start(self) -> None:
        threading.Thread(target=self._loop, name="cheetah-pubsub-pull", daemon=True).start()

    def _loop(self) -> None:
        try:
            while not self._closing:
                recs = self._client.pull(self._cfg.subscription, self._cfg.max_messages)
                for ack_id, mid, attrs, data in recs:
                    self._on_msg(ack_id, mid, _canon_attrs(attrs), data)
                if not recs:
                    time.sleep(self._cfg.poll_ms / 1000.0)
        except Exception as exc:
            if not self._closing:
                self._on_error(exc)

    def ack(self, ack_id: str) -> None:
        self._client.acknowledge(self._cfg.subscription, [ack_id])

    def close(self) -> None:
        self._closing = True


@dataclass
class PubSubReplayFactory:
    """NDJSON capture stand-in (schema: message_id, attributes, data),
    delivered ``chunk_size`` records per micro-batch ``pump()``;
    ``chunk_size<=0`` drains at construction."""

    capture_path: str = ""
    chunk_size: int = 0

    def __call__(self, on_msg, on_error):
        pump = _PubSubReplayPump(self, on_msg)
        if self.chunk_size <= 0:
            pump.pump_all()
        return pump


class _PubSubReplayPump:
    def __init__(self, factory: PubSubReplayFactory, on_msg):
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
                    yield rec["message_id"], rec["attributes"], rec["data"]

    def _deliveries(self):
        delivered = 0
        for mid, attrs, data in self._iter_capture():
            self._on_msg(None, mid, attrs, data)  # replay: nothing to ack
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


def _pubsub_factory(options) -> Callable:
    transport = (options.get("transport") or "http").lower()
    if transport == "http":
        return PubSubListenerFactory(
            addr=options.get("addr") or "",
            project=options.get("project") or "p",
            subscription=options.get("subscription") or "sub",
            poll_ms=int(options.get("poll_ms") or 100),
            max_messages=int(options.get("max_messages") or 500),
        )
    if transport == "replay":
        return PubSubReplayFactory(
            capture_path=options.get("capture_path") or "",
            chunk_size=int(options.get("chunk_size") or 0),
        )
    raise ValueError(f"pubsub: unknown transport {transport!r} (http|replay)")


class _AckIdAck:
    __slots__ = ("_listener", "_ack_id")

    def __init__(self, listener, ack_id: str):
        self._listener = listener
        self._ack_id = ack_id

    def ack(self) -> None:
        try:
            self._listener.ack(self._ack_id)
        except Exception:
            pass  # lease expires -> service redelivers; at-least-once holds


class _PubSubSimpleStreamReader(SeqWindowStreamReader):
    """Seq-window reader over the pull listener / replay pump. Acks:
    ``:acknowledge`` per ack-id fires on checkpoint commit (reference
    kawa T4 ackFn); a lost replay window warns and relies on
    lease-expiry redelivery (the MQTT QoS>=1 / AMQP policy)."""

    _PICKLE_FIELDS = ("_factory",)

    def __init__(self, options):
        self._factory = _pubsub_factory(options)
        self._init_runtime()

    def _make_listener(self):
        return self._factory(self._on_msg, self._on_error)

    def _on_msg(self, ack_id, mid: str, attributes: str, data: str) -> None:
        self._on_item((ack_id, mid, attributes, data))

    def _row_of(self, item: tuple) -> tuple:
        return item[1:]

    def _ack_of(self, item, seq: int, listener):
        ack_id = item[0]
        if ack_id is None:
            return None
        return _AckIdAck(listener, ack_id)

    def _on_lost_window(self, start_seq: int, end_seq: int) -> None:
        import warnings

        warnings.warn(
            f"pubsub: replay window [{start_seq},{end_seq}) lost after restart; "
            "messages in it were never acked — their leases expire and the "
            "service redelivers them (at-least-once)",
            stacklevel=2,
        )


class PubSubStreamDataSource(DataSource):
    """``spark.readStream.format("cheetah-pubsub")`` — a Pub/Sub
    subscription as a Python streaming data source."""

    @classmethod
    def name(cls) -> str:
        return "cheetah-pubsub"

    def schema(self) -> str:
        return PUBSUB_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return _PubSubSimpleStreamReader(self.options)


def register_pubsub_source(spark: SparkSession) -> None:
    spark.dataSource.register(PubSubStreamDataSource)


# ---------------------------------------------------------------------------
# Source / Sink adapters (config types)
# ---------------------------------------------------------------------------


@dataclass
class PubSubSource(Source):
    """Config type ``{"type":"pubsub","addr":...,"project":...,
    "subscription":...}``."""

    addr: str = ""
    project: str = "p"
    subscription: str = "sub"
    filter: str = ""  # replay-side narrowing (the public filter subset)
    poll_ms: int = 100
    max_messages: int = 500
    transport: str = "http"  # http | replay
    capture_path: str = ""
    chunk_size: int = 0
    streaming: bool = True

    def read(self, spark: SparkSession) -> DataFrame:
        if not self.streaming:
            # batch is only meaningful over a capture: a subscription
            # backlog drains on pull+ack; there is no stable history to
            # snapshot (Seek/retention need explicit service config)
            if self.transport.lower() != "replay":
                raise ValueError(
                    "pubsub: batch reads need transport='replay' — a "
                    "subscription backlog drains on pull; use a capture"
                )
            env = spark.read.schema(PUBSUB_SCHEMA).json(self.capture_path)
            if self.filter:
                env = env.where(filter_match_col(self.filter))
            return env
        register_pubsub_source(spark)
        reader = spark.readStream.format("cheetah-pubsub")
        for k, v in (
            ("transport", self.transport),
            ("addr", self.addr),
            ("project", self.project),
            ("subscription", self.subscription),
            ("poll_ms", str(self.poll_ms) if self.poll_ms != 100 else ""),
            ("max_messages", str(self.max_messages) if self.max_messages != 500 else ""),
            ("capture_path", self.capture_path),
            ("chunk_size", str(self.chunk_size) if self.chunk_size else ""),
        ):
            if v:
                reader = reader.option(k, v)
        return reader.load()


@dataclass
class PubSubSink(Sink):
    """``:publish`` every row (``attributes, data`` — a missing data
    column defaults to a JSON struct of the row). Batched per the REST
    contract (one :publish per ``batch_size`` rows) per partition;
    replay transport appends the NDJSON capture the source reads."""

    addr: str = ""
    project: str = "p"
    topic: str = "out"
    batch_size: int = 100
    transport: str = "http"  # http | replay
    capture_path: str = ""
    checkpoint: Optional[str] = None
    trigger: Optional[dict] = None

    def write(self, df: DataFrame):
        from cheetah_spark.sinks import _start

        t = self.transport.lower()
        cols = set(df.columns)
        mid_col = F.col("message_id") if "message_id" in cols else F.lit("")
        attrs_col = F.col("attributes") if "attributes" in cols else F.lit("{}")
        data_col = (
            F.col("data")
            if "data" in cols
            else F.to_json(F.struct(*[F.col(c) for c in df.columns]))
        )
        out = df.select(
            mid_col.alias("message_id"),
            attrs_col.alias("attributes"),
            data_col.alias("data"),
        )
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
        if t != "http":
            raise ValueError(f"pubsub: unknown transport {t!r} (http|replay)")
        addr, project, topic, bsz = self.addr, self.project, self.topic, self.batch_size

        def send(rows):
            client = PubSubClient(addr, project)
            batch = []
            for r in rows:
                batch.append(
                    {"data": r.data, "attributes": json.loads(r.attributes or "{}")}
                )
                if len(batch) >= bsz:
                    client.publish(topic, batch)
                    batch = []
            if batch:
                client.publish(topic, batch)

        if df.isStreaming:
            import uuid as _uuid

            w = out.writeStream.foreachBatch(
                lambda batch, _id: batch.foreachPartition(send)
            ).outputMode("append")
            return _start(
                w,
                self.checkpoint or f"/tmp/cheetah_spark_ckpt/pubsub_{_uuid.uuid4().hex[:8]}",
                self.trigger,
            )
        out.foreachPartition(send)
        return None

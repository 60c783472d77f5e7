"""Live syslog listener transport (reference kawad source config type
``syslog`` — README.md:168-177: ``{"type":"syslog","addr":
"0.0.0.0:5514"}``; the Go implementation lives in the parent project,
so this module is built from the config surface + the public RFCs) on
the PySpark Python Data Source API.

``spark.readStream.format("cheetah-syslog")`` admits raw syslog lines
into Structured Streaming with the envelope schema ``raw string, peer
string`` — parsing into PRI/facility/severity/host/app/message is a
*relational* concern handled by pure Column expressions
(:mod:`cheetah_spark.functions.syslog`), so it runs JVM-side on
executors, not inside the single-threaded listener. The listener only
moves bytes; Spark fans the lines out immediately after admission —
the same reader-thin/parse-wide split every 100 TB ingest edge needs.

Transports (the mqtt_live pluggable-transport pattern, but the socket
one is fully runnable here — it is stdlib, no wheel gate):

- ``transport=socket`` — the production path. A background thread
  binds ``addr`` and pushes datagrams (UDP — RFC 5426, one message
  per datagram) or newline-framed lines (TCP — RFC 6587 non-transparent
  framing) into the reader's buffer. UDP is fire-and-forget: there is
  no redelivery, so ``commit`` is a no-op and the at-least-once story
  is "don't crash between read and checkpoint" — exactly the wire
  protocol's own guarantee, surfaced honestly rather than pretended
  away.
- ``transport=replay`` — delivers an NDJSON capture (``{"raw": ...,
  "peer": ...}`` records) through the identical reader, optionally in
  per-micro-batch chunks, and records acks to ``ack_log`` so tests
  can assert commit-order acking from outside the streaming
  subprocess (the MqttReplaySource discipline).

Delivery contract: offsets are admitted-line counts ``{"seq": n}``;
``read`` drains the buffer, ``readBetweenOffsets`` replays a short
in-memory window after a restart, ``commit`` acks replay records
below the committed offset.

The seq-window reader core (buffer/window/offset/commit) is shared
with mqtt_live/journald_live via
:class:`cheetah_spark.sources.seqwindow.SeqWindowStreamReader` — an
offset-machinery fix lands once (the r8 self-declared debt, closed
r9); this module supplies only the transports and the envelope/ack/
lost-window hooks.
"""

from __future__ import annotations

import json
import os
import socket
import threading
from dataclasses import dataclass
from typing import Callable, Iterator, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType

from cheetah_spark.sources import Source
from cheetah_spark.sources.seqwindow import SeqWindowStreamReader

SYSLOG_STREAM_SCHEMA = "raw string, peer string"


@dataclass
class SyslogOpts:
    addr: str = "127.0.0.1:0"
    proto: str = "udp"  # udp (RFC 5426) | tcp (RFC 6587 newline framing)
    content_type: str = "raw"  # raw | auto (append parsed struct)

    def host_port(self) -> Tuple[str, int]:
        host, _, port = self.addr.rpartition(":")
        return host or "127.0.0.1", int(port)


class SyslogRecord:
    __slots__ = ("raw", "peer", "seq", "_ack")

    def __init__(self, raw: str, peer: str, seq: int, ack=None):
        self.raw = raw
        self.peer = peer
        self.seq = seq
        self._ack = ack

    def ack(self) -> None:
        if self._ack is not None:
            self._ack(self)


@dataclass
class SocketListenerFactory:
    """Real datagram/stream listener on stdlib sockets. Binding
    ``port=0`` picks an ephemeral port; the bound address is written
    to ``addr_file`` so the test process (outside the data-source
    runner) can learn where to send."""

    addr_file: str = ""

    def __call__(self, opts: SyslogOpts, on_record, on_error):
        proto = opts.proto.lower()
        host, port = opts.host_port()
        if proto == "udp":
            sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            sock.bind((host, port))
        elif proto == "tcp":
            sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            sock.bind((host, port))
            sock.listen(8)
        else:
            raise ValueError(f"syslog: unknown proto {opts.proto!r} (udp|tcp)")
        if self.addr_file:
            bound = sock.getsockname()
            with open(self.addr_file, "w") as fh:
                fh.write(f"{bound[0]}:{bound[1]}")
        adapter = _SocketAdapter(sock, proto, on_record, on_error)
        adapter.start()
        return adapter


class _SocketAdapter:
    def __init__(self, sock, proto: str, on_record, on_error):
        self._sock = sock
        self._proto = proto
        self._on_record = on_record
        self._on_error = on_error
        self._closing = False
        self._threads: list[threading.Thread] = []

    def start(self) -> None:
        t = threading.Thread(
            target=self._udp_loop if self._proto == "udp" else self._tcp_loop,
            name="cheetah-syslog-listener",
            daemon=True,
        )
        t.start()
        self._threads.append(t)

    def _udp_loop(self) -> None:
        # one syslog message per datagram (RFC 5426 §3.1); trailing
        # newlines some senders append are stripped, embedded ones are
        # content
        while not self._closing:
            try:
                data, peer = self._sock.recvfrom(65535)
            except OSError:
                if not self._closing:
                    self._on_error(RuntimeError("syslog: udp socket error"))
                return
            self._on_record(data.decode("utf-8", "replace").rstrip("\r\n"), f"{peer[0]}:{peer[1]}")

    def _tcp_loop(self) -> None:
        while not self._closing:
            try:
                conn, peer = self._sock.accept()
            except OSError:
                if not self._closing:
                    self._on_error(RuntimeError("syslog: tcp socket error"))
                return
            t = threading.Thread(
                target=self._tcp_conn, args=(conn, f"{peer[0]}:{peer[1]}"), daemon=True
            )
            t.start()
            self._threads.append(t)

    def _tcp_conn(self, conn, peer: str) -> None:
        # RFC 6587 §3.4.2 non-transparent framing: LF-terminated lines
        buf = b""
        with conn:
            while not self._closing:
                try:
                    chunk = conn.recv(65536)
                except OSError:
                    # connection reset mid-stream: treat like an abrupt
                    # close — fall through to the trailing-buffer flush
                    # instead of losing the partial line to an uncaught
                    # thread exception (r8 self-review)
                    break
                if not chunk:
                    break
                buf += chunk
                while b"\n" in buf:
                    line, buf = buf.split(b"\n", 1)
                    if line:
                        self._on_record(line.decode("utf-8", "replace").rstrip("\r"), peer)
        if buf.strip():  # sender closed/reset without final LF — still a message
            self._on_record(buf.decode("utf-8", "replace").rstrip("\r\n"), peer)

    def close(self) -> None:
        self._closing = True
        try:
            self._sock.close()
        except OSError:
            pass


@dataclass
class SyslogReplayFactory:
    """Deterministic sender stand-in: delivers an NDJSON capture
    (records ``{"raw": ..., "peer": ...}``; bare text files work too —
    each line becomes a record with a synthetic peer) through the same
    reader, recording acks to ``ack_log`` in commit order."""

    capture_path: str = ""
    ack_log: str = ""
    chunk_size: int = 0

    def __call__(self, opts: SyslogOpts, on_record, on_error):
        adapter = _ReplayAdapter(self, on_record)
        if self.chunk_size <= 0:
            adapter.pump_all()
        return adapter


class _ReplayAdapter:
    def __init__(self, factory: SyslogReplayFactory, on_record):
        self._factory = factory
        self._on_record = on_record
        self._lock = threading.Lock()
        self._gen = self._deliveries()

    def _iter_capture(self) -> Iterator[tuple[str, str]]:
        path = self._factory.capture_path
        names = (
            sorted(
                n
                for n in os.listdir(path)
                if not n.startswith(("_", ".")) and n.endswith((".json", ".txt"))
            )
            if os.path.isdir(path)
            else [""]
        )
        for name in names:
            fp = os.path.join(path, name) if name else path
            with open(fp) as fh:
                for line in fh:
                    line = line.rstrip("\n")
                    if not line:
                        continue
                    # NDJSON record if it parses as one; otherwise the
                    # line IS the message — a bare-text capture may
                    # legitimately contain syslog messages that start
                    # with '{' (JSON-payload syslog is common), and a
                    # prefix-only gate would JSONDecodeError and kill
                    # the replay pump (r8 advice)
                    if line.startswith("{"):
                        try:
                            rec = json.loads(line)
                            yield rec["raw"], rec.get("peer", "replay:0")
                            continue
                        except (json.JSONDecodeError, KeyError, TypeError):
                            pass
                    yield line, "replay:0"

    def _deliveries(self):
        delivered = 0
        for raw, peer in self._iter_capture():
            self._on_record(raw, peer)
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

    def log_ack(self, rec: SyslogRecord):
        if not self._factory.ack_log:
            return
        with self._lock, open(self._factory.ack_log, "a") as fh:
            fh.write(json.dumps({"seq": rec.seq, "peer": rec.peer}) + "\n")

    def close(self):
        pass


def _make_factory(options) -> Callable:
    transport = (options.get("transport") or "socket").lower()
    if transport == "socket":
        return SocketListenerFactory(addr_file=options.get("addr_file") or "")
    if transport == "replay":
        return SyslogReplayFactory(
            capture_path=options.get("capture_path") or "",
            ack_log=options.get("ack_log") or "",
            chunk_size=int(options.get("chunk_size") or 0),
        )
    raise ValueError(f"syslog: unknown transport {transport!r} (socket|replay)")


class _SyslogSimpleStreamReader(SeqWindowStreamReader):
    """Driver-side reader on the shared
    :class:`~cheetah_spark.sources.seqwindow.SeqWindowStreamReader`
    core: buffers listener-pushed lines, serves them as seq-numbered
    micro-batch slices, acks replay records on commit. UDP records
    have no ack by nature — the wire protocol has no redelivery — so
    commit only fires the replay-transport ack log."""

    _PICKLE_FIELDS = ("_opts", "_factory")

    def __init__(self, options):
        self._opts = SyslogOpts(
            addr=options.get("addr") or "127.0.0.1:0",
            proto=options.get("proto") or "udp",
            content_type=options.get("content_type") or "raw",
        )
        self._factory = _make_factory(options)
        self._init_runtime()

    def _make_listener(self):
        return self._factory(self._opts, self._on_record, self._on_error)

    def _on_record(self, raw: str, peer: str) -> None:
        self._on_item((raw, peer))

    def _row_of(self, item: tuple) -> tuple:
        return item

    def _ack_of(self, item: tuple, seq: int, listener):
        raw, peer = item
        return SyslogRecord(raw, peer, seq, ack=getattr(listener, "log_ack", None))

    def _lost_window_error(self, start_seq: int, end_seq: int) -> Exception:
        # datagram transports have no redelivery; surface the gap
        # instead of silently committing an empty range
        return RuntimeError(
            f"syslog: replay window lost for offsets [{start_seq},{end_seq}) "
            "after restart — datagram transport has no redelivery; rows are "
            "unrecoverable (use the replay transport or durable upstream relay "
            "for at-least-once)"
        )


class SyslogStreamDataSource(DataSource):
    """``spark.readStream.format("cheetah-syslog")`` — the kawad
    syslog source config type as a Python streaming data source."""

    @classmethod
    def name(cls) -> str:
        return "cheetah-syslog"

    def schema(self) -> str:
        return SYSLOG_STREAM_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return _SyslogSimpleStreamReader(self.options)


def register_syslog_source(spark: SparkSession) -> None:
    spark.dataSource.register(SyslogStreamDataSource)


@dataclass
class SyslogSource(Source):
    """Source adapter over the cheetah-syslog stream format.

    ``content_type="auto"`` appends the parsed struct (facility,
    severity, host, app, procid, message, ts_raw — pure Column
    expressions from :mod:`cheetah_spark.functions.syslog`) so config
    pipelines get typed fields without a separate transform; ``"raw"``
    leaves the envelope alone (the reference's contentType dial).
    ``"rfc3164"`` / ``"rfc5424"`` FORCE that single grammar: only the
    named RFC's regex is applied, and a line of the other format
    parses to an all-NULL struct rather than being silently handled by
    the sibling grammar (r8 advice: the forced values previously
    aliased auto-detection, so the dial was not honored)."""

    addr: str = "127.0.0.1:0"
    proto: str = "udp"
    content_type: str = "raw"
    transport: str = "socket"
    capture_path: str = ""
    ack_log: str = ""
    chunk_size: int = 0
    addr_file: str = ""
    streaming: bool = True

    def read(self, spark: SparkSession) -> DataFrame:
        register_syslog_source(spark)
        df = (
            spark.readStream.format("cheetah-syslog")
            .option("addr", self.addr)
            .option("proto", self.proto)
            .option("content_type", self.content_type)
            .option("transport", self.transport)
            .option("capture_path", self.capture_path)
            .option("ack_log", self.ack_log)
            .option("chunk_size", str(self.chunk_size))
            .option("addr_file", self.addr_file)
            .load()
        )
        if self.content_type == "auto":
            from cheetah_spark.functions import syslog as SL

            df = df.withColumn("syslog", SL.parsed(F.col("raw")))
        elif self.content_type in ("rfc3164", "rfc5424"):
            from cheetah_spark.functions import syslog as SL

            df = df.withColumn(
                "syslog", SL.parsed_forced(F.col("raw"), self.content_type)
            )
        elif self.content_type != "raw":
            raise ValueError(
                f"syslog: unknown content_type {self.content_type!r} "
                "(raw|auto|rfc3164|rfc5424)"
            )
        return df

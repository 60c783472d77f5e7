"""Live journald transport (reference kawad source config type
``journald``, README.md:179-185 — ``{"type":"journald"}``, zero
config) on the PySpark Python Data Source API.

``spark.readStream.format("cheetah-journald")`` admits Journal Export
Format *entries* (blank-line-separated ``KEY=VALUE`` blocks) with the
envelope schema ``entry string, cursor string``. Typed field
extraction is relational (:mod:`cheetah_spark.functions.journald`) —
the listener only frames entries; executors parse.

Transports:

- ``transport=journalctl`` — the production path: spawn ``journalctl
  --output=export --follow`` and frame its stdout into entries.
  Availability-gated the way paho/win32 are: constructing it on a host
  without journalctl raises a clear error naming the binary;
  everything downstream of the pipe — framing, offsets, commit — is
  the same code the replay transport exercises.
- ``transport=replay`` — frames a recorded export capture (a file or
  directory of ``*.export`` files) through the identical reader.

Offsets are admitted-entry counts ``{"seq": n}``; the journald cursor
(``__CURSOR`` field) rides in the envelope so a production consumer
can translate committed offsets back into ``journalctl
--after-cursor`` resume points — the export format's own resume
mechanism.
"""

from __future__ import annotations

import base64
import os
import shutil
import struct
import subprocess
import threading
from dataclasses import dataclass
from typing import BinaryIO, Callable, Iterator, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType

from cheetah_spark.sources import Source
from cheetah_spark.sources.seqwindow import SeqWindowStreamReader

JOURNALD_STREAM_SCHEMA = "entry string, cursor string"


def _frame_entries(lines: Iterator[str]) -> Iterator[str]:
    """Blank-line framing of a TEXT export stream: yield each entry as
    the newline-joined block of its KEY=VALUE lines. Text subset only —
    the live and replay paths frame through
    :func:`_frame_entries_bytes`, which understands the export format's
    length-prefixed binary fields (this helper would mis-frame them)."""
    block: list[str] = []
    for line in lines:
        line = line.rstrip("\n")
        if line == "":
            if block:
                yield "\n".join(block)
                block = []
        else:
            block.append(line)
    if block:
        yield "\n".join(block)


def _read_exact(stream: BinaryIO, n: int) -> bytes:
    """Read exactly n bytes (loop over short reads — a pipe's raw reads
    may return early even when more data is coming)."""
    chunks: list[bytes] = []
    while n > 0:
        chunk = stream.read(n)
        if not chunk:
            break
        chunks.append(chunk)
        n -= len(chunk)
    return b"".join(chunks)


def _frame_entries_bytes(stream: BinaryIO) -> Iterator[str]:
    """Binary-safe framing of a ``journalctl -o export`` stream
    (systemd Journal Export Format, a public spec): entries are
    blank-line-separated field blocks where a field is EITHER

    - ``NAME=VALUE\\n`` (text), or
    - ``NAME\\n`` + uint64-LE byte length + that many raw bytes +
      ``\\n`` (binary — e.g. a non-UTF-8 MESSAGE), whose payload may
      itself contain ``\\n\\n`` and invalid UTF-8.

    Round-8 advice: the previous text-mode reader decoded the pipe with
    the strict locale codec and framed purely on blank lines, so one
    binary journal field could raise UnicodeDecodeError in the pump
    thread (fataling the stream) or silently mis-frame entries. This
    framer reads bytes, decodes text fields with errors='replace', and
    re-emits binary fields as ``NAME=b64:<base64>`` so the entry stays
    one string and no payload byte can break framing.
    """
    block: list[str] = []
    while True:
        line = stream.readline()
        if line == b"":  # EOF
            break
        if line == b"\n":
            if block:
                yield "\n".join(block)
                block = []
            continue
        line = line.rstrip(b"\n")
        if b"=" in line:
            block.append(line.decode("utf-8", errors="replace"))
            continue
        # binary field: the name line is followed by a u64-LE size,
        # the raw payload, and a trailing newline
        size_raw = _read_exact(stream, 8)
        if len(size_raw) < 8:
            block = []  # truncated mid-field: drop the partial entry
            break
        (size,) = struct.unpack("<Q", size_raw)
        data = _read_exact(stream, size)
        if len(data) < size:
            block = []
            break
        _read_exact(stream, 1)  # the newline terminating the payload
        name = line.decode("utf-8", errors="replace")
        block.append(name + "=b64:" + base64.b64encode(data).decode("ascii"))
    if block:
        yield "\n".join(block)


def _cursor_of(entry: str) -> str:
    for line in entry.split("\n"):
        if line.startswith("__CURSOR="):
            return line[len("__CURSOR=") :]
    return ""


@dataclass
class JournalctlFactory:
    """Spawns ``journalctl -o export`` and pumps framed entries to the
    reader. ``extra_args`` is the escape hatch for unit/priority
    filters (server-side filtering beats shipping everything)."""

    follow: bool = True
    after_cursor: str = ""
    extra_args: tuple = ()

    def __call__(self, on_entry, on_error):
        binary = shutil.which("journalctl")
        if binary is None:
            raise RuntimeError(
                "journald source requires the journalctl binary (systemd host); "
                "use transport='replay' with an export-format capture elsewhere"
            )
        args = [binary, "--output=export", "--no-pager"]
        if self.follow:
            args.append("--follow")
        if self.after_cursor:
            args += ["--after-cursor", self.after_cursor]
        args += list(self.extra_args)
        proc = subprocess.Popen(
            args, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL
        )
        adapter = _ProcAdapter(proc)

        def pump():
            try:
                assert proc.stdout is not None
                for entry in _frame_entries_bytes(proc.stdout):
                    if adapter.closing:
                        return
                    on_entry(entry)
                if not adapter.closing and self.follow:
                    on_error(RuntimeError("journalctl exited unexpectedly"))
            except Exception as exc:  # pragma: no cover - pipe teardown races
                if not adapter.closing:
                    on_error(exc)

        t = threading.Thread(target=pump, name="cheetah-journald-pump", daemon=True)
        t.start()
        return adapter


class _ProcAdapter:
    def __init__(self, proc):
        self._proc = proc
        self.closing = False

    def close(self):
        self.closing = True
        try:
            self._proc.terminate()
        except OSError:
            pass


@dataclass
class JournaldReplayFactory:
    """Frames a recorded export capture through the same reader,
    optionally in per-micro-batch chunks."""

    capture_path: str = ""
    chunk_size: int = 0

    def __call__(self, on_entry, on_error):
        adapter = _ReplayAdapter(self, on_entry)
        if self.chunk_size <= 0:
            adapter.pump_all()
        return adapter


class _ReplayAdapter:
    def __init__(self, factory: JournaldReplayFactory, on_entry):
        self._factory = factory
        self._on_entry = on_entry
        self._gen = self._deliveries()

    def _iter_entries(self) -> Iterator[str]:
        path = self._factory.capture_path
        files = (
            [
                os.path.join(path, n)
                for n in sorted(os.listdir(path))
                if not n.startswith(("_", ".")) and n.endswith((".export", ".txt"))
            ]
            if os.path.isdir(path)
            else [path]
        )
        for fp in files:
            # binary-safe: a recorded capture can carry the export
            # format's length-prefixed binary fields too
            with open(fp, "rb") as fh:
                yield from _frame_entries_bytes(fh)

    def _deliveries(self):
        delivered = 0
        for entry in self._iter_entries():
            self._on_entry(entry)
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


def _make_factory(options) -> Callable:
    transport = (options.get("transport") or "journalctl").lower()
    if transport == "journalctl":
        extra = options.get("extra_args") or ""
        return JournalctlFactory(
            follow=(options.get("follow") or "true").lower() == "true",
            after_cursor=options.get("after_cursor") or "",
            # comma-separated through the option channel, e.g.
            # "--unit=sshd.service,--priority=4" — server-side
            # filtering beats shipping everything
            extra_args=tuple(a for a in extra.split(",") if a),
        )
    if transport == "replay":
        return JournaldReplayFactory(
            capture_path=options.get("capture_path") or "",
            chunk_size=int(options.get("chunk_size") or 0),
        )
    raise ValueError(f"journald: unknown transport {transport!r} (journalctl|replay)")


class _JournaldSimpleStreamReader(SeqWindowStreamReader):
    """Seq-offset buffering reader on the shared
    :class:`~cheetah_spark.sources.seqwindow.SeqWindowStreamReader`
    core. commit() is effectively positional: journald's own resume
    mechanism is the cursor, which rides in every row — there is no
    per-entry ack to fire (``_ack_of`` stays None)."""

    _PICKLE_FIELDS = ("_factory",)

    def __init__(self, options):
        self._factory = _make_factory(options)
        self._init_runtime()

    def _make_listener(self):
        return self._factory(self._on_item, self._on_error)

    def _row_of(self, entry: str) -> tuple:
        return (entry, _cursor_of(entry))

    def _lost_window_error(self, start_seq: int, end_seq: int) -> Exception:
        return RuntimeError(
            f"journald: replay window lost for offsets [{start_seq},{end_seq}) "
            "after restart — resume from the last committed row's cursor "
            "(journalctl --after-cursor) instead of replaying offsets"
        )


class JournaldStreamDataSource(DataSource):
    """``spark.readStream.format("cheetah-journald")``."""

    @classmethod
    def name(cls) -> str:
        return "cheetah-journald"

    def schema(self) -> str:
        return JOURNALD_STREAM_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return _JournaldSimpleStreamReader(self.options)


def register_journald_source(spark: SparkSession) -> None:
    spark.dataSource.register(JournaldStreamDataSource)


@dataclass
class JournaldSource(Source):
    """Source adapter over the cheetah-journald stream format. The
    reference's config block is just ``{"type":"journald"}``
    (README.md:179-185) — every field here defaults accordingly."""

    transport: str = "journalctl"
    follow: bool = True
    after_cursor: str = ""
    extra_args: tuple = ()  # journalctl filters, e.g. ("--unit=sshd.service",)
    capture_path: str = ""
    chunk_size: int = 0
    content_type: str = "raw"  # raw | auto (append parsed struct)
    streaming: bool = True

    def read(self, spark: SparkSession) -> DataFrame:
        register_journald_source(spark)
        df = (
            spark.readStream.format("cheetah-journald")
            .option("transport", self.transport)
            .option("follow", str(self.follow).lower())
            .option("after_cursor", self.after_cursor)
            .option("extra_args", ",".join(self.extra_args))
            .option("capture_path", self.capture_path)
            .option("chunk_size", str(self.chunk_size))
            .load()
        )
        if self.content_type == "auto":
            from cheetah_spark.functions import journald as JD

            df = df.withColumn("journal", JD.parsed(F.col("entry")))
        return df

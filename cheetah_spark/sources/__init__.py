"""Source adapters — the Spark-native re-expression of the reference's
Source surface (reference types.go:36-59: ``Recv(ctx) (Message[T],
ack, error)``).

Each source yields a DataFrame (bounded via ``spark.read`` or unbounded
via ``spark.readStream`` — the unified API means the same downstream
plan serves both, which is how the reference's "wire once, run
forever" processor shape maps onto Spark). Acknowledgement semantics
(at-least-once, ack-after-sink) are carried by Structured Streaming's
checkpoint offset commit, not per-message closures — see
streaming/conformance.py for the behavioral test.

Reference parity map:
    MemorySource      ← x/memory/memory.go:10-27 (S1)
    TextScannerSource ← x/scanner/scanner.go:14-105 (S2, custom delim)
    FileStreamSource  ← x/poller/poller.go:15-99 (S5, batch-pull →
                        stream via maxFilesPerTrigger)
    RateSource        ← the load-gen role of S1 in BenchmarkMem
    MultiSource       ← x/multi/multisrc.go:15-81 (S6, fan-in)
    JsonSource/CsvSource/ParquetSource ← DeserializationSource
                        (types.go:159-195, S7): schema applied at scan
    envelope()        ← Message[T] envelope (types.go:10-26)
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Canonical envelope schema — the Message[T] shape (key/value/topic/
# attributes, reference types.go:10-26), same layout Spark's Kafka
# source exposes.
ENVELOPE_SCHEMA = "key string, value binary, topic string, attributes map<string,string>"


class Source:
    """A bounded-or-unbounded scan producing a DataFrame."""

    streaming: bool = False

    def read(self, spark: SparkSession) -> DataFrame:  # pragma: no cover - interface
        raise NotImplementedError


@dataclass
class ParquetSource(Source):
    path: str
    streaming: bool = False
    schema: Optional[str] = None
    max_files_per_trigger: Optional[int] = None

    def read(self, spark: SparkSession) -> DataFrame:
        from cheetah_spark.catalog import ensure_instant_reads

        # naive parquet timestamps must load as instants (TIMESTAMP) —
        # withWatermark rejects TIMESTAMP_NTZ event-time columns
        ensure_instant_reads(spark)
        if self.streaming:
            reader = spark.readStream
            if self.schema:
                reader = reader.schema(self.schema)
            else:
                # streaming file sources need a schema: borrow from a batch
                # scan. Files Spark itself wrote from an NTZ frame carry
                # TimestampNTZType in their footer Spark-schema metadata
                # (which overrides inferTimestampNTZ=false); patch those to
                # instants — stored micros are read as UTC-epoch micros,
                # and withWatermark requires TIMESTAMP.
                from pyspark.sql import types as T

                borrowed = spark.read.parquet(self.path).schema
                fields = [
                    T.StructField(f.name, T.TimestampType(), f.nullable, f.metadata)
                    if isinstance(f.dataType, T.TimestampNTZType)
                    else f
                    for f in borrowed.fields
                ]
                reader = reader.schema(T.StructType(fields))
            if self.max_files_per_trigger:
                reader = reader.option("maxFilesPerTrigger", self.max_files_per_trigger)
            return reader.parquet(self.path)
        return spark.read.parquet(self.path)


@dataclass
class TextScannerSource(Source):
    """Delimiter-split text scan (reference scanner S2): every record
    between ``line_sep`` occurrences becomes one row ``value: string``,
    including multi-byte custom delimiters.

    ``path="" `` (or ``"-"``) reads STDIN — the reference scanner's
    default mode (x/scanner/scanner.go:14-30; config
    ``{"type":"scanner"}``, README.md:188-196). Spark executors cannot
    read the driver's stdin, so stdin is SPOOLED driver-side into
    files and scanned as a normal text source:

    - batch: stdin is drained to one temp file, then ``spark.read``;
    - streaming: a daemon thread cuts stdin at ``line_sep``
      boundaries into complete chunk files (write-then-rename, so the
      file stream source never admits a partial file — the poller S5
      admission pattern), and the query reads the spool directory
      with ``readStream``.
    """

    path: str = ""
    line_sep: str = "\n"
    streaming: bool = False
    # streaming stdin: flush a chunk file when the pending buffer
    # crosses this many bytes (records are never split across chunks)
    spool_chunk_bytes: int = 1 << 20

    def _spool_batch(self) -> str:
        import sys
        import tempfile

        fd, name = tempfile.mkstemp(prefix="cheetah_stdin_", suffix=".txt")
        with open(fd, "wb") as out:
            while True:
                chunk = sys.stdin.buffer.read(1 << 16)
                if not chunk:
                    break
                out.write(chunk)
        return name

    def _spool_stream(self) -> str:
        import sys
        import tempfile
        import threading

        spool_dir = tempfile.mkdtemp(prefix="cheetah_stdin_spool_")
        sep = self.line_sep.encode("utf-8")
        limit = self.spool_chunk_bytes

        def write_chunk(idx: int, data: bytes) -> None:
            # underscore-prefixed names are invisible to the file
            # source; the rename publishes a COMPLETE file atomically
            tmp = os.path.join(spool_dir, f"_inflight_{idx}")
            with open(tmp, "wb") as fh:
                fh.write(data)
            os.rename(tmp, os.path.join(spool_dir, f"chunk_{idx:08d}.txt"))

        def pump() -> None:
            buf = b""
            idx = 0
            stdin = sys.stdin.buffer
            while True:
                chunk = stdin.read(1 << 16)
                if not chunk:
                    break
                buf += chunk
                if len(buf) >= limit:
                    cut = buf.rfind(sep)
                    if cut >= 0:
                        write_chunk(idx, buf[: cut + len(sep)])
                        idx += 1
                        buf = buf[cut + len(sep):]
            if buf:
                write_chunk(idx, buf)

        t = threading.Thread(target=pump, name="cheetah-stdin-spool", daemon=True)
        t.start()
        self._spool_thread = t  # tests join this; the daemon never does
        return spool_dir

    def read(self, spark: SparkSession) -> DataFrame:
        path = self.path
        if path in ("", "-"):
            path = self._spool_stream() if self.streaming else self._spool_batch()
        reader = spark.readStream if self.streaming else spark.read
        if self.streaming:
            reader = reader.schema("value string")
        return reader.option("lineSep", self.line_sep).text(path)


@dataclass
class JsonSource(Source):
    path: str
    schema: Optional[str] = None
    streaming: bool = False

    def read(self, spark: SparkSession) -> DataFrame:
        reader = spark.readStream if self.streaming else spark.read
        if self.schema:
            reader = reader.schema(self.schema)
        return reader.json(self.path)


@dataclass
class CsvSource(Source):
    path: str
    schema: Optional[str] = None
    header: bool = True
    streaming: bool = False

    def read(self, spark: SparkSession) -> DataFrame:
        reader = spark.readStream if self.streaming else spark.read
        if self.schema:
            reader = reader.schema(self.schema)
        return reader.option("header", self.header).csv(self.path)


@dataclass
class RateSource(Source):
    """Unbounded load generator (``format("rate")``) — the streaming
    analogue of the reference benchmark's synthetic message feed
    (test/suite_test.go:106-155)."""

    rows_per_second: int = 10000
    num_partitions: int = 4
    streaming: bool = True

    def read(self, spark: SparkSession) -> DataFrame:
        return (
            spark.readStream.format("rate")
            .option("rowsPerSecond", self.rows_per_second)
            .option("numPartitions", self.num_partitions)
            .load()
        )


@dataclass
class MemorySource(Source):
    """Driver-provided rows (reference memory.MemorySource S1) — test
    and embedding source; bounded."""

    rows: Sequence
    schema: Optional[str] = None
    streaming: bool = False

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(self.rows, schema=self.schema)


@dataclass
class MultiSource(Source):
    """Fan-in of N sources into one stream (reference MultiSource S6,
    x/multi/multisrc.go:15-81). Spark unions streaming DataFrames
    natively, so no competing-goroutine starvation caveat applies."""

    sources: Sequence[Source] = field(default_factory=list)

    def __post_init__(self) -> None:
        self.streaming = any(s.streaming for s in self.sources)

    def read(self, spark: SparkSession) -> DataFrame:
        dfs = [s.read(spark) for s in self.sources]
        out = dfs[0]
        for df in dfs[1:]:
            out = out.unionByName(df)
        return out


def mqtt_filter_regex(topic_filter: str) -> str:
    """MQTT subscription filter → anchored regex (valid in both Java
    regex and RE2, so Spark ``rlike`` and DuckDB ``regexp_matches``
    evaluate it identically).

    MQTT-3.1.1 §4.7 semantics: ``+`` matches exactly one topic level,
    ``#`` (last level only) matches the remaining zero-or-more levels.
    """
    import re as _re

    parts = topic_filter.split("/")
    regs: list[str] = []
    for i, p in enumerate(parts):
        if p == "#":
            if i != len(parts) - 1:
                raise ValueError(f"'#' must be the last level: {topic_filter!r}")
            head = "/".join(regs)
            return f"^{head}(/.*)?$" if head else "^.*$"
        regs.append("[^/]+" if p == "+" else _re.escape(p))
    return "^" + "/".join(regs) + "$"


@dataclass
class MqttReplaySource(Source):
    """MQTT subscribe semantics over a recorded broker capture
    (reference mqtt.Source S3, x/mqtt/mqtt.go:178-251; opts 14-103).

    No broker exists in this environment, so the *connector* half is an
    NDJSON capture directory (schema: ``topic, payload, qos,
    retained``) and this adapter re-expresses the *semantics*:

    - subscription topic filter with MQTT wildcards (``+``/``#``,
      mqtt.go:89-94 default ``#``) → a pushed-down ``rlike`` predicate;
    - effective QoS = min(publish QoS, subscription QoS)
      (MQTT-3.1.1 §3.8.4 downgrade rule; mqtt.go:95-98);
    - at-least-once delivery (QoS ≥ 1) → checkpoint offset commit, the
      same mapping every source here uses;
    - rows surface as the canonical Message envelope (key=topic tail,
      value=payload bytes, attributes carry qos/retained — reference
      types.go:10-26).
    """

    path: str = ""
    topic_filter: str = "#"
    qos: int = 1
    streaming: bool = False

    CAPTURE_SCHEMA = "topic string, payload string, qos int, retained boolean"

    def read(self, spark: SparkSession) -> DataFrame:
        reader = spark.readStream if self.streaming else spark.read
        df = reader.schema(self.CAPTURE_SCHEMA).json(self.path)
        matched = df.where(F.col("topic").rlike(mqtt_filter_regex(self.topic_filter)))
        eff_qos = F.least(F.col("qos"), F.lit(self.qos))
        return matched.select(
            F.element_at(F.split("topic", "/"), -1).alias("key"),
            F.col("payload").cast("binary").alias("value"),
            "topic",
            F.create_map(
                F.lit("qos"), eff_qos.cast("string"),
                F.lit("retained"), F.col("retained").cast("string"),
            ).alias("attributes"),
        )


def envelope(df: DataFrame, key: str, topic: str) -> DataFrame:
    """Wrap arbitrary rows into the canonical Message envelope
    (key/value/topic/attributes, reference types.go:10-26): ``value``
    is the JSON-serialized row as bytes, ``attributes`` carries source
    metadata (the Attributes chain of types.go:28-30)."""
    return df.select(
        F.col(key).cast("string").alias("key"),
        F.to_json(F.struct(*df.columns)).cast("binary").alias("value"),
        F.col(topic).cast("string").alias("topic"),
        F.create_map(F.lit("source"), F.lit("cheetah_spark")).alias("attributes"),
    )

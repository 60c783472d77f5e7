"""Sink adapters — the Spark-native re-expression of the reference's
Destination surface (reference types.go:87-114: ``Send(ctx, ack,
msgs...)`` with ack-after-durable-write).

Delivery mapping: the reference fires each message's ack only after the
destination confirms the write (at-least-once). Structured Streaming
provides the same contract at micro-batch granularity — offsets commit
to the checkpoint only after the sink completes — and upgrades it to
exactly-once for idempotent file sinks. The reference's ref-counted
``ackFn(ack, n)`` coalescing (x/batcher/batcher.go:385-400) IS the
batch-level offset commit.

Reference parity map:
    ConsoleSink   ← x/printer/printer.go:10-43 (D1)
    MemorySink    ← x/memory/memory.go:29-49 (D4)
    NdjsonGzipSink← x/s3/s3.go:20-162 (D2: gzip NDJSON under
                    wall-clock-partitioned keys prefix/YYYY/MM/DD/HH/)
    MultiSink     ← x/multi/multidest.go:9-49 (D5, fan-out, ack after all)
    BatcherSink   ← x/batcher/batcher.go:58-400 (D6, micro-batcher:
                    FlushFrequency→trigger, FlushLength→input rate cap,
                    ErrorHandler/ErrDontAck→foreachBatch error policy)
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass, field
from typing import Callable, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class Sink:
    def write(self, df: DataFrame):  # pragma: no cover - interface
        raise NotImplementedError


def _start(writer, checkpoint: Optional[str], trigger: Optional[dict]):
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


@dataclass
class ConsoleSink(Sink):
    """Print rows (reference printer D1). Batch: show(); stream:
    console format."""

    num_rows: int = 20
    truncate: bool = True
    checkpoint: Optional[str] = None
    trigger: Optional[dict] = None

    def write(self, df: DataFrame):
        if df.isStreaming:
            w = df.writeStream.format("console").option("numRows", self.num_rows).option(
                "truncate", self.truncate
            )
            return _start(w, self.checkpoint, self.trigger)
        df.show(self.num_rows, truncate=self.truncate)
        return None


@dataclass
class MemorySink(Sink):
    """Queryable in-memory table (reference memory destination D4).
    Stream: memory format; batch: temp view of a cached frame."""

    name: str = "memory_sink"
    checkpoint: Optional[str] = None
    trigger: Optional[dict] = None
    # append for stateless chains; update/complete for chains ending in
    # a stateful operator (e.g. the url_dedup keyed keep-min transform)
    output_mode: str = "append"

    def write(self, df: DataFrame):
        if df.isStreaming:
            w = (
                df.writeStream.format("memory")
                .queryName(self.name)
                .outputMode(self.output_mode)
            )
            return _start(w, self.checkpoint, self.trigger)
        df.cache().createOrReplaceTempView(self.name)
        return None


@dataclass
class NdjsonGzipSink(Sink):
    """Gzip NDJSON files under wall-clock-partitioned directories
    (reference s3 D2: ``prefix/YYYY/MM/DD/HH/<ksuid>_<unix>.gz``,
    x/s3/s3.go:143-148).

    Spark-first translation: ``partitionBy(y,m,d,h)`` directories with
    many part files per partition (the engine writes one file per task
    — the ksuid uniqueness trick is replaced by the file-sink commit
    protocol, which also upgrades at-least-once to exactly-once).
    ``ts_col=None`` partitions by ingestion wall-clock like the
    reference; a column name partitions by event time, which is what a
    100 TB lake actually wants (partition pruning on read).

    S3-compatible stores: the reference accepts ``customEndpoint`` /
    ``accessKeyID`` / ``secretAccessKey`` / ``bucketRegion`` so
    non-AWS endpoints like R2 work (x/s3/s3.go:107-121). Here those
    map onto hadoop-s3a configuration, and — because one Spark app may
    feed sinks on DIFFERENT stores — they are set per-bucket
    (``fs.s3a.bucket.<name>.*``), never globally. A custom endpoint
    also forces path-style access, which R2/MinIO require. The
    mapping is applied lazily at ``write`` time so constructing a
    config never needs a live session.
    """

    path: str
    ts_col: Optional[str] = None
    checkpoint: Optional[str] = None
    trigger: Optional[dict] = None
    mode: str = "append"
    custom_endpoint: Optional[str] = None
    access_key_id: Optional[str] = None
    secret_access_key: Optional[str] = None
    bucket_region: Optional[str] = None
    # reference batchSize (x/s3/s3.go: messages per flushed gz object,
    # default 100) → Spark's per-file row cap; None = one file per task
    batch_size: Optional[int] = None

    def s3a_conf(self) -> dict:
        """The hadoop conf this sink requires, keyed per-bucket.
        Empty for non-object-store paths."""
        if not self.path.startswith(("s3a://", "s3://")):
            return {}
        bucket = self.path.split("://", 1)[1].split("/", 1)[0]
        pfx = f"fs.s3a.bucket.{bucket}"
        conf: dict = {}
        if self.custom_endpoint:
            conf[f"{pfx}.endpoint"] = self.custom_endpoint
            conf[f"{pfx}.path.style.access"] = "true"
        if self.bucket_region:
            conf[f"{pfx}.endpoint.region"] = self.bucket_region
        if self.access_key_id and self.secret_access_key:
            conf[f"{pfx}.access.key"] = self.access_key_id
            conf[f"{pfx}.secret.key"] = self.secret_access_key
        return conf

    def _apply_s3a_conf(self, df: DataFrame) -> None:
        conf = self.s3a_conf()
        if conf:
            hconf = df.sparkSession.sparkContext._jsc.hadoopConfiguration()
            for k, v in conf.items():
                hconf.set(k, v)

    def _partitioned(self, df: DataFrame) -> DataFrame:
        ts = F.col(self.ts_col) if self.ts_col else F.current_timestamp()
        return (
            df.withColumn("y", F.year(ts))
            .withColumn("m", F.month(ts))
            .withColumn("d", F.dayofmonth(ts))
            .withColumn("h", F.hour(ts))
        )

    def write(self, df: DataFrame):
        self._apply_s3a_conf(df)
        out = self._partitioned(df)
        if df.isStreaming:
            w = (
                out.writeStream.format("json")
                .option("compression", "gzip")
                .option("path", self.path)
                .partitionBy("y", "m", "d", "h")
                .outputMode("append")
            )
            if self.batch_size:
                w = w.option("maxRecordsPerFile", self.batch_size)
            return _start(w, self.checkpoint or f"{self.path}/_checkpoint", self.trigger)
        w = (
            out.write.mode(self.mode)
            .partitionBy("y", "m", "d", "h")
            .option("compression", "gzip")
        )
        if self.batch_size:
            w = w.option("maxRecordsPerFile", self.batch_size)
        w.json(self.path)
        return None


@dataclass
class MultiSink(Sink):
    """Fan-out to N sinks; the upstream offset commits only after every
    sink's write returns (reference MultiDestination D5 ack-after-all,
    x/multi/multidest.go:34-49). Streaming: one foreachBatch persists
    the micro-batch once and writes it N times — batch-level analogue
    of ``ackFn(ack, n)``."""

    sinks: Sequence[Sink] = field(default_factory=list)
    checkpoint: Optional[str] = None
    trigger: Optional[dict] = None

    def write(self, df: DataFrame):
        if df.isStreaming:

            def fanout(batch: DataFrame, epoch_id: int) -> None:
                batch.persist()
                try:
                    for s in self.sinks:
                        s.write(batch)
                finally:
                    batch.unpersist()

            return _start(df.writeStream.foreachBatch(fanout), self.checkpoint, self.trigger)
        df.persist()
        try:
            for s in self.sinks:
                s.write(df)
        finally:
            df.unpersist()
        return None


@dataclass
class MqttReplaySink(Sink):
    """MQTT publish semantics (reference mqtt.Destination D3,
    x/mqtt/mqtt.go:105-176): every payload goes to ONE fixed topic with
    the sink's QoS/retained flags (mqtt.go:34-48). Connector half is an
    NDJSON capture directory (same schema MqttReplaySource reads, so
    source↔sink round-trips); the blocking token wait (mqtt.go:160-168)
    maps to the micro-batch completing before its offsets commit."""

    path: str = ""
    topic: str = "out"
    qos: int = 1
    retained: bool = False
    payload_col: str = "value"
    checkpoint: Optional[str] = None
    trigger: Optional[dict] = None

    def _capture(self, df: DataFrame) -> DataFrame:
        return df.select(
            F.lit(self.topic).alias("topic"),
            F.col(self.payload_col).cast("string").alias("payload"),
            F.lit(self.qos).alias("qos"),
            F.lit(self.retained).alias("retained"),
        )

    def write(self, df: DataFrame):
        out = self._capture(df)
        if df.isStreaming:
            w = out.writeStream.format("json").option("path", self.path).outputMode("append")
            return _start(w, self.checkpoint or f"{self.path}/_checkpoint", self.trigger)
        out.write.mode("append").json(self.path)
        return None


class ErrDontAck(Exception):
    """Error-handler signal: do NOT commit this batch's offsets — the
    micro-batch replays on restart (reference batcher's ErrDontAck
    sentinel, x/batcher/batcher.go:21, 364-374)."""


@dataclass
class BatcherSink(Sink):
    """Micro-batching sink with pluggable flush + error policy — the
    reference batcher (D6, x/batcher/batcher.go:58-400) re-expressed on
    the micro-batch engine:

    - ``flush_interval`` ≈ FlushFrequency (batcher.go:138): trigger
      cadence.
    - input-rate caps (``maxFilesPerTrigger``/``maxOffsetsPerTrigger``
      on the source) ≈ FlushLength (batcher.go:137).
    - ``FlushParallelism`` (batcher.go:139) is subsumed by task
      parallelism within the batch write.
    - error policy ≈ ErrorHandler (batcher.go:40-48): ``"raise"`` →
      fatal query error (the reference's default fatal contract),
      ``"discard"`` → swallow and commit (DiscardHandler),
      ``"dont_ack"`` → fail the batch WITHOUT committing offsets so it
      replays (ErrDontAck).
    - ``flush_timeout`` ≈ the per-flush timeout + watchdog
      (batcher.go:230-242, 351-356): a flush exceeding the bound fails
      the query fatally instead of wedging the pipeline silently.
    - ``stop_timeout`` ≈ graceful-stop draining (batcher.go:283-304):
      bounds how long ``query.stop()`` waits for in-flight work
      (``spark.sql.streaming.stopTimeout``).
    """

    flush: Callable[[DataFrame, int], None] = lambda df, epoch: None
    flush_interval: Optional[str] = None  # e.g. "1 second"; None → availableNow
    on_error: str = "raise"
    checkpoint: Optional[str] = None
    flush_timeout: Optional[float] = None  # seconds; None → unbounded
    stop_timeout: Optional[str] = None  # e.g. "5s" (reference StopTimeout default)

    def write(self, df: DataFrame):
        import time as _time

        def do_flush(batch: DataFrame, epoch_id: int) -> None:
            t0 = _time.monotonic()
            try:
                self.flush(batch, epoch_id)
            except ErrDontAck:
                raise  # fail the batch → offsets not committed → replay
            except Exception:
                if self.on_error == "discard":
                    return  # swallow: batch acked without effect
                raise  # fatal (reference default: any Send error kills the processor)
            if self.flush_timeout is not None:
                elapsed = _time.monotonic() - t0
                if elapsed > self.flush_timeout:
                    # watchdog contract: a wedged/overlong flush is fatal,
                    # and the batch does NOT ack (error before commit)
                    raise TimeoutError(
                        f"flush of epoch {epoch_id} took {elapsed:.1f}s"
                        f" > flush_timeout={self.flush_timeout}s"
                    )

        trigger = (
            {"processingTime": self.flush_interval} if self.flush_interval else {"availableNow": True}
        )
        if not df.isStreaming:
            do_flush(df, 0)
            return None
        if self.stop_timeout is not None:
            df.sparkSession.conf.set("spark.sql.streaming.stopTimeout", self.stop_timeout)
        return _start(df.writeStream.foreachBatch(do_flush), self.checkpoint, trigger)


def _post_ndjson(
    url: str,
    body: bytes,
    headers: dict,
    max_retries: int,
    backoff: float,
    timeout: float,
) -> None:
    """One HTTP POST with the webhook delivery policy: retry
    connection errors and 5xx with exponential backoff (transient),
    fail fast on 4xx (a client error that a retry cannot fix —
    retrying would just hammer the endpoint). Runs inside executor
    tasks; stdlib urllib only."""
    import time as _time
    import urllib.error
    import urllib.request

    last: Exception | None = None
    for attempt in range(max_retries + 1):
        try:
            req = urllib.request.Request(url, data=body, headers=headers, method="POST")
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                resp.read()
            return
        except urllib.error.HTTPError as exc:
            if 400 <= exc.code < 500:
                raise RuntimeError(
                    f"webhook: fatal client error {exc.code} from {url}"
                ) from exc
            last = exc
        except (urllib.error.URLError, ConnectionError, OSError, TimeoutError) as exc:
            last = exc
        if attempt < max_retries:
            _time.sleep(backoff * (2**attempt))
    raise RuntimeError(
        f"webhook: {max_retries + 1} attempts to {url} failed: {last}"
    ) from last


@dataclass
class WebhookSink(Sink):
    """HTTP webhook destination (reference ``runreveal`` destination —
    README.md:244-250: ``{"type":"runreveal","webhookURL":...}`` —
    generalized to any NDJSON-accepting endpoint).

    Rows serialize to JSON on the JVM (``to_json(struct(*))``) so
    Python only moves finished strings; each executor partition POSTs
    its rows in ``batch_size`` chunks (the reference s3 default of 100
    events per request) with retry/backoff on transient failures and
    fail-fast on 4xx. A failed batch raises before the micro-batch
    commits, so offsets are not acked and the batch replays —
    at-least-once, the reference's delivery contract (duplicates are
    possible on timeout-after-delivery; receivers dedup on an id
    field, which is why the conformance oracle counts DISTINCT ids).

    Scale: delivery parallelism = partition count; per-request payload
    is bounded by batch_size, so endpoint load is tunable without
    touching the plan. No driver-side collect anywhere.
    """

    webhook_url: str = ""
    batch_size: int = 100
    max_retries: int = 4
    backoff: float = 0.2
    timeout: float = 30.0
    headers: Optional[dict] = None
    checkpoint: Optional[str] = None
    trigger: Optional[dict] = None

    def _post_partition(self):
        url = self.webhook_url
        if not url:
            raise ValueError("webhook: webhookURL is required")
        bs, mr, bo, to = self.batch_size, self.max_retries, self.backoff, self.timeout
        headers = {"Content-Type": "application/x-ndjson", **(self.headers or {})}

        def post_rows(rows) -> None:
            chunk: list = []
            for row in rows:
                chunk.append(row.value)
                if len(chunk) >= bs:
                    _post_ndjson(url, "\n".join(chunk).encode(), headers, mr, bo, to)
                    chunk = []
            if chunk:
                _post_ndjson(url, "\n".join(chunk).encode(), headers, mr, bo, to)

        return post_rows

    def _payload(self, df: DataFrame) -> DataFrame:
        return df.select(F.to_json(F.struct(*df.columns)).alias("value"))

    def write(self, df: DataFrame):
        post = self._post_partition()
        if df.isStreaming:

            def deliver(batch: DataFrame, epoch_id: int) -> None:
                self._payload(batch).foreachPartition(post)

            return _start(
                df.writeStream.foreachBatch(deliver),
                self.checkpoint,
                self.trigger or {"availableNow": True},
            )
        self._payload(df).foreachPartition(post)
        return None

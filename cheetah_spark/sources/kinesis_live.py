"""Kinesis source/sink — the reference wishlist's #6 connector
(reference README.md:301-311 "Source / Destination Wishlist:
Kinesis"), built on the PUBLIC Kinesis Data Streams JSON API
(docs.aws.amazon.com/kinesis/latest/APIReference — ``POST /`` with
``X-Amz-Target: Kinesis_20131202.<Op>`` and
``application/x-amz-json-1.1`` bodies): CreateStream/DescribeStream/
PutRecord(s)/GetShardIterator/GetRecords with base64 data, MD5
partition-key→hash-range shard routing, and per-shard monotonic
sequence numbers, spoken over stdlib ``urllib``/``http.server``.

Transports, the connector-family discipline:

- ``transport="http"`` — REAL Kinesis API calls over HTTP.
  :class:`KinesisClient` issues the documented requests verbatim;
  :class:`MiniKinesisServer` is a loopback service the conformance
  tests run against (``ThreadingHTTPServer``, N shards splitting the
  2^128 hash-key space evenly, TRIM_HORIZON / LATEST /
  AT/AFTER_SEQUENCE_NUMBER iterators) — kinesalite / LocalStack / the
  real service serve the identical wire format (the real endpoint
  additionally requires SigV4 request signing, which local stacks and
  this loopback do not check; a production deployment fronts these
  calls with a signing proxy or IAM-authenticated endpoint).
- ``transport="replay"`` — a deterministic NDJSON capture (schema:
  ``partition_key, data``; shard routing re-derived by the same MD5
  rule) delivered in bounded chunks per micro-batch, batch or
  streaming.

Rows surface as ``shard_id string, sequence_number string,
partition_key string, data string``.

Unlike AMQP/Pub/Sub there are NO acks: Kinesis consumers track their
own positions, and the stream RETAINS records for the retention
window — so the streaming reader is a CURSOR reader, not a buffer
reader. Offsets are per-shard sequence positions; ``read`` polls
``GetRecords`` from the committed positions (the reference S5 poller
shape, poller.go), and ``readBetweenOffsets`` re-fetches the exact
window from the service via ``AFTER_SEQUENCE_NUMBER`` — a reader
restart loses nothing and warns about nothing (the journald
cursor-resume policy, upgraded to true service-side replay)."""

from __future__ import annotations

import base64
import hashlib
import http.server
import json
import os
import threading
import urllib.request
from dataclasses import dataclass
from typing import Iterator, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType

from cheetah_spark.sinks import Sink
from cheetah_spark.sources import Source
from cheetah_spark.sources.seqwindow import SeqWindowStreamReader

KINESIS_SCHEMA = (
    "shard_id string, sequence_number string, partition_key string, data string"
)

_TARGET_PREFIX = "Kinesis_20131202."


def shard_for_key(partition_key: str, n_shards: int) -> int:
    """The documented routing rule: MD5(partition key) as a 128-bit
    integer, mapped into the shard whose hash-key range contains it
    (ranges split 2^128 evenly here, as CreateStream does)."""
    h = int.from_bytes(hashlib.md5(partition_key.encode("utf-8")).digest(), "big")
    return min(h // ((1 << 128) // n_shards), n_shards - 1)


def shard_id_str(i: int) -> str:
    return f"shardId-{i:012d}"


# ---------------------------------------------------------------------------
# Loopback service (conformance stand-in — kinesalite/LocalStack serve the
# same wire format)
# ---------------------------------------------------------------------------


class MiniKinesisServer:
    """Loopback Kinesis Data Streams API: CreateStream (N shards over
    an even 2^128 hash split), DescribeStream, PutRecord/PutRecords
    (MD5 routing, per-shard monotonic sequence numbers), shard
    iterators (TRIM_HORIZON, LATEST, AT/AFTER_SEQUENCE_NUMBER), and
    GetRecords with MillisBehindLatest — records are RETAINED, so any
    window can be re-read (the property the cursor reader's
    readBetweenOffsets relies on)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        outer = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_POST(self):
                target = self.headers.get("X-Amz-Target") or ""
                n = int(self.headers.get("Content-Length") or 0)
                body = json.loads(self.rfile.read(n) or b"{}")
                try:
                    op = target[len(_TARGET_PREFIX) :]
                    out = outer._dispatch(op, body)
                    code = 200
                except KeyError as exc:
                    out = {"__type": "ResourceNotFoundException", "message": str(exc)}
                    code = 400
                except ValueError as exc:
                    out = {"__type": "InvalidArgumentException", "message": str(exc)}
                    code = 400
                raw = json.dumps(out).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/x-amz-json-1.1")
                self.send_header("Content-Length", str(len(raw)))
                self.end_headers()
                self.wfile.write(raw)

        self._httpd = http.server.ThreadingHTTPServer((host, port), Handler)
        self.addr = "%s:%d" % self._httpd.server_address
        self._lock = threading.Lock()
        # stream -> list of shards; each shard is a list of records
        self._streams: dict[str, list[list[dict]]] = {}
        threading.Thread(target=self._httpd.serve_forever, daemon=True).start()

    def _dispatch(self, op: str, body: dict) -> dict:
        if op == "CreateStream":
            name = body["StreamName"]
            n = int(body.get("ShardCount") or 1)
            with self._lock:
                self._streams.setdefault(name, [[] for _ in range(n)])
            return {}
        with self._lock:
            shards = self._streams.get(body.get("StreamName") or self._stream_of_iter(body))
            if shards is None:
                raise KeyError(f"stream not found: {body.get('StreamName')}")
            if op == "DescribeStream":
                step = (1 << 128) // len(shards)
                return {
                    "StreamDescription": {
                        "StreamName": body["StreamName"],
                        "StreamStatus": "ACTIVE",
                        "Shards": [
                            {
                                "ShardId": shard_id_str(i),
                                "HashKeyRange": {
                                    "StartingHashKey": str(i * step),
                                    "EndingHashKey": str(
                                        ((i + 1) * step - 1) if i < len(shards) - 1 else (1 << 128) - 1
                                    ),
                                },
                            }
                            for i in range(len(shards))
                        ],
                    }
                }
            if op == "PutRecord":
                rec = self._put(shards, body)
                return {
                    "ShardId": rec["_shard"],
                    "SequenceNumber": rec["SequenceNumber"],
                }
            if op == "PutRecords":
                out = []
                for r in body.get("Records") or []:
                    rec = self._put(shards, r)
                    out.append(
                        {"ShardId": rec["_shard"], "SequenceNumber": rec["SequenceNumber"]}
                    )
                return {"FailedRecordCount": 0, "Records": out}
            if op == "GetShardIterator":
                sid = body["ShardId"]
                idx = int(sid.rsplit("-", 1)[1])
                itype = body["ShardIteratorType"]
                if itype == "TRIM_HORIZON":
                    pos = 0
                elif itype == "LATEST":
                    pos = len(shards[idx])
                elif itype in ("AT_SEQUENCE_NUMBER", "AFTER_SEQUENCE_NUMBER"):
                    seq = int(body["StartingSequenceNumber"])
                    pos = seq + (1 if itype == "AFTER_SEQUENCE_NUMBER" else 0)
                else:
                    raise ValueError(f"unsupported iterator type {itype}")
                token = json.dumps(
                    {"s": body["StreamName"], "i": idx, "p": pos}, separators=(",", ":")
                )
                return {"ShardIterator": base64.b64encode(token.encode()).decode()}
            if op == "GetRecords":
                tok = json.loads(base64.b64decode(body["ShardIterator"]))
                shard = self._streams[tok["s"]][tok["i"]]
                limit = int(body.get("Limit") or 1000)
                out = shard[tok["p"] : tok["p"] + limit]
                nxt = json.dumps(
                    {"s": tok["s"], "i": tok["i"], "p": tok["p"] + len(out)},
                    separators=(",", ":"),
                )
                return {
                    "Records": [
                        {k: v for k, v in r.items() if not k.startswith("_")} for r in out
                    ],
                    "NextShardIterator": base64.b64encode(nxt.encode()).decode(),
                    "MillisBehindLatest": 0 if tok["p"] + len(out) >= len(shard) else 1,
                }
        raise ValueError(f"unknown operation {op}")

    def _stream_of_iter(self, body: dict) -> Optional[str]:
        it = body.get("ShardIterator")
        if not it:
            return None
        return json.loads(base64.b64decode(it))["s"]

    def _put(self, shards: list, body: dict) -> dict:
        pk = body["PartitionKey"]
        i = shard_for_key(pk, len(shards))
        rec = {
            "SequenceNumber": str(len(shards[i])),  # per-shard index position
            "PartitionKey": pk,
            "Data": body["Data"],
            "ApproximateArrivalTimestamp": 0.0,
            "_shard": shard_id_str(i),
        }
        shards[i].append(rec)
        return rec

    def record_count(self, stream: str) -> int:
        with self._lock:
            return sum(len(s) for s in self._streams.get(stream, []))

    def close(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()


# ---------------------------------------------------------------------------
# Client (stdlib urllib)
# ---------------------------------------------------------------------------


class KinesisClient:
    """Minimal Kinesis Data Streams client. ``addr`` is a
    kinesalite-style ``host:port``; the real endpoint additionally
    needs SigV4 signing, which the loopback surface does not check."""

    def __init__(self, addr: str):
        self._url = f"http://{addr}/"

    def _call(self, op: str, body: dict) -> dict:
        req = urllib.request.Request(
            self._url,
            data=json.dumps(body).encode(),
            method="POST",
            headers={
                "Content-Type": "application/x-amz-json-1.1",
                "X-Amz-Target": _TARGET_PREFIX + op,
            },
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            return json.loads(resp.read() or b"{}")

    def create_stream(self, stream: str, shard_count: int = 4) -> None:
        self._call("CreateStream", {"StreamName": stream, "ShardCount": shard_count})

    def describe_stream(self, stream: str) -> list:
        out = self._call("DescribeStream", {"StreamName": stream})
        return out["StreamDescription"]["Shards"]

    def put_record(self, stream: str, partition_key: str, data) -> dict:
        if isinstance(data, str):
            data = data.encode("utf-8")
        return self._call(
            "PutRecord",
            {
                "StreamName": stream,
                "PartitionKey": partition_key,
                "Data": base64.b64encode(data).decode("ascii"),
            },
        )

    def put_records(self, stream: str, records: list) -> dict:
        """records: [(partition_key, data)]."""
        enc = []
        for pk, data in records:
            if isinstance(data, str):
                data = data.encode("utf-8")
            enc.append({"PartitionKey": pk, "Data": base64.b64encode(data).decode("ascii")})
        return self._call("PutRecords", {"StreamName": stream, "Records": enc})

    def get_shard_iterator(
        self, stream: str, shard_id: str, iterator_type: str = "TRIM_HORIZON",
        starting_sequence_number: Optional[str] = None,
    ) -> str:
        body = {
            "StreamName": stream,
            "ShardId": shard_id,
            "ShardIteratorType": iterator_type,
        }
        if starting_sequence_number is not None:
            body["StartingSequenceNumber"] = starting_sequence_number
        return self._call("GetShardIterator", body)["ShardIterator"]

    def get_records(self, shard_iterator: str, limit: int = 1000) -> dict:
        """→ {"records": [(seq, pk, data:str)], "next": iterator,
        "behind": bool}."""
        out = self._call("GetRecords", {"ShardIterator": shard_iterator, "Limit": limit})
        recs = [
            (
                r["SequenceNumber"],
                r["PartitionKey"],
                base64.b64decode(r.get("Data") or "").decode("utf-8"),
            )
            for r in out.get("Records") or []
        ]
        return {
            "records": recs,
            "next": out.get("NextShardIterator"),
            "behind": bool(out.get("MillisBehindLatest")),
        }


# ---------------------------------------------------------------------------
# Streaming readers
# ---------------------------------------------------------------------------


class _KinesisCursorStreamReader(SimpleDataSourceStreamReader):
    """CURSOR reader over the live API (reference S5 poller shape,
    poller.go): offsets are per-shard positions
    ``{"pos": {shard_id: next_seq_int}}``, ``read`` polls GetRecords
    from the committed positions, and ``readBetweenOffsets`` re-fetches
    the exact window from the service via AT_SEQUENCE_NUMBER — the
    stream retains records, so a reader restart replays losslessly
    with no local buffering at all (and ``commit`` has nothing to ack:
    Kinesis consumers own their positions, which ARE the checkpoint)."""

    def __init__(self, options):
        self._addr = options.get("addr") or ""
        self._stream = options.get("stream") or "events"
        self._limit = int(options.get("max_records") or 1000)
        self._client: Optional[KinesisClient] = None
        self._shard_ids: Optional[list] = None

    def __getstate__(self):
        return {
            "_addr": self._addr,
            "_stream": self._stream,
            "_limit": self._limit,
        }

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._client = None
        self._shard_ids = None

    def _ensure(self):
        if self._client is None:
            self._client = KinesisClient(self._addr)
            self._shard_ids = [s["ShardId"] for s in self._client.describe_stream(self._stream)]
        return self._client

    def initialOffset(self) -> dict:
        self._ensure()
        return {"pos": {sid: 0 for sid in self._shard_ids}}

    def _iter_at(self, shard_id: str, pos: int) -> str:
        """Iterator at position ``pos``: TRIM_HORIZON for the stream
        start (AT_SEQUENCE_NUMBER needs an existing record to anchor
        on), AT_SEQUENCE_NUMBER otherwise."""
        c = self._ensure()
        if pos == 0:
            return c.get_shard_iterator(self._stream, shard_id, "TRIM_HORIZON")
        return c.get_shard_iterator(
            self._stream, shard_id, "AT_SEQUENCE_NUMBER", str(pos)
        )

    def _fetch(self, shard_id: str, from_pos: int, until_pos: Optional[int] = None) -> list:
        """Fetch records of one shard from position ``from_pos``
        (inclusive), to the stream head or ``until_pos`` (exclusive)."""
        c = self._ensure()
        it = self._iter_at(shard_id, from_pos)
        rows = []
        while True:
            want = (until_pos - from_pos - len(rows)) if until_pos is not None else self._limit
            if until_pos is not None and want <= 0:
                break
            out = c.get_records(it, min(want, self._limit))
            rows.extend(out["records"])
            it = out["next"]
            if not out["records"] or (until_pos is None and not out["behind"]):
                break
        return rows

    def read(self, start: dict) -> Tuple[Iterator[tuple], dict]:
        c = self._ensure()
        pos = dict(start["pos"])
        rows = []
        for sid in self._shard_ids:
            p = int(pos.get(sid, 0))
            # ONE GetRecords per shard per micro-batch: admission stays
            # bounded by max_records even against a deep backlog (the
            # next trigger continues from the advanced position)
            it = self._iter_at(sid, p)
            recs = c.get_records(it, self._limit)["records"]
            for seq, pk, data in recs:
                rows.append((sid, seq, pk, data))
            pos[sid] = p + len(recs)
        return iter(rows), {"pos": pos}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # deterministic service-side replay: the stream retains the
        # window, so a restarted reader re-fetches it exactly
        self._ensure()
        rows = []
        for sid in self._shard_ids:
            p0 = int(start["pos"].get(sid, 0))
            p1 = int(end["pos"].get(sid, 0))
            if p1 > p0:
                for seq, pk, data in self._fetch(sid, p0, p1):
                    rows.append((sid, seq, pk, data))
        return iter(rows)

    def commit(self, end: dict) -> None:
        pass  # positions are the checkpoint; nothing to ack service-side


class _KinesisReplaySimpleStreamReader(SeqWindowStreamReader):
    """Replay transport on the shared seq-window core: the NDJSON
    capture (partition_key, data) is routed to shards by the same MD5
    rule the service applies, with per-shard positions as sequence
    numbers."""

    _PICKLE_FIELDS = ("_capture_path", "_chunk_size", "_n_shards")

    def __init__(self, options):
        self._capture_path = options.get("capture_path") or ""
        self._chunk_size = int(options.get("chunk_size") or 0)
        self._n_shards = int(options.get("shard_count") or 4)
        self._init_runtime()

    def _make_listener(self):
        return _KinesisReplayPump(
            self._capture_path, self._chunk_size, self._n_shards, self._on_item
        )

    def _row_of(self, item) -> tuple:
        return item

    def _lost_window_error(self, start_seq: int, end_seq: int) -> Exception:
        return RuntimeError(
            f"kinesis-replay: window [{start_seq},{end_seq}) lost after restart "
            "of the capture pump; the live transport re-fetches from the "
            "service instead (cursor reader)"
        )


class _KinesisReplayPump:
    def __init__(self, capture_path: str, chunk_size: int, n_shards: int, on_item):
        self._capture_path = capture_path
        self._chunk_size = chunk_size
        self._n_shards = n_shards
        self._on_item = on_item
        self._gen = self._deliveries()
        if chunk_size <= 0:
            for _ in self._gen:
                pass

    def _iter_capture(self):
        path = self._capture_path
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
                    yield rec["partition_key"], rec["data"]

    def _deliveries(self):
        delivered = 0
        seqs = [0] * self._n_shards
        for pk, data in self._iter_capture():
            i = shard_for_key(pk, self._n_shards)
            self._on_item((shard_id_str(i), str(seqs[i]), pk, data))
            seqs[i] += 1
            delivered += 1
            if self._chunk_size > 0 and delivered % self._chunk_size == 0:
                yield

    def pump(self):
        try:
            next(self._gen)
        except StopIteration:
            pass

    def close(self):
        pass


class KinesisStreamDataSource(DataSource):
    """``spark.readStream.format("cheetah-kinesis")`` — a Kinesis
    stream as a Python streaming data source (cursor reader over the
    live API; seq-window pump over a replay capture)."""

    @classmethod
    def name(cls) -> str:
        return "cheetah-kinesis"

    def schema(self) -> str:
        return KINESIS_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        transport = (self.options.get("transport") or "http").lower()
        if transport == "http":
            return _KinesisCursorStreamReader(self.options)
        if transport == "replay":
            return _KinesisReplaySimpleStreamReader(self.options)
        raise ValueError(f"kinesis: unknown transport {transport!r} (http|replay)")


def register_kinesis_source(spark: SparkSession) -> None:
    spark.dataSource.register(KinesisStreamDataSource)


# ---------------------------------------------------------------------------
# Source / Sink adapters (config types)
# ---------------------------------------------------------------------------


def shard_col(partition_key_col, n_shards: int):
    """The MD5 routing rule as a Catalyst expression (high bits of the
    MD5 hex digest), so replay-path shard derivation stays JVM-side.
    Valid for shard counts that divide 16 evenly into the top nibble
    (1, 2, 4, 8, 16 — the even 2^128 split only lands on nibble
    boundaries for these)."""
    if 16 % n_shards != 0:
        raise ValueError("shard_col supports shard counts 1,2,4,8,16")
    nibble = F.expr(
        f"instr('0123456789abcdef', substring(md5({partition_key_col}), 1, 1)) - 1"
    )
    idx = F.floor(nibble / (16 // n_shards)).cast("int")
    return F.concat(F.lit("shardId-"), F.lpad(idx.cast("string"), 12, "0"))


@dataclass
class KinesisSource(Source):
    """Config type ``{"type":"kinesis","addr":...,"stream":...}``."""

    addr: str = ""
    stream: str = "events"
    max_records: int = 1000
    shard_count: int = 4  # replay-side routing (live side: DescribeStream)
    transport: str = "http"  # http | replay
    capture_path: str = ""
    chunk_size: int = 0
    streaming: bool = True

    def read(self, spark: SparkSession) -> DataFrame:
        if not self.streaming:
            # batch over the live API would GetRecords-drain through the
            # driver — at scale the production batch path is
            # Firehose→S3 (then scan the parquet/ndjson there); keep
            # batch on the capture
            if self.transport.lower() != "replay":
                raise ValueError(
                    "kinesis: batch reads need transport='replay' — for bulk "
                    "export use Firehose->S3 and scan that, instead of "
                    "GetRecords-draining the stream through the driver"
                )
            env = spark.read.schema("partition_key string, data string").json(
                self.capture_path
            )
            return env.select(
                shard_col("partition_key", self.shard_count).alias("shard_id"),
                F.lit(None).cast("string").alias("sequence_number"),
                "partition_key",
                "data",
            )
        register_kinesis_source(spark)
        reader = spark.readStream.format("cheetah-kinesis")
        for k, v in (
            ("transport", self.transport),
            ("addr", self.addr),
            ("stream", self.stream),
            ("max_records", str(self.max_records) if self.max_records != 1000 else ""),
            ("shard_count", str(self.shard_count) if self.shard_count != 4 else ""),
            ("capture_path", self.capture_path),
            ("chunk_size", str(self.chunk_size) if self.chunk_size else ""),
        ):
            if v:
                reader = reader.option(k, v)
        return reader.load()


@dataclass
class KinesisSink(Sink):
    """PutRecords every row (``partition_key, data`` — a missing data
    column defaults to a JSON struct of the row), batched per the API
    contract (<=500 records per PutRecords) per partition; replay
    transport appends the NDJSON capture the source reads."""

    addr: str = ""
    stream: str = "out"
    batch_size: int = 500
    transport: str = "http"  # http | replay
    capture_path: str = ""
    checkpoint: Optional[str] = None
    trigger: Optional[dict] = None

    def write(self, df: DataFrame):
        from cheetah_spark.sinks import _start

        t = self.transport.lower()
        cols = set(df.columns)
        pk_col = F.col("partition_key") if "partition_key" in cols else F.lit("0")
        data_col = (
            F.col("data")
            if "data" in cols
            else F.to_json(F.struct(*[F.col(c) for c in df.columns]))
        )
        out = df.select(pk_col.alias("partition_key"), data_col.alias("data"))
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
            raise ValueError(f"kinesis: unknown transport {t!r} (http|replay)")
        addr, stream, bsz = self.addr, self.stream, min(self.batch_size, 500)

        def send(rows):
            client = KinesisClient(addr)
            batch = []
            for r in rows:
                batch.append((r.partition_key, r.data))
                if len(batch) >= bsz:
                    client.put_records(stream, batch)
                    batch = []
            if batch:
                client.put_records(stream, batch)

        if df.isStreaming:
            import uuid as _uuid

            w = out.writeStream.foreachBatch(
                lambda batch, _id: batch.foreachPartition(send)
            ).outputMode("append")
            return _start(
                w,
                self.checkpoint or f"/tmp/cheetah_spark_ckpt/kinesis_{_uuid.uuid4().hex[:8]}",
                self.trigger,
            )
        out.foreachPartition(send)
        return None

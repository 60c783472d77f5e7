"""Streaming execution helpers: bounded-replay fixtures and
run-to-completion plumbing for conformance-style checks.

The reference's conformance suite (test/suite_test.go:16-104) pushes N
unique payloads source→identity→sink and asserts no-loss/no-dup. Here
the replay source is a directory of parquet files consumed with
``maxFilesPerTrigger`` (micro-batches in deterministic file order) and
the sink is the in-memory table; ``processAllAvailable`` drives the
bounded stream to completion synchronously.
"""

from __future__ import annotations

import contextlib as _contextlib
import glob as _glob
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

FIXTURE_ROOT = "/tmp/cheetah_spark_fixtures"


def _tag(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir))


def fixture_stale(spark: SparkSession, path: str, fmt: str = "parquet") -> bool:
    """True if a cached fixture predates the instant-timestamp contract
    (its footer Spark-schema says TIMESTAMP_NTZ) and must be rebuilt —
    batch re-reads of such files re-infer NTZ from the footer metadata
    no matter what ``inferTimestampNTZ`` says.

    Only parquet carries the Spark-schema footer metadata that causes
    the NTZ override; other formats (ORC) never go stale this way, so
    they short-circuit to False — reading an ORC directory as parquet
    would throw and spuriously mark the fixture stale on every call.

    A fresh verdict is memoized per path for the process lifetime: the
    footer probe costs a full spark.read.parquet round trip, and a
    fixture that was fresh once cannot go stale underneath a running
    process (staleness is a property of how the files were WRITTEN)."""
    from pyspark.sql import types as T

    if fmt != "parquet":
        return False
    if path in _fresh_fixture_paths:
        return False
    try:
        schema = spark.read.parquet(path).schema
    except Exception:
        return True
    if any(isinstance(f.dataType, T.TimestampNTZType) for f in schema.fields):
        return True
    _fresh_fixture_paths.add(path)
    return False


_fresh_fixture_paths: set = set()  # paths verified non-stale; see fixture_stale


def _ordered_stream_dir(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    order_cols: tuple[str, ...],
    n_files: int,
    dir_name: str,
    drop_legacy: tuple[str, ...] = (),
    transform=None,
) -> str:
    """Shared replay-fixture builder: split ``table`` into n ordered
    parquet files with strictly increasing mtimes.

    Admission order is pinned explicitly: FileStreamSource admits files
    sorted by MODIFICATION TIME, and a parallel write finishes its part
    files in arbitrary order — which silently replayed a middle slice
    late, and watermarked operators then DROPPED that slice as late
    data (caught by the s_stream_watermark_late oracle, round 4).
    Renaming to slice order and stamping strictly increasing mtimes
    makes replay order == ``order_cols`` order, deterministically."""
    import glob as _glob

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from cheetah_spark.catalog import ensure_instant_reads, load_table

    ensure_instant_reads(spark)
    out = f"{FIXTURE_ROOT}/{_tag(sf_dir)}/{dir_name}"
    done = f"{out}/_FIXTURE_READY"
    if os.path.exists(done) and fixture_stale(spark, out):
        shutil.rmtree(out, ignore_errors=True)
    if not os.path.exists(done):
        for legacy in drop_legacy:  # pre-fix cache generations
            shutil.rmtree(f"{FIXTURE_ROOT}/{_tag(sf_dir)}/{legacy}", ignore_errors=True)
        t = load_table(spark, sf_dir, table)
        if transform is not None:
            t = transform(t)
        (
            # global-order ntile is fine here: bounded test-fixture
            # derivation, not a scale path
            t.withColumn("slice", F.ntile(n_files).over(W.orderBy(*order_cols)))
            .repartitionByRange(n_files, "slice")
            .sortWithinPartitions(*order_cols)
            .drop("slice")
            .write.mode("overwrite")
            .parquet(out)
        )
        base_t = 1_700_000_000
        for i, p in enumerate(sorted(_glob.glob(f"{out}/part-*.parquet"))):
            dst = f"{out}/data-{i:04d}.parquet"
            os.rename(p, dst)
            os.utime(dst, (base_t + i, base_t + i))
        open(done, "w").close()
    return out


def events_stream_dir(spark: SparkSession, sf_dir: str, n_files: int = 8) -> str:
    """Events replay feed: file k holds the k-th time-slice so
    event-time advances across micro-batches like a live stream.
    (dir suffix o2: cached pre-fix fixtures keep their broken mtimes,
    so the fixed layout gets its own cache key)"""
    return _ordered_stream_dir(
        spark,
        sf_dir,
        "events",
        ("ts", "event_id"),
        n_files,
        f"events_stream_{n_files}_o2",
        drop_legacy=(f"events_stream_{n_files}",),
    )


def events_replay_chunk(spark: SparkSession, sf_dir: str, windows: int = 4) -> int:
    """Per-trigger admission size for a bounded replay capture derived
    1:1 from the events table: target a FIXED number of offset windows
    at every scale (r13, guide §2 — make admission scale-adaptive).

    A constant chunk size is wrong in both directions: at sf0.01
    (10k events) a 10k constant collapses to a single window — the
    multi-batch seq-window discipline the replay queries exist to
    exercise is silently skipped — while at sf0.1+ it fans into
    dozens of floor-dominated micro-batches (measured: 10 windows
    5.2 s vs 4 windows 3.7 s for s_amqp_replay at sf0.1, min-of-2
    same-session). ``windows=4`` keeps >=2 real offset-window
    boundaries with slack at every SF. In production the equivalent
    knob is maxOffsetsPerTrigger sized to throughput x latency target,
    not a constant.
    """
    from cheetah_spark.catalog import _table_rows

    n = _table_rows(spark, sf_dir, "events")
    return max(1, -(-n // windows))


@_contextlib.contextmanager
def staged_replay(spark: SparkSession, sf_dir: str, prefix: str, src_dir: str):
    """Disposable hard-linked copy of a replay fixture, for queries
    that APPEND to the feed mid-run (watermark-advancing sentinels,
    late re-injections) without touching the shared fixture.

    Yields ``(stage, sentinel, max_ts)``: the stage directory a
    streaming source should read, a ``sentinel(hours)`` factory whose
    thunks append one far-future row (``max_ts + hours``) suitable for
    ``run_stream_to_completion(extra_drains=...)``, and the fixture's
    max event-time for filtering sentinel windows out of the result.
    The stage dir is removed on exit. Extracted from the three
    watermark/session queries that had copy-pasted it (round-6 advice).
    """
    from pyspark.sql import functions as F

    base = spark.read.parquet(src_dir)
    max_ts = base.agg(F.max("ts")).collect()[0][0]
    stage = f"{FIXTURE_ROOT}/{_tag(sf_dir)}/{prefix}_{uuid.uuid4().hex[:8]}"
    os.makedirs(stage, exist_ok=True)

    def sentinel(hours: int):
        def add() -> None:
            (
                base.limit(1)
                .withColumn("ts", F.lit(max_ts) + F.expr(f"INTERVAL {hours} HOURS"))
                .write.mode("append")
                .parquet(stage)
            )

        return add

    try:
        for f in _glob.glob(f"{src_dir}/*.parquet"):
            os.link(f, f"{stage}/{os.path.basename(f)}")
        yield stage, sentinel, max_ts
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def run_stream_to_completion(
    df: DataFrame,
    transform,
    output_mode: str = "append",
    trigger: dict | None = None,
    extra_drains=(),
) -> DataFrame:
    """Start stream → transform → memory sink, drain fully, stop;
    return the sink contents as a batch DataFrame. Fresh sink name +
    checkpoint per run (a reused checkpoint would replay nothing).

    ``extra_drains``: callables run AFTER the initial drain, each
    followed by another full drain — the hook for injecting data
    mid-run (e.g. a watermark-advancing sentinel file) with a
    deterministic batch boundary before and after."""
    spark = df.sparkSession
    name = f"sink_{uuid.uuid4().hex[:12]}"
    ckpt = f"/tmp/cheetah_spark_ckpt/{name}"
    # bounded conformance runs finish in seconds: push the state-store
    # maintenance cadence out of the way (its snapshot/cleanup passes
    # over providers of already-stopped queries stall later queries
    # sharing the session)
    spark.conf.set("spark.sql.streaming.stateStore.maintenanceInterval", "3600s")
    writer = (
        transform(df)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    query = writer.start()
    try:
        query.processAllAvailable()
        for drain in extra_drains:
            drain()
            query.processAllAvailable()
    finally:
        query.stop()
        try:
            # unload this query's state-store providers from the local
            # JVM so they don't accumulate across a long session
            spark._jvm.org.apache.spark.sql.execution.streaming.state.StateStore.stop()
        except Exception:
            pass  # hygiene only; never fail the query over it
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)


def run_stream_to_files(
    df: DataFrame,
    transform,
    output_mode: str = "update",
    trigger: dict | None = None,
) -> DataFrame:
    """Start stream → transform → foreachBatch parquet-append spool,
    drain fully, stop; return the spool as a batch DataFrame.

    The memory-sink variant above pins every emitted row in DRIVER
    memory — fine for bounded conformance rollups, a scale bug for
    update-mode stateful aggregations whose per-batch output is
    state-sized (s_llm_minhash_dedup emits ~|occupied buckets| rows
    per micro-batch: ~12 M rows/batch at the 25× probe, billions at
    100 TB). foreachBatch keeps the emission distributed: executors
    append parquet, the driver holds nothing, and the read-back is a
    normal scan (also measured mildly faster at 25× — the driver
    ingest was pure overhead). Checkpoint/state hygiene matches
    run_stream_to_completion."""
    spark = df.sparkSession
    name = f"spool_{uuid.uuid4().hex[:12]}"
    ckpt = f"/tmp/cheetah_spark_ckpt/{name}"
    out_dir = f"/tmp/cheetah_spark_ckpt/{name}_files"
    spark.conf.set("spark.sql.streaming.stateStore.maintenanceInterval", "3600s")
    out = transform(df)
    schema = out.schema

    def append_batch(batch: DataFrame, _epoch: int) -> None:
        batch.write.mode("append").parquet(out_dir)

    writer = (
        out.writeStream.foreachBatch(append_batch)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    query = writer.start()
    try:
        query.processAllAvailable()
    finally:
        query.stop()
        try:
            spark._jvm.org.apache.spark.sql.execution.streaming.state.StateStore.stop()
        except Exception:
            pass  # hygiene only; never fail the query over it
        shutil.rmtree(ckpt, ignore_errors=True)
    if not os.path.isdir(out_dir):  # zero-batch stream: nothing spooled
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(out_dir)


def run_stream_batch_partials(
    df: DataFrame,
    batch_transform,
    trigger: dict | None = None,
) -> DataFrame:
    """Start stream → foreachBatch(batch_transform → parquet-append
    spool), drain fully, stop; return the spool as a batch DataFrame.

    Unlike :func:`run_stream_to_files` (whose transform runs on the
    STREAMING frame and must be streaming-legal), ``batch_transform``
    here runs INSIDE foreachBatch on each micro-batch's BATCH frame —
    multi-level aggregations, exact distincts, and whole-stage-codegen
    projections are all available, and there is ZERO streaming state.
    This is the micro-batch-partials production pattern: each trigger
    reduces its admitted rows to a bounded partial (a monoid element —
    per-key counts/sums/mins), the spool accumulates partials, and the
    caller's final rollup merges them. Correct whenever the unit of
    aggregation (e.g. a document) never spans micro-batches and the
    final rollup is the partials' monoid merge."""
    spark = df.sparkSession
    name = f"spool_{uuid.uuid4().hex[:12]}"
    ckpt = f"/tmp/cheetah_spark_ckpt/{name}"
    out_dir = f"/tmp/cheetah_spark_ckpt/{name}_files"
    spark.conf.set("spark.sql.streaming.stateStore.maintenanceInterval", "3600s")
    schema_holder = {}

    def append_batch(batch: DataFrame, _epoch: int) -> None:
        out = batch_transform(batch)
        schema_holder.setdefault("schema", out.schema)
        out.write.mode("append").parquet(out_dir)

    writer = df.writeStream.foreachBatch(append_batch).option("checkpointLocation", ckpt)
    if trigger:
        writer = writer.trigger(**trigger)
    query = writer.start()
    try:
        query.processAllAvailable()
    finally:
        query.stop()
        try:
            spark._jvm.org.apache.spark.sql.execution.streaming.state.StateStore.stop()
        except Exception:
            pass  # hygiene only; never fail the query over it
        shutil.rmtree(ckpt, ignore_errors=True)
    if "schema" not in schema_holder or not os.path.isdir(out_dir):
        # zero-batch stream: derive the partial schema from an empty cut
        empty = batch_transform(df.sparkSession.createDataFrame([], df.schema))
        return spark.createDataFrame([], empty.schema)
    return spark.read.schema(schema_holder["schema"]).parquet(out_dir)


def documents_stream_dir(spark: SparkSession, sf_dir: str, n_files: int = 4) -> str:
    """Documents replay feed for streaming curation operators: file k
    holds the k-th doc_id slice, so replay (= arrival) order IS doc_id
    order — which lets a SQL oracle express arrival-order semantics
    ("flag the later arrival") as doc_id comparisons."""
    return _ordered_stream_dir(
        spark, sf_dir, "documents", ("doc_id",), n_files, f"documents_stream_{n_files}"
    )


def embeddings_raw_stream_dir(spark: SparkSession, sf_dir: str, n_files: int = 4) -> str:
    """UNaugmented embeddings replay feed (the table as-is, vec_id
    slice per file): for streaming operators whose oracle reads the
    `embeddings` table verbatim (s_llm_embed_pca) — the dedup feed
    above plants perturbed copies and would shift every moment."""
    return _ordered_stream_dir(
        spark, sf_dir, "embeddings", ("vec_id",), n_files,
        f"embeddings_raw_stream_{n_files}",
    )


def embeddings_stream_dir(spark: SparkSession, sf_dir: str, n_files: int = 4) -> str:
    """Embeddings replay feed, augmented with the SAME deterministic
    perturbed copies as q_llm_embed_dedup (vec_id + offset, component 1
    shifted +0.25). Replay order is vec_id order, so every perturbed
    copy arrives AFTER its original — arrival-order dedup semantics
    ("flag the later near-duplicate") stay SQL-expressible as vec_id
    comparisons. The vector is materialized as array<double> ``v`` so
    both engines read identical doubles."""
    from pyspark.sql import functions as F

    from cheetah_spark.queries.llm import _ED_DIM, _ED_PERT_MOD, _ED_PERT_OFFSET

    def plant(e):
        v = F.col("embedding").cast("array<double>")
        base = e.select("vec_id", v.alias("v"))
        pert = e.where(F.col("vec_id") % _ED_PERT_MOD == 0).select(
            (F.col("vec_id") + _ED_PERT_OFFSET).alias("vec_id"),
            F.concat(
                F.array(F.element_at(v, 1) + F.lit(0.25)), F.slice(v, 2, _ED_DIM - 1)
            ).alias("v"),
        )
        return base.unionByName(pert)

    # EVERY planting param in the dir name (mod, offset, shift
    # magnitude, dim): a constant change must build a fresh fixture,
    # not serve the stale cached one
    return _ordered_stream_dir(
        spark,
        sf_dir,
        "embeddings",
        ("vec_id",),
        n_files,
        f"embeddings_stream_{n_files}_m{_ED_PERT_MOD}_o{_ED_PERT_OFFSET}"
        f"_s025_d{_ED_DIM}",
        transform=plant,
    )

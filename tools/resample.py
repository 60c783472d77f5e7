"""Quiet-window min-of-N resampler for burst-suspect bench rows.

The per-round driver bench takes single/double samples under whatever
host load exists in its window; rows >2x the committed baseline stay
`weak` until reproduced-or-refuted min-of-N in a quiet window
(SCALE.md discipline, round-7/8 verdicts). This tool is that
re-measurement: N warmed samples per query, INTERLEAVED round-robin
across queries (sample i of every query before sample i+1 of any) so a
multi-second contention burst cannot inflate all samples of one query,
plus the 1e6-row identity canary timed before and after the whole run
so the window's own contention level is on the record.

Usage:
    python tools/resample.py [-n 8] [--sf-dir DIR] q_a q_b ... > out.json

Emits one JSON object: per-query raw samples + min + committed-baseline
context left to the author; SCALE.md rows are written from it.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cheetah_spark.registry import REGISTRY, _ensure_loaded  # noqa: E402
from cheetah_spark.session import get_spark  # noqa: E402


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def identity_sec(spark) -> float:
    """Seconds for 1e6 rows x 20 B through source->identity->sink —
    the same canary bench.py reports; min-of-3."""
    from pyspark.sql import functions as F

    df = spark.range(1_000_000).select(
        F.col("id").cast("string").alias("key"),
        F.substring(F.md5(F.col("id").cast("string")), 1, 20).cast("binary").alias("value"),
    )
    force(df)  # warm codegen
    times = []
    for _ in range(3):
        t0 = time.time()
        force(df)
        times.append(time.time() - t0)
    return round(min(times), 4)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("-n", type=int, default=8)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    _ensure_loaded()
    unknown = [q for q in args.queries if q not in REGISTRY]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = get_spark(app_name="cheetah_resample", cpus="32")
    # engine warm-up: scan + pandas-UDF + stream machinery (bench.py's)
    from pyspark.sql import functions as F

    spark.range(100_000).agg(F.sum("id")).collect()
    force(REGISTRY["q_scan_project"].fn(spark, args.sf_dir))

    def drop_stream_sinks() -> None:
        for t in spark.catalog.listTables():
            if t.name.startswith("sink_"):
                spark.catalog.dropTempView(t.name)

    canary_before = identity_sec(spark)

    samples: dict[str, list[float]] = {q: [] for q in args.queries}
    # warm-up run per query (pays per-query fixture/model one-time costs,
    # mirrors bench.py's warmed-engine steady state), then N timed rounds
    for q in args.queries:
        try:
            force(REGISTRY[q].fn(spark, args.sf_dir))
        except Exception as e:
            print(f"WARM-FAIL {q}: {str(e)[:200]}", file=sys.stderr)
        drop_stream_sinks()
        spark.catalog.clearCache()
    for i in range(args.n):
        for q in args.queries:
            t0 = time.time()
            try:
                force(REGISTRY[q].fn(spark, args.sf_dir))
                samples[q].append(round(time.time() - t0, 3))
            except Exception as e:
                print(f"FAIL {q} round {i}: {str(e)[:200]}", file=sys.stderr)
            drop_stream_sinks()
            spark.catalog.clearCache()

    canary_after = identity_sec(spark)

    out = {
        "protocol": f"min-of-{args.n}, warmed, round-robin interleaved",
        "sf_dir": args.sf_dir,
        "identity_canary_sec": {"before": canary_before, "after": canary_after},
        "queries": {
            q: {"samples": s, "min": min(s) if s else None}
            for q, s in samples.items()
        },
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

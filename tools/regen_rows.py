"""Machine re-measurement of burst-suspect BENCH_FULL.json rows.

The r13 verdict flagged the one thing a committed baseline table must
never contain: a hand-edited row (even a disclosed, resample-backed
one). This tool retires that pattern — when a row of a freshly
regenerated BENCH_FULL.json is burst-suspect, re-run it here: the tool
takes min-of-N warmed, canary-bracketed samples per named query (the
tools/resample.py protocol), rewrites the named rows IN the table from
the machine-measured min, and records the raw samples + canary under
``provenance.resampled_rows`` so the artifact stays a pure machine
product with its own audit trail.

Usage:
    python tools/regen_rows.py [-n 5] [--full BENCH_FULL.json] q_a q_b ...
    python tools/gen_baseline.py     # re-render BASELINE.md afterwards
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
from resample import force, identity_sec  # noqa: E402  (tools/resample.py)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("-n", type=int, default=5)
    ap.add_argument(
        "--full",
        default=str(Path(__file__).resolve().parent.parent / "BENCH_FULL.json"),
    )
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    full_path = Path(args.full)
    full = json.loads(full_path.read_text())
    unknown = [q for q in args.queries if q not in REGISTRY or q not in full["queries"]]
    if unknown:
        sys.exit(f"not in registry+table: {unknown}")

    _ensure_loaded()
    spark = get_spark(app_name="cheetah_regen_rows", cpus="32")
    force(REGISTRY["q_scan_project"].fn(spark, args.sf_dir))

    def clear() -> None:
        for t in spark.catalog.listTables():
            if t.name.startswith("sink_"):
                spark.catalog.dropTempView(t.name)
        spark.catalog.clearCache()

    canary_before = identity_sec(spark)
    samples: dict[str, list[float]] = {q: [] for q in args.queries}
    for q in args.queries:  # warmed protocol: one unmeasured run first
        force(REGISTRY[q].fn(spark, args.sf_dir))
        clear()
    for _ in range(args.n):  # interleaved: a burst cannot own one query
        for q in args.queries:
            t0 = time.time()
            force(REGISTRY[q].fn(spark, args.sf_dir))
            samples[q].append(round(time.time() - t0, 3))
            clear()
    canary_after = identity_sec(spark)

    prov = full.setdefault("provenance", {}).setdefault("resampled_rows", {})
    for q, ss in samples.items():
        full["queries"][q] = round(min(ss), 2)
        prov[q] = {
            "samples": ss,
            "protocol": f"tools/regen_rows.py min-of-{args.n}, warmed, interleaved",
            "identity_canary_sec": {"before": canary_before, "after": canary_after},
        }
    full["value"] = round(sum(t for t in full["queries"].values() if t > 0), 2)
    full_path.write_text(json.dumps(full, separators=(",", ":")))
    print(
        f"rewrote {len(samples)} rows in {full_path} "
        f"(canary {canary_before} -> {canary_after})"
    )


if __name__ == "__main__":
    main()

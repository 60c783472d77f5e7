"""Capture .explain("formatted") for declared queries into plans/<tag>/.

Usage:
    python tools/capture_plans.py <tag> [query ...]      # default: all q_*
    SPARK_GRAFT_SF_DIR=... python tools/capture_plans.py r13_before q_llm_dedup_keep

Writes plans/<tag>/<query>.txt (the caller renames/copies to
<query>_before.txt / <query>_after.txt as the round's evidence files).
Streaming (s_*) queries execute their stream when the fn is called, so
only pass them explicitly when the drained-spool plan is the thing you
want to pin.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cheetah_spark.registry import REGISTRY, _ensure_loaded  # noqa: E402
from cheetah_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    _ensure_loaded()
    if not names:
        names = [n for n in sorted(REGISTRY) if n.startswith("q_")]
    out_dir = Path(__file__).resolve().parent.parent / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="capture_plans")
    for name in names:
        try:
            df = REGISTRY[name].fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            plan = f"PLAN-CAPTURE-FAILED: {e}"
        (out_dir / f"{name}.txt").write_text(plan)
        print(name, "ok" if not plan.startswith("PLAN-CAPTURE-FAILED") else "FAILED")


if __name__ == "__main__":
    main()

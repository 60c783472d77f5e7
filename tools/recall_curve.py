"""Recall-vs-nprobe curves for the list-pruned ANN variants (round-5
verdict item #6: pin the contract floors near a MEASURED operating
point and publish the curve, so a regression in index quality is
hash-visible rather than hidden under a lenient floor).

Runs IVF and IVF-PQ at a sweep of nprobe values against the exact
top-k ground truth (the persisted anchor) at each available fixture
scale (sf0.1 = 1x, plus the generated 10x if present), prints one JSON
blob; the SCALE.md curve table is authored from it.

    python tools/recall_curve.py
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from cheetah_spark.registry import _ensure_loaded  # noqa: E402
from cheetah_spark.session import get_spark  # noqa: E402

SCALES = [
    ("1x", "/root/testdata/sf0.1"),
    ("10x", "/tmp/cheetah_scale/sfx10"),
]
NPROBES = [1, 2, 4, 6, 8, 16]
CAPACITY = [(8, 16), (8, 64), (8, 256), (16, 16), (16, 256)]
RERANKS = [2, 4, 8, 16]


def main() -> None:
    _ensure_loaded()
    from cheetah_spark.queries import llm as L

    spark = get_spark(
        app_name="cheetah_recall_curve", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    out: dict = {"nlists": L._IVF_LISTS, "topk": L._TOPK, "curves": {}}
    for tag, sf_dir in SCALES:
        if not os.path.isdir(sf_dir):
            print(f"SKIP {tag}: {sf_dir} missing", file=sys.stderr)
            continue
        _schema, exact_rows = L._exact_topk_rows(spark, sf_dir)
        exact_pairs = spark.createDataFrame(
            [(r.query_id, r.neighbor_id) for r in exact_rows],
            "query_id long, neighbor_id long",
        )
        n_exact = len(exact_rows)
        def recall_of(approx) -> float:
            n_hit = (
                approx.select("query_id", "neighbor_id")
                .join(F.broadcast(exact_pairs), ["query_id", "neighbor_id"])
                .count()
            )
            return round(n_hit / n_exact, 3)

        for variant, fn in (("ivf", L._ann_ivf_topk), ("ivfpq", L._ann_ivfpq_topk)):
            for nprobe in NPROBES:
                r = recall_of(fn(spark, sf_dir, nprobe))
                out["curves"].setdefault(variant, {}).setdefault(tag, {})[
                    str(nprobe)
                ] = r
                print(f"RECALL {tag} {variant} nprobe={nprobe} {r}", file=sys.stderr)
        # IVF-PQ code-capacity curve (round-6 verdict item #3): recall
        # vs (sub-codes M × codebook size K) at the default probe width
        for m, k in CAPACITY:
            r = recall_of(L._ann_ivfpq_topk(spark, sf_dir, pq_m=m, pq_k=k))
            out["curves"].setdefault("capacity", {}).setdefault(tag, {})[
                f"M{m}xK{k}"
            ] = r
            print(f"RECALL {tag} capacity M={m} K={k} {r}", file=sys.stderr)
        # rerank-pool depth at the chosen capacity point
        for rr in RERANKS:
            r = recall_of(
                L._ann_ivfpq_topk(
                    spark, sf_dir, pq_m=L._IVFPQ_M, pq_k=L._IVFPQ_K, rerank=rr
                )
            )
            out["curves"].setdefault("rerank", {}).setdefault(tag, {})[
                str(rr * L._TOPK * 2)
            ] = r
            print(f"RECALL {tag} rerank pool={rr * L._TOPK * 2} {r}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""``python -m cheetah_spark`` — the daemon executable.

The reference's primary production surface is the ``kawad`` daemon:
``kawad run --config config.json`` loads a JSON config of type-tagged
source/destination blocks, wires them into a processor, runs until a
fatal error or a termination signal, and exits non-zero on failure
(reference README.md:164-299). This module is that surface on Spark:

    python -m cheetah_spark run --config pipeline.json
    python -m cheetah_spark plan --config pipeline.json   # explain only

``run`` executes the pipeline: batch configs run to completion;
streaming configs run until ``--timeout`` seconds elapse (default:
forever) or SIGINT/SIGTERM arrives, at which point the StreamingQuery
is stopped gracefully (the reference's context-cancel shutdown path,
processor.go:124-167 — in-flight batches drain, offsets commit, no
acked data is lost). ``plan`` prints the resolved physical plan
without executing — the Spark-native analogue of a config dry-run.

Session parallelism comes from ``SPARK_GRAFT_CPUS`` (the reference's
``Parallelism(n)`` option) unless ``--cpus`` overrides it.
"""

from __future__ import annotations

import argparse
import signal
import sys
from typing import Optional, Sequence

from cheetah_spark.config import load_pipeline
from cheetah_spark.session import get_spark


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m cheetah_spark",
        description="Run a declarative source→transforms→sink pipeline config.",
    )
    sub = p.add_subparsers(dest="cmd", required=True)
    for name, help_ in (
        ("run", "execute the pipeline (batch: to completion; streaming: until timeout/signal)"),
        ("plan", "print the resolved physical plan and exit without executing"),
    ):
        s = sub.add_parser(name, help=help_)
        s.add_argument("--config", required=True, help="path to the JSON pipeline config")
        s.add_argument("--cpus", type=int, default=None, help="local core count (default: SPARK_GRAFT_CPUS)")
        if name == "run":
            s.add_argument(
                "--timeout",
                type=float,
                default=None,
                help="streaming only: stop gracefully after this many seconds (default: run forever)",
            )
    return p


def main(argv: Optional[Sequence[str]] = None) -> int:
    args = _build_parser().parse_args(argv)
    pipeline = load_pipeline(args.config)
    spark = get_spark(app_name=f"cheetah_spark:{args.config}", cpus=args.cpus)

    if args.cmd == "plan":
        pipeline.dataframe(spark).explain("formatted")
        return 0

    query = pipeline.run(spark)
    if query is None:  # batch config: pipeline.run already executed it
        return 0

    # Streaming: graceful stop on SIGINT/SIGTERM (kawad's ctx-cancel),
    # bounded by --timeout when given.
    def _stop(signum, frame):
        query.stop()

    old = {s: signal.signal(s, _stop) for s in (signal.SIGINT, signal.SIGTERM)}
    try:
        if args.timeout is not None:
            query.awaitTermination(args.timeout)
            query.stop()
        query.awaitTermination()  # raises StreamingQueryException on fatal error
        return 0
    finally:
        for s, h in old.items():
            signal.signal(s, h)


if __name__ == "__main__":
    sys.exit(main())

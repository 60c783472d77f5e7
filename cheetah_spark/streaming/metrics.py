"""Pipeline observability — StreamingQueryListener-based metrics.

The reference instruments each processor stage with OTel spans and
counters (reference processor.go:91-120: per-message spans around
handle/send, msgsProcessed counter). Spark's native hook for the same
telemetry is :class:`StreamingQueryListener`: per-micro-batch progress
events carrying rows read, processing durations per stage, and state
-store metrics — batch-granular rather than per-message, which is the
correct granularity for a vectorized engine (a per-row span would put
Python in the hot loop).

``PipelineMetrics`` aggregates progress events into the counters the
reference exposes; attach with ``spark.streams.addListener``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class BatchMetric:
    query_id: str
    batch_id: int
    num_input_rows: int
    duration_ms: dict


class PipelineMetrics(StreamingQueryListener):
    """Collects per-batch metrics for every streaming query on the
    session (reference msgsProcessed / span-duration parity,
    processor.go:91-120).

    Listener callbacks arrive asynchronously on the listener bus —
    totals are eventually consistent with the query's progress; tests
    should poll :meth:`rows_processed` after ``processAllAvailable``.
    """

    def __init__(self) -> None:
        self.batches: list[BatchMetric] = []
        self.started: dict[str, str] = {}
        self.terminated: dict[str, str | None] = {}

    # -- StreamingQueryListener interface ---------------------------------
    def onQueryStarted(self, event) -> None:
        self.started[str(event.id)] = event.name or ""

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self.batches.append(
            BatchMetric(
                query_id=str(p.id),
                batch_id=p.batchId,
                num_input_rows=p.numInputRows,
                duration_ms=dict(p.durationMs or {}),
            )
        )

    def onQueryIdle(self, event) -> None:  # pragma: no cover - no-op hook
        pass

    def onQueryTerminated(self, event) -> None:
        self.terminated[str(event.id)] = event.exception

    # -- counters (reference processor.go:114-120 parity) ------------------
    def rows_processed(self, query_id: str | None = None) -> int:
        return sum(
            b.num_input_rows
            for b in self.batches
            if query_id is None or b.query_id == query_id
        )

    def n_batches(self, query_id: str | None = None) -> int:
        return sum(1 for b in self.batches if query_id is None or b.query_id == query_id)

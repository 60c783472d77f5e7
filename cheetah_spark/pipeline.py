"""Pipeline assembly — the reference's Processor re-expressed.

Reference shape (processor.go:62-86, 131-167): ``kawa.New(Config{
Source, Destination, Handler}, Parallelism(n)).Run(ctx)`` wires a
3-stage linear topology and runs n workers; the first error anywhere
cancels everything; acks flow sink→source on success.

Spark-native shape: ``Pipeline(source, transforms, sink).run(spark)``
builds the lazy DataFrame DAG (configure step ≡ plan construction) and
either executes it (batch) or starts a StreamingQuery (streaming).
Worker parallelism is per-partition task parallelism; the fatal-error
contract is ``StreamingQueryException`` out of ``awaitTermination()``;
ack propagation is the checkpoint offset commit after sink completion.

Handlers here are ``DataFrame → DataFrame`` functions — the composable
analogue of the reference's ``Handler[T1,T2]`` (types.go:122-135),
where filter = ``df.filter`` (empty-result ⇒ the rows simply never
reach the sink, the reference's ack-and-skip, processor.go:107-112),
map = ``select``/``withColumn``, 1→N = ``explode``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

from cheetah_spark.sinks import Sink
from cheetah_spark.sources import Source

Handler = Callable[[DataFrame], DataFrame]


def pipe(df: DataFrame) -> DataFrame:
    """Identity handler (reference Pipe, types.go:137-145)."""
    return df


def chain(*handlers: Handler) -> Handler:
    """Compose handlers left-to-right (Handler → Handler fusion; the
    whole chain is one Catalyst plan, so fusion is free)."""

    def run(df: DataFrame) -> DataFrame:
        for h in handlers:
            df = h(df)
        return df

    return run


@dataclass
class Pipeline:
    source: Source
    sink: Sink
    transforms: Sequence[Handler] = field(default_factory=tuple)

    def dataframe(self, spark: SparkSession) -> DataFrame:
        """The configure step: build the full lazy plan (no execution)."""
        return chain(*self.transforms)(self.source.read(spark))

    def run(self, spark: SparkSession, await_termination: Optional[float] = None):
        """Execute. Batch: runs to completion, returns None. Streaming:
        returns the StreamingQuery (``.awaitTermination()`` raises on
        failure — the reference's fatal-error contract,
        processor.go:124-167)."""
        query = self.sink.write(self.dataframe(spark))
        if query is not None and await_termination is not None:
            query.awaitTermination(await_termination)
        return query

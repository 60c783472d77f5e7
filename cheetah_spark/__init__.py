"""cheetah_spark — a PySpark-native analytics + stream-processing engine.

Re-implements (Spark-first, not a port) the capabilities of the reference
stream-processing framework (runreveal kawa / "cheetah", see SURVEY.md),
extended with the relational, streaming, and LLM-data-pipeline operator
surface declared in SURVEY.md §2B.

Layout:
    session    — SparkSession bootstrap tuned for local test / cluster scale
    catalog    — fixture table loading + temp-view registration
    registry   — the query/oracle contract registry backing __spark_entry__
    queries/   — operator implementations, one module per family
    functions/ — reusable column-level helpers (vectors, text, hashing)
    pipeline   — Source→Transform→Sink assembly (reference processor.go parity)
    sources/   — source adapters (reference x/scanner, x/memory, x/multi ...)
    sinks/     — sink adapters (reference x/printer, x/s3, x/batcher ...)
    streaming/ — streaming conformance + batcher-parity helpers
"""

from cheetah_spark.session import get_spark
from cheetah_spark.catalog import TABLES, load_tables, register_views
from cheetah_spark.registry import REGISTRY, QuerySpec, register

__all__ = [
    "get_spark",
    "TABLES",
    "load_tables",
    "register_views",
    "REGISTRY",
    "QuerySpec",
    "register",
]

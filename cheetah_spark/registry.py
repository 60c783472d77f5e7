"""Query/oracle contract registry.

Every operator the engine claims is registered here as a
:class:`QuerySpec`: a Spark callable ``(spark, sf_dir) -> DataFrame``
plus (unless the semantics are not SQL-expressible) the equivalent
DuckDB oracle SQL. ``__spark_entry__.py`` re-exports this registry to
the verification driver; ``tests/test_oracle.py`` runs the same
differential check locally.

Oracle-safety conventions (SURVEY.md §2B) used across queries/:

- **Exact-decimal sums**: floating aggregates are computed as
  ``SUM(CAST(expr AS DECIMAL(38,6)))`` in BOTH engines, then cast to
  DOUBLE and rounded. Decimal summation is exact and order-independent,
  so the result is identical regardless of partitioning / summation
  order — ``ROUND(SUM(double), 2)`` alone is NOT safe at scale because
  float summation-order error grows with row count.
- **Stable names**: every computed column is aliased identically in the
  Spark plan and the oracle SQL (the driver sorts columns by name).
- **Deterministic order**: every ranking/top-k has a unique tiebreaker.
- **Timestamps**: truncated to ≥1s before comparison (ns fixtures are
  read as µs by both engines, but window/bucket logic sticks to seconds).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None  # DuckDB SQL; None => rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` under ``name`` with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=(fn.__doc__ or "").strip(), tags=tags)
        return fn

    return deco


def _ordered_names() -> list[str]:
    """Registry names with the check-rotation priority applied.

    The verification driver checks a bounded prefix of ``queries()``;
    ``cheetah_spark.queries.CHECK_FIRST`` puts not-yet-verified /
    changed operators inside that prefix (see queries/__init__.py)."""
    from cheetah_spark.queries import CHECK_FIRST

    first = [n for n in CHECK_FIRST if n in REGISTRY]
    head = set(first)
    return first + [n for n in REGISTRY if n not in head]


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }


def _ensure_loaded() -> None:
    # Import for side effect: populates REGISTRY via @register decorators.
    import cheetah_spark.queries  # noqa: F401

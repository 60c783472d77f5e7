"""Shared column helpers enforcing the oracle-safety conventions.

See registry.py module docstring: float aggregates go through exact
decimal summation so results are independent of partitioning /
summation order (identical on local[32] and on a 1000-executor
cluster — double summation order is NOT).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"


def dsum(col: Column | str) -> Column:
    """Order-independent exact sum of a float expression → DOUBLE.

    Spark side of the ``CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)``
    convention. The per-row cast rounds the double to 6 decimals (same
    value in both engines for non-boundary doubles), the decimal sum is
    exact, and the final cast back to double is deterministic.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Order-independent mean: exact decimal sum / count, in DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c) / F.count(c)


def r2(col: Column) -> Column:
    return F.round(col, 2)


def oracle_dsum(expr: str) -> str:
    """DuckDB side of the exact-sum convention."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE)"


def oracle_davg(expr: str) -> str:
    return f"({oracle_dsum(expr)} / COUNT({expr}))"

"""Shared column helpers enforcing the oracle-safety conventions.

Cross-engine float determinism rules (probed against DuckDB, see
tests/test_oracle.py):

1. **Sums**: ``ROUND(SUM(CAST(x AS DECIMAL(38,6))), 2)`` in BOTH
   engines. Decimal summation is exact and order-independent (identical
   on local[32] and a 1000-executor cluster), and decimal ROUND is
   half-away-from-zero in both engines. Never round a double sum:
   float summation order differs across engines/partitionings, and
   DuckDB's ROUND(double) rounds the binary value while Spark's rounds
   the shortest decimal string — exact .xx5 sums diverge.
2. **Averages / ratios**: emit the raw double division of an exact
   decimal sum by a count — IEEE division of identical operands is
   bit-identical; rounding a ratio can land exactly on a .xx5 boundary
   (e.g. any 2-row average of 2-decimal values) where engines disagree.
3. **Per-row transcendentals** (ln/pow): round to 6 decimals per row
   BEFORE the decimal sum so a 1-ulp libm difference can't flip an
   aggregate.
4. **Interpolated doubles** (percentiles): snap with a double→decimal
   cast (string-based rounding in both engines), not ROUND(double).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str) -> Column:
    """Order-independent exact sum of a float expression → DOUBLE."""
    return F.sum(_c(col).cast(DEC)).cast("double")


def dsum2(col: Column | str, n: int = 2) -> Column:
    """Exact decimal sum rounded (in decimal space) to n places → DOUBLE."""
    return F.round(F.sum(_c(col).cast(DEC)), n).cast("double")


def davg(col: Column | str) -> Column:
    """Order-independent mean: exact decimal sum / count, raw DOUBLE
    (unrounded — IEEE division of identical operands is bit-identical)."""
    return dsum(col) / F.count(_c(col))


def snap(col: Column | str, n: int = 3) -> Column:
    """Snap an interpolated double to n decimals via decimal cast."""
    return _c(col).cast(f"decimal(38,{n})").cast("double")


def oracle_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE)"


def oracle_dsum2(expr: str, n: int = 2) -> str:
    return f"CAST(ROUND(SUM(CAST(({expr}) AS DECIMAL(38,6))), {n}) AS DOUBLE)"


def oracle_davg(expr: str) -> str:
    return f"({oracle_dsum(expr)} / COUNT({expr}))"


def oracle_snap(expr: str, n: int = 3) -> str:
    return f"CAST(CAST(({expr}) AS DECIMAL(38,{n})) AS DOUBLE)"

"""Shared fixtures: one SparkSession per test run, a DuckDB oracle
connection with the fixture tables pre-registered as views (mirrors the
driver's harness), and the differential-compare helper."""

from __future__ import annotations

import math
import os
import sys
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from cheetah_spark.catalog import TABLES  # noqa: E402
from cheetah_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("CHEETAH_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="cheetah_spark_tests", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _canon(v):
    """Canonicalize a cell for order-insensitive comparison.

    Floats use full-precision ``repr`` — the driver's value hash is
    bit-exact, so any rounding here would make pytest a false-green
    predictor of CORRECTNESS (round-1 lesson: three driver hash fails
    were invisible at the old ``%.9g`` precision)."""
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


# DuckDB result types that have no Spark equivalent: their presence in
# an oracle result means an uncast aggregate (e.g. SUM over BIGINT →
# HUGEINT) that the driver's representation-level hash will reject even
# when the values are numerically equal.
_FORBIDDEN_DUCK_TYPES = ("HUGEINT", "UHUGEINT")


def _is_driver_incomparable_duck_type(type_str: str) -> bool:
    """True for DuckDB result types the verification driver's
    representation-level hash cannot compare against Spark even when
    the values are numerically identical: HUGEINT/UHUGEINT, and any
    DECIMAL with precision > 18 — DuckDB backs those with int128, the
    exact class that turned q_llm_span_trim red in the r7 driver
    window while the literal-name check below stayed green. The
    repo-wide convention is to cast every final aggregate back to
    BIGINT/DOUBLE; this gate enforces it mechanically."""
    t = type_str.upper()
    if t in _FORBIDDEN_DUCK_TYPES:
        return True
    if t.startswith("DECIMAL"):
        try:
            prec = int(t.split("(", 1)[1].split(",")[0])
        except (IndexError, ValueError):
            return True  # unparseable decimal — reject, cast explicitly
        return prec > 18
    return False


def assert_matches_oracle(spark_df, duck_rel):
    """Order-insensitive, column-name-sorted value comparison — a strict
    local mirror of the driver's row-count + schema + value-hash gate."""
    scols = sorted(spark_df.columns)
    sdec = [
        (f.name, f.dataType.simpleString())
        for f in spark_df.schema.fields
        if f.dataType.typeName() == "decimal"
    ]
    assert not sdec, (
        f"Spark final schema contains DecimalType (cast back to "
        f"bigint/double per the repo convention): {sdec}"
    )
    srows = spark_df.select(*scols).collect()
    dcols = [d[0] for d in duck_rel.description]
    assert sorted(dcols) == scols, f"column mismatch: spark={scols} duck={sorted(dcols)}"
    dtypes = [str(t) for t in duck_rel.types]
    bad = [(c, t) for c, t in zip(dcols, dtypes) if _is_driver_incomparable_duck_type(t)]
    assert not bad, f"oracle emits driver-incomparable types (add CAST): {bad}"
    drows = duck_rel.fetchall()
    didx = [dcols.index(c) for c in scols]
    sset = sorted(tuple(_canon(v) for v in row) for row in srows)
    dset = sorted(tuple(_canon(row[i]) for i in didx) for row in drows)
    assert len(sset) == len(dset), f"row count: spark={len(sset)} duck={len(dset)}"
    if sset != dset:
        diffs = [(a, b) for a, b in zip(sset, dset) if a != b][:5]
        raise AssertionError(f"value mismatch, first diffs: {diffs}")

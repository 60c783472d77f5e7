"""Differential tests: every registered query with an oracle runs on
Spark and DuckDB over the same parquet fixtures and must match
(order-insensitive, column-name-sorted) — the local mirror of the
driver's CORRECTNESS gate. Rows-only queries get a smoke run."""

from __future__ import annotations

import pytest

from cheetah_spark.registry import REGISTRY, _ensure_loaded

from conftest import assert_matches_oracle

_ensure_loaded()
_ORACLE = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
_ROWS_ONLY = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.mark.parametrize("name", _ORACLE)
def test_oracle_match(spark, duck, sf_dir, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir)
    rel = duck.sql(spec.oracle)
    assert_matches_oracle(sdf, rel)


def test_every_query_has_an_oracle():
    """Since round 3 every registered query carries a DuckDB oracle
    (invariant-pinning rows for the non-SQL-expressible ones) — keep it
    that way: a new oracle-less query must consciously extend this."""
    assert _ROWS_ONLY == []


if _ROWS_ONLY:  # smoke coverage for any future oracle-less query

    @pytest.mark.parametrize("name", _ROWS_ONLY)
    def test_rows_only_smoke(spark, sf_dir, name):
        spec = REGISTRY[name]
        df = spec.fn(spark, sf_dir)
        assert df.count() >= 0
        assert len(df.schema.fields) > 0

"""SqliteSource unit coverage beyond the oracle gate: range planning
edge cases (empty table, single row, more partitions than keys) and
read-only concurrency — the JDBC-partitioned-pull contract details the
hash gate can't isolate."""

from __future__ import annotations

import sqlite3

import pytest

from cheetah_spark.sources.sqlite_local import SqliteSource

SCHEMA = "k long, v string"


def _mkdb(tmp_path, rows):
    db = str(tmp_path / "t.sqlite")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE t (k INTEGER PRIMARY KEY, v TEXT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    con.commit()
    con.close()
    return db


def test_empty_table_yields_empty_frame(spark, tmp_path):
    db = _mkdb(tmp_path, [])
    df = SqliteSource(db, "t", SCHEMA, partition_col="k", num_partitions=4).read(spark)
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["k", "v"]


def test_single_row(spark, tmp_path):
    db = _mkdb(tmp_path, [(7, "x")])
    df = SqliteSource(db, "t", SCHEMA, partition_col="k", num_partitions=4).read(spark)
    assert [(r.k, r.v) for r in df.collect()] == [(7, "x")]


def test_more_partitions_than_keys_no_loss_no_dup(spark, tmp_path):
    rows = [(i, f"v{i}") for i in range(5)]
    db = _mkdb(tmp_path, rows)
    df = SqliteSource(db, "t", SCHEMA, partition_col="k", num_partitions=32).read(spark)
    got = sorted((r.k, r.v) for r in df.collect())
    assert got == rows


def test_sparse_noncontiguous_keys_covered_exactly_once(spark, tmp_path):
    # range slicing must be correct for arbitrary key gaps (negative
    # lows and a huge span stress the step arithmetic)
    keys = [-1000, -3, 0, 1, 17, 999_999, 10_000_001]
    rows = [(k, f"v{k}") for k in keys]
    db = _mkdb(tmp_path, rows)
    df = SqliteSource(db, "t", SCHEMA, partition_col="k", num_partitions=8).read(spark)
    got = sorted(r.k for r in df.collect())
    assert got == sorted(keys)


def test_writer_locked_db_still_readable(spark, tmp_path):
    # mode=ro readers must coexist with an open (uncommitted) writer —
    # SQLite allows reads of the last committed state
    rows = [(i, "a") for i in range(10)]
    db = _mkdb(tmp_path, rows)
    w = sqlite3.connect(db)
    w.execute("BEGIN")
    w.execute("INSERT INTO t VALUES (100, 'uncommitted')")
    try:
        df = SqliteSource(db, "t", SCHEMA, partition_col="k", num_partitions=4).read(spark)
        assert df.count() == 10  # committed state only
    finally:
        w.rollback()
        w.close()


@pytest.mark.parametrize("files_per_trigger", [1, 4])
def test_scd2_lookup_slicing_invariant(spark, sf_dir, files_per_trigger, monkeypatch):
    """s_stream_scd2_lookup's claim: the stream-static temporal join is
    stateless per batch, so ANY admission slicing yields the identical
    rollup. Drive the same query with 1-file and 4-file triggers."""
    import cheetah_spark.queries.streams as S

    orig = S.ParquetSource

    class Patched(orig):
        def __init__(self, path, streaming=False, schema=None, max_files_per_trigger=None):
            super().__init__(path, streaming, schema, files_per_trigger)

    monkeypatch.setattr(S, "ParquetSource", Patched)
    rows = sorted(
        tuple(r) for r in S.s_stream_scd2_lookup(spark, sf_dir).collect()
    )
    monkeypatch.setattr(S, "ParquetSource", orig)
    base = sorted(tuple(r) for r in S.s_stream_scd2_lookup(spark, sf_dir).collect())
    assert rows == base


def test_cdc_reader_offsets_and_restart_replay(tmp_path):
    """Direct reader contract: key-ordered pagination, offset monotonicity,
    empty-read fixpoint, and readBetweenOffsets recovering exactly the
    committed window from the store (lossless restart)."""
    from cheetah_spark.sources.sqlite_local import _SqliteCdcStreamReader

    db = _mkdb(tmp_path, [(i, f"v{i}") for i in range(10)])
    r = _SqliteCdcStreamReader(
        {"path": db, "table": "t", "partition_col": "k", "batch_size": "4"}
    )
    o0 = r.initialOffset()
    rows1, o1 = r.read(o0)
    rows1 = list(rows1)
    assert [x[0] for x in rows1] == [0, 1, 2, 3] and o1 == {"k": 3}
    rows2, o2 = r.read(o1)
    assert [x[0] for x in list(rows2)] == [4, 5, 6, 7] and o2 == {"k": 7}
    rows3, o3 = r.read(o2)
    assert [x[0] for x in list(rows3)] == [8, 9] and o3 == {"k": 9}
    # drained: empty read must return the same offset (fixpoint)
    rows4, o4 = r.read(o3)
    assert list(rows4) == [] and o4 == o3
    # restart replay: the half-open window re-queries the store
    assert [x[0] for x in r.readBetweenOffsets(o1, o2)] == [4, 5, 6, 7]
    assert [x[0] for x in r.readBetweenOffsets(o0, o1)] == [0, 1, 2, 3]
    # rows appended AFTER a checkpoint are picked up by the next read
    con = sqlite3.connect(db)
    con.execute("INSERT INTO t VALUES (11, 'late')")
    con.commit()
    con.close()
    rows5, o5 = r.read(o3)
    assert [x[0] for x in list(rows5)] == [11] and o5 == {"k": 11}


def test_cdc_pagination_no_loss_no_dup_fuzz(tmp_path):
    """Property fuzz (hypothesis): for ANY key set (gaps, negatives,
    clusters) and ANY batch size, walking the reader to its fixpoint
    delivers every key exactly once, in order, and every adjacent
    offset window replays exactly its slice."""
    from hypothesis import given, settings, strategies as st

    from cheetah_spark.sources.sqlite_local import _SqliteCdcStreamReader

    made = {"n": 0}

    @settings(max_examples=40, deadline=None)
    @given(
        keys=st.sets(st.integers(min_value=-(10**6), max_value=10**9), min_size=0, max_size=60),
        batch=st.integers(min_value=1, max_value=17),
    )
    def prop(keys, batch):
        made["n"] += 1
        db = str(tmp_path / f"f{made['n']}.sqlite")
        con = sqlite3.connect(db)
        con.execute("CREATE TABLE t (k INTEGER PRIMARY KEY, v TEXT)")
        con.executemany("INSERT INTO t VALUES (?, ?)", [(k, str(k)) for k in keys])
        con.commit()
        con.close()
        r = _SqliteCdcStreamReader(
            {"path": db, "table": "t", "partition_col": "k", "batch_size": str(batch)}
        )
        offs = [r.initialOffset()]
        got = []
        while True:
            rows, end = r.read(offs[-1])
            rows = list(rows)
            if not rows:
                assert end == offs[-1]  # fixpoint on empty read
                break
            got.extend(x[0] for x in rows)
            assert end == {"k": got[-1]}
            offs.append(end)
        assert got == sorted(keys)  # no loss, no dup, key order
        for a, b in zip(offs, offs[1:]):  # restart windows replay exactly
            assert [x[0] for x in r.readBetweenOffsets(a, b)] == [
                k for k in sorted(keys) if a["k"] < k <= b["k"]
            ]

    prop()

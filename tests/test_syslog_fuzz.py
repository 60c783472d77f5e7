"""Cross-engine fuzz of the syslog/journald parse expressions: random
and adversarial wire lines through a shared parquet fixture — Spark's
Java-regex extraction vs DuckDB's RE2 extraction of the SAME pattern
strings must agree byte-for-byte on every field, not just on the
capture fixture's well-formed soup. This is the direct test of the
claim in functions/syslog.py that every pattern is equivalent under
both engines."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from cheetah_spark.functions import journald as JD
from cheetah_spark.functions import syslog as SL

from conftest import assert_matches_oracle

_EDGE_LINES = [
    "",
    " ",
    "<34>1 2026-01-01T00:00:00Z h app 7 M - body",
    "<34>1 2026-01-01T00:00:00Z h app - - - ",
    "<34>1 2026-01-01T00:00:00Z h app - - [sd@1 k=\"v\"] with sd",
    "<0>1 t h a p m - minimal pri",
    "<191>1 x y z w v - max pri",
    "<999>1 a b c d e - pri overflow three digits",
    "<13>Aug  5 11:22:33 db01 postgres[99]: space day",
    "<13>Aug 05 11:22:33 db01 postgres[99]: zero day",
    "<13>Dec 31 23:59:59 h tag[1]: eoy",
    "<13>Aug 15 11:22:33 host-x my.app-2[42]: dotted tag",
    "<13>Aug 15 11:22:33 h tag[]: empty pid does not match",
    "<13>Aug 15 11:22:33 h tag: pid-less tag (parses since r8)",
    "<34>Oct 11 22:14:15 mymachine su: 'su root' failed for lonvick",
    '<34>1 2026-01-01T00:00:00Z h app 7 M [a@1][b@2] two sd elements',
    '<34>1 2026-01-01T00:00:00Z h app 7 M [a@1 k="v\\]w"] escaped bracket',
    '<34>1 2026-01-01T00:00:00Z h app 7 M [a@1][b@2 x="y"] msg [not sd]',
    "no pri at all",
    "<notanum>1 x",
    "<34>2 2026-01-01T00:00:00Z h app 7 M - wrong version",
    "<34>1",
    "<34>",
    "garbage 42",
    "<34>1 2026-01-01T00:00:00Z h app 7 M - unicode café 中文",
    "<34>1 2026-01-01T00:00:00Z h app 7 M - trailing spaces   ",
    "<13>Aug 15 11:22:33 h t[1]: msg with <34>1 embedded pri",
    "x" * 2000,
]

_JD_EDGE = [
    "",
    "MESSAGE=plain",
    "__CURSOR=s=a\nPRIORITY=3\nMESSAGE=two fields",
    "PRIORITY=notanint\nMESSAGE=bad pri",
    "PRIORITY=\nMESSAGE=empty pri",
    "MESSAGE=equals = inside = value",
    "NOT_A_MATCH\nMESSAGE=stray line",
    "_PID=123\n_PID=456\nMESSAGE=dup key first wins",
    "MESSAGE=unicode café 中文",
    "PRIORITY=7",
]


def _rand_lines(n=120, seed=13):
    rng = random.Random(seed)
    frags = [
        "<", ">", "1 ", "Aug ", "05 ", "11:22:33 ", "host ", "app", "[", "]", ": ",
        "2026-01-01T00:00:00Z ", "- ", "7 ", "msg ", "0", "13", "191", " ", "\t",
    ]
    return [
        "".join(rng.choice(frags) for _ in range(rng.randrange(0, 14))) for _ in range(n)
    ]


@pytest.fixture(scope="module")
def syslog_fuzz(spark, duck, tmp_path_factory):
    rows = [(i, s) for i, s in enumerate(_EDGE_LINES + _rand_lines())]
    path = str(tmp_path_factory.mktemp("syslog_fuzz") / "lines.parquet")
    spark.createDataFrame(rows, "id long, raw string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)
    duck.execute(f"CREATE OR REPLACE VIEW syslog_fuzz AS SELECT * FROM '{path}/*.parquet'")
    return path


def test_syslog_parse_cross_engine_fuzz(spark, duck, syslog_fuzz):
    sdf = spark.read.parquet(syslog_fuzz).select(
        "id",
        SL.pri("raw").alias("pri"),
        SL.facility("raw").alias("facility"),
        SL.severity("raw").alias("severity"),
        SL.is_rfc5424("raw").alias("rfc5424"),
        SL.host("raw").alias("host"),
        SL.app("raw").alias("app"),
        SL.procid("raw").alias("procid"),
        SL.ts_raw("raw").alias("ts_raw"),
        SL.message("raw").alias("msg"),
    )
    rel = duck.sql(
        f"""
        SELECT id,
               {SL.oracle_pri('raw')} AS pri,
               {SL.oracle_facility('raw')} AS facility,
               {SL.oracle_severity('raw')} AS severity,
               {SL.oracle_is_rfc5424('raw')} AS rfc5424,
               {SL.oracle_host('raw')} AS host,
               {SL.oracle_app('raw')} AS app,
               {SL.oracle_procid('raw')} AS procid,
               {SL.oracle_ts_raw('raw')} AS ts_raw,
               {SL.oracle_message('raw')} AS msg
        FROM syslog_fuzz
        """
    )
    assert_matches_oracle(sdf, rel)


@pytest.fixture(scope="module")
def journald_fuzz(spark, duck, tmp_path_factory):
    rows = [(i, s) for i, s in enumerate(_JD_EDGE)]
    path = str(tmp_path_factory.mktemp("jd_fuzz") / "entries.parquet")
    spark.createDataFrame(rows, "id long, entry string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)
    duck.execute(f"CREATE OR REPLACE VIEW jd_fuzz AS SELECT * FROM '{path}/*.parquet'")
    return path


def test_journald_fields_cross_engine_fuzz(spark, duck, journald_fuzz):
    sdf = spark.read.parquet(journald_fuzz).select(
        "id",
        JD.priority("entry").alias("priority"),
        JD.field("entry", "MESSAGE").alias("msg"),
        JD.field("entry", "__CURSOR").alias("cursor"),
        JD.field_bigint("entry", "_PID").alias("pid"),
    )
    rel = duck.sql(
        f"""
        SELECT id,
               {JD.oracle_field_bigint('entry', 'PRIORITY')} AS priority,
               {JD.oracle_field('entry', 'MESSAGE')} AS msg,
               {JD.oracle_field('entry', '__CURSOR')} AS cursor,
               {JD.oracle_field_bigint('entry', '_PID')} AS pid
        FROM jd_fuzz
        """
    )
    assert_matches_oracle(sdf, rel)

"""Cross-engine fuzz of the text primitives on adversarial inputs —
empty/whitespace/unicode/punctuation/long strings — via a shared
parquet fixture, one Spark job vs one DuckDB query. The md5-derived
hash56 convention only holds if tokenization and normalization agree
byte-for-byte on every edge case."""

from __future__ import annotations

import random

import duckdb
import pytest

from pyspark.sql import functions as F

from cheetah_spark.functions import text as X

from conftest import assert_matches_oracle

_EDGE = [
    "",
    " ",
    "\t\n  \r ",
    "a",
    "ab cd ef",
    "UPPER lower MiXeD",
    "  leading and trailing  ",
    "double  spaces   everywhere",
    "punct!@#$%^&*()[]{};:'\",.<>/?\\|`~-_=+",
    "digits 123 456 and 0x1f mixed a1b2c3",
    "unicode: café naïve über 中文 рус",
    "emoji \U0001f600 mixed",
    "newline\nin\nthe\nmiddle",
    "tab\tseparated\tvalues",
    "x" * 5000,
    ("word " * 500).strip(),
    "'quoted' \"double\" `back`",
    "a.b.c.d.e",
    "ALLCAPS",
    "1234567890",
]


def _rand_strings(n=80, seed=7):
    rng = random.Random(seed)
    alphabet = list("abc XYZ 012 .,!?\té中 ") + ["  ", "\n"]
    return ["".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 60))) for _ in range(n)]


@pytest.fixture(scope="module")
def fuzz_path(spark, tmp_path_factory):
    rows = [(i, s) for i, s in enumerate(_EDGE + _rand_strings())]
    path = str(tmp_path_factory.mktemp("fuzz") / "strings.parquet")
    spark.createDataFrame(rows, "id long, s string").coalesce(1).write.mode("overwrite").parquet(path)
    return path


def test_text_primitives_cross_engine(spark, fuzz_path):
    sdf = spark.read.parquet(fuzz_path).select(
        "id",
        X.norm_text(F.col("s")).alias("norm"),
        F.array_join(X.tokens(F.col("s")), "|").alias("toks"),
        F.array_join(X.tokens(F.col("s"), X.TOKEN_RE), "|").alias("bpe"),
        F.array_join(X.shingles(X.tokens(F.col("s")), 3), "~").alias("sh3"),
        X.hash56(F.col("s")).alias("h"),
    )
    con = duckdb.connect()
    tk = X.oracle_tokens("s")
    # COALESCE on the joins only: DuckDB's array_to_string([]) is NULL
    # while Spark's array_join([]) is '' — a quirk of the *display*
    # join here, not of the primitives under test (which must agree).
    rel = con.sql(f"""
        SELECT id,
               trim(regexp_replace(lower(s), '\\s+', ' ', 'g')) AS norm,
               coalesce(array_to_string({tk}, '|'), '') AS toks,
               coalesce(array_to_string({X.oracle_tokens("s", X.TOKEN_RE)}, '|'), '') AS bpe,
               coalesce(array_to_string({X.oracle_shingles(tk, 3)}, '~'), '') AS sh3,
               {X.oracle_hash56("s")} AS h
        FROM '{fuzz_path}/*.parquet'
    """)
    assert_matches_oracle(sdf, rel)

"""Scalar function suites: string, datetime, math, conditional, array,
and JSON expressions.

Maps the reference's serialization helpers (TransformUnmarshalJSON,
reference types.go:163-167; XML/JSON event normalization,
x/windows/windows_event.go:57-139) and the Handler-as-map transform
surface to Spark's built-in expression library — every function here is
JVM-side and whole-stage-codegen'd; no Python executes per row.

Per-row float functions (ln/pow/sqrt) are rounded to 6 decimals BEFORE
the exact-decimal sum so a 1-ulp libm difference between engines cannot
flip an aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cheetah_spark.catalog import load_table
from cheetah_spark.queries._util import dsum2, oracle_dsum2
from cheetah_spark.registry import register


@register(
    "q_scalar_string",
    oracle="""
        SELECT doc_id,
               UPPER(SUBSTR(text, 1, 10)) AS up10,
               LOWER(source) AS src_lower,
               LENGTH(text) AS n_char,
               REPLACE(SUBSTR(text, 1, 20), ' ', '_') AS rep20,
               regexp_extract(text, '([a-z]+) ([a-z]+)', 2) AS second_word,
               CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               lang || '-' || source AS tag,
               TRIM('  ' || lang || ' ') AS lang_trim,
               LPAD(lang, 5, '_') AS lang_pad
        FROM documents
    """,
    tags=("scalar", "string"),
)
def q_scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function suite: upper/lower/substr/length/replace/
    regexp_extract/split/concat/trim/lpad."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper(F.substring("text", 1, 10)).alias("up10"),
        F.lower("source").alias("src_lower"),
        F.length("text").alias("n_char"),
        F.replace(F.substring("text", 1, 20), F.lit(" "), F.lit("_")).alias("rep20"),
        F.regexp_extract("text", r"([a-z]+) ([a-z]+)", 2).alias("second_word"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        F.concat(F.col("lang"), F.lit("-"), F.col("source")).alias("tag"),
        F.trim(F.concat(F.lit("  "), F.col("lang"), F.lit(" "))).alias("lang_trim"),
        F.lpad("lang", 5, "_").alias("lang_pad"),
    )


@register(
    "q_scalar_datetime",
    oracle="""
        SELECT o_orderkey,
               CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
               CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mo,
               CAST(EXTRACT(day FROM o_orderdate) AS INT) AS dy,
               CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS qtr,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
               CAST(o_orderdate AS DATE) AS odate,
               CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INT)
                   AS days_to_98,
               CAST(epoch(date_trunc('second', o_orderdate)) AS BIGINT) AS unix_sec,
               CAST(o_orderdate + INTERVAL 90 DAY AS DATE) AS due_date
        FROM orders
    """,
    tags=("scalar", "datetime"),
)
def q_scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime suite: extract parts, date_trunc, datediff, epoch
    seconds, interval arithmetic."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.quarter("o_orderdate").alias("qtr"),
        F.to_date(F.date_trunc("month", "o_orderdate")).alias("month_start"),
        F.to_date("o_orderdate").alias("odate"),
        F.datediff(F.lit("1998-01-01").cast("date"), F.to_date("o_orderdate")).alias("days_to_98"),
        F.unix_timestamp(F.date_trunc("second", F.col("o_orderdate"))).alias("unix_sec"),
        F.to_date(F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
    )


@register(
    "q_scalar_math",
    oracle=f"""
        SELECT l_returnflag,
               {oracle_dsum2("ROUND(SQRT(l_quantity), 6)")} AS sum_sqrt_qty,
               {oracle_dsum2("ROUND(LN(l_extendedprice), 6)")} AS sum_ln_price,
               {oracle_dsum2("POW(l_quantity, 2)")} AS sum_qty_sq,
               {oracle_dsum2("ABS(l_extendedprice - 5000.0)")} AS sum_abs_dev,
               CAST(SUM(CAST(FLOOR(l_extendedprice) AS BIGINT)) AS BIGINT) AS sum_floor,
               CAST(SUM(CAST(CEIL(l_extendedprice) AS BIGINT)) AS BIGINT) AS sum_ceil,
               CAST(SUM(l_orderkey % 7) AS BIGINT) AS sum_mod7,
               CAST(SUM(CAST(SIGN(l_discount - 0.05) AS BIGINT)) AS BIGINT) AS sum_sign
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("scalar", "math"),
)
def q_scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math suite: sqrt/ln/pow/abs/floor/ceil/mod/sign, aggregated with
    the ulp-tolerant round-then-decimal-sum convention."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        dsum2((F.round(F.sqrt("l_quantity"), 6))).alias("sum_sqrt_qty"),
        dsum2((F.round(F.log(F.col("l_extendedprice")), 6))).alias("sum_ln_price"),
        dsum2((F.pow("l_quantity", F.lit(2)))).alias("sum_qty_sq"),
        dsum2((F.abs(F.col("l_extendedprice") - 5000.0))).alias("sum_abs_dev"),
        F.sum(F.floor("l_extendedprice").cast("bigint")).cast("bigint").alias("sum_floor"),
        F.sum(F.ceil("l_extendedprice").cast("bigint")).cast("bigint").alias("sum_ceil"),
        F.sum(F.col("l_orderkey") % 7).cast("bigint").alias("sum_mod7"),
        F.sum(F.signum(F.col("l_discount") - 0.05).cast("bigint")).cast("bigint").alias("sum_sign"),
    )


@register(
    "q_scalar_conditional",
    oracle=f"""
        SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                    WHEN o_totalprice < 150000 THEN 'mid'
                    ELSE 'large' END AS bucket,
               COALESCE(NULLIF(o_orderstatus, 'P'), 'pending') AS status,
               COUNT(*) AS n,
               {oracle_dsum2("LEAST(o_totalprice, 100000.0)")} AS sum_capped,
               {oracle_dsum2("GREATEST(o_totalprice, 10000.0)")} AS sum_floored
        FROM orders
        GROUP BY 1, 2
    """,
    tags=("scalar", "conditional"),
)
def q_scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / coalesce / nullif / greatest / least."""
    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "mid")
        .otherwise("large")
    )
    status = F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("pending"))
    return (
        o.select(
            bucket.alias("bucket"),
            status.alias("status"),
            "o_totalprice",
        )
        .groupBy("bucket", "status")
        .agg(
            F.count("*").alias("n"),
            dsum2((F.least(F.col("o_totalprice"), F.lit(100000.0)))).alias("sum_capped"),
            dsum2((F.greatest(F.col("o_totalprice"), F.lit(10000.0)))).alias("sum_floored"),
        )
    )


@register(
    "q_array_map_ops",
    oracle="""
        SELECT doc_id,
               CAST(LEN(string_split(text, ' ')) AS INT) AS n_tokens,
               CAST(LEN(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct,
               list_contains(string_split(text, ' '), 'spark') AS has_spark,
               list_sort(string_split(text, ' '))[1] AS first_tok,
               list_sort(string_split(text, ' '))[-1] AS last_tok,
               array_to_string(list_sort(list_distinct(string_split(SUBSTR(text, 1, 30), ' '))), ',')
                   AS head_toks
        FROM documents
    """,
    tags=("scalar", "array"),
)
def q_array_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array ops: size/distinct/contains/sort/element_at/join — reduced
    to scalar outputs so cross-engine array serialization never enters
    the hash."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.element_at(F.array_sort(toks), 1).alias("first_tok"),
        F.element_at(F.array_sort(toks), -1).alias("last_tok"),
        F.array_join(
            F.array_sort(F.array_distinct(F.split(F.substring("text", 1, 30), " "))), ","
        ).alias("head_toks"),
    )


@register(
    "q_json_ops",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
               CAST(SUM(LEN(json_keys(props))) AS BIGINT) AS sum_nkeys,
               MIN(json_extract_string(props, '$.k')) AS min_k_str
        FROM events
        GROUP BY event_type
    """,
    tags=("scalar", "json"),
)
def q_json_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON ops: string-path extraction (get_json_object), typed
    from_json into a map, key counting."""
    e = load_table(spark, sf_dir, "events")
    as_map = F.from_json("props", "map<string,int>")
    return (
        e.select(
            "event_type",
            F.get_json_object("props", "$.k").alias("k_str"),
            F.size(F.map_keys(as_map)).alias("nkeys"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("k_str").cast("int")).cast("bigint").alias("sum_k"),
            F.sum("nkeys").cast("bigint").alias("sum_nkeys"),
            F.min("k_str").alias("min_k_str"),
        )
    )

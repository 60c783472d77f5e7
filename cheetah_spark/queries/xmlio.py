"""XML deserialization: Windows EventLog-shaped records parsed with
``from_xml`` — the reference's second-largest component
(x/windows/windows_event.go:57-139 XML→struct normalization;
x/windows/event_logs.go:29-102 subscription pull; SURVEY.md §2A S4/T5
serialization surface).

The replay fixture is built in-plan from the events table (the
container ships no Windows evtx capture): each event is serialized to
the canonical ``<Event><System>…</System><EventData>…</EventData>
</Event>`` envelope, then parsed back with ``from_xml`` into the
nested struct — XML attributes (TimeCreated/@SystemTime, Data/@Name),
nested elements (EventID, Channel) and the Name-keyed ``<Data>`` array
(the EventData map shape windows_event.go:57-139 normalizes) are all
exercised. The DuckDB oracle computes the same aggregate straight from
the events table, so the hash gate proves the XML round-trip is
lossless field-by-field.

Scale: serialization and parsing are per-row JVM expressions (the XML
parser runs inside codegen) feeding one hash aggregate — a pure
scan-shaped plan, no extra shuffle beyond the groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cheetah_spark.catalog import load_table
from cheetah_spark.queries._util import dsum2, oracle_dsum2
from cheetah_spark.registry import register

_XML_SCHEMA = (
    "System struct<EventID: bigint, Channel: string, Computer: string, "
    "TimeCreated: struct<_SystemTime: string>>, "
    "EventData struct<Data: array<struct<_Name: string, _VALUE: string>>>"
)

_XML_OPTS = {"attributePrefix": "_", "valueTag": "_VALUE"}


@register(
    "q_deser_xml",
    oracle=f"""
        SELECT event_type AS channel,
               COUNT(*) AS n_events,
               MIN(event_id) AS min_event_id,
               MAX(event_id) AS max_event_id,
               COUNT(DISTINCT user_id) AS n_users,
               {oracle_dsum2("value")} AS sum_value,
               MAX(strftime(date_trunc('second', ts), '%Y-%m-%dT%H:%M:%S')) AS max_systemtime
        FROM events
        GROUP BY event_type
    """,
    tags=("xml", "deser"),
)
def q_deser_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windows EventLog XML round-trip: serialize each event to the
    EventLog envelope, ``from_xml`` it back (attributes + nested
    elements + Name-keyed Data array), then aggregate per Channel.
    The oracle aggregates the raw events directly — equality proves
    the XML normalization loses nothing (reference
    x/windows/windows_event.go:57-139 parity)."""
    e = load_table(spark, sf_dir, "events")
    xml = F.format_string(
        '<Event><System><EventID>%s</EventID><Channel>%s</Channel>'
        '<Computer>cheetah</Computer><TimeCreated SystemTime="%s"/></System>'
        '<EventData><Data Name="value">%s</Data><Data Name="user">%s</Data>'
        "</EventData></Event>",
        F.col("event_id"),
        F.col("event_type"),
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss"),
        F.col("value").cast("string"),
        F.col("user_id"),
    )
    parsed = e.select(F.from_xml(xml, _XML_SCHEMA, _XML_OPTS).alias("ev"))
    data = F.col("ev.EventData.Data")
    val = F.element_at(F.filter(data, lambda d: d["_Name"] == "value"), 1)["_VALUE"]
    user = F.element_at(F.filter(data, lambda d: d["_Name"] == "user"), 1)["_VALUE"]
    flat = parsed.select(
        F.col("ev.System.EventID").alias("event_id"),
        F.col("ev.System.Channel").alias("channel"),
        F.col("ev.System.TimeCreated._SystemTime").alias("systemtime"),
        val.cast("double").alias("value"),
        user.cast("bigint").alias("user_id"),
    )
    return flat.groupBy("channel").agg(
        F.count("*").alias("n_events"),
        F.min("event_id").alias("min_event_id"),
        F.max("event_id").alias("max_event_id"),
        F.countDistinct("user_id").alias("n_users"),
        dsum2("value").alias("sum_value"),
        F.max("systemtime").alias("max_systemtime"),
    )

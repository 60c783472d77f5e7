"""Syslog line parsing as pure Column expressions (reference kawad
source config type ``syslog``, README.md:168-177 — addr + contentType;
the Go implementation lives in the parent project, so the semantics
here are built from the public RFCs).

Two wire formats, both parsed JVM-side with ``regexp_extract`` (no
Python in the hot path — a syslog firehose is exactly the 100 TB-class
ingest where a per-row UDF would dominate):

- **RFC 5424** (``<PRI>1 TIMESTAMP HOST APP PROCID MSGID SD MSG``) —
  the modern structured format; ``-`` is the nil value.
- **RFC 3164** (``<PRI>MMM dd HH:MM:SS HOST TAG[PID]: MSG``) — the
  legacy BSD format (no year, no tz). The day may be space- or
  zero-padded; both are accepted.

``PRI`` encodes ``facility * 8 + severity`` — recovered with shifts
(``pri >> 3`` / ``pri & 7``), identical integer ops in Spark and
DuckDB.

Every regex here is valid and equivalent in BOTH Java regex (Spark)
and RE2 (DuckDB): numbered groups only, no backreferences, no
lookaround, explicit character classes. The ``oracle_*`` mirrors embed
the same pattern strings so the differential gate proves the parse
cross-engine, not just the plumbing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# group order: 1=pri 2=ts 3=host 4=app 5=procid 6=msgid 7=sd 8=msg.
# SD is one-or-more [..] elements (rsyslog commonly emits several) and
# PARAM-VALUE may contain RFC 5424 §6.3.3 escaped characters (\" \\ \]),
# hence the ([^\]\\]|\\.)* element body — a plain [^\]]* would end the
# element at an ESCAPED bracket and leak SD fragments into MSG (r8
# self-review finding).
RFC5424_RE = (
    r"^<(\d{1,3})>1 (\S+) (\S+) (\S+) (\S+) (\S+)"
    r" (-|(?:\[(?:[^\]\\]|\\.)*\])+) ?(.*)$"
)
# group order: 1=pri 2=mon 3=day 4=time 5=host 6=tag 7=pid 8=msg.
# The bracketed PID is OPTIONAL — the RFC 3164 specimen itself is
# `su: 'su root' failed...`, and kernel:/CRON:-style pid-less tags are
# the dominant legacy traffic (r8 self-review finding); a
# non-participating group extracts as '' in BOTH engines, which the
# procid() nullif already maps to NULL.
RFC3164_RE = (
    r"^<(\d{1,3})>([A-Z][a-z]{2}) {1,2}(\d{1,2}) (\d{2}:\d{2}:\d{2})"
    r" (\S+) ([A-Za-z0-9_.-]+)(?:\[(\d+)\])?: (.*)$"
)


def _raw(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def is_rfc5424(col: Column | str) -> Column:
    return _raw(col).rlike(r"^<\d{1,3}>1 ")


def matches_rfc5424(col: Column | str) -> Column:
    """Full-grammar RFC 5424 match (not just the version prefix) — the
    per-grammar parse-failure signal: NOT matches == this line would
    yield an all-NULL struct under a forced-5424 source."""
    return _raw(col).rlike(RFC5424_RE)


def matches_rfc3164(col: Column | str) -> Column:
    """Full-grammar RFC 3164 match — see :func:`matches_rfc5424`."""
    return _raw(col).rlike(RFC3164_RE)


def pri(col: Column | str) -> Column:
    """PRI as bigint from either format ('' → NULL on unparseable)."""
    return F.nullif(F.regexp_extract(_raw(col), r"^<(\d{1,3})>", 1), F.lit("")).cast(
        "bigint"
    )


def facility(col: Column | str) -> Column:
    return F.call_function("shiftright", pri(col), F.lit(3)).cast("bigint")


def severity(col: Column | str) -> Column:
    return pri(col).bitwiseAND(F.lit(7)).cast("bigint")


def _g5424(col: Column | str, n: int) -> Column:
    return F.regexp_extract(_raw(col), RFC5424_RE, n)


def _g3164(col: Column | str, n: int) -> Column:
    return F.regexp_extract(_raw(col), RFC3164_RE, n)


def host(col: Column | str) -> Column:
    return F.when(is_rfc5424(col), _g5424(col, 3)).otherwise(_g3164(col, 5))


def app(col: Column | str) -> Column:
    """APP-NAME (5424) / TAG (3164)."""
    return F.when(is_rfc5424(col), _g5424(col, 4)).otherwise(_g3164(col, 6))


def procid(col: Column | str) -> Column:
    """PROCID / bracketed PID as bigint, NULL when nil, absent, or
    non-numeric — RFC 5424 permits any PRINTUSASCII PROCID (e.g. a
    worker name), so the numeric coercion must be try_cast, not a
    hard ANSI cast (found by tests/test_syslog_fuzz.py: a literal
    'p' PROCID crashed the parse)."""
    raw = F.when(is_rfc5424(col), _g5424(col, 5)).otherwise(_g3164(col, 7))
    return F.nullif(F.nullif(raw, F.lit("-")), F.lit("")).try_cast("bigint")


def msgid(col: Column | str) -> Column:
    return F.when(is_rfc5424(col), F.nullif(_g5424(col, 6), F.lit("-")))


def ts_raw(col: Column | str) -> Column:
    """The timestamp field verbatim: RFC3339 for 5424, 'MMM dd
    HH:MM:SS' re-joined for 3164 (no year on the wire — re-parsing to
    a typed timestamp is the caller's policy decision)."""
    return F.when(is_rfc5424(col), _g5424(col, 2)).otherwise(
        F.concat_ws(" ", _g3164(col, 2), _g3164(col, 3), _g3164(col, 4))
    )


def message(col: Column | str) -> Column:
    return F.when(is_rfc5424(col), _g5424(col, 8)).otherwise(_g3164(col, 8))


def parsed(col: Column | str) -> Column:
    """The full parse as one struct — what SyslogSource(content_type=
    'auto') appends to the envelope."""
    return F.struct(
        pri(col).alias("pri"),
        facility(col).alias("facility"),
        severity(col).alias("severity"),
        ts_raw(col).alias("ts_raw"),
        host(col).alias("host"),
        app(col).alias("app"),
        procid(col).alias("procid"),
        message(col).alias("message"),
        is_rfc5424(col).alias("rfc5424"),
    )


def parsed_forced(col: Column | str, grammar: str) -> Column:
    """Single-grammar parse (the reference's contentType dial forced to
    one RFC): every field comes ONLY from the named RFC's regex, and a
    line that doesn't match that grammar yields an all-NULL struct —
    it is NOT silently handed to the sibling grammar the way
    :func:`parsed`'s auto-detection would (r8 advice: the forced values
    previously ran the same auto parse, so a 3164 line in a declared
    'rfc5424' stream was parsed as 3164 instead of rejected).

    Same field schema as :func:`parsed`; ``rfc5424`` is the grammar
    constant when the line matches, NULL when it doesn't.
    """
    if grammar == "rfc5424":
        matched = _raw(col).rlike(RFC5424_RE)
        ts = _g5424(col, 2)
        host_c, app_c = _g5424(col, 3), _g5424(col, 4)
        procid_raw, msg_c = _g5424(col, 5), _g5424(col, 8)
    elif grammar == "rfc3164":
        matched = _raw(col).rlike(RFC3164_RE)
        ts = F.concat_ws(" ", _g3164(col, 2), _g3164(col, 3), _g3164(col, 4))
        host_c, app_c = _g3164(col, 5), _g3164(col, 6)
        procid_raw, msg_c = _g3164(col, 7), _g3164(col, 8)
    else:
        raise ValueError(f"syslog: unknown forced grammar {grammar!r} (rfc3164|rfc5424)")
    procid_c = F.nullif(F.nullif(procid_raw, F.lit("-")), F.lit("")).try_cast("bigint")
    return F.struct(
        F.when(matched, pri(col)).alias("pri"),
        F.when(matched, facility(col)).alias("facility"),
        F.when(matched, severity(col)).alias("severity"),
        F.when(matched, ts).alias("ts_raw"),
        F.when(matched, host_c).alias("host"),
        F.when(matched, app_c).alias("app"),
        F.when(matched, procid_c).alias("procid"),
        F.when(matched, msg_c).alias("message"),
        F.when(matched, F.lit(grammar == "rfc5424")).alias("rfc5424"),
    )


# --- DuckDB mirrors (same pattern strings, RE2) ------------------------


def _sq(rx: str) -> str:
    # SQL single-quoted literal: only quotes need doubling (DuckDB does
    # not backslash-escape inside standard string literals)
    return rx.replace("'", "''")


def oracle_is_rfc5424(expr: str) -> str:
    return f"regexp_matches({expr}, '^<\\d{{1,3}}>1 ')"


def oracle_pri(expr: str) -> str:
    return f"CAST(nullif(regexp_extract({expr}, '^<(\\d{{1,3}})>', 1), '') AS BIGINT)"


def oracle_facility(expr: str) -> str:
    return f"({oracle_pri(expr)} >> 3)"


def oracle_severity(expr: str) -> str:
    return f"({oracle_pri(expr)} & 7)"


def _o5424(expr: str, n: int) -> str:
    return f"regexp_extract({expr}, '{_sq(RFC5424_RE)}', {n})"


def _o3164(expr: str, n: int) -> str:
    return f"regexp_extract({expr}, '{_sq(RFC3164_RE)}', {n})"


def oracle_matches_rfc5424(expr: str) -> str:
    return f"regexp_matches({expr}, '{_sq(RFC5424_RE)}')"


def oracle_matches_rfc3164(expr: str) -> str:
    return f"regexp_matches({expr}, '{_sq(RFC3164_RE)}')"


def oracle_host(expr: str) -> str:
    return (
        f"CASE WHEN {oracle_is_rfc5424(expr)} THEN {_o5424(expr, 3)}"
        f" ELSE {_o3164(expr, 5)} END"
    )


def oracle_app(expr: str) -> str:
    return (
        f"CASE WHEN {oracle_is_rfc5424(expr)} THEN {_o5424(expr, 4)}"
        f" ELSE {_o3164(expr, 6)} END"
    )


def oracle_procid(expr: str) -> str:
    raw = (
        f"CASE WHEN {oracle_is_rfc5424(expr)} THEN {_o5424(expr, 5)}"
        f" ELSE {_o3164(expr, 7)} END"
    )
    return f"TRY_CAST(nullif(nullif({raw}, '-'), '') AS BIGINT)"


def oracle_ts_raw(expr: str) -> str:
    return (
        f"CASE WHEN {oracle_is_rfc5424(expr)} THEN {_o5424(expr, 2)}"
        f" ELSE {_o3164(expr, 2)} || ' ' || {_o3164(expr, 3)} || ' ' || {_o3164(expr, 4)} END"
    )


def oracle_message(expr: str) -> str:
    return (
        f"CASE WHEN {oracle_is_rfc5424(expr)} THEN {_o5424(expr, 8)}"
        f" ELSE {_o3164(expr, 8)} END"
    )

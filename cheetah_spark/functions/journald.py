"""systemd Journal Export Format field extraction as pure Column
expressions (reference kawad source config type ``journald``,
README.md:179-185 — zero-config host-log ingestion; the Go
implementation lives in the parent project, so the semantics here are
built from the public Journal Export Format specification).

An export-format *entry* is a blank-line-separated block of
``KEY=VALUE`` lines (binary-safe fields use a length-prefixed form this
module does not synthesize; the replay reader passes them through
verbatim and ``field`` simply won't match them — the documented text
subset). Field extraction is one anchored regexp per key —
``(?:^|\\n)KEY=([^\\n]*)`` — valid and equivalent in Java regex and
RE2, so the DuckDB oracle parses the identical entries with the same
pattern strings.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column
from pyspark.sql import functions as F

# journald field names: uppercase, digits, underscore, optional leading
# underscore(s) for trusted fields
_KEY_RE = _re.compile(r"^_{0,2}[A-Z][A-Z0-9_]*$")


def _rx(key: str) -> str:
    if not _KEY_RE.match(key):
        raise ValueError(f"not a journald field name: {key!r}")
    return f"(?:^|\\n){key}=([^\\n]*)"


def _raw(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def field(col: Column | str, key: str) -> Column:
    """The field's value as string; '' when absent (regexp_extract
    non-match convention, same in both engines)."""
    return F.regexp_extract(_raw(col), _rx(key), 1)


def field_bigint(col: Column | str, key: str) -> Column:
    # try_cast: journald field values are arbitrary text; a
    # non-numeric PRIORITY/_PID must become NULL, not an ANSI cast
    # error (tests/test_syslog_fuzz.py)
    return F.nullif(field(col, key), F.lit("")).try_cast("bigint")


def priority(col: Column | str) -> Column:
    return field_bigint(col, "PRIORITY")


def realtime_usec(col: Column | str) -> Column:
    return field_bigint(col, "__REALTIME_TIMESTAMP")


def message(col: Column | str) -> Column:
    return field(col, "MESSAGE")


def parsed(col: Column | str) -> Column:
    """The common typed projection — what JournaldSource appends when
    ``content_type='auto'``."""
    return F.struct(
        priority(col).alias("priority"),
        realtime_usec(col).alias("realtime_usec"),
        field(col, "_HOSTNAME").alias("hostname"),
        field(col, "SYSLOG_IDENTIFIER").alias("identifier"),
        field_bigint(col, "_PID").alias("pid"),
        field(col, "_SYSTEMD_UNIT").alias("unit"),
        message(col).alias("message"),
    )


# --- DuckDB mirrors (same pattern strings, RE2) ------------------------


def oracle_field(expr: str, key: str) -> str:
    rx = _rx(key).replace("'", "''")
    return f"regexp_extract({expr}, '{rx}', 1)"


def oracle_field_bigint(expr: str, key: str) -> str:
    return f"TRY_CAST(nullif({oracle_field(expr, key)}, '') AS BIGINT)"

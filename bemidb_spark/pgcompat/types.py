"""Postgres type system: literal parsing, Spark schema mapping, render shims.

Ports the reference's type matrix (SURVEY.md §1.3; reference
syncer-postgres/lib/pg_schema_column.go:49-99 and
common/iceberg_schema_column.go:210-386) to Spark types, with the two shims
Spark needs (§4.3):

- **time / timetz** → BIGINT microseconds-of-day + a render shim (Spark has no
  TimeType; the reference stores µs too, README.md:289). The pg origin is
  recorded in StructField metadata (``pg_type``) so the wire encoder can emit
  ``HH:MM:SS.ffffff`` with the TimeOID.
- **interval** → DECIMAL(38,6) total microseconds (months normalized at 30
  days, mirroring the reference's µs storage, pg_schema_column.go:58-60) +
  render shim producing the reference's wire format
  ``"N months N days N microseconds"`` (response_handler.go:293-298).

Documented deviations from the reference (both directions safe for clients):
- int8 stays BIGINT (the reference re-types it DECIMAL(38,0) because its µs
  engine lacked int64-preserving paths; Spark doesn't — SURVEY §7).
- float NaN is preserved (the reference zeroes NaN to dodge an engine crash,
  iceberg_schema_column.go:269-279).
"""

from __future__ import annotations

import datetime as dt
import re

from pyspark.sql import types as T

NULL_SENTINEL = "BEMIDB_NULL"  # reference common/iceberg_schema_column.go:39

MICROS_PER_SECOND = 1_000_000
MICROS_PER_DAY = 86_400 * MICROS_PER_SECOND
MICROS_PER_MONTH = 30 * MICROS_PER_DAY  # reference normalizes at 30-day months


# --------------------------------------------------------------------- schema
def spark_field(name: str, pg_type: str, nullable: bool = True) -> T.StructField:
    """StructField for a pg column, with pg_type stamped in metadata."""
    pg = pg_type.lower()
    if pg.startswith("vector"):
        # pgvector column: stored as a double array; the `vector(n)` typmod
        # (dims) rides along in the metadata tag so \d / pg_attribute can
        # echo it (pgvector's atttypmod IS the dim count)
        data_type: T.DataType = T.ArrayType(T.DoubleType())
    elif pg.startswith("_"):
        elem = spark_field(name, pg[1:], nullable).dataType
        data_type = T.ArrayType(elem)
    elif pg in ("bool", "boolean"):
        data_type = T.BooleanType()
    elif pg in ("bit", "int2", "int4"):
        data_type = T.IntegerType()
    elif pg in ("int8", "xid"):
        data_type = T.LongType()
    elif pg == "xid8":
        data_type = T.DecimalType(38, 0)
    elif pg.startswith("numeric"):
        m = re.match(r"numeric\((\d+),\s*(\d+)\)", pg)
        if m:
            data_type = T.DecimalType(min(int(m.group(1)), 38), int(m.group(2)))
        else:
            data_type = T.DecimalType(38, 6)  # fallback scale, §1.3
    elif pg == "float4":
        data_type = T.FloatType()
    elif pg == "float8":
        data_type = T.DoubleType()
    elif pg == "date":
        data_type = T.DateType()
    elif pg.startswith("timestamptz"):
        data_type = T.TimestampType()
    elif pg.startswith("timestamp"):
        data_type = T.TimestampNTZType()
    elif pg.startswith(("timetz", "time")):
        data_type = T.LongType()  # µs of day + render shim
    elif pg == "interval":
        data_type = T.DecimalType(38, 6)  # total µs
    elif pg == "bytea":
        data_type = T.BinaryType()
    else:  # text/varchar/bpchar/uuid/json/jsonb/xml/point/inet/udt/...
        data_type = T.StringType()
    return T.StructField(name, data_type, nullable, metadata={"pg_type": pg})


# ------------------------------------------------------------- literal parsing
def parse_interval(text: str) -> int:
    """'1 mon 2 days 01:00:01.000001' → total microseconds (30-day months)."""
    micros = 0
    m = re.search(r"(-?\d+)\s+(?:year|years)", text)
    if m:
        micros += int(m.group(1)) * 12 * MICROS_PER_MONTH
    m = re.search(r"(-?\d+)\s+(?:mon|mons|month|months)", text)
    if m:
        micros += int(m.group(1)) * MICROS_PER_MONTH
    m = re.search(r"(-?\d+)\s+(?:day|days)", text)
    if m:
        micros += int(m.group(1)) * MICROS_PER_DAY
    m = re.search(r"(-?\d+)\s+(?:hour|hours)", text)
    if m:
        micros += int(m.group(1)) * 3600 * MICROS_PER_SECOND
    m = re.search(r"(-?\d+)\s+(?:minute|minutes|min|mins)", text)
    if m:
        micros += int(m.group(1)) * 60 * MICROS_PER_SECOND
    m = re.search(r"(-?\d+(?:\.\d+)?)\s+(?:second|seconds|sec|secs)", text)
    if m:
        micros += int(float(m.group(1)) * MICROS_PER_SECOND)
    m = re.search(r"(-?\d+)\s+(?:microsecond|microseconds)", text)
    if m:
        micros += int(m.group(1))
    m = re.search(r"(-?)(\d{1,2}):(\d{2}):(\d{2})(?:\.(\d{1,6}))?", text)
    if m:
        sign = -1 if m.group(1) else 1
        frac = int((m.group(5) or "0").ljust(6, "0"))
        micros += sign * (
            int(m.group(2)) * 3600 * MICROS_PER_SECOND
            + int(m.group(3)) * 60 * MICROS_PER_SECOND
            + int(m.group(4)) * MICROS_PER_SECOND
            + frac
        )
    return micros


def render_interval(total_micros: int) -> str:
    """µs → the reference's wire form 'N months N days N microseconds'."""
    months, rem = divmod(int(total_micros), MICROS_PER_MONTH)
    days, micros = divmod(rem, MICROS_PER_DAY)
    return f"{months} months {days} days {micros} microseconds"


def parse_time(text: str) -> int:
    """'12:00:00.123456' (optionally with +/-TZ offset) → µs of day (UTC)."""
    m = re.match(r"(\d{1,2}):(\d{2}):(\d{2})(?:\.(\d{1,6}))?([+-]\d{1,2}(?::\d{2})?)?", text)
    if not m:
        raise ValueError(f"bad time literal: {text!r}")
    frac = int((m.group(4) or "0").ljust(6, "0"))
    micros = (
        int(m.group(1)) * 3600 + int(m.group(2)) * 60 + int(m.group(3))
    ) * MICROS_PER_SECOND + frac
    if m.group(5):
        off = m.group(5)
        parts = off[1:].split(":")
        off_min = int(parts[0]) * 60 + (int(parts[1]) if len(parts) > 1 else 0)
        if off.startswith("+"):
            micros -= off_min * 60 * MICROS_PER_SECOND
        else:
            micros += off_min * 60 * MICROS_PER_SECOND
        micros %= MICROS_PER_DAY
    return micros


def render_time(micros: int) -> str:
    secs, frac = divmod(int(micros), MICROS_PER_SECOND)
    h, rem = divmod(secs, 3600)
    mnt, s = divmod(rem, 60)
    base = f"{h:02d}:{mnt:02d}:{s:02d}"
    return base + (f".{frac:06d}".rstrip("0") if frac else "")


def parse_timestamp(text: str) -> dt.datetime:
    """pg timestamp[tz] literal → datetime (tz-aware if offset present)."""
    m = re.match(
        r"(\d{4,5})-(\d{2})-(\d{2})[ T](\d{2}):(\d{2}):(\d{2})(?:\.(\d{1,6}))?"
        r"([+-]\d{1,2}(?::\d{2})?)?",
        text,
    )
    if not m:
        raise ValueError(f"bad timestamp literal: {text!r}")
    year = min(int(m.group(1)), 9999)  # python/Spark cap; far-future clamps
    frac = int((m.group(7) or "0").ljust(6, "0"))
    base = dt.datetime(
        year, int(m.group(2)), int(m.group(3)),
        int(m.group(4)), int(m.group(5)), int(m.group(6)), frac,
    )
    if m.group(8):
        off = m.group(8)
        parts = off[1:].split(":")
        minutes = int(parts[0]) * 60 + (int(parts[1]) if len(parts) > 1 else 0)
        delta = dt.timedelta(minutes=minutes)
        utc = base - delta if off.startswith("+") else base + delta
        return utc.replace(tzinfo=dt.timezone.utc)
    return base


def parse_pg_array(text: str) -> list[str | None]:
    """'{a,"b c",NULL}' → element text list (None for NULL)."""
    body = text.strip()
    assert body.startswith("{") and body.endswith("}"), text
    body = body[1:-1]
    if not body:
        return []
    out: list[str | None] = []
    cur, in_quotes, i = [], False, 0
    while i < len(body):
        ch = body[i]
        if in_quotes:
            if ch == "\\":
                cur.append(body[i + 1])
                i += 2
                continue
            if ch == '"':
                # `""` inside a quoted element is a literal quote (the
                # CSV-doubling convention the wire encoder and the
                # reference's encoding/csv writer emit); a lone `"` closes.
                # pg's own output (`\"`) takes the backslash branch above.
                if i + 1 < len(body) and body[i + 1] == '"':
                    cur.append('"')
                    i += 2
                    continue
                in_quotes = False
            else:
                cur.append(ch)
        elif ch == '"':
            in_quotes = True
        elif ch == ",":
            item = "".join(cur)
            out.append(None if item == "NULL" else item)
            cur = []
        else:
            cur.append(ch)
        i += 1
    item = "".join(cur)
    out.append(None if item == "NULL" else item)
    return out


def parse_pg_literal(pg_type: str, text: str | None):
    """One pg text literal → the python value for the Spark row (ingest path).

    Mirrors the reference's CSV→typed-value conversion
    (iceberg_schema_column.go:210-335).
    """
    import decimal

    if text is None or text == NULL_SENTINEL:
        return None
    pg = pg_type.lower()
    if pg.startswith("_"):
        return [parse_pg_literal(pg[1:], e) for e in parse_pg_array(text)]
    if pg in ("bool", "boolean"):
        return text in ("t", "true", "TRUE")
    if pg in ("bit", "int2", "int4", "int8", "xid"):
        return int(text)
    if pg == "xid8":
        return decimal.Decimal(text)
    if pg.startswith("numeric"):
        return decimal.Decimal(text)
    if pg in ("float4", "float8"):
        return float(text)
    if pg == "date":
        m = re.match(r"(\d{4,6})-(\d{2})-(\d{2})", text)
        return dt.date(min(int(m.group(1)), 9999), int(m.group(2)), int(m.group(3)))
    if pg.startswith("timestamp"):  # timestamp & timestamptz (before 'time'!)
        return parse_timestamp(text)
    if pg.startswith(("timetz", "time")):
        return parse_time(text)
    if pg == "interval":
        return decimal.Decimal(parse_interval(text))
    if pg == "bytea":
        assert text.startswith("\\x")
        return bytes.fromhex(text[2:])
    if pg == "bpchar":
        return text.rstrip(" ")  # reference rtrims bpchar on ingest
    return text

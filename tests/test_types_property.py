"""Property-based tests for the pg type layer (hypothesis).

The reference has no property testing (SURVEY §5 "Not present"); these pin
the parse/render shims across the whole input space instead of two fixture
rows.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from bemidb_spark.pgcompat.types import (
    MICROS_PER_DAY,
    parse_interval,
    parse_pg_array,
    parse_pg_literal,
    parse_time,
    render_interval,
    render_time,
)


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=MICROS_PER_DAY - 1))
def test_time_render_parse_roundtrip(micros):
    assert parse_time(render_time(micros)) == micros


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=0, max_value=500),
    st.integers(min_value=0, max_value=29),
    st.integers(min_value=0, max_value=MICROS_PER_DAY - 1),
)
def test_interval_render_parse_roundtrip(months, days, micros):
    total = (months * 30 + days) * MICROS_PER_DAY + micros
    assert parse_interval(render_interval(total)) == total


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=-(2**62), max_value=2**62),
    st.decimals(allow_nan=False, allow_infinity=False, places=6,
                min_value=-10**12, max_value=10**12),
    st.booleans(),
    st.dates(),
    st.binary(max_size=16),
)
def test_pg_literal_parse_typed(i, dec, b, day, blob):
    # ingest-path literal parsing: the pg text form of each typed value
    # parses back to the identical python value (mirrors the reference's
    # CSV→typed conversion, iceberg_schema_column.go:210-335)
    assert parse_pg_literal("int8", str(i)) == i
    assert parse_pg_literal("numeric(30,6)", str(dec)) == dec
    assert parse_pg_literal("bool", "t" if b else "f") is b
    if day.year <= 9999:
        assert parse_pg_literal("date", day.isoformat()) == day
    assert parse_pg_literal("bytea", "\\x" + blob.hex()) == blob
    assert parse_pg_literal("_int8", "{" + str(i) + ",NULL}") == [i, None]


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.text(
                alphabet=st.characters(blacklist_characters="\x00"),
                max_size=20,
            ),
        ),
        max_size=8,
    )
)
def test_pg_array_roundtrip(elems):
    # render the way the wire encoder does, then parse back
    from bemidb_spark.server.wire import _array_elem

    rendered = "{" + ",".join(
        "NULL" if e is None else _array_elem(e) for e in elems
    ) + "}"
    parsed = parse_pg_array(rendered)
    # "NULL" text is indistinguishable from NULL in pg array literals — both
    # engines share that ambiguity; normalize for comparison
    norm = [None if e == "NULL" else e for e in elems]
    assert parsed == norm

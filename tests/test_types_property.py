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

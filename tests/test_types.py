"""Type-fidelity golden tests over the 41-column fixture.

Mirrors the reference's "Column types" / "Type casts" golden sections
(query_handler_test.go) and FIXTURES.md §1 invariants, at the wire level
where rendering matters (time/interval shims, arrays, bool t/f, bytea).
"""

from __future__ import annotations

import pytest

from bemidb_spark.pgcompat.types import (
    parse_interval,
    parse_pg_array,
    parse_time,
    render_interval,
    render_time,
)
from bemidb_spark.server.wire import WireServer
from bemidb_spark.sources.fixtures import build_test_table, register_test_table
from tests.pg_client import MiniPgClient


# -- pure type-layer units ---------------------------------------------------
def test_interval_roundtrip():
    micros = parse_interval("1 mon 2 days 01:00:01.000001")
    assert micros == (30 + 2) * 86_400_000_000 + 3_601_000_001
    assert render_interval(micros) == "1 months 2 days 3601000001 microseconds"


def test_time_parsing_and_render():
    assert render_time(parse_time("12:00:00.123456")) == "12:00:00.123456"
    assert render_time(parse_time("12:00:00.123")) == "12:00:00.123"
    # timetz normalizes to UTC day-time
    assert render_time(parse_time("12:00:00.123-05")) == "17:00:00.123"
    assert render_time(parse_time("12:00:00.1+05")) == "07:00:00.1"


def test_pg_array_parsing():
    assert parse_pg_array("{one,two,three}") == ["one", "two", "three"]
    assert parse_pg_array("{}") == []
    assert parse_pg_array('{"a b",NULL,"c,d"}') == ["a b", None, "c,d"]
    assert parse_pg_array('{"{\\"key\\": \\"value1\\"}"}') == ['{"key": "value1"}']


# -- fixture through the engine ---------------------------------------------
@pytest.fixture(scope="module")
def fixture_df(spark):
    return register_test_table(spark)


def test_fixture_shape(fixture_df):
    assert len(fixture_df.schema.fields) == 40
    assert fixture_df.count() == 2


def test_fixture_invariants(spark, fixture_df):
    # FIXTURES.md "key query invariants"
    assert spark.sql("SELECT COUNT(DISTINCT id) AS n FROM test_table").collect()[0].n == 2
    assert spark.sql("SELECT ORDER_ROW.id FROM (SELECT id FROM test_table ORDER BY id DESC LIMIT 1) ORDER_ROW").collect()[0].id == 2
    row1 = spark.sql("SELECT * FROM test_table WHERE id = 1").collect()[0]
    assert row1.varchar_column == "varchar"
    assert row1.int8_column == 9223372036854775807
    assert spark.sql(
        "SELECT id FROM test_table WHERE array_contains(array_text_column, 'one')"
    ).collect()[0].id == 1
    assert spark.sql(
        "SELECT get_json_object(jsonb_column, '$.key') AS v FROM test_table WHERE id = 1"
    ).collect()[0].v == "value"
    # NaN preserved (documented deviation from the reference's NaN->0)
    import math

    row2 = spark.sql("SELECT float4_column FROM test_table WHERE id = 2").collect()[0]
    assert math.isnan(row2.float4_column)


# -- wire-level rendering ----------------------------------------------------
@pytest.fixture(scope="module")
def wire_client(spark, fixture_df):
    srv = WireServer(spark)
    srv.start()
    c = MiniPgClient(srv.host, srv.port)
    yield c
    c.close()
    srv.stop()


def test_wire_oids_for_shim_types(wire_client):
    r = wire_client.query(
        "SELECT time_column, interval_column, json_column, bool_column, bytea_column "
        "FROM test_table WHERE id = 1"
    )
    assert r["oids"] == [1083, 1186, 114, 16, 17]


def test_wire_time_and_interval_rendering(wire_client):
    r = wire_client.query(
        "SELECT time_column, timetz_column, interval_column FROM test_table WHERE id = 1"
    )
    assert r["rows"] == [[
        "12:00:00.123456",
        "17:00:00.123456",
        "1 months 2 days 3601000001 microseconds",
    ]]


def test_wire_null_row_rendering(wire_client):
    r = wire_client.query(
        "SELECT varchar_column, int4_column, interval_column, array_text_column "
        "FROM test_table WHERE id = 2"
    )
    assert r["rows"] == [[None, None, None, None]]


def test_wire_bool_bytea_array_rendering(wire_client):
    r = wire_client.query(
        "SELECT bool_column, bytea_column, array_int_column, array_jsonb_column "
        "FROM test_table WHERE id = 1"
    )
    assert r["rows"] == [[
        "t",
        "\\x48656c6c6f",
        "{1,2,3}",
        # CSV-style array-element quoting: embedded quotes double
        # (reference response_handler.go:332-369)
        '{"{""key"": ""value1""}","{""key"": ""value2""}"}',
    ]]


def test_write_path_roundtrip(spark, tmp_path):
    """Fixture survives the real write path (parquet + catalog) losslessly."""
    from bemidb_spark.sources.catalog import Catalog
    from bemidb_spark.sources.writer import read_table, replace_table

    catalog = Catalog(str(tmp_path / "wh"))
    df = build_test_table(spark)
    replace_table(catalog, "postgres", "test_table_rt", df, n_files=1)
    back = read_table(spark, catalog, "postgres", "test_table_rt")
    assert back.count() == 2
    r1 = back.filter("id = 1").collect()[0]
    assert r1.int8_column == 9223372036854775807
    assert int(r1.interval_column) == parse_interval("1 mon 2 days 01:00:01.000001")
    assert r1.array_text_column == ["one", "two", "three"]
    # field metadata (pg_type tags) survives the parquet roundtrip
    meta = {f.name: f.metadata.get("pg_type") for f in back.schema.fields}
    assert meta["time_column"] == "time" and meta["interval_column"] == "interval"

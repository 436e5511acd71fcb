"""DuckDB-as-oracle differential harness.

Mimics the driver's correctness gate: run the Spark query and the oracle SQL on
the same parquet tables, then compare row count, column names, and an
order-insensitive canonical value multiset. Used by the test suite so parity
failures surface locally before the driver's per-round check.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import math

import duckdb
from pyspark.sql import DataFrame

from bemidb_spark.tables import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon(v):
    """Canonicalize one cell so logically-equal values compare equal."""
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # exact: engines must agree bit-for-bit
    if isinstance(v, _decimal.Decimal):
        # Deliberately distinct from float: the driver's pandas canonicalizer
        # hashes Decimal (object dtype) differently from float64, so a
        # Decimal-vs-double divergence must fail locally too, not be masked.
        return "dec:" + str(v)
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, int):
        return repr(v)
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def _rows_multiset(columns: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted("|".join(_canon(r[i]) for i in order) for r in rows)


# DuckDB output types that the driver's pandas canonicalizer hashes
# differently from their Spark counterparts (HUGEINT → object/float, DECIMAL
# → object Decimal). Any oracle producing one is a contract-boundary bug:
# CAST it (BIGINT / DOUBLE) in the oracle SQL. This check exists because the
# class recurred three times (r1 dates, r2 arrays, r3 HUGEINT sums).
_FORBIDDEN_ORACLE_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def check_oracle_dtypes(con: duckdb.DuckDBPyConnection, oracle_sql: str) -> None:
    """Fail if the oracle's output schema contains a driver-hash-unsafe type."""
    desc = con.execute(f"DESCRIBE {oracle_sql}").fetchall()
    bad = [
        (name, typ)
        for name, typ, *_ in desc
        if any(f in typ.upper() for f in _FORBIDDEN_ORACLE_TYPES)
    ]
    assert not bad, (
        f"oracle output has driver-hash-unsafe dtypes {bad}; "
        f"CAST to BIGINT/DOUBLE at the contract boundary"
    )


def compare(spark_df: DataFrame, oracle_sql: str, sf_dir: str) -> None:
    """Assert the Spark result and the DuckDB oracle result are equivalent."""
    from pyspark.sql import types as T

    con = duckdb_connection(sf_dir)
    try:
        check_oracle_dtypes(con, oracle_sql)
        cur = con.execute(oracle_sql)
        oracle_cols = [d[0] for d in cur.description]
        oracle_rows = cur.fetchall()
    finally:
        con.close()

    bad_spark = [
        f.name for f in spark_df.schema.fields if isinstance(f.dataType, T.DecimalType)
    ]
    assert not bad_spark, (
        f"Spark output has DecimalType columns {bad_spark}; the driver's pandas "
        f"canonicalizer hashes Decimal (object dtype) unlike DuckDB's double — "
        f"cast to DOUBLE at the contract boundary"
    )

    spark_cols = spark_df.columns
    spark_rows = [tuple(r) for r in spark_df.collect()]

    assert sorted(spark_cols) == sorted(oracle_cols), (
        f"column mismatch: spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}"
    )
    assert len(spark_rows) == len(oracle_rows), (
        f"row count mismatch: spark={len(spark_rows)} oracle={len(oracle_rows)}"
    )
    s = _rows_multiset(spark_cols, spark_rows)
    o = _rows_multiset(oracle_cols, oracle_rows)
    if s != o:
        diff_s = [r for r in s if r not in set(o)][:5]
        diff_o = [r for r in o if r not in set(s)][:5]
        raise AssertionError(
            f"value mismatch ({sum(1 for a, b in zip(s, o) if a != b)} rows differ)\n"
            f"spark-only (first 5): {diff_s}\noracle-only (first 5): {diff_o}"
        )

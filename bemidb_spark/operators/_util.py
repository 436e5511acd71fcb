"""Shared helpers for oracle-parity-safe aggregation.

Cross-engine value parity rules (Spark vs the DuckDB oracle), established
empirically:

- SUM over DOUBLE is not deterministic under Spark's partition-parallel reduce
  → all money/measure sums are exact DECIMAL sums (order-independent).
- double→decimal CASTs round ties differently (Spark HALF_UP, DuckDB
  HALF_EVEN) → only cast *inputs whose values are clean* (2-decimal prices,
  integral quantities, random-continuous fractions — none sit on a tie), never
  a computed product.
- decimal→decimal ROUND ties go away-from-zero in both engines for positive
  values → rounding an exact decimal SUM is safe.
- decimal×decimal stays exact as long as combined precision ≤ 38 in *both*
  engines (Spark adds +1 precision, DuckDB sums widths) → the casts below are
  sized so a three-factor product keeps precision ≤ 36.

Both sides evaluate the *same SQL text* (Spark via ``F.expr``), so the
expression tree — and therefore every intermediate type — is pinned.

These choices cost nothing at scale: decimal sums are Tungsten-native with
map-side partial aggregation, and the casts are per-row codegen'd expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec_price(col: str) -> str:
    """Exact decimal view of a 2-decimal money column."""
    return f"CAST({col} AS DECIMAL(14,2))"


def dec_qty(col: str) -> str:
    """Exact decimal view of a small integral quantity column."""
    return f"CAST({col} AS DECIMAL(8,2))"


def dec_frac(col: str) -> str:
    """Exact decimal view of a [0,1) fraction column (discount/tax)."""
    return f"CAST({col} AS DECIMAL(8,6))"


# Canonical TPC-H measures, shared verbatim by Spark and the oracle.
DISC_PRICE = f"{dec_price('l_extendedprice')} * (1 - {dec_frac('l_discount')})"
# The widening cast between the two multiplications keeps DuckDB's intermediate
# in int128 (it would otherwise pick an int64-backed DECIMAL(18,8) and overflow);
# it is value-exact on both engines.
CHARGE = f"CAST({DISC_PRICE} AS DECIMAL(26,8)) * (1 + {dec_frac('l_tax')})"
DISC_REV = f"{dec_price('l_extendedprice')} * {dec_frac('l_discount')}"


def sql_dsum(dec_expr: str, alias: str | None = None) -> str:
    """Order-independent decimal SUM → DOUBLE (rounded at 4 decimals)."""
    s = f"CAST(ROUND(SUM({dec_expr}), 4) AS DOUBLE)"
    return f"{s} AS {alias}" if alias else s


def sql_davg(dec_expr: str, alias: str | None = None) -> str:
    """Order-independent decimal AVG → DOUBLE (exact sum / count)."""
    s = f"CAST(ROUND(SUM({dec_expr}), 4) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)"
    return f"{s} AS {alias}" if alias else s


def dsum(dec_expr: str) -> Column:
    """Spark-side twin of :func:`sql_dsum` (same SQL text via ``F.expr``)."""
    return F.expr(sql_dsum(dec_expr))


def davg(dec_expr: str) -> Column:
    """Spark-side twin of :func:`sql_davg`."""
    return F.expr(sql_davg(dec_expr))

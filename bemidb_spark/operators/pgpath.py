"""Driver-oracle entries that exercise the pgcompat ROUTE, not just Spark SQL.

Most registry entries call spark.sql directly; these three run their
statement through ``PgSession.execute`` — transpiler, catalog folding,
grouping compensation and all — so the driver's DuckDB oracle checks the
pg-compatibility path end-to-end (VERDICT r4 next-round #8: features that
existed only as pytest coverage get first-class oracle entries).

Reference parity: the reference routes every client statement through its
query remapper before DuckDB executes it (src/server/query_handler.go); these
entries pin our equivalent route against a real second engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bemidb_spark.tables import register_views

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def _register_pg(name: str, pg_sql: str, duck_sql: str) -> None:
    def run(spark: SparkSession, sf_dir: str, _sql: str = pg_sql) -> DataFrame:
        register_views(spark, sf_dir)
        from bemidb_spark.pgcompat.session import PgSession

        return PgSession(spark).execute(_sql)

    QUERIES[name] = run
    ORACLES[name] = duck_sql


# ---------------------------------------------------------------------------
# E-string literals (pg extended string syntax) through the transpiler.
# The r4 E-string fix (doubled-quote handling) is pinned here against DuckDB
# computing the same bytes from standard literals.
# ---------------------------------------------------------------------------
_register_pg(
    "pg_estring_roundtrip",
    r"""
    SELECT doc_id,
           E'tab\there' AS tabbed,
           E'it''s fine' AS quoted,
           lang || E'\n' AS lang_nl,
           E'back\\slash' AS bs
    FROM documents ORDER BY doc_id LIMIT 50
    """,
    r"""
    SELECT doc_id,
           'tab' || chr(9) || 'here' AS tabbed,
           'it''s fine' AS quoted,
           lang || chr(10) AS lang_nl,
           'back\slash' AS bs
    FROM documents ORDER BY doc_id LIMIT 50
    """,
)

# ---------------------------------------------------------------------------
# WITH RECURSIVE through the pg route (plans/recursive.py iterative-union
# fixpoint on the Spark side; DuckDB runs the genuine recursive CTE) — joined
# against real data so the recursion result binds into a normal agg plan.
# ---------------------------------------------------------------------------
_REC_SQL = """
    WITH RECURSIVE r(rk) AS (
      SELECT CAST(0 AS BIGINT)
      UNION ALL
      SELECT rk + 1 FROM r WHERE rk < 4
    )
    SELECT r.rk, count(*) AS n_nations
    FROM r JOIN nation ON nation.n_regionkey = r.rk
    GROUP BY r.rk ORDER BY r.rk
"""
_register_pg("pg_recursive_cte_route", _REC_SQL, _REC_SQL)

# ---------------------------------------------------------------------------
# Grouping-sets empty-input compensation (closed r4 for analyzable shapes):
# pg and DuckDB emit the folded super-aggregate row for the empty grouping
# set even when the input is EMPTY; plain Spark emits nothing. The pg route
# adds the compensation arm (pgcompat/grouping_comp.py).
# ---------------------------------------------------------------------------
_GS_EMPTY = """
    SELECT o_orderstatus,
           CAST(GROUPING(o_orderstatus) AS INT) AS g,
           count(*) AS n,
           sum(o_totalprice) AS total
    FROM orders WHERE o_orderkey < 0
    GROUP BY ROLLUP (o_orderstatus)
    ORDER BY g, o_orderstatus
"""
_register_pg("pg_grouping_sets_empty", _GS_EMPTY, _GS_EMPTY)

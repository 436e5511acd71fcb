"""TPC-H-derived query battery over the test star schema.

The reference's acceptance benchmark is the 22 TPC-H queries executed by its
embedded engine (reference benchmark/queries.sql:1-2, Makefile:66-68); they are the
capability contract for the SQL surface in SURVEY.md §2.A (joins of every shape,
semi/anti via EXISTS/IN, correlated scalar subqueries, aggregation with HAVING,
CASE, LIKE, top-k, CTEs).

The driver's test schema is a *trimmed* TPC-H (no partsupp, no
commit/receipt dates, no comments/phones), so each query here preserves the
original's **operator shape** against the available columns:

- q2  -> multi-way join + correlated scalar MIN subquery (partsupp replaced by
         the distinct (l_partkey, l_suppkey) pairs of lineitem)
- q4  -> EXISTS semi-join with an interval-shifted date predicate
- q13 -> outer join with ON-clause filter, two-level aggregation
- q16 -> NOT IN anti-join + COUNT(DISTINCT)
- q17 -> correlated scalar AVG subquery
- q21 -> EXISTS + NOT EXISTS correlated self-joins
- q22 -> anti-join + uncorrelated scalar subquery, etc.

Spark-first notes:
- Dimension joins (region/nation) are explicitly ``broadcast()``; supplier/part
  are left to the broadcast threshold + AQE so the *same code* picks
  shuffle-hash/SMJ when those tables are large at 100 TB.
- Aggregates use exact decimal sums built from shared SQL text (see ``_util``)
  — order-independent, so results are stable under any partitioning, and
  Tungsten-native.
- Every LIMIT query carries a unique total order (tie-broken by key) so top-k is
  deterministic across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bemidb_spark.operators._util import (
    CHARGE,
    DISC_PRICE,
    DISC_REV,
    davg,
    dec_frac,
    dec_price,
    dec_qty,
    dsum,
    sql_davg,
    sql_dsum,
)
from bemidb_spark.tables import load_tables, register_views

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def _register(name: str, fn, oracle: str) -> None:
    QUERIES[name] = fn
    ORACLES[name] = oracle


# ---------------------------------------------------------------------------
# q1 — pricing summary report: wide aggregation, 8 aggregates, group-by 2 keys
# (TPC-H Q1; reference benchmark/query-templates/1.sql)
# ---------------------------------------------------------------------------
def q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp_ntz"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(dec_qty("l_quantity")).alias("sum_qty"),
            dsum(dec_price("l_extendedprice")).alias("sum_base_price"),
            dsum(DISC_PRICE).alias("sum_disc_price"),
            dsum(CHARGE).alias("sum_charge"),
            davg(dec_qty("l_quantity")).alias("avg_qty"),
            davg(dec_price("l_extendedprice")).alias("avg_price"),
            davg(dec_frac("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_register(
    "tpch_q1",
    q1,
    f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum(dec_qty("l_quantity"), "sum_qty")},
           {sql_dsum(dec_price("l_extendedprice"), "sum_base_price")},
           {sql_dsum(DISC_PRICE, "sum_disc_price")},
           {sql_dsum(CHARGE, "sum_charge")},
           {sql_davg(dec_qty("l_quantity"), "avg_qty")},
           {sql_davg(dec_price("l_extendedprice"), "avg_price")},
           {sql_davg(dec_frac("l_discount"), "avg_disc")},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)


# ---------------------------------------------------------------------------
# q2 — min-cost supplier: multi-way join + correlated scalar MIN subquery
# (TPC-H Q2 shape; partsupp := SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
# ---------------------------------------------------------------------------
_Q2_SQL = """
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name
    FROM part, ps, supplier, nation, region
    WHERE p_partkey = ps.l_partkey
      AND s_suppkey = ps.l_suppkey
      AND p_size BETWEEN 1 AND 15
      AND p_type = 'STANDARD'
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND s_acctbal = (
        SELECT MIN(s2.s_acctbal)
        FROM ps ps2, supplier s2, nation n2, region r2
        WHERE ps2.l_partkey = p_partkey
          AND s2.s_suppkey = ps2.l_suppkey
          AND s2.s_nationkey = n2.n_nationkey
          AND n2.n_regionkey = r2.r_regionkey
          AND r2.r_name = 'EUROPE'
      )
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
"""


def q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_Q2_SQL)


_register("tpch_q2", q2, _Q2_SQL)


# ---------------------------------------------------------------------------
# q3 — shipping priority: 3-way join, group-by, top-k on aggregated measure
# ---------------------------------------------------------------------------
def q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    cutoff = F.lit("1998-06-15").cast("timestamp_ntz")
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    orders = t["orders"].filter(F.col("o_orderdate") < cutoff)
    li = t["lineitem"].filter(F.col("l_shipdate") > cutoff)
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(DISC_PRICE).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


_register(
    "tpch_q3",
    q3,
    f"""
    SELECT l_orderkey,
           {sql_dsum(DISC_PRICE, "revenue")},
           CAST(o_orderdate AS DATE) AS o_orderdate,
           o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-06-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-06-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)


# ---------------------------------------------------------------------------
# q4 — order priority checking: EXISTS semi-join with interval arithmetic
# ---------------------------------------------------------------------------
def q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    li = t["lineitem"]
    # Catalyst plans a LeftSemi join — the Spark-native EXISTS.
    exists = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 30 DAY")),
        "left_semi",
    )
    return (
        exists.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


_register(
    "tpch_q4",
    q4,
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)


# ---------------------------------------------------------------------------
# q5 — local supplier volume: 6-way join incl. broadcast dims, region filter
# ---------------------------------------------------------------------------
def q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    # region/nation are tiny at any scale factor: force broadcast so the big
    # fact-fact join (orders x lineitem) is the only shuffle in the plan.
    nation = F.broadcast(t["nation"])
    region = F.broadcast(t["region"].filter(F.col("r_name") == "ASIA"))
    return (
        t["customer"]
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(DISC_PRICE).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


_register(
    "tpch_q5",
    q5,
    f"""
    SELECT n_name,
           {sql_dsum(DISC_PRICE, "revenue")}
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)


# ---------------------------------------------------------------------------
# q6 — forecasting revenue change: pure scan + pushed-down range predicates
# ---------------------------------------------------------------------------
def q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(dsum(DISC_REV).alias("revenue"))


_register(
    "tpch_q6",
    q6,
    f"""
    SELECT {sql_dsum(DISC_REV, "revenue")}
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)


# ---------------------------------------------------------------------------
# q7 — volume shipping: dual nation-role join (nation aliased twice), year()
# ---------------------------------------------------------------------------
def q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    n1 = F.broadcast(t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    ))
    n2 = F.broadcast(t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    ))
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31").cast("timestamp_ntz"))
    )
    joined = (
        t["supplier"]
        .join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.withColumn("l_year", F.year("l_shipdate").cast("bigint"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(DISC_PRICE).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_register(
    "tpch_q7",
    q7,
    f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           {sql_dsum(DISC_PRICE, "revenue")}
    FROM supplier, lineitem, orders, customer, nation n1, nation n2
    WHERE s_suppkey = l_suppkey
      AND o_orderkey = l_orderkey
      AND c_custkey = o_custkey
      AND s_nationkey = n1.n_nationkey
      AND c_nationkey = n2.n_nationkey
      AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <= TIMESTAMP '1997-12-31 00:00:00'
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)


# ---------------------------------------------------------------------------
# q8 — national market share: 8-way join + conditional-aggregate ratio
# ---------------------------------------------------------------------------
_Q8_SQL = f"""
    SELECT o_year,
           CAST(ROUND(SUM(CASE WHEN nation = 'NATION_3' THEN volume
                               ELSE CAST(0 AS DECIMAL(14,2)) END), 4) AS DOUBLE)
           / CAST(ROUND(SUM(volume), 4) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             {DISC_PRICE} AS volume,
             n2.n_name AS nation
      FROM part, lineitem, supplier, orders, customer, nation n1, nation n2, region
      WHERE p_partkey = l_partkey
        AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey
        AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey
        AND n1.n_regionkey = r_regionkey
        AND r_name = 'AMERICA'
        AND s_nationkey = n2.n_nationkey
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <= TIMESTAMP '1997-12-31 00:00:00'
        AND p_type = 'ECONOMY'
    ) AS all_nations
    GROUP BY o_year
    ORDER BY o_year
"""


def q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_Q8_SQL)


_register("tpch_q8", q8, _Q8_SQL)


# ---------------------------------------------------------------------------
# q9 — product-type profit: LIKE filter, 5-way join, derived profit measure
# (ps_supplycost is synthesized as 10% of p_retailprice — partsupp is absent)
# ---------------------------------------------------------------------------
_Q9_AMOUNT = (
    f"{DISC_PRICE} - {dec_price('p_retailprice')} * {dec_qty('l_quantity')}"
    " * CAST(0.1 AS DECIMAL(8,6))"
)


def q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    part = t["part"].filter(F.col("p_name").like("%gear%"))
    return (
        part.join(t["lineitem"], F.col("p_partkey") == F.col("l_partkey"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            F.expr(_Q9_AMOUNT).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum("amount").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


_register(
    "tpch_q9",
    q9,
    f"""
    SELECT nation, o_year, {sql_dsum("amount", "sum_profit")}
    FROM (
      SELECT n_name AS nation,
             CAST(year(o_orderdate) AS BIGINT) AS o_year,
             {_Q9_AMOUNT} AS amount
      FROM part, lineitem, supplier, orders, nation
      WHERE p_partkey = l_partkey
        AND s_suppkey = l_suppkey
        AND o_orderkey = l_orderkey
        AND s_nationkey = n_nationkey
        AND p_name LIKE '%gear%'
    ) AS profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)


# ---------------------------------------------------------------------------
# q10 — returned items: 4-way join, group-by 4 keys, top-k
# ---------------------------------------------------------------------------
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    li = t["lineitem"].filter(F.col("l_returnflag") == "R")
    return (
        t["customer"]
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(DISC_PRICE).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


_register(
    "tpch_q10",
    q10,
    f"""
    SELECT c_custkey, c_name, c_acctbal, n_name,
           {sql_dsum(DISC_PRICE, "revenue")}
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)


# ---------------------------------------------------------------------------
# q11 — important stock: GROUP BY + HAVING against uncorrelated scalar subquery
# (partsupp value := sum(l_extendedprice * l_quantity) per part)
# ---------------------------------------------------------------------------
_Q11_VALUE = f"{dec_price('l_extendedprice')} * {dec_qty('l_quantity')}"
_Q11_SQL = f"""
    SELECT l_partkey AS ps_partkey,
           {sql_dsum(_Q11_VALUE, "part_value")}
    FROM lineitem, supplier, nation
    WHERE l_suppkey = s_suppkey
      AND s_nationkey = n_nationkey
      AND n_name = 'NATION_7'
    GROUP BY l_partkey
    HAVING {sql_dsum(_Q11_VALUE)} > (
      SELECT {sql_dsum(_Q11_VALUE)} * 0.001
      FROM lineitem, supplier, nation
      WHERE l_suppkey = s_suppkey
        AND s_nationkey = n_nationkey
        AND n_name = 'NATION_7'
    )
    ORDER BY part_value DESC, ps_partkey
"""


def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_Q11_SQL)


_register("tpch_q11", q11, _Q11_SQL)


# ---------------------------------------------------------------------------
# q12 — shipping modes/priority: conditional counts (FILTER-style aggregates)
# ---------------------------------------------------------------------------
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["orders"]
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


_register(
    "tpch_q12",
    q12,
    """
    SELECT l_linestatus,
           COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')) AS high_line_count,
           COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
)


# ---------------------------------------------------------------------------
# q13 — customer order-count distribution: LEFT OUTER JOIN with ON-filter,
# two-level aggregation
# ---------------------------------------------------------------------------
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    orders = t["orders"].filter(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        t["customer"]
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


_register(
    "tpch_q13",
    q13,
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    ) AS c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)


# ---------------------------------------------------------------------------
# q14 — promotion effect: CASE-in-aggregate ratio over a month of shipments
# ---------------------------------------------------------------------------
_Q14_RATIO = (
    f"100 * CAST(ROUND(SUM(CASE WHEN p_type = 'PROMO' THEN {DISC_PRICE}"
    f" ELSE CAST(0 AS DECIMAL(14,2)) END), 4) AS DOUBLE)"
    f" / CAST(ROUND(SUM({DISC_PRICE}), 4) AS DOUBLE)"
)


def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    return li.join(t["part"], F.col("l_partkey") == F.col("p_partkey")).agg(
        F.expr(_Q14_RATIO).alias("promo_revenue")
    )


_register(
    "tpch_q14",
    q14,
    f"""
    SELECT {_Q14_RATIO} AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
    """,
)


# ---------------------------------------------------------------------------
# q15 — top supplier: CTE + uncorrelated scalar MAX subquery
# ---------------------------------------------------------------------------
_Q15_SQL = f"""
    WITH revenue0 AS (
      SELECT l_suppkey AS supplier_no,
             {sql_dsum(DISC_PRICE, "total_revenue")}
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier, revenue0
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
    ORDER BY s_suppkey
"""


def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_Q15_SQL)


_register("tpch_q15", q15, _Q15_SQL)


# ---------------------------------------------------------------------------
# q16 — parts/supplier relationship: NOT IN anti-join + COUNT(DISTINCT)
# ---------------------------------------------------------------------------
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    ps = t["lineitem"].select("l_partkey", "l_suppkey").distinct()
    part = t["part"].filter(
        (F.col("p_brand") != "Brand#5")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22, 25)
    )
    bad_supp = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        ps.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(bad_supp, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


_register(
    "tpch_q16",
    q16,
    """
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) AS ps
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22, 25)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)


# ---------------------------------------------------------------------------
# q17 — small-quantity-order revenue: correlated scalar AVG subquery
# (AVG over integral double quantities is exact in IEEE754 → engine-portable)
# ---------------------------------------------------------------------------
_Q17_SQL = f"""
    SELECT CAST(ROUND(SUM({dec_price("l_extendedprice")}), 4) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand = 'Brand#12'
      AND l_quantity < (
        SELECT 0.2 * AVG(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey
      )
"""


def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_Q17_SQL)


_register("tpch_q17", q17, _Q17_SQL)


# ---------------------------------------------------------------------------
# q18 — large-volume customers: IN over GROUP BY/HAVING subquery + top-k
# ---------------------------------------------------------------------------
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 250)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        t["orders"]
        .join(big, F.col("o_orderkey") == F.col("big_orderkey"), "left_semi")
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum(dec_qty("l_quantity")).alias("sum_qty"))
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_totalprice", "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


_register(
    "tpch_q18",
    q18,
    f"""
    SELECT c_name, c_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS o_orderdate,
           o_totalprice,
           {sql_dsum(dec_qty("l_quantity"), "sum_qty")}
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
      )
      AND c_custkey = o_custkey
      AND o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)


# ---------------------------------------------------------------------------
# q19 — discounted revenue: disjunction of conjunctive join predicates
# ---------------------------------------------------------------------------
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    j = t["lineitem"].join(t["part"], F.col("p_partkey") == F.col("l_partkey"))
    cond = (
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(cond).agg(dsum(DISC_PRICE).alias("revenue"))


_register(
    "tpch_q19",
    q19,
    f"""
    SELECT {sql_dsum(DISC_PRICE, "revenue")}
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND ((p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
        OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
        OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30))
    """,
)


# ---------------------------------------------------------------------------
# q20 — potential part promotion: nested IN subqueries with GROUP BY/HAVING
# ---------------------------------------------------------------------------
_Q20_SQL = """
    SELECT s_name, s_suppkey
    FROM supplier, nation
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_suppkey
        HAVING SUM(l_quantity) > 100
      )
      AND s_nationkey = n_nationkey
      AND n_name IN ('NATION_3', 'NATION_5', 'NATION_9')
    ORDER BY s_name
"""


def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_Q20_SQL)


_register("tpch_q20", q20, _Q20_SQL)


# ---------------------------------------------------------------------------
# q21 — suppliers who kept orders waiting: EXISTS + NOT EXISTS self-joins
# ("late" := shipped >60 days after the order date; the reference's
# commit/receipt dates do not exist in this schema)
# ---------------------------------------------------------------------------
_Q21_SQL = """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier, lineitem l1, orders, nation, region
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > l1.l_shipdate
      )
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
"""


def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_Q21_SQL)


_register("tpch_q21", q21, _Q21_SQL)


# ---------------------------------------------------------------------------
# q22 — global sales opportunity: anti-join + uncorrelated scalar AVG subquery
# (c_phone country code is synthesized as c_custkey % 10)
# ---------------------------------------------------------------------------
_Q22_SQL = f"""
    SELECT cntrycode, COUNT(*) AS numcust,
           {sql_dsum(dec_price("c_acctbal"), "totacctbal")}
    FROM (
      SELECT CAST(c_custkey % 10 AS BIGINT) AS cntrycode, c_acctbal
      FROM customer
      WHERE c_custkey % 10 IN (1, 3, 5, 7, 9)
        AND c_acctbal > (
          SELECT {sql_davg(dec_price("c_acctbal"))}
          FROM customer WHERE c_acctbal > 0.0
        )
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ) AS custsale
    GROUP BY cntrycode
    ORDER BY cntrycode
"""


def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_Q22_SQL)


_register("tpch_q22", q22, _Q22_SQL)

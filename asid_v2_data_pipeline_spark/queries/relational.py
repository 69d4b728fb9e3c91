"""Relational queries over the TPC-H-ish testdata tables.

These exercise the engine's scan/filter/join/aggregate/sort surface
(SURVEY.md §2.1-§2.3, §2.5, §2.7) on the driver's star schema.  Join
strategy notes are on each query: small dims broadcast; the lineitem side
never shuffles more than once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import load_table


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1-shaped pricing summary.  One scan of lineitem,
    map-side partial aggs, 6-group output."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2024-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 4)                              AS sum_qty,
       ROUND(SUM(l_extendedprice), 4)                         AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4)      AS sum_disc_price,
       ROUND(AVG(l_quantity), 6)                              AS avg_qty,
       ROUND(AVG(l_discount), 6)                              AS avg_disc,
       COUNT(*)                                               AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2024-09-01'
GROUP BY l_returnflag, l_linestatus
"""


def q3_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ orders ⋈ lineitem; customer broadcast (small dim)."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way star join; every dim broadcasts, lineitem shuffles once for
    the final group-by."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q5_SQL = """
SELECT r_name, n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + aggregate over lineitem — the
    predicate-pushdown showcase (all three filters reach the parquet
    scan as PushedFilters; only 4 columns are read — plan-asserted)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q6_SQL = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


def q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → left-semi hash join with a mixed
    equi + range predicate (orders with any lineitem shipped after the
    order date), then priority counts."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional aggregation — per return flag, how
    many lineitems belong to high- vs low-priority orders."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("int")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(high).alias("high_lines"),
            F.sum(1 - high).alias("low_lines"),
        )
        .orderBy("l_returnflag")
    )


Q12_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_lines,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: percentage-of-total — PROMO parts' share of
    revenue (broadcast part dim; single global aggregate)."""
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev), 6).alias(
                "promo_pct"
            ),
            F.round(F.sum(rev), 4).alias("total_revenue"),
        )
    )


Q14_SQL = """
SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                         THEN l_extendedprice * (1 - l_discount)
                         ELSE 0.0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 6) AS promo_pct,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


def _sql_query(spark: SparkSession, sf_dir: str, sql: str, tables: list[str]) -> DataFrame:
    """Run a correlated-subquery query through ``spark.sql`` so Catalyst's
    decorrelation (RewriteCorrelatedScalarSubquery / pull-up) is exercised —
    the DataFrame API can't express the correlation directly.  The same SQL
    text doubles as the DuckDB oracle (both dialects accept it verbatim)."""
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(sql)


# TPC-H Q17 shape (correlated scalar aggregate): parts of one brand whose
# order quantity is below 20% of the part's own average quantity.  Catalyst
# decorrelates the per-part AVG into an aggregate + join — plan-asserted
# (tests/test_plans.py).  No partsupp table in the testdata; lineitem is
# the part-quantity source, as in the classic query.
Q17_SQL = """
SELECT ROUND(SUM(l_extendedprice) / 7.0, 4) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < (SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = p_partkey)
"""


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 — correlated scalar avg per part (decorrelated by
    Catalyst into an aggregated join)."""
    return _sql_query(spark, sf_dir, Q17_SQL, ["lineitem", "part"])


# TPC-H Q18 shape (grouped-HAVING semi-join + top-k): large-quantity
# orders.  The IN subquery becomes a left-semi hash join against the
# HAVING aggregate; the ORDER BY + LIMIT compiles to TakeOrderedAndProject
# (per-partition top-k, never a full global sort) — plan-asserted.
Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       ROUND(SUM(l_quantity), 4) AS sum_qty
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 — grouped HAVING filter feeding a semi-join, top-k tail."""
    return _sql_query(
        spark, sf_dir, Q18_SQL, ["customer", "orders", "lineitem"]
    )


# TPC-H Q20 shape (nested semi-join whose inner block carries a correlated
# scalar aggregate): suppliers who shipped >10% of a red part's all-time
# quantity within 1996 alone.  Two nesting levels: supplier IN (grouped
# lineitem HAVING sum > correlated per-part total).  The testdata has no
# partsupp, so lineitem's (l_partkey, l_suppkey) is the supply relation.
Q20_SQL = """
SELECT s_suppkey, s_name, ROUND(s_acctbal, 4) AS s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem l1 JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE 'red%'
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
  GROUP BY l_partkey, l_suppkey
  HAVING SUM(l_quantity) > (SELECT 0.1 * SUM(l_quantity) FROM lineitem l2
                            WHERE l2.l_partkey = l1.l_partkey))
ORDER BY s_suppkey
"""


def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 — nested semi-join with a correlated aggregate in
    HAVING (decorrelated into aggregated joins — plan-asserted)."""
    return _sql_query(
        spark, sf_dir, Q20_SQL, ["supplier", "lineitem", "part"]
    )


# TPC-H Q2 shape (min-per-group correlated lookup): for each size-15 part,
# the supplier(s) offering its minimum unit price.  The correlated MIN
# decorrelates into a per-part aggregate joined back on equality; double
# division is IEEE-deterministic in both engines, so the equality predicate
# is portable.  The output price is FLOOR(x*1e4) — pure double arithmetic,
# identical in both engines, unlike ROUND (Spark rounds the decimal string
# half-up, DuckDB rounds the binary value: 26.24125 → 26.2412 vs 26.2413).
Q2_SQL = """
SELECT p_partkey, p_name, s_name,
       CAST(FLOOR(ps.unit_price * 10000) AS BIGINT) AS min_unit_price_e4
FROM part
JOIN (SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS unit_price
      FROM lineitem GROUP BY l_partkey, l_suppkey) ps
  ON p_partkey = ps.l_partkey
JOIN supplier ON s_suppkey = ps.l_suppkey
WHERE p_size = 15
  AND ps.unit_price = (SELECT MIN(l_extendedprice / l_quantity)
                       FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
ORDER BY p_partkey, s_name
"""


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 — min-per-group lookup via a correlated scalar MIN."""
    return _sql_query(
        spark, sf_dir, Q2_SQL, ["part", "supplier", "lineitem"]
    )


# TPC-H Q21 shape (EXISTS + NOT EXISTS, both correlated, on the same
# fact table): suppliers who were the ONLY late shipper of a finished
# multi-supplier order ("late" = shipped >60 days after the order date —
# the testdata has no commit/receipt dates).  Catalyst turns the EXISTS
# into a left-semi and the NOT EXISTS into a left-anti hash join.
Q21_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3 JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 — correlated EXISTS + NOT EXISTS (semi- and anti-join
    against the same fact table), top-k tail."""
    return _sql_query(
        spark, sf_dir, Q21_SQL, ["supplier", "lineitem", "orders"]
    )


# TPC-H Q22 shape (uncorrelated scalar subquery + correlated NOT EXISTS):
# above-average-balance customers who never placed an URGENT order
# (every synthetic customer has SOME order, so the classic "no orders at
# all" predicate is vacuous here; the anti-join shape is identical).
Q22_SQL = """
SELECT c_nationkey, COUNT(*) AS n_cust, ROUND(SUM(c_acctbal), 4) AS total_bal
FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 — scalar average subquery feeding an anti-join."""
    return _sql_query(spark, sf_dir, Q22_SQL, ["customer", "orders"])


# TPC-H Q13 shape (outer join + double aggregation): the distribution of
# non-urgent order counts per customer — the LEFT OUTER preserves
# zero-order customers, the join predicate filters before grouping.
Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey) cc
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 — outer join feeding a count histogram."""
    return _sql_query(spark, sf_dir, Q13_SQL, ["customer", "orders"])


# TPC-H Q11 shape (HAVING against an uncorrelated scalar aggregate):
# parts whose total traded value exceeds a fixed fraction of the global
# total (no partsupp table — lineitem value is the inventory surrogate).
Q11_SQL = """
SELECT l_partkey, ROUND(SUM(l_extendedprice * l_quantity), 4) AS part_value
FROM lineitem
GROUP BY l_partkey
HAVING SUM(l_extendedprice * l_quantity) >
       (SELECT 0.0007 * SUM(l_extendedprice * l_quantity) FROM lineitem)
ORDER BY part_value DESC, l_partkey
"""


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 — grouped HAVING vs a global scalar subquery (the
    subquery executes once; Spark plans it as a reused scalar)."""
    return _sql_query(spark, sf_dir, Q11_SQL, ["lineitem"])


# TPC-H Q15 shape (aggregate view + scalar MAX lookup): the top
# supplier(s) by 1996Q1 revenue.
Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, ROUND(total_revenue, 4) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 — CTE revenue view consumed twice (join side + scalar
    MAX); equality on the double is engine-portable because both sides
    aggregate the identical value set."""
    return _sql_query(spark, sf_dir, Q15_SQL, ["supplier", "lineitem"])


# TPC-H Q16 shape (NOT IN subquery + COUNT DISTINCT): supplier variety
# per part group, excluding a name-pattern supplier blocklist.
Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#23' AND p_size IN (1, 5, 9, 15, 25)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%33%')
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 — NOT IN anti-join + COUNT(DISTINCT) (two-phase
    distinct aggregation)."""
    return _sql_query(
        spark, sf_dir, Q16_SQL, ["part", "lineitem", "supplier"]
    )


# TPC-H Q19 shape (disjunction of conjunctive brackets across both join
# sides): Catalyst extracts the common p_partkey equi-condition so the
# OR brackets evaluate as a post-join filter, not a nested loop.
Q19_SQL = """
SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue, COUNT(*) AS n
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 50 AND l_quantity BETWEEN 20 AND 40)
"""


def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 — disjunctive predicate brackets over an equi-join."""
    return _sql_query(spark, sf_dir, Q19_SQL, ["lineitem", "part"])


# TPC-H Q7 shape (nation-pair volume): symmetric disjunctive pair
# predicate over a 6-way join, yearly slices.
Q7_SQL = """
SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 4) AS revenue
FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01') shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 — bidirectional nation-pair shipping volume."""
    return _sql_query(
        spark, sf_dir, Q7_SQL,
        ["supplier", "lineitem", "orders", "customer", "nation"],
    )


# TPC-H Q8 shape (market share): one nation's fraction of regional PROMO
# volume per order year — an 8-way join with a conditional numerator.
Q8_SQL = """
SELECT o_year, ROUND(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                     / SUM(volume), 6) AS mkt_share
FROM (SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'EUROPE' AND p_type = 'PROMO') all_nations
GROUP BY o_year
ORDER BY o_year
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 — market-share ratio over an 8-way star join."""
    return _sql_query(
        spark, sf_dir, Q8_SQL,
        ["part", "lineitem", "supplier", "orders", "customer", "nation", "region"],
    )


# TPC-H Q9 shape (profit by nation/year): LIKE-filtered part dimension,
# profit = discounted revenue minus tax (no partsupp/supplycost in the
# testdata; tax keeps every amount at 4 decimals so the rounded sums
# stay off engine-specific rounding boundaries — a 0.5x cost factor
# would create exact .xxxx5 ties, measured divergent).
Q9_SQL = """
SELECT nation, o_year, ROUND(SUM(amount), 4) AS sum_profit
FROM (SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount) - l_extendedprice * l_tax AS amount
      FROM part JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%green%' OR p_name LIKE '%red%') profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


def q9_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 — product-profit cube by supplier nation and year."""
    return _sql_query(
        spark, sf_dir, Q9_SQL,
        ["part", "lineitem", "supplier", "orders", "nation"],
    )


# TPC-H Q10 shape (returned-item ranking): top-k customers by returned
# revenue in a half-year window.
Q10_SQL = """
SELECT c_custkey, c_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       ROUND(c_acctbal, 4) AS c_acctbal, n_name
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-07-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 — top returns customers (TakeOrderedAndProject tail)."""
    return _sql_query(
        spark, sf_dir, Q10_SQL,
        ["customer", "orders", "lineitem", "nation"],
    )


def s3_incremental_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3/O5 — the unprocessed-set anti-join (ledger pattern,
    archive.py:180-195): orders with no lineitem rows."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_anti")
        .select("o_orderkey", "o_orderstatus")
        .orderBy("o_orderkey")
    )


S3_SQL = """
SELECT o_orderkey, o_orderstatus
FROM orders
WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
ORDER BY o_orderkey
"""


def f2_health_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2/F8 — the health-predicate *shape* (conjunction with a
    greatest() lower bound, archive.py:205-221) over orders-as-scenes."""
    o = load_table(spark, sf_dir, "orders")
    lowerbound = F.greatest(F.lit(50), (F.col("o_custkey") % 100).cast("long"))
    return (
        o.filter(
            (F.col("o_orderstatus") != "F")
            & ((F.col("o_totalprice") / 1000 - lowerbound) >= 10)
        )
        .select("o_orderkey", "o_custkey")
        .orderBy("o_orderkey")
    )


F2_SQL = """
SELECT o_orderkey, o_custkey
FROM orders
WHERE o_orderstatus <> 'F'
  AND (o_totalprice / 1000 - GREATEST(50, o_custkey % 100)) >= 10
ORDER BY o_orderkey
"""


def a4_distinct_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/C5 — distinct prefix extraction (scene_date set,
    apply_model.py:30-32): distinct source prefixes of documents."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            F.split(F.col("source"), "_").getItem(0).alias("src_prefix"),
            F.col("lang"),
        )
        .distinct()
        .orderBy("src_prefix", "lang")
    )


A4_SQL = """
SELECT DISTINCT str_split(source, '_')[1] AS src_prefix, lang
FROM documents
ORDER BY src_prefix, lang
"""


def top10_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1-style sort + limit over an aggregate."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.round(F.sum("o_totalprice"), 4).alias("total_spend"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.col("total_spend").desc(), "o_custkey")
        .limit(10)
    )


TOP10_SQL = """
SELECT o_custkey, ROUND(SUM(o_totalprice), 4) AS total_spend, COUNT(*) AS n_orders
FROM orders
GROUP BY o_custkey
ORDER BY total_spend DESC, o_custkey
LIMIT 10
"""


def j_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction from the events props column."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


JSON_SQL = """
SELECT event_type,
       CAST(SUM(CAST(props->>'$.k' AS INT)) AS BIGINT) AS sum_k,
       COUNT(*) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def j3_id_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — id-list -> sample lookup as a broadcast hash join (the
    reference's O(n*m) linear scan, data_generator.py:71-89, becomes a
    hash join)."""
    e = load_table(spark, sf_dir, "embeddings")
    ids = e.select("vec_id").filter(F.col("vec_id") % 50 == 0)
    return (
        e.join(F.broadcast(ids), "vec_id", "left_semi")
        .select("vec_id", "label")
        .orderBy("vec_id")
    )


J3_SQL = """
SELECT vec_id, label
FROM embeddings
WHERE vec_id % 50 = 0
ORDER BY vec_id
"""


def o2_shuffled_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 — seeded shuffle (epoch reshuffle, data_generator.py:43-47)
    under the full oracle gate: the portable keyed shuffle hash (two LCG
    rounds mod 2^31) gives an engine-independent permutation, and the
    emitted ``rank`` pins the ORDER itself, not just the head-100
    membership."""
    from pyspark.sql.window import Window

    from ..operators.split import shuffle_hash, shuffled

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    out = shuffled(d, seed=42, id_col="doc_id").limit(100)
    return (  # rank re-derived post-limit: the window spans only 100 rows
        out.withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(shuffle_hash(F.col("doc_id").cast("long"), 42), "doc_id"))
            .cast("int"),
        )
        .select("rank", "doc_id", "lang")
        .orderBy("rank")
    )


def _o2_sql() -> str:
    from ..operators.split import shuffle_hash_sql

    h = shuffle_hash_sql("doc_id", 42)
    return f"""
SELECT CAST(row_number() OVER (ORDER BY {h}, doc_id) AS INT) AS rank,
       doc_id, lang
FROM documents
ORDER BY {h}, doc_id
LIMIT 100
"""



def o7_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout key over two part dimensions — the sort
    key behind multi-dimension file clustering (functions/layout.py);
    bit-for-bit mirrored in the oracle."""
    from ..functions.layout import zorder_key

    part = load_table(spark, sf_dir, "part")
    keyed = part.select(
        "p_partkey",
        "p_size",
        zorder_key(
            [F.col("p_partkey"), F.col("p_size")], bits=8
        ).alias("zkey"),
    )
    return keyed.orderBy("zkey", "p_partkey").limit(20)


def _o7_sql() -> str:
    from ..functions.layout import zorder_key_sql

    z = zorder_key_sql(["p_partkey", "p_size"], bits=8)
    return f"""
SELECT p_partkey, p_size, {z} AS zkey
FROM part ORDER BY zkey, p_partkey LIMIT 20
"""


REGISTRY = {
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "j3_id_lookup": (j3_id_lookup, J3_SQL),
    "o2_shuffled_sample": (o2_shuffled_sample, _o2_sql()),
    "o7_zorder_key": (o7_zorder_key, _o7_sql()),
    "q3_order_revenue": (q3_order_revenue, Q3_SQL),
    "q5_nation_revenue": (q5_nation_revenue, Q5_SQL),
    "q6_forecast_revenue": (q6_forecast_revenue, Q6_SQL),
    "q4_priority_check": (q4_priority_check, Q4_SQL),
    "q12_priority_lines": (q12_priority_lines, Q12_SQL),
    "q14_promo_share": (q14_promo_share, Q14_SQL),
    "q17_small_quantity": (q17_small_quantity, Q17_SQL),
    "q18_large_orders": (q18_large_orders, Q18_SQL),
    "q20_dominant_suppliers": (q20_dominant_suppliers, Q20_SQL),
    "q2_min_cost_supplier": (q2_min_cost_supplier, Q2_SQL),
    "q21_waiting_suppliers": (q21_waiting_suppliers, Q21_SQL),
    "q22_idle_rich_customers": (q22_idle_rich_customers, Q22_SQL),
    "q11_important_stock": (q11_important_stock, Q11_SQL),
    "q13_order_distribution": (q13_order_distribution, Q13_SQL),
    "q15_top_supplier": (q15_top_supplier, Q15_SQL),
    "q16_supplier_variety": (q16_supplier_variety, Q16_SQL),
    "q19_bracket_revenue": (q19_bracket_revenue, Q19_SQL),
    "q7_nation_volume": (q7_nation_volume, Q7_SQL),
    "q8_market_share": (q8_market_share, Q8_SQL),
    "q9_nation_profit": (q9_nation_profit, Q9_SQL),
    "q10_returned_items": (q10_returned_items, Q10_SQL),
    "s3_incremental_antijoin": (s3_incremental_antijoin, S3_SQL),
    "f2_health_filter": (f2_health_filter, F2_SQL),
    "a4_distinct_groups": (a4_distinct_groups, A4_SQL),
    "top10_customers": (top10_customers, TOP10_SQL),
    "j_props_json": (j_props_json, JSON_SQL),
}

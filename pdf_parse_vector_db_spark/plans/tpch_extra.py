"""Remaining TPC-H query shapes (SURVEY §2.10 X7) — completes 22/22 coverage.

The reference performs no relational queries (SURVEY §2.3 J2 *absent*); this
module rounds out the engine-breadth suite started in plans/relational.py and
plans/advanced.py with the nine TPC-H shapes not yet covered: Q9, Q10, Q12,
Q14, Q15, Q16, Q17, Q18, Q20. The fixture star schema has no `partsupp`
table and no `l_shipmode`/`l_receiptdate` columns, so those queries are
adapted (cost proxy from `p_retailprice`, ship-delay buckets from
`l_shipdate - o_orderdate`) while keeping the *plan shape* the original
exercises — multi-way fact joins, decorrelated scalar subqueries, semi-join
chains, distinct aggregation with anti-join exclusion.

Scale discipline (100 TB posture), same as plans/relational.py:
  * dimension sides (part, supplier, nation, customer at dim-scale) are
    broadcast — the lineitem scan never shuffles for those joins;
  * fact-fact joins shuffle once on the join key; AQE coalesces/skew-splits;
  * aggregates are partial+final hash aggs (map-side combine);
  * every LIMIT is preceded by a total order with a unique tiebreak so both
    engines pick identical rows;
  * surfaced floats are rounded identically in plan and oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pdf_parse_vector_db_spark.plans.registry import QuerySpec
from pdf_parse_vector_db_spark.sources.registry import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def _disc():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# --------------------------------------------------------------------------
# Q9-shape: product-type profit by nation and year. partsupp is absent, so
# cost = 0.6 * p_retailprice * l_quantity stands in for ps_supplycost —
# the plan shape (5-way join, two broadcast dims, year extraction, two-key
# agg) is what Q9 exercises. part/supplier/nation broadcast; the only
# shuffle is lineitem⋈orders on l_orderkey plus the final 2-key agg.
# --------------------------------------------------------------------------


def profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    pa = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    su = _t(spark, sf_dir, "supplier")
    na = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    # Exact integer ten-thousandths: prices are cents-exact, discounts
    # 2-dec, retailprice 1-dec, quantity integral (verified on the driver
    # data law), so the per-row amount ×1e4 is an exact integer and the
    # group sum is order-independent — a double sum flips the rounded last
    # cent between engines on large skewed groups (found by the round-6
    # skew-corpus oracle sweep).
    ext_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    ret_d = F.round(F.col("p_retailprice") * 10).cast("long")
    qty = F.col("l_quantity").cast("long")
    # ansi: per-row |amount_e4| < 1e10 fits long; decimal(38,0) pre-sum
    amount_e4 = (ext_c * (100 - disc_c) - 600 * ret_d * qty).cast("decimal(38,0)")
    return (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        # ansi: exact decimal sum; cast double only for the final /1e4
        .agg(F.round(F.sum(amount_e4).cast("double") / 1e4, 2).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


PROFIT_BY_NATION_SQL = """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INT) AS o_year,
       round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l_discount * 100) AS BIGINT))
                      - 600 * CAST(round(p_retailprice * 10) AS BIGINT)
                            * CAST(l_quantity AS BIGINT)) AS DOUBLE)
             / 1e4, 2) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, year(o_orderdate)
ORDER BY nation, o_year DESC
"""


# --------------------------------------------------------------------------
# Q10-shape: returned-item reporting — revenue lost to returns per customer
# in one quarter, top 20. customer⋈nation broadcast; orders⋈lineitem is the
# one shuffle; TakeOrderedAndProject caps driver transfer at 20 rows.
# --------------------------------------------------------------------------


def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    na = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cu), orders.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(F.round(F.sum(_disc()), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


RETURNED_ITEM_CUSTOMERS_SQL = """
SELECT c_custkey, c_name, n_name, c_acctbal,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
GROUP BY c_custkey, c_name, n_name, c_acctbal
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --------------------------------------------------------------------------
# Q12-shape: priority counting by ship-delay bucket. The fixture has no
# l_shipmode, so the grouping key is the shipping-delay bucket
# (l_shipdate − o_orderdate); the CASE-conditional counts over
# o_orderpriority are Q12's core. One orders⋈lineitem shuffle + 3-group agg.
# --------------------------------------------------------------------------


def ship_delay_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay < 30, "under_30d")
        .when(delay < 90, "30_to_90d")
        .otherwise("over_90d")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(bucket.alias("delay_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("delay_bucket")
    )


SHIP_DELAY_PRIORITY_SQL = """
SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) < 30 THEN 'under_30d'
            WHEN datediff('day', o_orderdate, l_shipdate) < 90 THEN '30_to_90d'
            ELSE 'over_90d' END AS delay_bucket,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
ORDER BY delay_bucket
"""


# --------------------------------------------------------------------------
# Q14-shape: promotion-revenue share for one month — broadcast part join +
# single global conditional-ratio agg. p_type = 'PROMO' plays the LIKE
# 'PROMO%' class. Result is one row; ratio rounded to 4 dp on both sides.
# --------------------------------------------------------------------------


def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    pa = _t(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", _disc()).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .agg(
            # ansi: _disc() sums positive discounted prices over the month > 0
        F.round(100.0 * F.sum(promo) / F.sum(_disc()), 4).alias("promo_share_pct"),
            F.round(F.sum(_disc()), 2).alias("total_revenue"),
        )
    )


PROMO_REVENUE_SHARE_SQL = """
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_share_pct,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
"""


# --------------------------------------------------------------------------
# Q15-shape: top supplier(s) by quarterly revenue. The revenue CTE is
# aggregated once; the max is taken with a rank() window over the (tiny)
# per-supplier totals instead of a second scan — ties are kept, exactly the
# original's `= max(total_revenue)` semantics.
# --------------------------------------------------------------------------


def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    su = _t(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(F.round(F.sum(_disc()), 2).alias("total_revenue"))
    w = Window.orderBy(F.desc("total_revenue"))
    return (
        rev.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") == 1)
        .drop("rnk")
        .join(F.broadcast(su), F.col("l_suppkey") == su.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


TOP_SUPPLIER_REVENUE_SQL = """
WITH revenue AS (
  SELECT l_suppkey,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# --------------------------------------------------------------------------
# Q16-shape: distinct-supplier counts per part class, excluding suppliers
# from a predicate-defined blocklist. partsupp is absent, so the
# (part, supplier) relation is the distinct pairs observed in lineitem.
# The exclusion is a broadcast anti-join (NOT IN with non-null keys);
# count(DISTINCT) runs as a two-phase partial-distinct agg.
# --------------------------------------------------------------------------


def parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    pa = _t(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#1")
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 1000.0).select("s_suppkey")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(F.broadcast(bad), pairs.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(pa), pairs.l_partkey == pa.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


PARTS_SUPPLIER_COUNTS_SQL = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000.0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# --------------------------------------------------------------------------
# Q17-shape: small-quantity-order revenue. The correlated scalar subquery
# (per-part average quantity) is decorrelated into a groupBy + broadcast
# re-join — the rewrite Catalyst would have to prove; stating it directly
# keeps the fact scan single-pass. Revenue/7 ≅ "avg yearly".
# --------------------------------------------------------------------------


def small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    pa = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg_qty")
    )
    return (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .join(F.broadcast(avg_qty), li.l_partkey == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


SMALL_QTY_REVENUE_SQL = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                    FROM lineitem l2
                    WHERE l2.l_partkey = lineitem.l_partkey)
"""


# --------------------------------------------------------------------------
# Q18-shape: large-volume customers — orders whose total quantity exceeds a
# threshold (HAVING over the order-grain agg), joined back to customer and
# orders. The lineitem agg groups on the join key, so the subsequent join
# reuses the shuffle partitioning; top-20 via TakeOrderedAndProject.
# --------------------------------------------------------------------------


def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy(F.col("l_orderkey").alias("k_orderkey"))
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .filter(F.col("sum_qty") > 170.0)
    )
    return (
        big.join(orders, big.k_orderkey == orders.o_orderkey)
        .join(F.broadcast(cu), orders.o_custkey == cu.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


LARGE_VOLUME_CUSTOMERS_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM (SELECT l_orderkey, round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 170.0) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


# --------------------------------------------------------------------------
# Q20-shape: suppliers with excess shipped stock of a part class — a
# semi-join chain: part class → per-(supp, part) shipped quantity in a
# year → suppliers clearing the threshold → names. Every reduction happens
# before touching the supplier dim; the final join is broadcast.
# --------------------------------------------------------------------------


def excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    pa = _t(spark, sf_dir, "part").filter(F.col("p_name").startswith("blue"))
    su = _t(spark, sf_dir, "supplier")
    na = _t(spark, sf_dir, "nation")
    shipped = (
        li.join(F.broadcast(pa.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50.0)
        .select("l_suppkey")
        .distinct()
    )
    return (
        su.join(shipped, su.s_suppkey == shipped.l_suppkey, "left_semi")
        .join(F.broadcast(na), F.col("s_nationkey") == na.n_nationkey)
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
        .orderBy("s_suppkey")
    )


EXCESS_STOCK_SUPPLIERS_SQL = """
SELECT s_suppkey, s_name, n_name AS nation
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'blue%'
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_suppkey, l_partkey
  HAVING sum(l_quantity) > 50.0)
ORDER BY s_suppkey
"""


QUERIES = [
    QuerySpec(
        "profit_by_nation",
        profit_by_nation,
        PROFIT_BY_NATION_SQL,
        doc="Q9-shape 5-way join profit rollup (cost proxy: no partsupp in fixtures)",
    ),
    QuerySpec(
        "returned_item_customers",
        returned_item_customers,
        RETURNED_ITEM_CUSTOMERS_SQL,
        doc="Q10-shape returned-item revenue top-20",
    ),
    QuerySpec(
        "ship_delay_priority",
        ship_delay_priority,
        SHIP_DELAY_PRIORITY_SQL,
        doc="Q12-shape conditional priority counts by ship-delay bucket",
    ),
    QuerySpec(
        "promo_revenue_share",
        promo_revenue_share,
        PROMO_REVENUE_SHARE_SQL,
        doc="Q14-shape promotion revenue share",
    ),
    QuerySpec(
        "top_supplier_revenue",
        top_supplier_revenue,
        TOP_SUPPLIER_REVENUE_SQL,
        doc="Q15-shape top supplier with tie-keeping max",
    ),
    QuerySpec(
        "parts_supplier_counts",
        parts_supplier_counts,
        PARTS_SUPPLIER_COUNTS_SQL,
        doc="Q16-shape distinct-supplier counts with NOT IN exclusion",
    ),
    QuerySpec(
        "small_qty_revenue",
        small_qty_revenue,
        SMALL_QTY_REVENUE_SQL,
        doc="Q17-shape decorrelated scalar subquery",
    ),
    QuerySpec(
        "large_volume_customers",
        large_volume_customers,
        LARGE_VOLUME_CUSTOMERS_SQL,
        doc="Q18-shape HAVING-gated large orders top-20",
    ),
    QuerySpec(
        "excess_stock_suppliers",
        excess_stock_suppliers,
        EXCESS_STOCK_SUPPLIERS_SQL,
        doc="Q20-shape semi-join chain",
    ),
]

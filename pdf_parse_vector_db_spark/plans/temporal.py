"""Interval analytics: sweep-line concurrency over derived order intervals.

The classic "how many intervals are open at time t" question — capacity
planning, WIP accounting, concurrent-session counting — done the
scale-correct way. The naive formulation is an interval × calendar range
join (O(N·days)); the sweep-line formulation reduces every interval to two
signed endpoint deltas, aggregates deltas per day, and takes one running
sum over the (bounded) calendar spine.

- ``max_open_orders`` — an order is "open" from o_orderdate through the
  day its last lineitem ships; report the maximum number of concurrently
  open orders per month.

Scale shape (100 TB): per-order close dates are one map-side-combined
max over lineitem co-keyed on orderkey; endpoint deltas aggregate to
**one row per calendar day** before any window runs. The running sum's
input is the dense day spine (a few thousand rows for any realistic time
range — bounded by calendar length, NOT by data size), so the
single-partition window is a constant-cost driver-scale step no matter
how many orders exist. The month rollup is a ~100-key aggregate.

The dense spine matters for correctness, not just perf: concurrency is
constant between events, so a month containing no endpoint still has a
well-defined (inherited) level — gap days must exist to carry it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .registry import QuerySpec


def max_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    close = lineitem.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("close"))
    iv = orders.join(
        close, orders.o_orderkey == close.l_orderkey
    ).select(
        F.col("o_orderdate").cast("date").alias("open_d"),
        # the synthetic generator allows shipdates before the order date;
        # clamp so every order is open at least on its order day (an
        # inverted interval would inject spurious −1 days into the sweep)
        F.date_add(
            F.greatest(F.col("o_orderdate").cast("date"), F.col("close").cast("date")), 1
        ).alias("shut_d"),
    )
    deltas = (
        iv.select(F.col("open_d").alias("d"), F.lit(1).alias("delta"))
        .unionAll(iv.select(F.col("shut_d").alias("d"), F.lit(-1).alias("delta")))
        .groupBy("d")
        .agg(F.sum("delta").alias("net"))
    )
    span = deltas.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = span.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("d")
    )
    daily = spine.join(deltas, "d", "left").select(
        "d", F.coalesce(F.col("net"), F.lit(0)).alias("net")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    level = daily.withColumn("open_cnt", F.sum("net").over(w).cast("bigint"))
    return (
        level.groupBy(F.date_format("d", "yyyy-MM").alias("month"))
        .agg(F.max("open_cnt").alias("max_open"))
        .orderBy("month")
    )


MAX_OPEN_ORDERS_SQL = """
WITH close AS (
  SELECT l_orderkey, max(l_shipdate) AS close FROM lineitem GROUP BY l_orderkey
), iv AS (
  SELECT CAST(o.o_orderdate AS DATE) AS open_d,
         greatest(CAST(o.o_orderdate AS DATE), CAST(c.close AS DATE)) + 1 AS shut_d
  FROM orders o JOIN close c ON o.o_orderkey = c.l_orderkey
), deltas AS (
  SELECT d, CAST(sum(delta) AS BIGINT) AS net FROM (
    SELECT open_d AS d, 1 AS delta FROM iv
    UNION ALL
    SELECT shut_d AS d, -1 AS delta FROM iv
  ) GROUP BY d
), spine AS (
  SELECT CAST(unnest(generate_series(
           (SELECT min(d) FROM deltas), (SELECT max(d) FROM deltas),
           INTERVAL 1 DAY)) AS DATE) AS d
), daily AS (
  SELECT s.d, coalesce(x.net, 0) AS net FROM spine s LEFT JOIN deltas x USING (d)
), level AS (
  SELECT d, CAST(sum(net) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS BIGINT) AS open_cnt
  FROM daily
)
SELECT strftime(d, '%Y-%m') AS month, max(open_cnt) AS max_open
FROM level
GROUP BY 1
ORDER BY 1
"""


QUERIES = [
    QuerySpec(
        "max_open_orders",
        max_open_orders,
        MAX_OPEN_ORDERS_SQL,
        "sweep-line max concurrent open orders per month over a dense day spine",
    ),
]

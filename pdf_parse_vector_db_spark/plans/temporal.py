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


_AC_MAX_LAG = 7


def revenue_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1..7 Pearson autocorrelation of daily revenue — the seasonality
    screen run over every metric stream before modeling it.

    Exactness: daily revenue reduces to integer dollars (cents summed as
    BIGINT, then integer-divided), so every Pearson sufficient statistic
    (Σx, Σxy, Σx², n) is an exact integer on both engines; the only float
    math is the final closed-form correlation over those integers —
    identical doubles in, identical 6-dp result out. Never uses a
    float `corr()` aggregate, whose merge order is engine-dependent.

    Scale shape: the corpus-sized work is one (date)-keyed agg with
    map-side partials; the lag window and the 7 sufficient-statistic
    aggregates run on the dense calendar spine (calendar-bounded, a few
    thousand rows), zero-filled so gaps don't silently splice the series.
    """
    orders = load_table(spark, sf_dir, "orders", spread=True)
    daily = (
        orders.groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents")
        )
        .select("d", F.expr("cents div 100").alias("x"))
    )
    span = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = span.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("d")
    )
    series = spine.join(daily, "d", "left").select(
        "d", F.coalesce(F.col("x"), F.lit(0)).alias("x")
    )
    w = Window.orderBy("d")
    lagged = series.select(
        "x", *[F.lag("x", k).over(w).alias(f"y{k}") for k in range(1, _AC_MAX_LAG + 1)]
    )
    stack_expr = ", ".join(
        f"named_struct('lag', {k}, 'x', x, 'y', y{k})" for k in range(1, _AC_MAX_LAG + 1)
    )
    pairs = (
        lagged.select(F.explode(F.expr(f"array({stack_expr})")).alias("s"))
        .select("s.lag", "s.x", "s.y")
        .filter(F.col("y").isNotNull())
    )
    # second moments widen to decimal(38,0) before the sum: daily-revenue
    # squares cross int64 near sf10 (the revenue_changepoint overflow class)
    xd, yd = F.col("x").cast("decimal(19,0)"), F.col("y").cast("decimal(19,0)")
    stats = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((xd * yd).cast("decimal(38,0)")).alias("sxy"),
        F.sum((xd * xd).cast("decimal(38,0)")).alias("sxx"),
        F.sum((yd * yd).cast("decimal(38,0)")).alias("syy"),
    )
    n, sx, sy = [F.col(c).cast("double") for c in ("n", "sx", "sy")]
    sxy, sxx, syy = [F.col(c).cast("double") for c in ("sxy", "sxx", "syy")]
    # try_divide: a constant (zero-variance) series has denominator 0 —
    # r is undefined there; DuckDB's native x/0 is NULL, so both agree
    return stats.select(
        F.col("lag").cast("int").alias("lag"),
        F.col("n").cast("bigint").alias("n"),
        F.round(
            F.try_divide(
                n * sxy - sx * sy,
                F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            ),
            6,
        ).alias("r"),
    ).orderBy("lag")


def _autocorr_sql() -> str:
    lag_cols = ", ".join(
        f"lag(x, {k}) OVER (ORDER BY d) AS y{k}" for k in range(1, _AC_MAX_LAG + 1)
    )
    pair_selects = " UNION ALL ".join(
        f"SELECT {k} AS lag, x, y{k} AS y FROM lagged WHERE y{k} IS NOT NULL"
        for k in range(1, _AC_MAX_LAG + 1)
    )
    return f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) // 100 AS x
  FROM orders GROUP BY 1
), spine AS (
  SELECT CAST(unnest(generate_series(
           (SELECT min(d) FROM daily), (SELECT max(d) FROM daily),
           INTERVAL 1 DAY)) AS DATE) AS d
), series AS (
  SELECT s.d, coalesce(daily.x, 0) AS x FROM spine s LEFT JOIN daily USING (d)
), lagged AS (
  SELECT x, {lag_cols} FROM series
), pairs AS ({pair_selects}),
stats AS (
  SELECT lag,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
  FROM pairs GROUP BY lag
)
SELECT CAST(lag AS INTEGER) AS lag, n,
       round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
             / sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                    * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)), 6) AS r
FROM stats
ORDER BY lag
"""


REVENUE_AUTOCORRELATION_SQL = _autocorr_sql()


def revenue_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation OLS trend of monthly revenue vs month index — grouped
    closed-form linear regression from sufficient statistics, the
    map-reduce regression pattern (one pass collects Σt, Σy, Σty, Σt²
    per group; slope/intercept are O(groups) algebra afterwards).

    Exactness: monthly revenue is integer dollars and the month index is
    a small integer, so all sufficient statistics are exact BIGINTs; the
    closed-form division is the only float step.
    """
    orders = load_table(spark, sf_dir, "orders", spread=True)
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    monthly = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            (
                (F.year("o_orderdate") - F.lit(1992)) * 12
                + F.month("o_orderdate")
                - 1
            ).alias("t"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents")
        )
        .select("nation", "t", F.expr("cents div 100").alias("y"))
    )
    stats = monthly.groupBy("nation").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t").alias("st"),
        F.sum("y").alias("sy"),
        # t <= months-since-1992 (~1e3) and y is per-nation monthly dollars
        # (~1e10 even at sf100) -> t*y <= 1e13, summed over <= 1e3 months
        # per nation <= 1e16 < int64; t*t <= 1e6
        F.sum(F.col("t") * F.col("y")).alias("sty"),  # ansi: bounded, see above
        F.sum(F.col("t") * F.col("t")).alias("stt"),  # ansi: t*t <= 1e6
    )
    n, st, sy = [F.col(c).cast("double") for c in ("n", "st", "sy")]
    sty, stt = [F.col(c).cast("double") for c in ("sty", "stt")]
    # try_divide: a nation with a single month has zero t-variance; slope
    # is undefined -> NULL on both engines (DuckDB x/0 is natively NULL)
    slope = F.try_divide(n * sty - st * sy, n * stt - st * st)
    return stats.select(
        "nation",
        F.col("n").cast("bigint").alias("n_months"),
        F.round(slope, 4).alias("slope"),
        # ansi: n = group count >= 1
        F.round((sy - slope * st) / n, 2).alias("intercept"),
    ).orderBy("nation")


REVENUE_TREND_OLS_SQL = """
WITH monthly AS (
  SELECT n_name AS nation,
         (CAST(year(o_orderdate) AS BIGINT) - 1992) * 12
           + CAST(month(o_orderdate) AS BIGINT) - 1 AS t,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) // 100 AS y
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
), stats AS (
  SELECT nation,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(t) AS BIGINT) AS st, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(t * y) AS BIGINT) AS sty, CAST(sum(t * t) AS BIGINT) AS stt
  FROM monthly GROUP BY nation
)
SELECT nation, n AS n_months,
       round((n * CAST(sty AS DOUBLE) - CAST(st AS DOUBLE) * sy)
             / (n * CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * st), 4) AS slope,
       round((CAST(sy AS DOUBLE)
              - ((n * CAST(sty AS DOUBLE) - CAST(st AS DOUBLE) * sy)
                 / (n * CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * st)) * st)
             / n, 2) AS intercept
FROM stats
ORDER BY nation
"""




def forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of two classical forecasters over monthly revenue —
    seasonal naive (predict month t with month t−12) vs 3-month moving
    average — scored by MAPE. The eval harness every metrics pipeline
    runs before trusting a forecast; here it doubles as a window-lag
    showcase where every number is integer-exact: monthly revenue is
    integer dollars, predictions use integer division, and the per-month
    absolute percentage error is computed in integer milli-units, so the
    final MAPE is identical across engines with no float-summation
    hazard.

    Scale shape: one (month)-keyed agg over orders, ONE window pass over
    the bounded monthly series, and ONE global aggregate computing both
    methods' error sums side by side (NULL lags drop out of count/sum
    naturally); the two report rows come from a `stack` unpivot of that
    single aggregate row — orders is scanned once, where the round-2 shape
    re-derived the monthly series per forecaster leg (the round's slowest
    query at 7.1 s, all scheduling floor).
    """
    orders = load_table(spark, sf_dir, "orders", spread=True)
    monthly = (
        orders.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents")
        )
        .select("month", F.expr("cents div 100").alias("y"))
    )
    w = Window.orderBy("month")
    lagged = monthly.select(
        "month",
        "y",
        F.lag("y", 12).over(w).alias("snaive"),
        ((F.lag("y", 1).over(w) + F.lag("y", 2).over(w) + F.lag("y", 3).over(w)))
        .alias("ma3_sum"),
    ).withColumn("ma3", F.expr("ma3_sum div 3"))
    ape = lambda pred: F.expr(f"abs({pred} - y) * 1000 div y")
    stats = lagged.agg(
        F.count("snaive").cast("bigint").alias("n_sn"),
        F.sum(ape("snaive")).alias("s_sn"),
        F.count("ma3").cast("bigint").alias("n_ma"),
        F.sum(ape("ma3")).alias("s_ma"),
    )
    return (
        stats.select(
            F.expr(
                "stack(2, 'moving_avg_3', n_ma, s_ma, 'seasonal_naive', n_sn, s_sn) "
                "AS (method, n_months, ape_sum)"
            )
        )
        .select(
            "method",
            F.col("n_months").cast("bigint").alias("n_months"),
            F.round(
                F.try_divide(F.col("ape_sum").cast("double"), F.col("n_months")) / 1000.0,
                4,
            ).alias("mape"),
        )
        .orderBy("method")
    )


FORECAST_BACKTEST_SQL = """
WITH monthly AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) // 100 AS y
  FROM orders GROUP BY 1
), lagged AS (
  SELECT month, y,
         lag(y, 12) OVER (ORDER BY month) AS snaive,
         (lag(y, 1) OVER (ORDER BY month) + lag(y, 2) OVER (ORDER BY month)
          + lag(y, 3) OVER (ORDER BY month)) // 3 AS ma3
  FROM monthly
)
SELECT * FROM (
  SELECT 'seasonal_naive' AS method,
         CAST(count(*) AS BIGINT) AS n_months,
         round(CAST(sum(abs(snaive - y) * 1000 // y) AS DOUBLE) / count(*) / 1000.0, 4) AS mape
  FROM lagged WHERE snaive IS NOT NULL
  UNION ALL
  SELECT 'moving_avg_3',
         CAST(count(*) AS BIGINT),
         round(CAST(sum(abs(ma3 - y) * 1000 // y) AS DOUBLE) / count(*) / 1000.0, 4)
  FROM lagged WHERE ma3 IS NOT NULL
)
ORDER BY method
"""


_BT_VALID_AT = "2024-01-15 00:00:00"
_BT_TXN_1 = "2024-01-20 00:00:00"
_BT_TXN_2 = "2024-02-01 00:00:00"


def bitemporal_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal as-of query (Snodgrass's two-axis temporal model,
    public): every fact carries a VALID time (when it was true) and a
    TRANSACTION time (when the warehouse learned it). Here the events
    table plays the changelog: recorded = ts, valid = ts minus a
    deterministic hash lateness (0-2 h), modeling late-arriving facts.
    The query answers "what was each user's state at valid time V" twice
    — as of transaction time T1 and as of T2 — and flags users whose
    answer CHANGED between the two reads: the late-correction impact
    report that tells a pipeline which downstream partitions to restate.

    Scale shape: each as-of leg is one (user)-keyed rank window over the
    doubly-filtered changelog; the compare is a user-keyed outer join of
    the two one-row-per-user legs.
    """
    ev = load_table(spark, sf_dir, "events", spread=True)
    lateness = F.expr(
        "CAST(conv(substring(md5(concat(CAST(event_id AS STRING), ':', "
        "CAST(user_id AS STRING))), 1, 8), 16, 10) AS BIGINT) % 7200"
    )
    base = ev.select(
        "user_id",
        "event_id",
        F.col("event_type").alias("state"),
        F.expr("unix_micros(ts)").alias("recorded_us"),
        (F.expr("unix_micros(ts)") - lateness * 1_000_000).alias("valid_us"),
    )
    v_us = F.expr(f"unix_micros(TIMESTAMP '{_BT_VALID_AT}')")

    def as_of(txn: str, out: str) -> DataFrame:
        t_us = F.expr(f"unix_micros(TIMESTAMP '{txn}')")
        w = Window.partitionBy("user_id").orderBy(
            F.desc("valid_us"), F.desc("recorded_us"), F.desc("event_id")
        )
        return (
            base.filter((F.col("valid_us") <= v_us) & (F.col("recorded_us") <= t_us))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", F.col("state").alias(out))
        )

    t1 = as_of(_BT_TXN_1, "state_t1")
    t2 = as_of(_BT_TXN_2, "state_t2")
    return (
        t1.join(t2, "user_id", "full_outer")
        .select(
            "user_id",
            "state_t1",
            "state_t2",
            (~F.col("state_t1").eqNullSafe(F.col("state_t2"))).alias("restated"),
        )
        .orderBy("user_id")
    )


BITEMPORAL_ASOF_SQL = f"""
WITH base AS (
  SELECT user_id, event_id, event_type AS state,
         epoch_us(ts) AS recorded_us,
         epoch_us(ts) - (('0x' || substring(md5(CAST(event_id AS VARCHAR) || ':' ||
                          CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 7200) * 1000000
           AS valid_us
  FROM events
), t1 AS (
  SELECT user_id, state AS state_t1 FROM (
    SELECT user_id, state,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY valid_us DESC, recorded_us DESC, event_id DESC) AS rn
    FROM base
    WHERE valid_us <= epoch_us(TIMESTAMP '{_BT_VALID_AT}')
      AND recorded_us <= epoch_us(TIMESTAMP '{_BT_TXN_1}')
  ) WHERE rn = 1
), t2 AS (
  SELECT user_id, state AS state_t2 FROM (
    SELECT user_id, state,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY valid_us DESC, recorded_us DESC, event_id DESC) AS rn
    FROM base
    WHERE valid_us <= epoch_us(TIMESTAMP '{_BT_VALID_AT}')
      AND recorded_us <= epoch_us(TIMESTAMP '{_BT_TXN_2}')
  ) WHERE rn = 1
)
SELECT coalesce(t1.user_id, t2.user_id) AS user_id, state_t1, state_t2,
       NOT (state_t1 IS NOT DISTINCT FROM state_t2) AS restated
FROM t1 FULL OUTER JOIN t2 ON t1.user_id = t2.user_id
ORDER BY user_id
"""


def revenue_recognition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accrual revenue recognition: prorate each order's total evenly
    across its open interval (order date through last shipment) and
    compare, per month, BOOKED revenue (all cents at order date) with
    RECOGNIZED revenue (cents spread over delivery) — the deferral
    report every finance pipeline reconciles.

    Integer-exact proration: per-day amount = cents div n_days, with the
    division remainder assigned to the first day, so each order's daily
    pieces sum EXACTLY to its booked cents — the invariant the oracle
    hash enforces globally (Σ booked == Σ recognized).

    Scale shape (round-3 rewrite): the accrual grain is daily, but the
    REPORT grain is monthly — so the explode fans each order into its
    covered MONTHS (1-4 rows), each month's piece = per_day × overlap
    days (+ the remainder in the opening month). Identical cents to the
    day explode, ~30x fewer intermediate rows (order-months, not
    order-days), then the same map-side (month) agg. No windows, no
    joins beyond the order-close lookup.
    """
    orders = load_table(spark, sf_dir, "orders", spread=True)
    lineitem = load_table(spark, sf_dir, "lineitem")
    close = lineitem.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("close"))
    iv = orders.join(close, orders.o_orderkey == close.l_orderkey).select(
        F.col("o_orderdate").cast("date").alias("open_d"),
        F.greatest(
            F.col("o_orderdate").cast("date"), F.col("close").cast("date")
        ).alias("close_d"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    months = iv.select(
        "cents",
        "open_d",
        "close_d",
        (F.datediff("close_d", "open_d") + 1).cast("bigint").alias("n_days"),
        F.explode(
            F.expr("sequence(date_trunc('MONTH', open_d), date_trunc('MONTH', close_d), interval 1 month)")
        ).alias("m"),
    )
    overlap = (
        F.datediff(
            F.least(F.col("close_d"), F.expr("last_day(m)")),
            F.greatest(F.col("open_d"), F.col("m").cast("date")),
        )
        + 1
    ).cast("bigint")
    piece = F.expr("cents div n_days") * overlap + F.when(
        F.expr("date_trunc('MONTH', open_d)") == F.col("m"),
        F.col("cents") % F.col("n_days"),
    ).otherwise(F.lit(0))
    recognized = (
        months.select(F.date_format("m", "yyyy-MM").alias("month"), piece.alias("p"))
        .groupBy("month")
        .agg(F.sum("p").alias("rec_cents"))
    )
    booked = (
        iv.select(F.date_format("open_d", "yyyy-MM").alias("month"), "cents")
        .groupBy("month")
        .agg(F.sum("cents").alias("book_cents"))
    )
    return (
        booked.join(recognized, "month", "full_outer")
        .select(
            "month",
            (F.coalesce(F.col("book_cents"), F.lit(0)) / 100.0).alias("booked"),
            (F.coalesce(F.col("rec_cents"), F.lit(0)) / 100.0).alias("recognized"),
            (
                (
                    F.coalesce(F.col("rec_cents"), F.lit(0))
                    - F.coalesce(F.col("book_cents"), F.lit(0))
                )
                / 100.0
            ).alias("deferral_shift"),
        )
        .orderBy("month")
    )


REVENUE_RECOGNITION_SQL = """
WITH close AS (
  SELECT l_orderkey, max(l_shipdate) AS close FROM lineitem GROUP BY l_orderkey
), iv AS (
  SELECT CAST(o_orderdate AS DATE) AS open_d,
         greatest(CAST(o_orderdate AS DATE), CAST(close AS DATE)) AS close_d,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders JOIN close ON o_orderkey = l_orderkey
), expanded AS (
  SELECT cents, open_d, close_d,
         CAST(date_diff('day', open_d, close_d) + 1 AS BIGINT) AS n_days,
         CAST(unnest(generate_series(date_trunc('month', open_d),
                                     date_trunc('month', close_d),
                                     INTERVAL 1 MONTH)) AS DATE) AS m
  FROM iv
), recognized AS (
  SELECT strftime(m, '%Y-%m') AS month,
         CAST(sum((cents // n_days)
                    * (date_diff('day', greatest(open_d, m),
                                 least(close_d, last_day(m))) + 1)
                  + CASE WHEN date_trunc('month', open_d) = m
                         THEN cents % n_days ELSE 0 END) AS BIGINT)
           AS rec_cents
  FROM expanded GROUP BY 1
), booked AS (
  SELECT strftime(open_d, '%Y-%m') AS month,
         CAST(sum(cents) AS BIGINT) AS book_cents
  FROM iv GROUP BY 1
)
SELECT coalesce(b.month, r.month) AS month,
       coalesce(b.book_cents, 0) / 100.0 AS booked,
       coalesce(r.rec_cents, 0) / 100.0 AS recognized,
       (coalesce(r.rec_cents, 0) - coalesce(b.book_cents, 0)) / 100.0 AS deferral_shift
FROM booked b FULL OUTER JOIN recognized r ON b.month = r.month
ORDER BY month
"""


def revenue_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-changepoint detection in the monthly revenue trend: fit a
    two-segment linear model with the break after month k for EVERY
    candidate k, pick the k minimizing total SSE, and report both
    segment slopes plus the fit improvement over the single-line model —
    the classic structural-break scan (Quandt/Chow family, public).

    Exhaustive over candidates without re-scanning anything: all
    segment statistics derive from CUMULATIVE sums over the bounded
    monthly series (prefix stats via running windows; suffix = total −
    prefix), so the whole scan is O(months) arithmetic after one
    (month)-keyed agg over orders. Integer-exact sufficient statistics;
    SSE compared at 4 dp with a smallest-k tie-break so both engines
    elect the same break.

    Overflow contract (the round-2 sf0.1 bug): monthly revenue y is
    ~2.8e8 at sf0.1, so y^2 ~ 8e16 and its cumulative sum crosses int64
    under ANSI ``addExact``. The quadratic terms (y*y, t*y) are therefore
    widened to decimal(38,0) BEFORE the window sum (exact to 38 digits —
    safe past sf100), mirrored as HUGEINT in the DuckDB oracle; both are
    exact integers, so the double casts downstream stay bit-identical.
    """
    from pyspark.sql.window import Window as W

    orders = load_table(spark, sf_dir, "orders", spread=True)
    monthly = (
        orders.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents")
        )
        .select("month", F.expr("cents div 100").alias("y"))
    )
    wt = W.orderBy("month")
    idx = monthly.withColumn("t", F.row_number().over(wt))
    wc = W.orderBy("t").rowsBetween(W.unboundedPreceding, W.currentRow)
    yd = F.col("y").cast("decimal(19,0)")
    td = F.col("t").cast("decimal(19,0)")
    cum = idx.select(
        "month",
        "t",
        F.sum(F.lit(1)).over(wc).alias("cn"),
        F.sum("t").over(wc).alias("ct"),
        F.sum("y").over(wc).alias("cy"),
        F.sum((td * yd).cast("decimal(38,0)")).over(wc).alias("cty"),
        # ansi: t is a months-index, t*t cumsum <= n^3 ~ 1e9 for 1e3 months
        F.sum(F.col("t") * F.col("t")).over(wc).alias("ctt"),
        F.sum((yd * yd).cast("decimal(38,0)")).over(wc).alias("cyy"),
    )
    tot = cum.orderBy(F.desc("t")).limit(1).select(
        F.col("cn").alias("tn"),
        F.col("ct").alias("tt_"),
        F.col("cy").alias("ty_"),
        F.col("cty").alias("tty"),
        F.col("ctt").alias("ttt"),
        F.col("cyy").alias("tyy"),
    )

    # ansi: both helpers are called only on segments of >= 3 DISTINCT
    # consecutive t values (the t >= 3 / t <= tn-3 candidate filter), so
    # n >= 3 and the t-variance terms sxx / (n*stt - st^2) are strictly
    # positive — no denominator can be zero
    def sse(n, st, sy, sty, stt, syy):
        n, st, sy = n.cast("double"), st.cast("double"), sy.cast("double")
        sty, stt, syy = sty.cast("double"), stt.cast("double"), syy.cast("double")
        sxx = stt - st * st / n  # ansi: n >= 3 (candidate filter)
        sxy = sty - st * sy / n  # ansi: n >= 3 (candidate filter)
        # ansi: sxx > 0 — t values are distinct consecutive integers
        return (syy - sy * sy / n) - sxy * sxy / sxx

    def slope(n, st, sy, sty, stt):
        n, st, sy = n.cast("double"), st.cast("double"), sy.cast("double")
        sty, stt = sty.cast("double"), stt.cast("double")
        # ansi: n*stt - st^2 = n^2 * var(t) > 0 for >= 2 distinct t
        return (n * sty - st * sy) / (n * stt - st * st)

    cand = (
        cum.crossJoin(F.broadcast(tot))
        .filter((F.col("t") >= 3) & (F.col("t") <= F.col("tn") - 3))
        .select(
            "month",
            "t",
            F.round(
                sse(F.col("cn"), F.col("ct"), F.col("cy"), F.col("cty"), F.col("ctt"), F.col("cyy"))
                + sse(
                    F.col("tn") - F.col("cn"),
                    F.col("tt_") - F.col("ct"),
                    F.col("ty_") - F.col("cy"),
                    F.col("tty") - F.col("cty"),
                    F.col("ttt") - F.col("ctt"),
                    F.col("tyy") - F.col("cyy"),
                ),
                4,
            ).alias("sse_two"),
            F.round(slope(F.col("cn"), F.col("ct"), F.col("cy"), F.col("cty"), F.col("ctt")), 4).alias(
                "slope_left"
            ),
            F.round(
                slope(
                    F.col("tn") - F.col("cn"),
                    F.col("tt_") - F.col("ct"),
                    F.col("ty_") - F.col("cy"),
                    F.col("tty") - F.col("cty"),
                    F.col("ttt") - F.col("ctt"),
                ),
                4,
            ).alias("slope_right"),
        )
    )
    best = cand.orderBy(F.asc("sse_two"), F.asc("t")).limit(1)
    single = tot.select(
        F.round(
            sse(F.col("tn"), F.col("tt_"), F.col("ty_"), F.col("tty"), F.col("ttt"), F.col("tyy")),
            4,
        ).alias("sse_one")
    )
    return best.crossJoin(F.broadcast(single)).select(
        F.col("month").alias("break_month"),
        "slope_left",
        "slope_right",
        "sse_two",
        "sse_one",
        F.round(1.0 - F.try_divide(F.col("sse_two"), F.col("sse_one")), 6).alias(
            "sse_reduction"
        ),
    )


REVENUE_CHANGEPOINT_SQL = """
WITH monthly AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) // 100 AS y
  FROM orders GROUP BY 1
), idx AS (
  SELECT month, y, row_number() OVER (ORDER BY month) AS t FROM monthly
), cum AS (
  SELECT month, t,
         CAST(count(*) OVER w AS BIGINT) AS cn,
         CAST(sum(t) OVER w AS BIGINT) AS ct,
         CAST(sum(y) OVER w AS BIGINT) AS cy,
         CAST(sum(CAST(t AS HUGEINT) * y) OVER w AS HUGEINT) AS cty,
         CAST(sum(t * t) OVER w AS BIGINT) AS ctt,
         CAST(sum(CAST(y AS HUGEINT) * y) OVER w AS HUGEINT) AS cyy
  FROM idx
  WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), tot AS (
  SELECT cn AS tn, ct AS tt_, cy AS ty_, cty AS tty, ctt AS ttt, cyy AS tyy
  FROM cum ORDER BY t DESC LIMIT 1
), cand AS (
  SELECT month, t,
         round(
           ((CAST(cyy AS DOUBLE) - CAST(cy AS DOUBLE) * cy / cn)
            - pow(CAST(cty AS DOUBLE) - CAST(ct AS DOUBLE) * cy / cn, 2)
              / (CAST(ctt AS DOUBLE) - CAST(ct AS DOUBLE) * ct / cn))
           + ((CAST(tyy - cyy AS DOUBLE) - CAST(ty_ - cy AS DOUBLE) * (ty_ - cy) / (tn - cn))
              - pow(CAST(tty - cty AS DOUBLE)
                    - CAST(tt_ - ct AS DOUBLE) * (ty_ - cy) / (tn - cn), 2)
                / (CAST(ttt - ctt AS DOUBLE) - CAST(tt_ - ct AS DOUBLE) * (tt_ - ct) / (tn - cn))),
           4) AS sse_two,
         round(((cn * CAST(cty AS DOUBLE) - CAST(ct AS DOUBLE) * cy)
                / (cn * CAST(ctt AS DOUBLE) - CAST(ct AS DOUBLE) * ct)), 4) AS slope_left,
         round((((tn - cn) * CAST(tty - cty AS DOUBLE) - CAST(tt_ - ct AS DOUBLE) * (ty_ - cy))
                / ((tn - cn) * CAST(ttt - ctt AS DOUBLE) - CAST(tt_ - ct AS DOUBLE) * (tt_ - ct))), 4)
           AS slope_right
  FROM cum CROSS JOIN tot
  WHERE t >= 3 AND t <= tn - 3
), best AS (
  SELECT * FROM cand ORDER BY sse_two ASC, t ASC LIMIT 1
), single AS (
  SELECT round((CAST(tyy AS DOUBLE) - CAST(ty_ AS DOUBLE) * ty_ / tn)
               - pow(CAST(tty AS DOUBLE) - CAST(tt_ AS DOUBLE) * ty_ / tn, 2)
                 / (CAST(ttt AS DOUBLE) - CAST(tt_ AS DOUBLE) * tt_ / tn), 4) AS sse_one
  FROM tot
)
SELECT best.month AS break_month, slope_left, slope_right, sse_two, sse_one,
       round(1.0 - sse_two / nullif(sse_one, 0), 6) AS sse_reduction
FROM best CROSS JOIN single
"""


_SES_ALPHAS = (0.2, 0.5, 0.8)
_SES_W = 8


def ses_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple-exponential-smoothing backtest across an alpha grid (Brown
    1956, public), in the single-scan-multi-config style: the forecast
    for month t is the geometrically-weighted mean of the previous 8
    months, ŷ_t = Σ w_j·y_{t−1−j} with w_j ∝ α(1−α)^j normalized over
    the truncated window (the tail beyond 8 lags carries <(1−α)^8 of the
    weight). All three alphas evaluate against the same 8 lag columns —
    one window pass over the bounded monthly series — and report MAPE
    next to forecast_backtest's seasonal-naive/MA3 baselines.

    Determinism: weights are literal doubles, the weighted sum is a
    fixed-order 8-term expression over exact integer lags, and the APE
    rounds to integer milli before averaging.
    """
    from pyspark.sql.window import Window as W

    orders = load_table(spark, sf_dir, "orders", spread=True)
    monthly = (
        orders.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents"))
        .select("month", F.expr("cents div 100").alias("y"))
    )
    w = W.orderBy("month")
    lagged = monthly.select(
        "y", *[F.lag("y", j + 1).over(w).alias(f"l{j}") for j in range(_SES_W)]
    ).filter(F.col(f"l{_SES_W - 1}").isNotNull())
    legs = []
    for a in _SES_ALPHAS:
        ws = [a * (1 - a) ** j for j in range(_SES_W)]
        norm = sum(ws)
        pred = None
        for j, wt in enumerate(ws):
            # ansi: wt/norm is Python constant math; norm = sum of positive weights
            term = F.col(f"l{j}") * F.lit(wt / norm)
            pred = term if pred is None else pred + term
        # ansi: y = a present month's revenue -> >= 1 whole dollar by construction
        ape = F.round(F.abs(pred - F.col("y")) * 1000 / F.col("y")).cast("bigint")
        legs.append(
            lagged.agg(
                F.lit(a).alias("alpha"),
                F.count(F.lit(1)).cast("bigint").alias("n_months"),
                F.round(F.sum(ape).cast("double") / F.count(F.lit(1)) / 1000.0, 4).alias(
                    "mape"
                ),
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionAll(leg)
    return out.orderBy("alpha")


def _ses_sql() -> str:
    lag_cols = ", ".join(
        f"lag(y, {j + 1}) OVER (ORDER BY month) AS l{j}" for j in range(_SES_W)
    )
    legs = []
    for a in _SES_ALPHAS:
        ws = [a * (1 - a) ** j for j in range(_SES_W)]
        norm = sum(ws)
        pred = " + ".join(f"l{j} * {wt / norm!r}" for j, wt in enumerate(ws))
        legs.append(f"""
  SELECT CAST({a} AS DOUBLE) AS alpha,
         CAST(count(*) AS BIGINT) AS n_months,
         round(CAST(sum(CAST(round(abs(({pred}) - y) * 1000 / y) AS BIGINT)) AS DOUBLE)
               / count(*) / 1000.0, 4) AS mape
  FROM lagged WHERE l{_SES_W - 1} IS NOT NULL""")
    return f"""
WITH monthly AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) // 100 AS y
  FROM orders GROUP BY 1
), lagged AS (
  SELECT y, {lag_cols} FROM monthly
)
SELECT * FROM ({" UNION ALL ".join(legs)})
ORDER BY alpha
"""


SES_BACKTEST_SQL = _ses_sql()


QUERIES = [
    QuerySpec(
        "max_open_orders",
        max_open_orders,
        MAX_OPEN_ORDERS_SQL,
        "sweep-line max concurrent open orders per month over a dense day spine",
    ),
    QuerySpec(
        "revenue_autocorrelation",
        revenue_autocorrelation,
        REVENUE_AUTOCORRELATION_SQL,
        "lag-1..7 Pearson autocorrelation from exact integer sufficient statistics",
    ),
    QuerySpec(
        "revenue_trend_ols",
        revenue_trend_ols,
        REVENUE_TREND_OLS_SQL,
        "grouped closed-form OLS trend from one-pass sufficient statistics",
    ),
    QuerySpec(
        "forecast_backtest",
        forecast_backtest,
        FORECAST_BACKTEST_SQL,
        "seasonal-naive vs MA3 MAPE backtest, integer-exact error accounting",
    ),
    QuerySpec(
        "bitemporal_asof",
        bitemporal_asof,
        BITEMPORAL_ASOF_SQL,
        "bitemporal as-of read at two transaction times + restatement flags",
    ),
    QuerySpec(
        "revenue_recognition",
        revenue_recognition,
        REVENUE_RECOGNITION_SQL,
        "interval-prorated accrual vs booked revenue (integer-exact pieces)",
    ),
    QuerySpec(
        "revenue_changepoint",
        revenue_changepoint,
        REVENUE_CHANGEPOINT_SQL,
        "structural-break scan: two-segment OLS over cumulative sufficient statistics",
    ),
    QuerySpec(
        "ses_backtest",
        ses_backtest,
        SES_BACKTEST_SQL,
        "truncated exponential-smoothing MAPE backtest over an alpha grid",
    ),
]

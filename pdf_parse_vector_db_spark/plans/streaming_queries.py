"""Batch twins of the streaming window plans (X8), oracle-checked.

Each query applies a streaming/windows.py plan function to the batch events
table; tests/test_streaming.py re-runs the SAME plan functions under
readStream with a watermark and asserts identical results — that equivalence
is the correctness argument for the streaming tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_parse_vector_db_spark.plans.registry import QuerySpec
from pdf_parse_vector_db_spark.sources.registry import load_table
from pdf_parse_vector_db_spark.streaming import windows as W


def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return W.sliding_counts(ev, "10 minutes", "5 minutes").orderBy("window_start")


# each event falls into exactly duration/slide = 2 windows, whose starts are
# the event's 300s-floor bucket and that bucket minus 300s; epoch arithmetic
# sidesteps engine date_trunc differences and matches Spark's epoch-aligned
# window() origin.
EVENTS_SLIDING_SQL = """
WITH ev AS (
  SELECT CAST(floor(epoch(ts) / 300) AS BIGINT) * 300 AS bucket, value
  FROM events
),
expanded AS (
  SELECT CAST(to_timestamp(bucket - off) AS TIMESTAMP) AS window_start, value
  FROM ev CROSS JOIN (VALUES (0), (300)) AS offs(off)
)
SELECT window_start, count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM expanded
GROUP BY window_start
ORDER BY window_start
"""


def events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return W.session_counts(ev, "30 minutes").orderBy("user_id", "session_start")


# gaps-and-islands: a new session starts when the gap to the previous event
# is >= 30 min (Spark session end = last + gap, end-exclusive merge).
EVENTS_SESSIONS_SQL = """
WITH seq AS (
  SELECT user_id, ts, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
  FROM events
),
marked AS (
  SELECT *,
         CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) >= 1800 THEN 1 ELSE 0 END AS is_new
  FROM seq
),
sessions AS (
  SELECT *,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_start
"""


def events_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return W.tumbling_counts(ev, "1 day").orderBy("window_start")


EVENTS_TUMBLING_DAILY_SQL = """
SELECT CAST(to_timestamp(CAST(floor(epoch(ts) / 86400) AS BIGINT) * 86400) AS TIMESTAMP) AS window_start,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1
ORDER BY 1
"""

def purchase_view_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream attribution join
    (streaming/windows.purchase_view_join): every (purchase, prior view
    within 1 hour, same user) pair. tests/test_streaming.py re-runs the
    SAME plan function under readStream with watermarks on both sides and
    asserts identical pairs — the equivalence that makes this oracle row
    cover the streaming operator too."""
    from pdf_parse_vector_db_spark.streaming.windows import purchase_view_join

    ev = load_table(spark, sf_dir, "events")
    return purchase_view_join(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "view"),
    ).orderBy("purchase_id", "v_ts")


PURCHASE_VIEW_PAIRS_SQL = """
SELECT p.event_id AS purchase_id,
       p.user_id,
       p.ts AS p_ts,
       v.ts AS v_ts
FROM events p
JOIN events v
  ON p.event_type = 'purchase' AND v.event_type = 'view'
 AND p.user_id = v.user_id
 AND v.ts <= p.ts
 AND v.ts >= p.ts - INTERVAL 1 HOUR
ORDER BY purchase_id, v_ts
"""


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-stage funnel over the event log (view → click →
    purchase, each stage strictly after the previous): the product-analytics
    query a behavioral-training pipeline runs to label user trajectories.

    Formulated as three conditional-min aggs, each keyed on user_id — after
    the first exchange every stage is co-partitioned, so at 100 TB this is
    ONE shuffle plus two local join+agg rounds (AQE reuses the
    partitioning). The min-after-min formulation (not an array fold) keeps
    tie semantics (`ts` strictly greater) engine-portable."""
    events = load_table(spark, sf_dir, "events", spread=True)
    t1 = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t1")
    )
    t2 = (
        events.join(t1, on="user_id")
        .filter((F.col("event_type") == "click") & (F.col("ts") > F.col("t1")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    t3 = (
        events.join(t2, on="user_id")
        .filter((F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    per_user = (
        events.select("user_id")
        .distinct()
        .join(t1, on="user_id", how="left")
        .join(t2, on="user_id", how="left")
        .join(t3, on="user_id", how="left")
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("users_total"),
        F.count("t1").alias("users_view"),
        F.count("t2").alias("users_click_after_view"),
        F.count("t3").alias("users_purchase_after_click"),
        F.round(F.count("t3").cast("double") / F.count(F.lit(1)), 6).alias(
            "funnel_rate"
        ),
    )


def events_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-static enrichment join
    (streaming/windows.enrich_with_dim): events enriched with the customer
    dimension's market segment, rolled up per (segment, event_type).

    Scale shape: the dim side broadcasts (re-read per micro-batch in
    streaming, so dimension updates flow through); the event stream never
    shuffles for the join — the only exchange carries the 5×5 rollup
    keys. Value sum is exact integer cents, so the oracle hash can't
    drift on float summation order."""
    ev = load_table(spark, sf_dir, "events", spread=True)
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
    )
    enriched = W.enrich_with_dim(ev, dim)
    return (
        enriched.groupBy("segment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("users"),
            (
                F.sum(F.round(F.col("value") * 100).cast("long")).cast("double") / 100.0
            ).alias("sum_value"),
        )
        .orderBy("segment", "event_type")
    )


EVENTS_BY_SEGMENT_SQL = """
SELECT c.c_mktsegment AS segment, e.event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS users,
       CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
ORDER BY 1, 2
"""


def item_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining over event baskets: items (props.k) seen by
    the same user in the same hour form a basket; pairs with support ≥ 5
    baskets ranked by lift = P(ab)/(P(a)P(b)) — the single-pass pair-count
    core of Apriori/market-basket analysis, the co-occurrence signal
    recommender training data is built from.

    Scale shape: baskets dedup to distinct (user, hour, item) FIRST, so
    the pair self-join is bounded by Σ basket_size² (items-per-basket is
    small by construction), joined on the (user, hour) basket key — never
    an unkeyed cross join. Counts are exact integers; support/lift are
    int ratios, hash-stable."""
    ev = load_table(spark, sf_dir, "events", spread=True)
    items = (
        ev.select(
            "user_id",
            F.floor(F.col("ts").cast("double") / 3600).cast("long").alias("hour"),
            F.get_json_object("props", "$.k").cast("int").alias("item"),
        )
        .filter(F.col("item").isNotNull())
        .distinct()
    )
    baskets = items.select("user_id", "hour").distinct().agg(
        F.count(F.lit(1)).alias("b")
    )
    ic = items.groupBy("item").agg(F.count(F.lit(1)).alias("c"))
    a = items.select("user_id", "hour", F.col("item").alias("item_a"))
    bb = items.select("user_id", "hour", F.col("item").alias("item_b"))
    pc = (
        a.join(bb, on=["user_id", "hour"])
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= 5)
    )
    scored = (
        pc.join(ic.select(F.col("item").alias("item_a"), F.col("c").alias("c_a")), on="item_a")
        .join(ic.select(F.col("item").alias("item_b"), F.col("c").alias("c_b")), on="item_b")
        .crossJoin(F.broadcast(baskets))
        # ansi: b = global basket count — >= 1 whenever a pair row exists
        .withColumn("support", F.round(F.col("c_ab").cast("double") / F.col("b"), 6))
        .withColumn(
            "lift",
            F.round(
                F.col("c_ab").cast("double")
                * F.col("b").cast("double")
                # ansi: c_a/c_b are groupBy counts >= 1 (inner-joined)
                / (F.col("c_a").cast("double") * F.col("c_b").cast("double")),
                4,
            ),
        )
    )
    return (
        scored.select("item_a", "item_b", "c_ab", "c_a", "c_b", "support", "lift")
        .orderBy(F.desc("lift"), "item_a", "item_b")
        .limit(40)
    )


ITEM_COOCCURRENCE_SQL = """
WITH items AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour,
         CAST(json_extract_string(props, '$.k') AS INTEGER) AS item
  FROM events
  WHERE json_extract_string(props, '$.k') IS NOT NULL
),
b AS (SELECT CAST(count(*) AS BIGINT) AS b
      FROM (SELECT DISTINCT user_id, hour FROM items)),
ic AS (SELECT item, CAST(count(*) AS BIGINT) AS c FROM items GROUP BY 1),
pc AS (
  SELECT a.item AS item_a, x.item AS item_b, CAST(count(*) AS BIGINT) AS c_ab
  FROM items a JOIN items x ON a.user_id = x.user_id AND a.hour = x.hour
  WHERE a.item < x.item
  GROUP BY 1, 2
  HAVING count(*) >= 5
)
SELECT p.item_a, p.item_b, p.c_ab, ca.c AS c_a, cb.c AS c_b,
       round(CAST(p.c_ab AS DOUBLE) / b.b, 6) AS support,
       round(CAST(p.c_ab AS DOUBLE) * b.b / (CAST(ca.c AS DOUBLE) * cb.c), 4) AS lift
FROM pc p
JOIN ic ca ON p.item_a = ca.item
JOIN ic cb ON p.item_b = cb.item
CROSS JOIN b
ORDER BY lift DESC, item_a, item_b
LIMIT 40
"""


def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per day (WAU curve): for each calendar
    day, the count of distinct users active in the trailing 7-day window.
    COUNT(DISTINCT) has no sliding-window form in either engine, so the
    scalable shape is the cover-set expansion: dedup to (day, user) FIRST
    (the only corpus-sized agg), then each active-day fans out to the ≤7
    window days it covers — the exchange carries at most 7 × |distinct
    (day, user)| fixed-width rows, never raw events. Days after the last
    event are clipped so the curve ends at the data."""
    ev = load_table(spark, sf_dir, "events", spread=True)
    du = (
        ev.select(
            F.floor(F.col("ts").cast("double") / 86400).cast("long").alias("day"),
            "user_id",
        )
        .distinct()
    )
    last_day = du.agg(F.max("day").alias("last_day"))
    covered = (
        du.crossJoin(F.broadcast(last_day))
        .select(
            F.explode(
                F.sequence(
                    F.col("day"), F.least(F.col("day") + 6, F.col("last_day"))
                )
            ).alias("win_day"),
            "user_id",
        )
        .distinct()
    )
    return (
        covered.groupBy("win_day")
        .agg(F.count(F.lit(1)).alias("wau"))
        .select(F.col("win_day").alias("day"), "wau")
        .orderBy("day")
    )


ROLLING_ACTIVE_USERS_SQL = """
WITH du AS (
  SELECT DISTINCT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day, user_id
  FROM events
),
last_d AS (SELECT max(day) AS last_day FROM du),
covered AS (
  SELECT DISTINCT u.win_day, user_id FROM (
    SELECT unnest(range(day, least(day + 7, (SELECT last_day FROM last_d) + 1))) AS win_day,
           user_id
    FROM du
  ) u
)
SELECT win_day AS day, CAST(count(*) AS BIGINT) AS wau
FROM covered
GROUP BY 1
ORDER BY day
"""


def attribution_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: each purchase's credit splits
    equally across the same user's views in the preceding hour (the
    purchase_view_pairs join), rolled up per view-hour — the
    touchpoint-value table a marketing/behavioral pipeline trains against.

    Determinism: per-(purchase, hour) credit = views_in_hour / n_views is
    rounded to integer micros BEFORE the hour rollup, so fractional
    credits sum identically in both engines. Scale shape: the attribution
    join is the event-time range join (watermark-bounded in streaming);
    everything after aggregates pair-table-sized data."""
    from pyspark.sql import Window

    from pdf_parse_vector_db_spark.streaming.windows import purchase_view_join

    ev = load_table(spark, sf_dir, "events")
    pairs = purchase_view_join(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "view"),
    )
    per_pb = (
        pairs.withColumn(
            "hour", F.floor(F.col("v_ts").cast("double") / 3600).cast("long")
        )
        .groupBy("purchase_id", "hour")
        .agg(F.count(F.lit(1)).alias("k"))
        .withColumn("n", F.sum("k").over(Window.partitionBy("purchase_id")))
        .withColumn(
            "micros",
            # ansi: n = partition sum of k, >= own k >= 1
            F.round(F.col("k").cast("double") / F.col("n") * 1e6).cast("long"),
        )
    )
    return (
        per_pb.groupBy("hour")
        .agg(
            F.count(F.lit(1)).alias("n_purchase_hours"),
            F.round(F.sum("micros").cast("double") / 1e6, 6).alias("credit"),
        )
        .orderBy("hour")
    )


ATTRIBUTION_CREDIT_SQL = """
WITH pairs AS (
  SELECT p.event_id AS purchase_id, p.user_id, p.ts AS p_ts, v.ts AS v_ts
  FROM events p JOIN events v
    ON p.user_id = v.user_id
   AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR
  WHERE p.event_type = 'purchase' AND v.event_type = 'view'
),
per_pb AS (
  SELECT purchase_id,
         CAST(floor(epoch(v_ts) / 3600) AS BIGINT) AS hour,
         CAST(count(*) AS BIGINT) AS k
  FROM pairs
  GROUP BY 1, 2
),
with_n AS (
  SELECT purchase_id, hour, k,
         CAST(sum(k) OVER (PARTITION BY purchase_id) AS BIGINT) AS n
  FROM per_pb
),
credited AS (
  SELECT hour,
         CAST(round(CAST(k AS DOUBLE) / n * 1000000) AS BIGINT) AS micros
  FROM with_n
)
SELECT hour,
       CAST(count(*) AS BIGINT) AS n_purchase_hours,
       round(CAST(sum(micros) AS DOUBLE) / 1000000, 6) AS credit
FROM credited
GROUP BY hour
ORDER BY hour
"""


def dwell_times(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dwell-time distribution: seconds until the user's NEXT event, by
    the type of the current event — the engagement metric behind session
    design (the 30-minute gap constants in events_sessions come from
    exactly this distribution's tail).

    Scale shape: lead() rides the shared (user_id, ts, event_id)
    sessionization sort; percentiles aggregate per event_type (5 groups)
    with Spark's exact percentile ≅ DuckDB quantile_cont (the
    price_percentiles parity convention, round 2)."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events", spread=True)
    seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        events.select(
            "event_type",
            F.col("ts").cast("double").alias("t"),
            F.lead(F.col("ts").cast("double")).over(seq).alias("t_next"),
        )
        .filter(F.col("t_next").isNotNull())
        .select("event_type", (F.col("t_next") - F.col("t")).alias("gap_s"))
    )
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.expr("percentile(gap_s, 0.5)"), 2).alias("p50_s"),
            F.round(F.expr("percentile(gap_s, 0.9)"), 2).alias("p90_s"),
            F.round(F.expr("percentile(gap_s, 0.99)"), 2).alias("p99_s"),
        )
        .orderBy("event_type")
    )


DWELL_TIMES_SQL = """
WITH gaps AS (
  SELECT event_type,
         epoch(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
           - epoch(ts) AS gap_s
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(quantile_cont(gap_s, 0.5), 2) AS p50_s,
       round(quantile_cont(gap_s, 0.9), 2) AS p90_s,
       round(quantile_cont(gap_s, 0.99), 2) AS p99_s
FROM gaps
WHERE gap_s IS NOT NULL
GROUP BY event_type
ORDER BY event_type
"""


def path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern mining: top-20 event-type trigram paths across
    per-user timelines — the path statistics a behavioral model's
    curriculum is sampled from (and the qualitative check that transition
    probabilities compose sensibly beyond first order).

    Scale shape: two lead() columns ride ONE (user_id, ts, event_id)
    sort — the same exchange event_transitions uses; the trigram rollup
    exchanges ≤ |types|³ keys; top-20 is a TakeOrderedAndProject."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events", spread=True)
    seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = (
        events.select(
            F.col("event_type").alias("e1"),
            F.lead("event_type", 1).over(seq).alias("e2"),
            F.lead("event_type", 2).over(seq).alias("e3"),
        )
        .filter(F.col("e3").isNotNull())
        .groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        tri.select(F.concat_ws(">", "e1", "e2", "e3").alias("path"), "n")
        .orderBy(F.desc("n"), "path")
        .limit(20)
    )


PATH_TRIGRAMS_SQL = """
WITH seq AS (
  SELECT event_type AS e1,
         lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
         lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
  FROM events
)
SELECT e1 || '>' || e2 || '>' || e3 AS path, CAST(count(*) AS BIGINT) AS n
FROM seq WHERE e3 IS NOT NULL
GROUP BY 1
ORDER BY n DESC, path
LIMIT 20
"""


def degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite user–item interaction-graph degree distribution: how many
    users touch k distinct items and how many items are touched by k
    distinct users — the sparsity profile read before training any
    recommender/graph model (and the skew check for dup_components-style
    propagation). Output is (side, degree, n) — constant-bounded by the
    max degree, whatever the input size.

    Scale shape: one distinct edge pass; each side is a two-level
    aggregate (edges → per-node degree → per-degree count), all
    partial-agg friendly."""
    ev = load_table(spark, sf_dir, "events", spread=True)
    edges = (
        ev.select(
            "user_id",
            F.get_json_object("props", "$.k").cast("int").alias("item"),
        )
        .filter(F.col("item").isNotNull())
        .distinct()
    )
    udeg = (
        edges.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("degree"))
        .groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("user").alias("side"), "degree", "n")
    )
    ideg = (
        edges.groupBy("item")
        .agg(F.count(F.lit(1)).alias("degree"))
        .groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("item").alias("side"), "degree", "n")
    )
    return udeg.unionAll(ideg).orderBy("side", "degree")


DEGREE_DISTRIBUTION_SQL = """
WITH edges AS (
  SELECT DISTINCT user_id,
         CAST(json_extract_string(props, '$.k') AS INTEGER) AS item
  FROM events
  WHERE json_extract_string(props, '$.k') IS NOT NULL
),
udeg AS (
  SELECT 'user' AS side, degree, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT user_id, CAST(count(*) AS BIGINT) AS degree FROM edges GROUP BY 1)
  GROUP BY 2
),
ideg AS (
  SELECT 'item' AS side, degree, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT item, CAST(count(*) AS BIGINT) AS degree FROM edges GROUP BY 1)
  GROUP BY 2
)
SELECT side, degree, n FROM udeg
UNION ALL
SELECT side, degree, n FROM ideg
ORDER BY side, degree
"""


#: scoring anchor: first instant after the fixture's event window (Jan 2024)
#: — a FIXED anchor keeps the query deterministic and single-scan (a
#: max(ts)-derived anchor would re-derive the events subtree or need a
#: corpus-sized single-partition window)
_DECAY_ANCHOR_EPOCH = 1706745600  # 2024-02-01 00:00:00 UTC
_DECAY_HALF_LIFE_DAYS = 7.0


def decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential time-decay engagement score per user — the classic
    recency-weighted feature every behavioral ranking model consumes:
    score = Σ value · 2^(-age_days / half_life), 7-day half-life.

    Cross-engine determinism: each decayed term rounds to integer micros
    before the sum (both engines evaluate the identical pow/exp argument;
    summation order then can't flip the hash). One scan, one (user_id)
    exchange with map-side partial aggregation."""
    ev = load_table(spark, sf_dir, "events", spread=True)
    # cast-to-double epoch keeps fractional seconds (unix_timestamp truncates
    # to whole seconds and drifts vs DuckDB's epoch())
    # ansi: both denominators are nonzero literals/constants
    age_days = (F.lit(_DECAY_ANCHOR_EPOCH) - F.col("ts").cast("double")) / F.lit(
        86400.0
    )
    # ansi: _DECAY_HALF_LIFE_DAYS is a nonzero module constant
    term = F.col("value") * F.pow(F.lit(2.0), -age_days / F.lit(_DECAY_HALF_LIFE_DAYS))
    return (
        ev.withColumn("micros", F.round(term * 1e6).cast("long"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("micros").cast("double") / 1e6, 4).alias("score"),
        )
        .orderBy("user_id")
    )


DECAYED_ENGAGEMENT_SQL = f"""
WITH t AS (
  SELECT user_id,
         CAST(round(value * pow(2.0, -(({_DECAY_ANCHOR_EPOCH} - epoch(ts)) / 86400.0)
                                     / {_DECAY_HALF_LIFE_DAYS}) * 1000000) AS BIGINT) AS micros
  FROM events
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       round(CAST(sum(micros) AS DOUBLE) / 1000000, 4) AS score
FROM t
GROUP BY user_id
ORDER BY user_id
"""


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences —
    the sequence-model prior a behavioral pipeline estimates before
    training (and the sanity check that sessionized data is ordered
    correctly). P(next | prev) = c(prev→next) / Σ_next c(prev→next).

    Scale shape: lead() needs one (user_id)-keyed exchange and a per-user
    sort — the same partitioning every sessionization query here reuses;
    the transition agg then exchanges only (prev, next) pairs (|types|² ≤
    25 keys), and the row-normalizer is a window over that tiny matrix,
    not a corpus re-scan. Tie-break on (ts, event_id) keeps lead()
    deterministic under duplicate timestamps in both engines."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events", spread=True)
    seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            F.col("event_type").alias("prev"),
            F.lead("event_type").over(seq).alias("next"),
        )
        .filter(F.col("next").isNotNull())
        .groupBy("prev", "next")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    row = Window.partitionBy("prev")
    return (
        pairs.withColumn(
            # ansi: partition sum includes this row's n -> >= 1
            "p", F.round(F.col("n").cast("double") / F.sum("n").over(row), 6)
        )
        .select("prev", "next", "n", "p")
        .orderBy("prev", "next")
    )


EVENT_TRANSITIONS_SQL = """
WITH seq AS (
  SELECT event_type AS prev,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next
  FROM events
),
pairs AS (
  SELECT prev, next, CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE next IS NOT NULL
  GROUP BY 1, 2
)
SELECT prev, next, n,
       round(CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY prev) AS DOUBLE), 6) AS p
FROM pairs
ORDER BY prev, next
"""


FUNNEL_CONVERSION_SQL = """
WITH t1 AS (
  SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS t1
  FROM events GROUP BY 1
),
t2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'click' AND e.ts > t1.t1
  GROUP BY 1
),
t3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > t2.t2
  GROUP BY 1
),
u AS (SELECT DISTINCT user_id FROM events)
SELECT count(*) AS users_total,
       count(t1.t1) AS users_view,
       count(t2.t2) AS users_click_after_view,
       count(t3.t3) AS users_purchase_after_click,
       round(CAST(count(t3.t3) AS DOUBLE) / count(*), 6) AS funnel_rate
FROM u
LEFT JOIN t1 ON u.user_id = t1.user_id
LEFT JOIN t2 ON u.user_id = t2.user_id
LEFT JOIN t3 ON u.user_id = t3.user_id
"""


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7/X8 analytics breadth: weekly cohort retention — users grouped by
    first-seen week, counted in each later activity week, as (cohort_week,
    week_offset, users, pct_of_cohort). The standard growth-analytics
    matrix every event warehouse serves.

    Weeks are integer epoch-week indices (floor(epoch/604800)) rather than
    date_trunc — both engines derive them from the same microsecond
    instants, sidestepping the TIMESTAMP-vs-DATE date_trunc mismatch.
    Shape: per-user min-week agg and the distinct (user, week) activity
    set exchange on the SAME user_id key (co-partitioned join), then a
    small rollup; pct is exact-integer division rounded 4dp."""
    events = load_table(spark, sf_dir, "events")
    week = F.floor(F.unix_timestamp("ts") / 604800).cast("bigint")
    activity = events.select("user_id", week.alias("week")).distinct()
    cohort = activity.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    sizes = cohort.groupBy("cohort_week").agg(
        F.countDistinct("user_id").alias("cohort_size")
    )
    return (
        activity.join(cohort, on="user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.countDistinct("user_id").alias("users"))
        .join(F.broadcast(sizes), on="cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "users",
            # ansi: cohort_size = countDistinct over the cohort's own
            # members (inner join) -> >= 1
            # ansi: cohort_size = countDistinct of the cohort >= 1
            F.round(F.col("users").cast("double") / F.col("cohort_size"), 4).alias(
                "pct_of_cohort"
            ),
        )
        .orderBy("cohort_week", "week_offset")
    )


COHORT_RETENTION_SQL = """
WITH activity AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts) / 604800) AS BIGINT) AS week
  FROM events
),
cohort AS (SELECT user_id, min(week) AS cohort_week FROM activity GROUP BY user_id),
sizes AS (SELECT cohort_week, CAST(count(DISTINCT user_id) AS BIGINT) AS cohort_size
          FROM cohort GROUP BY cohort_week),
ret AS (
  SELECT c.cohort_week, a.week - c.cohort_week AS week_offset,
         CAST(count(DISTINCT a.user_id) AS BIGINT) AS users
  FROM activity a JOIN cohort c USING (user_id)
  GROUP BY 1, 2
)
SELECT r.cohort_week, r.week_offset, r.users,
       round(CAST(r.users AS DOUBLE) / s.cohort_size, 4) AS pct_of_cohort
FROM ret r JOIN sizes s USING (cohort_week)
ORDER BY cohort_week, week_offset
"""


_WM_BUCKET = 4096  # arrival-order bucket width for the two-level prefix max


def watermark_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-policy audit: how out-of-order is the stream, and what
    would a given watermark drop? Lateness of an event = (max event-time
    seen among EARLIER ARRIVALS) - (its own event time), with arrival
    order = event_id. Reports per-type lateness percentiles and the drop
    rate at a 10-minute watermark — the measurement that justifies the
    withWatermark() constants in streaming/windows.py.

    The naive formulation is a running max over one global arrival order —
    a single-partition window. This plan computes the SAME quantity with
    a two-level prefix max that stays parallel at 100 TB: (1) per-bucket
    max over arrival buckets of 4096 events, (2) a prefix max over the
    tiny bucket table, (3) a within-bucket running max; the true running
    max is greatest(prefix of earlier buckets, within-bucket prefix).
    The oracle states the naive global window directly — same values."""
    from pyspark.sql.window import Window as Wd

    ev = (
        load_table(spark, sf_dir, "events", spread=True)
        .select(
            "event_id",
            "event_type",
            F.expr("unix_micros(ts)").alias("us"),
            (F.col("event_id") / _WM_BUCKET).cast("long").alias("b"),
        )
    )
    bucket_max = ev.groupBy("b").agg(F.max("us").alias("bmax"))
    prefix = bucket_max.withColumn(
        "pmax",
        F.max("bmax").over(
            Wd.orderBy("b").rowsBetween(Wd.unboundedPreceding, -1)
        ),
    ).select("b", "pmax")
    within = F.max("us").over(
        Wd.partitionBy("b").orderBy("event_id").rowsBetween(Wd.unboundedPreceding, -1)
    )
    late = (
        ev.withColumn("wmax", within)
        .join(F.broadcast(prefix), on="b")
        .withColumn(
            "late_us",
            F.greatest(
                F.lit(0).cast("long"),
                # greatest() skips NULL sides; NULL-NULL only at the global
                # first arrival, where the clamp lands on 0 anyway
                F.coalesce(F.greatest("wmax", "pmax"), F.lit(0).cast("long"))
                - F.col("us"),
            ),
        )
    )
    return (
        late.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.expr("percentile(late_us, 0.5)") / 1000000.0, 4).alias("p50_late_s"),
            F.round(F.expr("percentile(late_us, 0.95)") / 1000000.0, 4).alias("p95_late_s"),
            F.round(F.max("late_us") / 1000000.0, 4).alias("max_late_s"),
            F.round(
                F.sum(F.when(F.col("late_us") > 600 * 1000000, 1).otherwise(0))
                / F.count(F.lit(1))
                * 100,
                4,
            ).alias("dropped_at_10min_pct"),
        )
        .orderBy("event_type")
    )


WATERMARK_LATENESS_SQL = """
WITH ev AS (
  SELECT event_id, event_type, epoch_us(ts) AS us FROM events
),
w AS (
  SELECT event_type, us,
         greatest(0, coalesce(max(us) OVER (ORDER BY event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     - us) AS late_us
  FROM ev
)
SELECT event_type,
       count(*) AS n,
       round(quantile_cont(late_us, 0.5) / 1000000.0, 4) AS p50_late_s,
       round(quantile_cont(late_us, 0.95) / 1000000.0, 4) AS p95_late_s,
       round(CAST(max(late_us) AS DOUBLE) / 1000000.0, 4) AS max_late_s,
       round(CAST(sum(CASE WHEN late_us > 600000000 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) * 100, 4) AS dropped_at_10min_pct
FROM w
GROUP BY event_type
ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Rolling z-score rate anomalies — the monitoring query a streaming
# pipeline alerts from: per event type, compare each hour's event count to
# the trailing-24h mean/std over a DENSE hourly spine (missing hours count
# as 0 — a silent outage IS an anomaly, which a sparse rollup would hide).
# Mean and variance derive from integer sums (Σx, Σx²) over the ROWS frame,
# so both engines divide the same exact integers — no float-accumulation
# drift reaches the hash. Flagged rows (|z| ≥ 2.5 with a full window)
# bound the result; at scale the hourly pre-agg partial-aggregates
# map-side and the window state per (type) partition is one 24-row frame.
# --------------------------------------------------------------------------

_ANOM_W = 24
_ANOM_Z = 2.5


def hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events", spread=True)
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    span = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    hours = span.select(
        F.explode(F.sequence(F.col("h0"), F.col("h1"), F.expr("interval 1 hour"))).alias("hour")
    )
    spine = ev.select("event_type").distinct().crossJoin(hours)
    dense = spine.join(hourly, on=["event_type", "hour"], how="left").select(
        "event_type", "hour", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
    )
    w = W.partitionBy("event_type").orderBy("hour").rowsBetween(-_ANOM_W, -1)
    stats = dense.select(
        "event_type",
        "hour",
        "cnt",
        F.count(F.lit(1)).over(w).alias("n_w"),
        F.sum("cnt").over(w).alias("s1"),
        # cnt^2 widens to decimal(38,0) before the window sum: hourly counts
        # past ~600M would cross int64 in the 24h sum (changepoint class)
        F.sum(
            (F.col("cnt").cast("decimal(19,0)") * F.col("cnt")).cast("decimal(38,0)")
        ).over(w).alias("s2"),
    ).filter(F.col("n_w") == _ANOM_W)
    mean = F.col("s1").cast("double") / _ANOM_W  # ansi: nonzero constant
    # ansi: _ANOM_W and _ANOM_W - 1 are nonzero constants
    var = (F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1") / _ANOM_W) / (
        _ANOM_W - 1
    )
    # try_divide: a constant 24h window (e.g. 24 gap-filled zero hours) has
    # var = 0 -> z undefined -> NULL, dropped by the |z| filter below just
    # as the oracle's NULL comparison drops it
    z = F.try_divide(F.col("cnt") - mean, F.sqrt(var))
    return (
        stats.withColumn("z", F.round(z, 4))
        .filter((F.abs("z") >= _ANOM_Z) & (var > 0))
        .select("event_type", "hour", "cnt", F.round(mean, 4).alias("mean_24h"), "z")
        .orderBy("event_type", "hour")
    )


HOURLY_ANOMALIES_SQL = f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2),
span AS (
  SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
  FROM events),
hours AS (
  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM span),
spine AS (
  SELECT t.event_type, h.hour
  FROM (SELECT DISTINCT event_type FROM events) t CROSS JOIN hours h),
dense AS (
  SELECT s.event_type, s.hour, coalesce(cnt, 0) AS cnt
  FROM spine s LEFT JOIN hourly USING (event_type, hour)),
stats AS (
  SELECT event_type, hour, cnt,
         count(*) OVER w AS n_w,
         sum(cnt) OVER w AS s1,
         sum(cnt * cnt) OVER w AS s2
  FROM dense
  WINDOW w AS (PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN {_ANOM_W} PRECEDING AND 1 PRECEDING))
SELECT event_type, hour, cnt,
       round(CAST(s1 AS DOUBLE) / {_ANOM_W}, 4) AS mean_24h,
       round((cnt - CAST(s1 AS DOUBLE) / {_ANOM_W})
             / sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / {_ANOM_W})
                    / {_ANOM_W - 1}), 4) AS z
FROM stats
WHERE n_w = {_ANOM_W}
  AND (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / {_ANOM_W}) / {_ANOM_W - 1} > 0
  AND abs(round((cnt - CAST(s1 AS DOUBLE) / {_ANOM_W})
                / sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / {_ANOM_W})
                       / {_ANOM_W - 1}), 4)) >= {_ANOM_Z}
ORDER BY event_type, hour
"""


_DEBOUNCE_GAP_S = 5


def event_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst debouncing: collapse each burst of same-(user, event_type)
    events (consecutive gaps ≤ 5 s) to its first event — the
    double-click / retry-storm cleaner every event pipeline runs before
    counting anything. Gaps-and-islands semantics, NOT a naive
    "drop-if-within-5s-of-previous": an event opens a new burst exactly
    when its gap from the previous event exceeds the threshold, so a long
    chain of 4-second gaps still collapses to ONE kept event.

    Per (event_type): events seen, events kept, drop share. One
    (user_id, event_type) sort-exchange for the lag; the rollup is a
    |types|-key agg.
    """
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events", spread=True)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    us = F.expr("unix_micros(ts)")
    flagged = events.withColumn(
        "is_first",
        (us - F.lag(us).over(w) > _DEBOUNCE_GAP_S * 1_000_000)
        | F.lag("ts").over(w).isNull(),
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("is_first").cast("long")).cast("bigint").alias("n_kept"),
            F.round(
                1.0 - F.sum(F.col("is_first").cast("long")) / F.count(F.lit(1)), 6
            ).alias("drop_share"),
        )
        .orderBy("event_type")
    )


EVENT_DEBOUNCE_SQL = f"""
WITH flagged AS (
  SELECT event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {_DEBOUNCE_GAP_S} * 1000000
              THEN 1 ELSE 0 END AS is_first
  FROM events
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(is_first) AS BIGINT) AS n_kept,
       round(1.0 - CAST(sum(is_first) AS DOUBLE) / count(*), 6) AS drop_share
FROM flagged
GROUP BY event_type
ORDER BY event_type
"""


_CEP_WINDOW_S = 1800


def cep_pattern_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event pattern detection with per-event time bounds — the
    MATCH_RECOGNIZE shape: view → first click within 30 min OF THAT VIEW →
    first purchase within 30 min OF THAT CLICK, per user. Differs from
    funnel_conversion (global conditional mins) because every stage's
    window anchors on the matched predecessor EVENT, not on the user.

    One row: anchors, stage-2 matches, full matches, completion rate.

    Scale shape: both stage joins are user-keyed range joins — after the
    first exchange on user_id everything is co-partitioned, and the range
    predicate bounds the per-user pair fan-out to events within a 30-min
    band (the shipments_in_window bucketing applies verbatim if a band
    join is needed at 100 TB).
    """
    events = load_table(spark, sf_dir, "events", spread=True)
    base = events.select(
        "user_id",
        F.col("event_type").alias("et"),
        F.expr("unix_micros(ts)").alias("s"),
    )
    v = base.filter(F.col("et") == "view").select("user_id", F.col("s").alias("vs"))
    c = base.filter(F.col("et") == "click").select("user_id", F.col("s").alias("cs"))
    p = base.filter(F.col("et") == "purchase").select("user_id", F.col("s").alias("ps"))
    vc = (
        v.join(
            c,
            (v.user_id == c.user_id)
            & (c.cs > v.vs)
            & (c.cs <= v.vs + _CEP_WINDOW_S * 1_000_000),
        )
        .groupBy(v.user_id, "vs")
        .agg(F.min("cs").alias("cs"))
    )
    vcp = (
        vc.join(
            p,
            (vc.user_id == p.user_id)
            & (p.ps > vc.cs)
            & (p.ps <= vc.cs + _CEP_WINDOW_S * 1_000_000),
        )
        .groupBy(vc.user_id, "vs", "cs")
        .agg(F.min("ps").alias("ps"))
    )
    return (
        v.agg(F.count(F.lit(1)).cast("bigint").alias("n_views"))
        .crossJoin(vc.agg(F.count(F.lit(1)).cast("bigint").alias("n_view_click")))
        .crossJoin(vcp.agg(F.count(F.lit(1)).cast("bigint").alias("n_full_match")))
        .select(
            "n_views",
            "n_view_click",
            "n_full_match",
            # try_divide: zero view events -> rate undefined -> NULL on
            # both engines (DuckDB x/0 is natively NULL)
            F.round(
                F.try_divide(F.col("n_full_match"), F.col("n_views").cast("double")), 6
            ).alias("completion_rate"),
        )
    )


CEP_PATTERN_FUNNEL_SQL = f"""
WITH v AS (SELECT user_id, epoch_us(ts) AS vs FROM events WHERE event_type = 'view'),
c AS (SELECT user_id, epoch_us(ts) AS cs FROM events WHERE event_type = 'click'),
p AS (SELECT user_id, epoch_us(ts) AS ps FROM events WHERE event_type = 'purchase'),
vc AS (
  SELECT v.user_id, v.vs, min(c.cs) AS cs
  FROM v JOIN c ON v.user_id = c.user_id
             AND c.cs > v.vs AND c.cs <= v.vs + {_CEP_WINDOW_S} * 1000000
  GROUP BY 1, 2
),
vcp AS (
  SELECT vc.user_id, vc.vs, vc.cs, min(p.ps) AS ps
  FROM vc JOIN p ON vc.user_id = p.user_id
              AND p.ps > vc.cs AND p.ps <= vc.cs + {_CEP_WINDOW_S} * 1000000
  GROUP BY 1, 2, 3
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_views,
       (SELECT CAST(count(*) AS BIGINT) FROM vc) AS n_view_click,
       (SELECT CAST(count(*) AS BIGINT) FROM vcp) AS n_full_match,
       round((SELECT count(*) FROM vcp) * 1.0
             / (SELECT count(*) FROM v), 6) AS completion_rate
"""




def purchase_view_left_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream LEFT OUTER attribution join
    (streaming/windows.purchase_view_left_join): every purchase, paired
    with each prior-hour view OR null-padded when none exists.
    tests/test_streaming.py replays the same plan function under
    readStream with watermarks on both sides (multi-batch, so the
    watermark actually advances) and asserts identical rows — including
    the null-padded ones, which only a correct outer-join state machine
    produces."""
    from pdf_parse_vector_db_spark.streaming.windows import purchase_view_left_join

    ev = load_table(spark, sf_dir, "events")
    return purchase_view_left_join(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "view"),
    ).orderBy("purchase_id", "v_ts")


PURCHASE_VIEW_LEFT_PAIRS_SQL = """
SELECT p.event_id AS purchase_id,
       p.user_id,
       p.ts AS p_ts,
       v.ts AS v_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id
 AND v.ts <= p.ts
 AND v.ts >= p.ts - INTERVAL 1 HOUR
ORDER BY purchase_id, v_ts
"""




_CUPED_SPLIT = "2024-01-16"


def cuped_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experimentation analytics with CUPED variance reduction (Deng,
    Xu, Kohavi & Walker, WSDM 2013 — public): users hash-split into two
    variants; the post-period metric Y is adjusted by the pre-period
    covariate X via theta = cov(X,Y)/var(X), shrinking variance by the
    squared correlation without biasing the treatment effect. One row:
    per-variant means, raw and adjusted z statistics, realized variance
    reduction.

    Exactness: X and Y are integer cents per user; every moment
    (Σx, Σy, Σxy, Σx², Σy², per variant and pooled) is exact — first
    moments in BIGINT, second moments widened to decimal(38,0) BEFORE the
    sum (per-user cents squared crosses int64 once per-user spend exceeds
    ~$30M·√users — the revenue_changepoint overflow class) — so theta,
    the adjusted means, and both z statistics are identical doubles on
    both engines. Scale shape: one (user)-keyed agg over the scan, then
    all algebra on per-variant sufficient statistics — the same one-pass
    pattern as revenue_trend_ols.
    """
    ev = load_table(spark, sf_dir, "events", spread=True)
    per_user = (
        ev.groupBy("user_id")
        .agg(
            # fixed-point cents scaling — int64 holds $92e15 in cents,
            # ansi: far past any per-user total
            F.sum(
                F.when(
                    F.col("ts") < F.lit(_CUPED_SPLIT).cast("timestamp"),
                    F.round(F.col("value") * 100).cast("bigint"),
                ).otherwise(F.lit(0))
            ).alias("x"),
            F.sum(  # ansi: cents scaling, see above
                F.when(
                    F.col("ts") >= F.lit(_CUPED_SPLIT).cast("timestamp"),
                    F.round(F.col("value") * 100).cast("bigint"),
                ).otherwise(F.lit(0))
            ).alias("y"),
        )
        .withColumn(
            "variant",
            F.expr(
                "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 8), 16, 10)"
                " AS BIGINT) % 2"
            ).cast("int"),
        )
    )
    xd, yd = F.col("x").cast("decimal(19,0)"), F.col("y").cast("decimal(19,0)")
    stats = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((xd * yd).cast("decimal(38,0)")).alias("sxy"),
        F.sum((xd * xd).cast("decimal(38,0)")).alias("sxx"),
        F.sum((yd * yd).cast("decimal(38,0)")).alias("syy"),
    )
    pooled = stats.agg(
        F.sum("n").alias("n"),
        F.sum("sx").alias("sx"),
        F.sum("sy").alias("sy"),
        F.sum("sxy").alias("sxy"),
        F.sum("sxx").alias("sxx"),
        F.sum("syy").alias("syy"),
    )
    # theta from pooled moments (double algebra over exact ints);
    # try_divide on theta: zero pre-period variance (every user identical
    # X) makes CUPED undefined -> NULL, matching DuckDB's native x/0
    n, sx, sy = [F.col(c).cast("double") for c in ("n", "sx", "sy")]
    sxy, sxx, syy = [F.col(c).cast("double") for c in ("sxy", "sxx", "syy")]
    th = pooled.select(
        F.try_divide(n * sxy - sx * sy, n * sxx - sx * sx).alias("theta"),
        (sx / n).alias("mx"),  # ansi: n = pooled user count >= 1
        (((n * syy - sy * sy) / n / n)).alias("var_y_pop"),  # ansi: n >= 1
        (((n * sxx - sx * sx) / n / n)).alias("var_x_pop"),  # ansi: n >= 1
        ((n * sxy - sx * sy) / n / n).alias("cov_xy_pop"),  # ansi: n >= 1
    )
    j = stats.crossJoin(F.broadcast(th))
    per_var = j.select(
        "variant",
        F.col("n").cast("bigint").alias("nv"),
        # ansi: n = per-variant group count >= 1 (mean_y / mean_y_adj);
        # try_divide on the sample variances: a single-user variant has
        # n-1 = 0 -> variance undefined -> NULL on both engines
        (F.col("sy").cast("double") / F.col("n")).alias("mean_y"),  # ansi: n >= 1
        (
            (F.col("sy").cast("double") - F.col("theta") * (F.col("sx").cast("double") - F.col("n") * F.col("mx")))
            / F.col("n")  # ansi: n >= 1
        ).alias("mean_y_adj"),
        F.try_divide(
            F.col("n").cast("double") * F.col("syy") - F.col("sy").cast("double") * F.col("sy"),
            F.col("n").cast("double") * (F.col("n") - 1),
        ).alias("var_y"),
        F.try_divide(
            (
                F.col("n").cast("double") * F.col("syy")
                - F.col("sy").cast("double") * F.col("sy")
                - 2 * F.col("theta") * (F.col("n").cast("double") * F.col("sxy") - F.col("sx").cast("double") * F.col("sy"))
                + F.col("theta") * F.col("theta")
                * (F.col("n").cast("double") * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
            ),
            F.col("n").cast("double") * (F.col("n") - 1),
        ).alias("var_y_adj"),
        "theta",
        "var_y_pop",
        "cov_xy_pop",
        "var_x_pop",
    )
    a = per_var.filter(F.col("variant") == 0).alias("a")
    b = per_var.filter(F.col("variant") == 1).alias("b")
    return a.crossJoin(b).select(
        F.col("a.nv").alias("n_a"),
        F.col("b.nv").alias("n_b"),
        F.round(F.col("a.theta"), 6).alias("theta"),
        F.round((F.col("b.mean_y") - F.col("a.mean_y")) / 100.0, 4).alias("diff_raw"),
        F.round((F.col("b.mean_y_adj") - F.col("a.mean_y_adj")) / 100.0, 4).alias("diff_adj"),
        # try_divide on both z statistics and the ratio: degenerate inputs
        # (zero variance, single-user variant) make them undefined -> NULL
        # on both engines; nv >= 1 in the inner var/nv terms
        F.round(
            F.try_divide(
                F.col("b.mean_y") - F.col("a.mean_y"),
                # ansi: nv = variant group count >= 1
                F.sqrt(F.col("a.var_y") / F.col("a.nv") + F.col("b.var_y") / F.col("b.nv")),
            ),
            4,
        ).alias("z_raw"),
        F.round(
            F.try_divide(
                F.col("b.mean_y_adj") - F.col("a.mean_y_adj"),
                F.sqrt(
                    # ansi: nv = variant group count >= 1
                    F.col("a.var_y_adj") / F.col("a.nv") + F.col("b.var_y_adj") / F.col("b.nv")
                ),
            ),
            4,
        ).alias("z_adj"),
        F.round(
            1.0
            - F.try_divide(
                F.col("a.cov_xy_pop") * F.col("a.cov_xy_pop"),
                F.col("a.var_x_pop") * F.col("a.var_y_pop"),
            ),
            6,
        ).alias("var_ratio_theory"),
    )


CUPED_AB_TEST_SQL = f"""
WITH per_user AS (
  SELECT user_id,
         CAST(sum(CASE WHEN ts < TIMESTAMP '{_CUPED_SPLIT}'
                       THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
         CAST(sum(CASE WHEN ts >= TIMESTAMP '{_CUPED_SPLIT}'
                       THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y,
         CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2 AS INTEGER) AS variant
  FROM events GROUP BY user_id
), stats AS (
  SELECT variant, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
  FROM per_user GROUP BY variant
), pooled AS (
  SELECT CAST(sum(n) AS BIGINT) AS n, CAST(sum(sx) AS BIGINT) AS sx,
         CAST(sum(sy) AS BIGINT) AS sy, CAST(sum(sxy) AS BIGINT) AS sxy,
         CAST(sum(sxx) AS BIGINT) AS sxx, CAST(sum(syy) AS BIGINT) AS syy
  FROM stats
), th AS (
  SELECT (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
           / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx) AS theta,
         CAST(sx AS DOUBLE) / n AS mx,
         (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy) / n / n AS var_y_pop,
         (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx) / n / n AS var_x_pop,
         (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy) / n / n AS cov_xy_pop
  FROM pooled
), per_var AS (
  SELECT variant, n AS nv,
         CAST(sy AS DOUBLE) / n AS mean_y,
         (CAST(sy AS DOUBLE) - th.theta * (CAST(sx AS DOUBLE) - n * th.mx)) / n AS mean_y_adj,
         (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)
           / (CAST(n AS DOUBLE) * (n - 1)) AS var_y,
         (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy
          - 2 * th.theta * (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
          + th.theta * th.theta * (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx))
           / (CAST(n AS DOUBLE) * (n - 1)) AS var_y_adj,
         th.theta, th.var_y_pop, th.var_x_pop, th.cov_xy_pop
  FROM stats CROSS JOIN th
)
SELECT a.nv AS n_a, b.nv AS n_b,
       round(a.theta, 6) AS theta,
       round((b.mean_y - a.mean_y) / 100.0, 4) AS diff_raw,
       round((b.mean_y_adj - a.mean_y_adj) / 100.0, 4) AS diff_adj,
       round((b.mean_y - a.mean_y)
             / sqrt(a.var_y / a.nv + b.var_y / b.nv), 4) AS z_raw,
       round((b.mean_y_adj - a.mean_y_adj)
             / sqrt(a.var_y_adj / a.nv + b.var_y_adj / b.nv), 4) AS z_adj,
       round(1.0 - (a.cov_xy_pop * a.cov_xy_pop)
                   / (a.var_x_pop * a.var_y_pop), 6) AS var_ratio_theory
FROM (SELECT * FROM per_var WHERE variant = 0) a
CROSS JOIN (SELECT * FROM per_var WHERE variant = 1) b
"""


QUERIES = [
    QuerySpec("hourly_anomalies", hourly_anomalies, HOURLY_ANOMALIES_SQL, "rolling z-score rate anomalies over the dense hourly spine"),
    QuerySpec("event_debounce", event_debounce, EVENT_DEBOUNCE_SQL, "gaps-and-islands burst debouncing per (user, type)"),
    QuerySpec("cep_pattern_funnel", cep_pattern_funnel, CEP_PATTERN_FUNNEL_SQL, "MATCH_RECOGNIZE-shape time-anchored pattern funnel"),
    QuerySpec("cuped_ab_test", cuped_ab_test, CUPED_AB_TEST_SQL, "CUPED variance-reduced A/B analysis from exact integer moments"),
    QuerySpec("cohort_retention", cohort_retention, COHORT_RETENTION_SQL, "X7 weekly cohort retention matrix"),
    QuerySpec("funnel_conversion", funnel_conversion, FUNNEL_CONVERSION_SQL, "ordered 3-stage funnel (conditional-min formulation)"),
    QuerySpec("event_transitions", event_transitions, EVENT_TRANSITIONS_SQL, "first-order Markov transition matrix"),
    QuerySpec("events_by_segment", events_by_segment, EVENTS_BY_SEGMENT_SQL, "stream-static dim enrichment (batch twin)"),
    QuerySpec("decayed_engagement", decayed_engagement, DECAYED_ENGAGEMENT_SQL, "exponential time-decay engagement feature"),
    QuerySpec("item_cooccurrence", item_cooccurrence, ITEM_COOCCURRENCE_SQL, "market-basket support/lift pair mining"),
    QuerySpec("degree_distribution", degree_distribution, DEGREE_DISTRIBUTION_SQL, "bipartite interaction-graph degree profile"),
    QuerySpec("path_trigrams", path_trigrams, PATH_TRIGRAMS_SQL, "top event-type trigram paths"),
    QuerySpec("dwell_times", dwell_times, DWELL_TIMES_SQL, "inter-event dwell-time percentiles"),
    QuerySpec("attribution_credit", attribution_credit, ATTRIBUTION_CREDIT_SQL, "linear multi-touch attribution rollup"),
    QuerySpec("rolling_active_users", rolling_active_users, ROLLING_ACTIVE_USERS_SQL, "rolling 7-day distinct actives (WAU)"),
    QuerySpec("watermark_lateness", watermark_lateness, WATERMARK_LATENESS_SQL, "out-of-orderness audit: lateness percentiles + watermark drop rate"),
    QuerySpec("events_sliding", events_sliding, EVENTS_SLIDING_SQL, "X8 sliding windows (batch twin)"),
    QuerySpec("events_sessions", events_sessions, EVENTS_SESSIONS_SQL, "X8 session windows (batch twin)"),
    QuerySpec("events_tumbling_daily", events_tumbling_daily, EVENTS_TUMBLING_DAILY_SQL, "X8 tumbling windows (batch twin)"),
    QuerySpec("purchase_view_pairs", purchase_view_pairs, PURCHASE_VIEW_PAIRS_SQL, "stream-stream join (batch twin)"),
    QuerySpec("purchase_view_left_pairs", purchase_view_left_pairs, PURCHASE_VIEW_LEFT_PAIRS_SQL, "stream-stream LEFT OUTER join with watermark null-padding (batch twin)"),
]

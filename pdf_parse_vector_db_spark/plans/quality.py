"""Data-quality audits and corpus-hygiene operators (north-star X5/X1 ext).

Four pipeline stages every large-scale training-data build runs between
ingestion and shard layout:

* span_dedup — C4-style corpus-wide span deduplication. C4 (Raffel et al.,
  JMLR 2020, §2.2) removes any three-sentence span that occurs more than
  once in the corpus, keeping one occurrence; RefinedWeb (Penedo et al.,
  2023) does the same at line granularity. The fixture corpus has no
  sentence boundaries, so the deterministic analog of a "line" is each
  non-overlapping 4-word span — both engines derive identical spans from
  the same split, which is what makes the query oracle-checkable.
* referential_audit — dbt-test-style constraint audit: orphan foreign keys,
  duplicate primary keys, domain violations, temporal ordering violations.
  One row per named check with its violation count, so a 100 TB run's
  output is a constant-size report no matter the input.
* user_state_intervals — SCD2-style interval collapse: the event stream is
  folded into (user, state, valid_from, valid_to) validity ranges using the
  gaps-and-islands double row_number device. This is the standard
  "latest-snapshot + history" dimension build.
* numeric_profile — one-pass statistical profile (corr / covariance /
  variance / least-squares fit) per lineitem return-flag group, the
  column-statistics stage of an ANALYZE pipeline.

No reference citations: the reference has no corpus-hygiene stage; these are
driver-mandated extensions (BASELINE.json) modeled on the published C4 /
RefinedWeb cleanup recipes and warehouse audit practice.

Scale posture (100 TB):
* span_dedup's span extraction is a pure codegen map (split + sequence +
  transform — no explode-per-word, no UDF); the corpus shuffles once on the
  span hash for winner election and once on doc_id for reassembly. That one
  corpus-sized exchange is the irreducible cost of global span dedup (C4
  ran it as a MapReduce job); salting is unnecessary because span keys are
  near-unique by construction.
* referential_audit is all semi/anti joins and conditional aggregates —
  broadcast for the dim side, AQE-planned for fact-fact; each check is a
  partial-agg map-side count.
* user_state_intervals' two row_numbers and the interval lead() share one
  (user_id, ts) sort — Catalyst plans a single Exchange + Sort and reuses
  it across all three window functions.
* numeric_profile is a single hash-aggregate pass with map-side partials;
  every moment (corr, covar, regr_*) folds in the same partial buffer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pdf_parse_vector_db_spark.plans.registry import QuerySpec
from pdf_parse_vector_db_spark.sources.registry import load_table

_SPAN_WORDS = 4

# identical span derivation on both engines: words = split(text, ' '),
# span i = words[i*4+1 .. i*4+4] joined with ' ', i in [0, ceil(n/4))
_SPANS_SPARK = (
    "explode(transform(sequence(0, cast(ceil(size(split(text, ' ')) / {w}.0) AS int) - 1), "
    "i -> struct(i AS span_idx, array_join(slice(split(text, ' '), i * {w} + 1, {w}), ' ') AS span)))"
).format(w=_SPAN_WORDS)


def span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style span dedup: every 4-word span that occurs more than once in
    the corpus is kept only at its first occurrence (lowest doc_id, then
    lowest span index — C4 keeps one arbitrary occurrence; we pin the
    deterministic one). Per document: span counts and an md5 of the
    surviving text, i.e. the cleaned corpus under fingerprint."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    spans = docs.select("doc_id", F.expr(_SPANS_SPARK).alias("s")).select(
        "doc_id", F.col("s.span_idx").alias("span_idx"), F.col("s.span").alias("span")
    )
    w = Window.partitionBy("span").orderBy("doc_id", "span_idx")
    ranked = spans.withColumn("rn", F.row_number().over(w))
    kept_text = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("rn") == 1, F.struct("span_idx", "span"))
                )
            ),
            lambda x: x["span"],
        ),
        " ",
    )
    return (
        ranked.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_spans"),
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).cast("long").alias("n_kept"),
            F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).cast("long").alias("n_removed"),
            F.md5(kept_text).alias("kept_md5"),
        )
        .orderBy("doc_id")
    )


SPAN_DEDUP_SQL = f"""
WITH spans AS (
  SELECT doc_id, i AS span_idx,
         array_to_string(string_split(text, ' ')[(i * {_SPAN_WORDS} + 1):(i * {_SPAN_WORDS} + {_SPAN_WORDS})], ' ') AS span
  FROM documents,
       LATERAL (SELECT UNNEST(range(CAST(ceil(len(string_split(text, ' ')) / {_SPAN_WORDS}.0) AS BIGINT)))) t(i)
),
ranked AS (
  SELECT doc_id, span_idx, span,
         row_number() OVER (PARTITION BY span ORDER BY doc_id, span_idx) AS rn
  FROM spans
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       md5(coalesce(string_agg(CASE WHEN rn = 1 THEN span END, ' ' ORDER BY span_idx), '')) AS kept_md5
FROM ranked
GROUP BY doc_id
ORDER BY doc_id
"""


def referential_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint audit over the warehouse tables: one row per named check
    with its violation count. Checks: FK orphans (orders→customer,
    lineitem→orders), PK duplicates (orders), domain bounds
    (lineitem.l_discount outside [0, 0.1], non-positive extended price),
    and temporal ordering (receipt before ship)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")

    def check(name: str, cnt: DataFrame) -> DataFrame:
        return cnt.select(
            F.lit(name).alias("check_name"), F.col("violations").cast("long").alias("violations")
        )

    orphan_orders = check(
        "orphan_orders",
        orders.join(
            F.broadcast(customer.select("c_custkey")),
            orders["o_custkey"] == customer["c_custkey"],
            "left_anti",
        ).agg(F.count("*").alias("violations")),
    )
    orphan_lineitems = check(
        "orphan_lineitems",
        lineitem.join(
            orders.select("o_orderkey"),
            lineitem["l_orderkey"] == orders["o_orderkey"],
            "left_anti",
        ).agg(F.count("*").alias("violations")),
    )
    dup_order_keys = check(
        "dup_order_keys",
        orders.groupBy("o_orderkey")
        .count()
        .filter(F.col("count") > 1)
        .agg(F.coalesce(F.sum(F.col("count") - 1), F.lit(0)).alias("violations")),
    )
    discount_domain = check(
        "discount_out_of_range",
        lineitem.agg(
            F.sum(
                F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1), 1).otherwise(0)
            ).alias("violations")
        ),
    )
    nonpositive_price = check(
        "nonpositive_extendedprice",
        lineitem.agg(
            F.sum(F.when(F.col("l_extendedprice") <= 0, 1).otherwise(0)).alias("violations")
        ),
    )
    ship_before_order = check(
        "ship_before_order",
        lineitem.join(
            orders.select("o_orderkey", "o_orderdate"),
            lineitem["l_orderkey"] == orders["o_orderkey"],
        ).agg(
            F.sum(F.when(F.col("l_shipdate") < F.col("o_orderdate"), 1).otherwise(0)).alias(
                "violations"
            )
        ),
    )
    out = (
        orphan_orders.unionAll(orphan_lineitems)
        .unionAll(dup_order_keys)
        .unionAll(discount_domain)
        .unionAll(nonpositive_price)
        .unionAll(ship_before_order)
    )
    return out.orderBy("check_name")


REFERENTIAL_AUDIT_SQL = """
SELECT * FROM (
  SELECT 'orphan_orders' AS check_name,
         CAST((SELECT count(*) FROM orders o WHERE NOT EXISTS
               (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS BIGINT) AS violations
  UNION ALL
  SELECT 'orphan_lineitems',
         CAST((SELECT count(*) FROM lineitem l WHERE NOT EXISTS
               (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
  UNION ALL
  SELECT 'dup_order_keys',
         CAST(coalesce((SELECT sum(n - 1) FROM
               (SELECT count(*) AS n FROM orders GROUP BY o_orderkey HAVING count(*) > 1)), 0) AS BIGINT)
  UNION ALL
  SELECT 'discount_out_of_range',
         CAST((SELECT sum(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END)
               FROM lineitem) AS BIGINT)
  UNION ALL
  SELECT 'nonpositive_extendedprice',
         CAST((SELECT sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) FROM lineitem) AS BIGINT)
  UNION ALL
  SELECT 'ship_before_order',
         CAST((SELECT sum(CASE WHEN l.l_shipdate < o.o_orderdate THEN 1 ELSE 0 END)
               FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey) AS BIGINT)
)
ORDER BY check_name
"""


def user_state_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 interval collapse: fold each user's event stream into validity
    ranges of consecutive identical event_type states. valid_to is the
    start of the next state (NULL = current). Restricted to user_id % 50
    = 0 so the result is a bounded slice of the full dimension build."""
    events = load_table(spark, sf_dir, "events")
    e = events.filter(F.col("user_id") % 50 == 0)
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    w_all = Window.partitionBy("user_id").orderBy(*order)
    w_state = Window.partitionBy("user_id", "event_type").orderBy(*order)
    grp = (F.row_number().over(w_all) - F.row_number().over(w_state)).alias("grp")
    islands = e.select("user_id", "event_type", "ts", "event_id", grp)
    agg = islands.groupBy("user_id", "event_type", "grp").agg(
        F.min("ts").alias("valid_from"),
        F.max("ts").alias("_last_ts"),
        F.count("*").cast("long").alias("n_events"),
    )
    w_next = Window.partitionBy("user_id").orderBy("valid_from")
    return (
        agg.withColumn("valid_to", F.lead("valid_from").over(w_next))
        .select(
            "user_id",
            F.col("event_type").alias("state"),
            "valid_from",
            "valid_to",
            "n_events",
        )
        .orderBy("user_id", "valid_from")
    )


USER_STATE_INTERVALS_SQL = """
WITH e AS (
  SELECT user_id, event_type, ts, event_id
  FROM events WHERE user_id % 50 = 0
),
islands AS (
  SELECT user_id, event_type, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
         - row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS grp
  FROM e
),
agg AS (
  SELECT user_id, event_type, grp,
         min(ts) AS valid_from,
         CAST(count(*) AS BIGINT) AS n_events
  FROM islands GROUP BY user_id, event_type, grp
)
SELECT user_id, event_type AS state, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from) AS valid_to,
       n_events
FROM agg
ORDER BY user_id, valid_from
"""


def numeric_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass statistical profile per return flag: Pearson correlation,
    sample covariance/stddev, and the least-squares fit of extended price
    on quantity (slope / intercept / R²). All moments fold in a single
    hash-aggregate with map-side partials."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    return (
        lineitem.groupBy("l_returnflag")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.corr(q, p), 6).alias("corr_qty_price"),
            F.round(F.covar_samp(q, p), 4).alias("covar_qty_price"),
            F.round(F.stddev_samp(p), 4).alias("stddev_price"),
            F.round(F.regr_slope(p, q), 6).alias("slope"),
            F.round(F.regr_intercept(p, q), 4).alias("intercept"),
            F.round(F.regr_r2(p, q), 6).alias("r2"),
        )
        .orderBy("l_returnflag")
    )


NUMERIC_PROFILE_SQL = """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
       round(stddev_samp(l_extendedprice), 4) AS stddev_price,
       round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
       round(regr_r2(l_extendedprice, l_quantity), 6) AS r2
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per order priority: median / MAD (median
    absolute deviation) of o_totalprice and the count of modified-z-score
    outliers (|x - med| > 3.5 * 1.4826 * MAD — Iglewicz & Hoaglin's rule).
    Two grouped exact-percentile passes with a broadcast rejoin of the
    per-group medians; the GK-sketch tier (plans/relational.py
    price_percentiles discussion) is the approximate scale path."""
    orders = load_table(spark, sf_dir, "orders")
    med = orders.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("med")
    )
    with_med = orders.join(F.broadcast(med), "o_orderpriority")
    mad = with_med.groupBy("o_orderpriority").agg(
        F.expr("percentile(abs(o_totalprice - med), 0.5)").alias("mad"),
        F.first("med").alias("med"),
        F.count("*").cast("long").alias("n"),
    )
    flagged = with_med.join(
        F.broadcast(mad.select("o_orderpriority", "mad")), "o_orderpriority"
    ).groupBy("o_orderpriority").agg(
        # ansi: sums 0/1 indicator values — bounded by the row count
        F.sum(
            F.when(
                F.abs(F.col("o_totalprice") - F.col("med")) > 3.5 * 1.4826 * F.col("mad"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_outliers")
    )
    return (
        mad.join(flagged, "o_orderpriority")
        .select(
            "o_orderpriority",
            "n",
            F.round("med", 4).alias("med"),
            F.round("mad", 4).alias("mad"),
            "n_outliers",
        )
        .orderBy("o_orderpriority")
    )


ROBUST_OUTLIERS_SQL = """
WITH med AS (
  SELECT o_orderpriority, CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE) AS med,
         CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY o_orderpriority
),
j AS (
  SELECT o.o_orderpriority, o.o_totalprice, m.med, m.n FROM orders o
  JOIN med m USING (o_orderpriority)
),
mad AS (
  SELECT o_orderpriority,
         CAST(quantile_cont(abs(o_totalprice - med), 0.5) AS DOUBLE) AS mad
  FROM j GROUP BY o_orderpriority
)
SELECT j.o_orderpriority, any_value(j.n) AS n,
       round(any_value(j.med), 4) AS med,
       round(any_value(m.mad), 4) AS mad,
       CAST(sum(CASE WHEN abs(j.o_totalprice - j.med) > 3.5 * 1.4826 * m.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM j JOIN mad m USING (o_orderpriority)
GROUP BY j.o_orderpriority
ORDER BY j.o_orderpriority
"""


def moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-statistic window: exact median of each user's last 10 event
    values (ROWS frame), the robust twin of orders_moving_avg. Exact
    percentile as a windowed aggregate — one sort per user partition,
    shared with any other (user_id, ts) window in the same plan."""
    events = load_table(spark, sf_dir, "events")
    e = events.filter(F.col("user_id") % 100 == 0)
    med = F.expr("percentile(value, 0.5)").over(
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-9, 0)
    )
    return (
        e.select(
            "user_id",
            "event_id",
            "ts",
            F.round(med, 4).alias("med10"),
        )
        .orderBy("user_id", "ts", "event_id")
    )


MOVING_MEDIAN_SQL = """
SELECT user_id, event_id, ts,
       round(CAST(median(value) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS DOUBLE), 4) AS med10
FROM events
WHERE user_id % 100 = 0
ORDER BY user_id, ts, event_id
"""


def dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar heatmap input: event count and exact value total per
    (day-of-week, hour) cell. Day-of-week is computed from epoch days
    ((days + 4) mod 7, 0 = Sunday) so both engines share one definition
    instead of their differing dayofweek() conventions; value totals sum
    integer cents so no float summation order reaches the hash."""
    events = load_table(spark, sf_dir, "events")
    dow = ((F.datediff(F.to_date("ts"), F.lit("1970-01-01")) + 4) % 7).cast("int")
    return (
        events.groupBy(
            dow.alias("dow"), F.hour("ts").cast("int").alias("hour")
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            (
                F.sum(F.round(F.col("value") * 100).cast("long")) / F.lit(100.0)
            ).alias("total_value"),
        )
        .orderBy("dow", "hour")
    )


DOW_HOUR_HEATMAP_SQL = """
SELECT CAST((datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 4) % 7 AS INT) AS dow,
       CAST(extract(hour FROM ts) AS INT) AS hour,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_value
FROM events
GROUP BY 1, 2
ORDER BY dow, hour
"""


def zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus QA: least-squares Zipf exponent per language — the slope of
    ln(frequency) on ln(rank) over each language's top-100 terms. Natural
    corpora sit near -1; synthetic or template-heavy corpora flatten. One
    term-count aggregate, one per-language top-k window, one regression
    fold — the term stream shuffles once."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    words = docs.select(
        "lang", F.explode(F.split(F.lower(F.trim(F.col("text"))), "\\s+")).alias("term")
    )
    counts = words.groupBy("lang", "term").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), F.col("term").asc())
    ranked = counts.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 100)
    lf, lr = F.log(F.col("cnt").cast("double")), F.log(F.col("rank").cast("double"))
    return (
        ranked.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_terms"),
            F.round(F.regr_slope(lf, lr), 3).alias("zipf_slope"),
            F.round(F.regr_r2(lf, lr), 3).alias("r2"),
        )
        .orderBy("lang")
    )


ZIPF_FIT_SQL = """
WITH counts AS (
  SELECT lang, term, count(*) AS cnt
  FROM (SELECT lang, UNNEST(string_split_regex(lower(trim(text)), '\\s+')) AS term
        FROM documents)
  GROUP BY lang, term
),
ranked AS (
  SELECT lang, cnt,
         row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, term ASC) AS rank
  FROM counts
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_terms,
       round(regr_slope(ln(cnt), ln(rank)), 3) AS zipf_slope,
       round(regr_r2(ln(cnt), ln(rank)), 3) AS r2
FROM ranked WHERE rank <= 100
GROUP BY lang ORDER BY lang
"""


def ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus QA: type-token ratio per source at n = 1, 2, 3 — the
    distinct-n diversity metric (Li et al. 2016) that flags template-heavy
    or machine-generated sources (low TTR at higher n) before they enter a
    training mix.

    Scale shape: ONE corpus scan and one explode — the three gram orders
    are tagged structs in a single generator array (token array bound once
    via the single-element-array trick, so the split isn't re-evaluated
    per order); the only exchanges carry (source, n, gram) for the
    distinct-count agg. Output is |sources|×3 rows."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    toks = "filter(split(lower(trim(text)), '\\\\s+'), x -> x <> '')"
    uni = "transform(tk, t -> struct(1 AS n, t AS g))"
    bi = (
        "transform(zip_with(slice(tk, 1, size(tk) - 1), slice(tk, 2, size(tk) - 1), "
        "(a, b) -> concat(a, ' ', b)), t -> struct(2 AS n, t AS g))"
    )
    # sequence(1, size-2) flips to a DESCENDING sequence when size < 3
    # (Spark auto-negates the step) — guard explicitly
    tri = (
        "CASE WHEN size(tk) >= 3 THEN transform(sequence(1, size(tk) - 2), "
        "i -> struct(3 AS n, concat_ws(' ', element_at(tk, i), element_at(tk, i + 1), "
        "element_at(tk, i + 2)) AS g)) ELSE array() END"
    )
    tagged = (
        f"element_at(transform(array({toks}), tk -> concat({uni}, {bi}, {tri})), 1)"
    )
    grams = (
        docs.filter(F.length(F.trim("text")) > 0)
        .select("source", F.explode(F.expr(tagged)).alias("t"))
        .select("source", F.col("t.n").alias("n"), F.col("t.g").alias("g"))
    )
    return (
        grams.groupBy("source", "n")
        .agg(
            F.count(F.lit(1)).alias("grams"),
            F.countDistinct("g").alias("distinct_grams"),
        )
        .withColumn(
            "ttr",
            # ansi: grams = group count >= 1
            F.round(F.col("distinct_grams").cast("double") / F.col("grams"), 6),
        )
        .orderBy("source", "n")
    )


def key_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ops diagnostics: hot-key profile of the join/aggregation keys this
    suite shuffles on — rows, distinct keys, the hottest key's row count,
    its share, and the max/avg skew ratio. These are the numbers that
    decide whether a key needs salting (operators/skew.py) or AQE skew-join
    handling before a 100 TB run, produced as a constant-size report (one
    row per audited key, whatever the input size).

    Scale shape: each leg is a two-level aggregate — per-key counts
    (map-side partial first) then a 1-row rollup — and the report is a
    4-row union. Nothing wide ever reaches the driver."""
    legs = []
    for tbl, key in [
        ("orders", "o_custkey"),
        ("lineitem", "l_orderkey"),
        ("lineitem", "l_partkey"),
        ("events", "user_id"),
    ]:
        per = (
            load_table(spark, sf_dir, tbl)
            .groupBy(F.col(key))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        legs.append(
            per.agg(
                F.sum("c").alias("n_rows"),
                F.count(F.lit(1)).alias("n_keys"),
                F.max("c").alias("max_rows"),
            ).select(F.lit(f"{tbl}.{key}").alias("key"), "n_rows", "n_keys", "max_rows")
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionAll(leg)
    return (
        # try_divide: an empty table leg has n_rows = 0 — the skew profile
        # is undefined there -> NULL on both engines
        out.withColumn(
            "top_share",
            F.round(F.try_divide(F.col("max_rows").cast("double"), F.col("n_rows")), 6),
        )
        .withColumn(
            "skew_ratio",
            F.round(
                F.try_divide(
                    F.col("max_rows").cast("double") * F.col("n_keys").cast("double"),
                    F.col("n_rows"),
                ),
                4,
            ),
        )
        .orderBy("key")
    )


def _skew_leg_sql(tbl: str, key: str) -> str:
    return (
        f"SELECT '{tbl}.{key}' AS key, CAST(sum(c) AS BIGINT) AS n_rows, "
        f"CAST(count(*) AS BIGINT) AS n_keys, CAST(max(c) AS BIGINT) AS max_rows "
        f"FROM (SELECT count(*) AS c FROM {tbl} GROUP BY {key})"
    )


KEY_SKEW_AUDIT_SQL = f"""
WITH legs AS (
  {_skew_leg_sql('orders', 'o_custkey')}
  UNION ALL
  {_skew_leg_sql('lineitem', 'l_orderkey')}
  UNION ALL
  {_skew_leg_sql('lineitem', 'l_partkey')}
  UNION ALL
  {_skew_leg_sql('events', 'user_id')}
)
SELECT key, n_rows, n_keys, max_rows,
       round(CAST(max_rows AS DOUBLE) / n_rows, 6) AS top_share,
       round(CAST(max_rows AS DOUBLE) * n_keys / n_rows, 4) AS skew_ratio
FROM legs
ORDER BY key
"""


NGRAM_DIVERSITY_SQL = """
WITH t AS (
  SELECT source,
         list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS toks
  FROM documents WHERE length(trim(text)) > 0
),
uni AS (SELECT source, 1 AS n, unnest(toks) AS g FROM t),
bi AS (
  SELECT source, 2 AS n,
         unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])) AS g
  FROM t
),
tri AS (
  SELECT source, 3 AS n,
         unnest(list_transform(range(1, len(toks) - 1),
                i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS g
  FROM t
),
grams AS (
  SELECT * FROM uni UNION ALL SELECT * FROM bi UNION ALL SELECT * FROM tri
)
SELECT source, n,
       CAST(count(*) AS BIGINT) AS grams,
       CAST(count(DISTINCT g) AS BIGINT) AS distinct_grams,
       round(CAST(count(DISTINCT g) AS DOUBLE) / count(*), 6) AS ttr
FROM grams
GROUP BY source, n
ORDER BY source, n
"""


_ZBITS = 10


def _interleave_spark(xk: str, yk: str) -> str:
    terms = []
    for i in range(_ZBITS):
        terms.append(f"shiftleft(shiftright({xk}, {i}) & 1, {2 * i})")
        terms.append(f"shiftleft(shiftright({yk}, {i}) & 1, {2 * i + 1})")
    return " + ".join(terms)


def _interleave_duck(xk: str, yk: str) -> str:
    terms = []
    for i in range(_ZBITS):
        terms.append(f"((({xk} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({yk} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layout audit for data skipping: cluster orders into 32 equal file
    buckets two ways — by Z-order (Morton interleave of customer key ×
    order date, the Delta/Iceberg OPTIMIZE ZORDER layout) and by date
    alone — and measure each bucket's (custkey span × date span) bounding
    box, the quantity min/max file statistics prune on. Single-key
    clustering is degenerate: date buckets are tight on date (span ~33 of
    1024 at sf0.01) but every bucket spans the FULL custkey range — a
    custkey filter scans all 32 files. Z-order bounds both spans at ~√cells
    (329 × 209), so a selective filter on EITHER dimension skips ~2/3 of
    the files; that balanced-pruning trade, not total box volume, is what
    OPTIMIZE ZORDER buys.

    Locally the ntile is a global sort; at scale the same layout falls out
    of repartitionByRange(z) + sortWithinPartitions(z) (sampling-based
    range boundaries), the operators/shards.py writer path."""
    orders = load_table(spark, sf_dir, "orders")
    days = "datediff(o_orderdate, DATE '1970-01-01')"
    base = orders.selectExpr(
        "o_orderkey",
        "CAST(o_custkey AS DOUBLE) AS x",
        f"CAST({days} AS DOUBLE) AS y",
    )
    b = base.selectExpr(
        "o_orderkey",
        "x",
        "y",
        "min(x) OVER () AS x0",
        "max(x) OVER () AS x1",
        "min(y) OVER () AS y0",
        "max(y) OVER () AS y1",
    ).selectExpr(
        "o_orderkey",
        f"CAST(floor((x - x0) * {2**_ZBITS - 1}.0 / (x1 - x0)) AS INT) AS xk",
        f"CAST(floor((y - y0) * {2**_ZBITS - 1}.0 / (y1 - y0)) AS INT) AS yk",
    )
    z = b.selectExpr("o_orderkey", "xk", "yk", f"({_interleave_spark('xk', 'yk')}) AS z")

    def layout(df: DataFrame, label: str, order_cols: list[str]) -> DataFrame:
        w = Window.orderBy(*[F.col(c) for c in order_cols])
        return (
            df.withColumn("bucket", F.ntile(32).over(w))
            .groupBy("bucket")
            .agg(
                ((F.max("xk") - F.min("xk") + 1).cast("long")
                 * (F.max("yk") - F.min("yk") + 1).cast("long")).alias("bbox"),
                (F.max("xk") - F.min("xk") + 1).cast("long").alias("x_span"),
                (F.max("yk") - F.min("yk") + 1).cast("long").alias("y_span"),
            )
            .agg(
                F.lit(label).alias("layout"),
                F.sum("bbox").cast("long").alias("total_bbox"),
                F.round(F.avg("x_span"), 2).alias("avg_x_span"),
                F.round(F.avg("y_span"), 2).alias("avg_y_span"),
            )
            .select("layout", "total_bbox", "avg_x_span", "avg_y_span")
        )

    return (
        layout(z, "zorder", ["z", "o_orderkey"])
        .unionAll(layout(z, "bydate", ["yk", "o_orderkey"]))
        .orderBy("layout")
    )


ZORDER_SKIPPING_SQL = f"""
WITH base AS (
  SELECT o_orderkey, CAST(o_custkey AS DOUBLE) AS x,
         CAST(datediff('day', DATE '1970-01-01', o_orderdate) AS DOUBLE) AS y
  FROM orders
),
b AS (
  SELECT o_orderkey,
         CAST(floor((x - min(x) OVER ()) * {2**_ZBITS - 1}.0
              / (max(x) OVER () - min(x) OVER ())) AS INT) AS xk,
         CAST(floor((y - min(y) OVER ()) * {2**_ZBITS - 1}.0
              / (max(y) OVER () - min(y) OVER ())) AS INT) AS yk
  FROM base
),
z AS (
  SELECT o_orderkey, xk, yk, ({_interleave_duck('xk', 'yk')}) AS z FROM b
),
zb AS (
  SELECT xk, yk, ntile(32) OVER (ORDER BY z, o_orderkey) AS bucket FROM z
),
db AS (
  SELECT xk, yk, ntile(32) OVER (ORDER BY yk, o_orderkey) AS bucket FROM z
),
zagg AS (
  SELECT 'zorder' AS layout,
         CAST(sum((max_xk - min_xk + 1) * (max_yk - min_yk + 1)) AS BIGINT) AS total_bbox,
         round(avg(max_xk - min_xk + 1), 2) AS avg_x_span,
         round(avg(max_yk - min_yk + 1), 2) AS avg_y_span
  FROM (SELECT bucket, max(xk) AS max_xk, min(xk) AS min_xk,
               max(yk) AS max_yk, min(yk) AS min_yk FROM zb GROUP BY bucket)
),
dagg AS (
  SELECT 'bydate' AS layout,
         CAST(sum((max_xk - min_xk + 1) * (max_yk - min_yk + 1)) AS BIGINT) AS total_bbox,
         round(avg(max_xk - min_xk + 1), 2) AS avg_x_span,
         round(avg(max_yk - min_yk + 1), 2) AS avg_y_span
  FROM (SELECT bucket, max(xk) AS max_xk, min(xk) AS min_xk,
               max(yk) AS max_yk, min(yk) AS min_yk FROM db GROUP BY bucket)
)
SELECT * FROM zagg UNION ALL SELECT * FROM dagg ORDER BY layout
"""


# deterministic boilerplate injection (same device as plans/privacy.py's PII
# markers): every doc_id % 13 == 0 gains one of 3 rotating site banners, so
# both engines derive the identical corpus and the detector's recall is
# exactly checkable
_BP_BANNER_SPARK = (
    "CASE WHEN doc_id % 13 = 0 THEN concat('Cookie notice banner v', "
    "CAST(doc_id % 3 AS STRING), ' please accept terms. ', text) ELSE text END"
)
_BP_BANNER_DUCK = (
    "CASE WHEN doc_id % 13 = 0 THEN concat('Cookie notice banner v', "
    "CAST(doc_id % 3 AS VARCHAR), ' please accept terms. ', text) ELSE text END"
)
_BP_PREFIX_LEN = 40
_BP_MIN_DOCS = 3


def boilerplate_prefixes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb-style boilerplate detection: docs sharing a canonical
    leading span (first 40 chars lowercased) with >= 3 other docs are
    boilerplate-headed — the cookie-banner / nav-chrome signature that
    line-level dedup removes before training. Reports per-source counts
    plus how many distinct banners were found.

    Scale shape: the prefix is a fixed 40-byte key, so the groupBy
    exchanges 40 bytes per doc regardless of document size; the flag
    rejoin broadcasts the (few) offending prefixes back onto the scan."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    pref = F.lower(F.substring(F.expr(_BP_BANNER_SPARK), 1, _BP_PREFIX_LEN))
    tagged = docs.select("doc_id", "source", pref.alias("prefix"))
    hot = (
        tagged.groupBy("prefix")
        .agg(F.count(F.lit(1)).alias("pdocs"))
        .filter(F.col("pdocs") >= _BP_MIN_DOCS)
    )
    flagged = tagged.join(
        F.broadcast(hot.select("prefix", F.lit(1).alias("is_bp"))), on="prefix", how="left"
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(F.coalesce(F.col("is_bp"), F.lit(0))).alias("bp_docs"),
            F.countDistinct(F.when(F.col("is_bp") == 1, F.col("prefix"))).alias(
                "bp_banners"
            ),
            F.round(
                F.sum(F.coalesce(F.col("is_bp"), F.lit(0)))
                / F.count(F.lit(1))
                * 100,
                4,
            ).alias("bp_pct"),
        )
        .orderBy("source")
    )


BOILERPLATE_PREFIXES_SQL = f"""
WITH tagged AS (
  SELECT doc_id, source,
         lower(substring({_BP_BANNER_DUCK}, 1, {_BP_PREFIX_LEN})) AS prefix
  FROM documents
),
hot AS (
  SELECT prefix FROM tagged GROUP BY prefix HAVING count(*) >= {_BP_MIN_DOCS}
),
flagged AS (
  SELECT t.doc_id, t.source, t.prefix,
         CASE WHEN h.prefix IS NOT NULL THEN 1 ELSE 0 END AS is_bp
  FROM tagged t LEFT JOIN hot h ON t.prefix = h.prefix
)
SELECT source,
       count(*) AS docs,
       CAST(sum(is_bp) AS BIGINT) AS bp_docs,
       CAST(count(DISTINCT CASE WHEN is_bp = 1 THEN prefix END) AS BIGINT)
         AS bp_banners,
       round(CAST(sum(is_bp) AS DOUBLE) / count(*) * 100, 4) AS bp_pct
FROM flagged
GROUP BY source
ORDER BY source
"""


def point_in_time_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-store point-in-time join: each purchase event fetched
    against the SCD2 state dimension AS OF the purchase's event time —
    the training-serving-skew-free feature lookup (every feature value is
    what was knowable at the label's timestamp, never the future).
    Reuses user_state_intervals as the versioned dimension and joins
    purchases into their covering validity interval.

    Scale shape: the equi key (user_id) carries the shuffle; the interval
    predicate evaluates inside the matched user's handful of intervals,
    so pair cost is Σ per-user intervals × purchases, never a cross
    product. This is the standard PIT formulation (e.g. Feast's PIT
    correctness contract) as one sort-merge join."""
    intervals = user_state_intervals(spark, sf_dir).withColumnRenamed(
        "user_id", "iv_user"
    )
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(
        (F.col("user_id") % 50 == 0) & (F.col("event_type") == "purchase")
    ).select("user_id", "ts", "value")
    j = purchases.join(
        intervals,
        (F.col("user_id") == F.col("iv_user"))
        & (F.col("ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))),
    )
    return (
        j.groupBy(F.col("state").alias("state_at_purchase"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(
                F.sum(F.expr("CAST(round(value * 1000000) AS BIGINT)"))
                # ansi: group count >= 1 times a nonzero literal
                / (F.count(F.lit(1)) * F.lit(1000000.0)),
                6,
            ).alias("avg_value"),
        )
        .orderBy("state_at_purchase")
    )


POINT_IN_TIME_STATE_SQL = f"""
WITH iv AS ({USER_STATE_INTERVALS_SQL.rsplit('ORDER BY', 1)[0]}),
p AS (
  SELECT user_id, ts, value FROM events
  WHERE user_id % 50 = 0 AND event_type = 'purchase'
)
SELECT iv.state AS state_at_purchase,
       count(*) AS n_purchases,
       CAST(count(DISTINCT p.user_id) AS BIGINT) AS n_users,
       round(CAST(sum(CAST(round(p.value * 1000000) AS BIGINT)) AS DOUBLE)
             / (count(*) * 1000000.0), 6) AS avg_value
FROM p JOIN iv
  ON p.user_id = iv.user_id
 AND p.ts >= iv.valid_from
 AND (iv.valid_to IS NULL OR p.ts < iv.valid_to)
GROUP BY 1
ORDER BY state_at_purchase
"""


# --------------------------------------------------------------------------
# Chi-square independence audit (Pearson 1900) between customer market
# segment and order priority — the stock "are these two categoricals
# actually independent?" check a feature-selection pass runs before
# one-hot-encoding both. Everything derives from ONE (segment, priority)
# contingency agg: row/column marginals are windows over the 25-cell table,
# not corpus re-scans. The chi2 total is summed in integer micros (exact,
# order-independent) so the statistic itself sits under the oracle hash;
# per-cell expected counts come from identical integer marginals in both
# engines. Scale: the fact join shuffles once on custkey; the contingency
# agg is |segments|x|priorities| keys with map-side partials — constant
# size regardless of input rows.
# --------------------------------------------------------------------------


def segment_priority_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders", spread=True)
    cust = load_table(spark, sf_dir, "customer")
    cells = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = cells.withColumn("row_n", F.sum("n").over(W.partitionBy("c_mktsegment"))) \
        .withColumn("col_n", F.sum("n").over(W.partitionBy("o_orderpriority"))) \
        .withColumn("grand", F.sum("n").over(W.partitionBy()))
    contrib = tot.withColumn(
        "expected",
        # ansi: grand = global sum >= this cell's n >= 1
        F.col("row_n").cast("double") * F.col("col_n") / F.col("grand"),
    ).withColumn(
        "contrib_mic",
        F.round(
            # ansi: expected = row_n*col_n/grand with all three >= 1 -> > 0
            F.pow(F.col("n") - F.col("expected"), F.lit(2.0)) / F.col("expected") * 1e6
        ).cast("bigint"),
    )
    return contrib.groupBy().agg(
        F.round(F.sum("contrib_mic") / 1e6, 4).alias("chi2"),
        ((F.countDistinct("c_mktsegment") - 1) * (F.countDistinct("o_orderpriority") - 1)).alias("dof"),
        F.max("grand").alias("n_orders"),
        F.count(F.lit(1)).alias("n_cells"),
    )


def segment_priority_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (and normalized MI) between customer market
    segment and order priority — the information-theoretic complement of
    the chi-square audit above, over the SAME constant-size contingency
    aggregate. MI = Σ p(x,y)·ln(p(x,y)/(p(x)p(y))); NMI normalizes by
    √(H(X)·H(Y)) so 0 = independent, 1 = deterministic.

    Determinism: every probability derives from exact BIGINT cell counts;
    the only floats are per-cell ln() contributions, summed as integer
    nanos so summation order can never move the 6-dp result.

    Scale shape: identical to chi2 — one |segments|×|priorities| agg with
    map-side partials; everything after runs on ≤25 rows.
    """
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders", spread=True)
    cust = load_table(spark, sf_dir, "customer")
    cells = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = (
        cells.withColumn("row_n", F.sum("n").over(W.partitionBy("c_mktsegment")))
        .withColumn("col_n", F.sum("n").over(W.partitionBy("o_orderpriority")))
        .withColumn("grand", F.sum("n").over(W.partitionBy()))
    )
    p = F.col("n").cast("double") / F.col("grand")  # ansi: grand >= n >= 1
    mi_cell = p * F.log(
        # ansi: marginals row_n/col_n >= this cell's n >= 1
        F.col("n").cast("double") * F.col("grand") / (F.col("row_n") * F.col("col_n"))
    )
    # entropy contributions count each row/col marginal once per cell if
    # summed naively — divide by the marginal's cell multiplicity instead
    # of deduplicating (same total, stays one stream)
    rmult = F.count(F.lit(1)).over(W.partitionBy("c_mktsegment"))
    cmult = F.count(F.lit(1)).over(W.partitionBy("o_orderpriority"))
    pr = F.col("row_n").cast("double") / F.col("grand")  # ansi: grand >= 1
    pc = F.col("col_n").cast("double") / F.col("grand")  # ansi: grand >= 1
    staged = tot.select(
        F.round(mi_cell * 1e9).cast("bigint").alias("mi_nano"),
        # ansi: rmult is a partition count >= 1
        F.round(-pr * F.log(pr) / rmult * 1e9).cast("bigint").alias("hr_nano"),
        F.round(-pc * F.log(pc) / cmult * 1e9).cast("bigint").alias("hc_nano"),  # ansi: cmult >= 1
    )
    return staged.agg(
        F.round(F.sum("mi_nano") / 1e9, 6).alias("mi_nats"),
        # try_divide: a single-category marginal has zero entropy — NMI is
        # undefined -> NULL on both engines
        F.round(
            F.try_divide(
                F.sum("mi_nano") / 1e9,
                F.sqrt((F.sum("hr_nano") / 1e9) * (F.sum("hc_nano") / 1e9)),
            ),
            6,
        ).alias("nmi"),
    )


SEGMENT_PRIORITY_MI_SQL = """
WITH cells AS (
  SELECT c_mktsegment, o_orderpriority, CAST(count(*) AS BIGINT) AS n
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2),
tot AS (
  SELECT *,
         sum(n) OVER (PARTITION BY c_mktsegment) AS row_n,
         sum(n) OVER (PARTITION BY o_orderpriority) AS col_n,
         sum(n) OVER () AS grand,
         count(*) OVER (PARTITION BY c_mktsegment) AS rmult,
         count(*) OVER (PARTITION BY o_orderpriority) AS cmult
  FROM cells),
staged AS (
  SELECT
    CAST(round(CAST(n AS DOUBLE) / grand
               * ln(CAST(n AS DOUBLE) * grand / (CAST(row_n AS DOUBLE) * col_n))
               * 1e9) AS BIGINT) AS mi_nano,
    CAST(round(-(CAST(row_n AS DOUBLE) / grand)
               * ln(CAST(row_n AS DOUBLE) / grand) / rmult * 1e9) AS BIGINT)
      AS hr_nano,
    CAST(round(-(CAST(col_n AS DOUBLE) / grand)
               * ln(CAST(col_n AS DOUBLE) / grand) / cmult * 1e9) AS BIGINT)
      AS hc_nano
  FROM tot)
SELECT round(CAST(sum(mi_nano) AS BIGINT) / 1e9, 6) AS mi_nats,
       round((CAST(sum(mi_nano) AS BIGINT) / 1e9)
             / sqrt((CAST(sum(hr_nano) AS BIGINT) / 1e9)
                    * (CAST(sum(hc_nano) AS BIGINT) / 1e9)), 6) AS nmi
FROM staged
"""


def data_contract_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-contract verification in the Deequ style (AWS
    Deequ / "Automating large-scale data quality verification", Schelter
    et al. 2018 VLDB, public): a fixed constraint suite evaluated over the
    orders table in one report — completeness, uniqueness, value range,
    closed domain, referential integrity, freshness. One row per
    constraint: (check_name, metric, passed).

    Scale shape: each constraint is a scan-level aggregate with map-side
    partials (uniqueness is the one exchange — a count-distinct on the
    key); the referential check is a broadcast anti-join probe. The report
    union is 6 one-row frames. This is the nightly gate a 100 TB ingest
    runs before publishing a partition.
    """
    orders = load_table(spark, sf_dir, "orders", spread=True)
    cust = load_table(spark, sf_dir, "customer")
    base = orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_custkey").isNull().cast("long")).alias("null_cust"),
        F.countDistinct("o_orderkey").alias("dist_key"),
        F.sum((F.col("o_totalprice") <= 0).cast("long")).alias("bad_price"),
        F.sum(
            (~F.col("o_orderstatus").isin("O", "F", "P")).cast("long")
        ).alias("bad_status"),
        F.max(F.col("o_orderdate").cast("date")).alias("max_d"),
    )
    orphans = orders.join(
        F.broadcast(cust),
        orders.o_custkey == cust.c_custkey,
        "left_anti",
    ).agg(F.count(F.lit(1)).alias("orphans"))
    rep = base.crossJoin(orphans)
    checks = [
        # try_divide(x2): on an EMPTY table (n = 0) the ratio checks are
        # undefined -> NULL score on both engines; the boolean verdicts
        # still evaluate
        ("completeness_o_custkey", 1.0 - F.try_divide(F.col("null_cust"), F.col("n")), F.col("null_cust") == 0),
        ("uniqueness_o_orderkey", F.try_divide(F.col("dist_key"), F.col("n")), F.col("dist_key") == F.col("n")),
        ("range_o_totalprice_positive", F.col("bad_price").cast("double"), F.col("bad_price") == 0),
        ("domain_o_orderstatus", F.col("bad_status").cast("double"), F.col("bad_status") == 0),
        ("referential_custkey", F.col("orphans").cast("double"), F.col("orphans") == 0),
        ("freshness_orderdate_1998", F.year("max_d").cast("double"), F.year("max_d") >= 1998),
    ]
    out = None
    for name, metric, passed in checks:
        one = rep.select(
            F.lit(name).alias("check_name"),
            F.round(metric, 6).alias("metric"),
            passed.alias("passed"),
        )
        out = one if out is None else out.unionAll(one)
    return out.orderBy("check_name")


DATA_CONTRACT_AUDIT_SQL = """
WITH base AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_cust,
         CAST(count(DISTINCT o_orderkey) AS BIGINT) AS dist_key,
         CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS bad_price,
         CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END) AS BIGINT) AS bad_status,
         max(CAST(o_orderdate AS DATE)) AS max_d
  FROM orders
), orph AS (
  SELECT CAST(count(*) AS BIGINT) AS orphans
  FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
), rep AS (SELECT * FROM base CROSS JOIN orph)
SELECT * FROM (
  SELECT 'completeness_o_custkey' AS check_name,
         round(1.0 - CAST(null_cust AS DOUBLE) / n, 6) AS metric, null_cust = 0 AS passed FROM rep
  UNION ALL
  SELECT 'uniqueness_o_orderkey', round(CAST(dist_key AS DOUBLE) / n, 6), dist_key = n FROM rep
  UNION ALL
  SELECT 'range_o_totalprice_positive', round(CAST(bad_price AS DOUBLE), 6), bad_price = 0 FROM rep
  UNION ALL
  SELECT 'domain_o_orderstatus', round(CAST(bad_status AS DOUBLE), 6), bad_status = 0 FROM rep
  UNION ALL
  SELECT 'referential_custkey', round(CAST(orphans AS DOUBLE), 6), orphans = 0 FROM rep
  UNION ALL
  SELECT 'freshness_orderdate_1998', round(CAST(year(max_d) AS DOUBLE), 6), year(max_d) >= 1998 FROM rep
)
ORDER BY check_name
"""


def benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of o_totalprice (Newcomb 1881 /
    Benford 1938, public): per digit 1-9, the observed share vs the
    log10(1 + 1/d) expectation — the standard screen for fabricated or
    truncated numeric columns in ingested data.

    First digit extracted arithmetically (floor(p / 10^floor(log10 p)))
    so no engine-specific number formatting is involved. One 9-key
    aggregate with map-side partials; share math on 9 rows.
    """
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders", spread=True)
    d = F.floor(
        F.col("o_totalprice")
        # ansi: evaluated only behind the o_totalprice > 0 filter; pow(10, k) > 0
        / F.pow(F.lit(10.0), F.floor(F.log10(F.col("o_totalprice"))))
    ).cast("int")
    digits = (
        orders.filter(F.col("o_totalprice") > 0)
        .select(d.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = digits.withColumn("total", F.sum("n").over(W.partitionBy()))
    return tot.select(
        "digit",
        "n",
        # ansi(file): total = global sum >= own n >= 1; digit in 1..9
        F.round(F.col("n").cast("double") / F.col("total"), 6).alias("obs_share"),  # ansi: total >= 1
        F.round(F.log10(1 + 1 / F.col("digit").cast("double")), 6).alias("exp_share"),  # ansi: digit >= 1
        F.round(
            F.col("n").cast("double") / F.col("total")  # ansi: total >= 1
            - F.log10(1 + 1 / F.col("digit").cast("double")),  # ansi: digit >= 1
            6,
        ).alias("deviation"),
    ).orderBy("digit")


BENFORD_AUDIT_SQL = """
WITH digits AS (
  SELECT CAST(floor(o_totalprice / pow(10, floor(log10(o_totalprice)))) AS INTEGER)
           AS digit,
         CAST(count(*) AS BIGINT) AS n
  FROM orders WHERE o_totalprice > 0
  GROUP BY 1),
tot AS (SELECT *, sum(n) OVER () AS total FROM digits)
SELECT digit, n,
       round(CAST(n AS DOUBLE) / total, 6) AS obs_share,
       round(log10(1 + 1 / CAST(digit AS DOUBLE)), 6) AS exp_share,
       round(CAST(n AS DOUBLE) / total
             - log10(1 + 1 / CAST(digit AS DOUBLE)), 6) AS deviation
FROM tot
ORDER BY digit
"""


SEGMENT_PRIORITY_CHI2_SQL = """
WITH cells AS (
  SELECT c_mktsegment, o_orderpriority, CAST(count(*) AS BIGINT) AS n
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2),
tot AS (
  SELECT *,
         sum(n) OVER (PARTITION BY c_mktsegment) AS row_n,
         sum(n) OVER (PARTITION BY o_orderpriority) AS col_n,
         sum(n) OVER () AS grand
  FROM cells),
contrib AS (
  SELECT *,
         CAST(round(pow(n - CAST(row_n AS DOUBLE) * col_n / grand, 2)
                    / (CAST(row_n AS DOUBLE) * col_n / grand) * 1e6) AS BIGINT)
           AS contrib_mic
  FROM tot)
SELECT round(CAST(sum(contrib_mic) AS BIGINT) / 1e6, 4) AS chi2,
       CAST((count(DISTINCT c_mktsegment) - 1)
            * (count(DISTINCT o_orderpriority) - 1) AS BIGINT) AS dof,
       CAST(max(grand) AS BIGINT) AS n_orders,
       CAST(count(*) AS BIGINT) AS n_cells
FROM contrib
"""


_GRID_MIN_TOKENS = [10, 20, 40]
_GRID_MAX_AVG_LEN = [6.0, 8.0, 10.0]


def quality_grid_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold grid search in ONE scan: evaluate every combination of
    quality-gate parameters (min token count × max mean token length)
    against the corpus simultaneously — per-doc metrics are computed
    once, the 9-combo config array explodes map-side, and each config
    accumulates its own retained-docs/retained-tokens partials. The
    single-pass-multi-config pattern is how parameter sweeps stay
    affordable at 100 TB: G configs cost one scan + a G-key agg, not G
    scans.

    Output: one row per config with retained counts and retention rates.
    """
    from pdf_parse_vector_db_spark.functions.text import quality_metrics_expr

    docs = load_table(spark, sf_dir, "documents", spread=True)
    q = quality_metrics_expr("text")
    base = docs.select(
        q["n_tokens"].alias("n_tokens"), q["avg_token_len"].alias("avg_len")
    )
    combos = ", ".join(
        f"named_struct('min_tokens', {mt}, 'max_avg_len', CAST({mal} AS DOUBLE))"
        for mt in _GRID_MIN_TOKENS
        for mal in _GRID_MAX_AVG_LEN
    )
    swept = base.select(
        "n_tokens", "avg_len", F.explode(F.expr(f"array({combos})")).alias("cfg")
    ).select(
        F.col("cfg.min_tokens").alias("min_tokens"),
        F.col("cfg.max_avg_len").alias("max_avg_len"),
        "n_tokens",
        (
            (F.col("n_tokens") >= F.col("cfg.min_tokens"))
            & (F.col("avg_len") <= F.col("cfg.max_avg_len"))
        ).alias("keep"),
    )
    return (
        swept.groupBy("min_tokens", "max_avg_len")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("docs"),
            F.sum(F.col("keep").cast("long")).cast("bigint").alias("kept_docs"),
            F.sum(F.when(F.col("keep"), F.col("n_tokens")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("kept_tokens"),
            F.round(
                F.sum(F.col("keep").cast("long")) / F.count(F.lit(1)).cast("double"), 6
            ).alias("keep_rate"),
        )
        .orderBy("min_tokens", "max_avg_len")
    )


def _grid_sql() -> str:
    from pdf_parse_vector_db_spark.functions.text import quality_metrics_sql

    m = quality_metrics_sql("text")
    combos = " UNION ALL ".join(
        f"SELECT {mt} AS min_tokens, CAST({mal} AS DOUBLE) AS max_avg_len"
        for mt in _GRID_MIN_TOKENS
        for mal in _GRID_MAX_AVG_LEN
    )
    return f"""
WITH base AS (
  SELECT {m['n_tokens']} AS n_tokens, {m['avg_token_len']} AS avg_len
  FROM documents
), cfg AS ({combos}), swept AS (
  SELECT cfg.min_tokens, cfg.max_avg_len, base.n_tokens,
         base.n_tokens >= cfg.min_tokens AND base.avg_len <= cfg.max_avg_len AS keep
  FROM base CROSS JOIN cfg
)
SELECT min_tokens, max_avg_len,
       CAST(count(*) AS BIGINT) AS docs,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs,
       CAST(sum(CASE WHEN keep THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens,
       round(CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
         AS keep_rate
FROM swept
GROUP BY 1, 2
ORDER BY 1, 2
"""


QUALITY_GRID_SWEEP_SQL = _grid_sql()


_EMD_SRC = ("src0", "src1")


def length_emd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D earth mover's distance (Wasserstein-1) between two sources'
    document-length distributions — the transport-cost complement of
    source_kl_divergence (KL sees ratio differences, EMD sees HOW FAR
    mass must move). Computed exactly as ∫|F1 − F2| over the merged value
    axis: per distinct length, the running CDF gap times the gap to the
    next length — every term a ratio of exact integers.

    Scale shape: lengths reduce to a (value → per-source count) histogram
    first (map-side partials; domain bounded by distinct lengths), and
    the CDF window runs over that bounded histogram.
    """
    docs = load_table(spark, sf_dir, "documents", spread=True)
    a, b = _EMD_SRC
    hist = (
        docs.filter(F.col("source").isin(list(_EMD_SRC)))
        .groupBy("n_chars")
        .agg(
            F.sum((F.col("source") == a).cast("long")).alias("ca"),
            F.sum((F.col("source") == b).cast("long")).alias("cb"),
        )
    )
    from pyspark.sql.window import Window as W

    tot = hist.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    w = W.orderBy("n_chars").rowsBetween(W.unboundedPreceding, W.currentRow)
    steps = (
        hist.crossJoin(F.broadcast(tot))
        .withColumn("cuma", F.sum("ca").over(w))
        .withColumn("cumb", F.sum("cb").over(w))
        .withColumn("next_v", F.lead("n_chars").over(W.orderBy("n_chars")))
        .filter(F.col("next_v").isNotNull())
        .select(
            (
                # try_divide(x2): a source with zero docs makes its CDF
                # undefined -> NULL segments -> NULL EMD on both engines
                F.abs(
                    F.try_divide(F.col("cuma").cast("double"), F.col("na"))
                    - F.try_divide(F.col("cumb").cast("double"), F.col("nb"))
                )
                * (F.col("next_v") - F.col("n_chars"))
            ).alias("seg")
        )
    )
    return steps.agg(
        F.round(F.sum(F.round(F.col("seg") * 1e6)).cast("bigint") / 1e6, 4).alias("emd_chars")
    )


LENGTH_EMD_SQL = f"""
WITH hist AS (
  SELECT n_chars,
         CAST(sum(CASE WHEN source = '{_EMD_SRC[0]}' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(sum(CASE WHEN source = '{_EMD_SRC[1]}' THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM documents WHERE source IN ('{_EMD_SRC[0]}', '{_EMD_SRC[1]}')
  GROUP BY n_chars
), tot AS (
  SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb FROM hist
), steps AS (
  SELECT abs(CAST(cuma AS DOUBLE) / na - CAST(cumb AS DOUBLE) / nb)
           * (next_v - n_chars) AS seg
  FROM (
    SELECT n_chars,
           sum(ca) OVER (ORDER BY n_chars ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
           sum(cb) OVER (ORDER BY n_chars ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb,
           lead(n_chars) OVER (ORDER BY n_chars) AS next_v
    FROM hist
  ) CROSS JOIN tot
  WHERE next_v IS NOT NULL
)
SELECT round(CAST(sum(CAST(round(seg * 1e6) AS BIGINT)) AS BIGINT) / 1e6, 4) AS emd_chars
FROM steps
"""


def revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation Gini coefficient of customer revenue concentration
    (Gini 1912, public) — the inequality audit behind "do 20% of
    customers carry 80% of revenue". Uses the rank formula
    G = Σ(2i − n − 1)·x_(i) / (n·Σx) over revenue-sorted customers
    WITHIN each nation, so the rank window partitions by nation — never
    a global per-row sort. Every term is an exact integer (revenue in
    cents, ranks, counts); the one division happens per nation at the
    end.
    """
    orders = load_table(spark, sf_dir, "orders", spread=True)
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    per_cust = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), "o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents")
        )
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("nation").orderBy("cents", "o_custkey")
    ranked = per_cust.withColumn("i", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(W.partitionBy("nation"))
    )
    return (
        ranked.groupBy("nation")
        .agg(
            F.max("n").cast("bigint").alias("n_customers"),
            # numerator widens to decimal(38,0) before the sum (rank x cents
            # crosses int64 near 1e6 customers/nation — changepoint class);
            # denominator multiplies in double for the same reason;
            # try_divide: a zero-revenue nation has an undefined Gini -> NULL
            F.round(
                F.try_divide(
                    F.sum(
                        (
                            (2 * F.col("i") - F.col("n") - 1).cast("decimal(19,0)")
                            * F.col("cents")
                        ).cast("decimal(38,0)")
                    ).cast("double"),
                    F.max("n").cast("double") * F.sum("cents").cast("double"),
                ),
                6,
            ).alias("gini"),
        )
        .orderBy("nation")
    )


REVENUE_GINI_SQL = """
WITH per_cust AS (
  SELECT n_name AS nation, o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
), ranked AS (
  SELECT nation, cents,
         row_number() OVER (PARTITION BY nation ORDER BY cents, o_custkey) AS i,
         count(*) OVER (PARTITION BY nation) AS n
  FROM per_cust
)
SELECT nation,
       CAST(max(n) AS BIGINT) AS n_customers,
       round(CAST(sum((2 * i - n - 1) * cents) AS DOUBLE)
             / (CAST(max(n) AS DOUBLE) * sum(cents)), 6) AS gini
FROM ranked
GROUP BY nation
ORDER BY nation
"""


def null_repair_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Imputation quality with built-in ground truth: deterministically
    mask 10% of orders (hash gate), repair the masked categorical
    (o_orderpriority ← per-segment mode of the UNMASKED rows, min-label
    tie-break) and the masked numeric (o_totalprice ← per-segment exact
    median of unmasked), then grade the repairs against the true values
    we hid. The masked-and-recover device turns data cleaning — usually
    unauditable — into a measured operator: per segment, categorical
    accuracy and numeric MAE.

    Scale shape: train-side stats are one segment-keyed agg (mode via a
    (segment, priority) count + argmax window over ≤25 rows; median via
    the exact-percentile aggregate, hist_quantiles being the sketch twin);
    repairs join back as a ≤5-row broadcast.
    """
    from pyspark.sql.window import Window as W

    orders = load_table(spark, sf_dir, "orders", spread=True)
    cust = load_table(spark, sf_dir, "customer")
    base = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    ).select(
        "o_orderkey",
        F.col("c_mktsegment").alias("segment"),
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        (
            F.expr(
                "CAST(conv(substring(md5(CAST(o_orderkey AS STRING)), 1, 8), 16, 10)"
                " AS BIGINT) % 10"
            )
            == 0
        ).alias("is_masked"),
    )
    train = base.filter(~F.col("is_masked"))
    mode = (
        train.groupBy("segment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("segment").orderBy(F.desc("c"), F.asc("o_orderpriority"))
            ),
        )
        .filter(F.col("rn") == 1)
        .select("segment", F.col("o_orderpriority").alias("imp_priority"))
    )
    med = train.groupBy("segment").agg(
        F.expr("percentile(cents, 0.5)").alias("imp_cents")
    )
    masked = base.filter(F.col("is_masked"))
    return (
        masked.join(F.broadcast(mode), "segment")
        .join(F.broadcast(med), "segment")
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_masked"),
            F.round(
                F.sum((F.col("o_orderpriority") == F.col("imp_priority")).cast("long"))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("cat_accuracy"),
            F.round(
                F.sum(F.abs(F.col("cents") - F.col("imp_cents"))) / F.count(F.lit(1)) / 100.0,
                2,
            ).alias("num_mae"),
        )
        .orderBy("segment")
    )


NULL_REPAIR_AUDIT_SQL = """
WITH base AS (
  SELECT o_orderkey, c_mktsegment AS segment, o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         ('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT % 10 = 0
           AS is_masked
  FROM orders JOIN customer ON o_custkey = c_custkey
), train AS (SELECT * FROM base WHERE NOT is_masked),
mode AS (
  SELECT segment, o_orderpriority AS imp_priority FROM (
    SELECT segment, o_orderpriority,
           row_number() OVER (PARTITION BY segment
                              ORDER BY count(*) DESC, o_orderpriority ASC) AS rn
    FROM train GROUP BY segment, o_orderpriority
  ) WHERE rn = 1
), med AS (
  SELECT segment, quantile_cont(cents, 0.5) AS imp_cents FROM train GROUP BY segment
)
SELECT m.segment,
       CAST(count(*) AS BIGINT) AS n_masked,
       round(CAST(sum(CASE WHEN m.o_orderpriority = mo.imp_priority THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS cat_accuracy,
       round(sum(abs(m.cents - me.imp_cents)) / count(*) / 100.0, 2) AS num_mae
FROM (SELECT * FROM base WHERE is_masked) m
JOIN mode mo ON m.segment = mo.segment
JOIN med me ON m.segment = me.segment
GROUP BY m.segment
ORDER BY m.segment
"""


_MERKLE_COARSE = 16
_MERKLE_LEAF = 256


def merkle_diff_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-entropy replica comparison via Merkle-style range digests (the
    Cassandra/Dynamo repair mechanism, public): each replica reduces every
    key range to a commutative XOR digest of its row hashes; comparing
    digests finds diverging ranges WITHOUT shipping rows — coarse level
    first, then only the dirty coarse bucket's leaves. The audit builds
    "replica B" as the orders table with ONE deterministically-chosen row
    mutated (+1 cent), diffs both digest levels, and reports exactly the
    ranges a repair job would re-sync: one dirty coarse bucket of 16 and
    one dirty leaf of 256 — a 17-digest exchange localizing a single
    corrupt row among tens of thousands.

    Scale shape: row hashing is a pure map; each digest level is one
    fixed-key-space XOR aggregate with map-side partials (XOR is
    commutative/associative — the same mergeability contract as the
    sketch family). Bytes exchanged per replica: |buckets| digests,
    independent of table size.
    """
    orders = load_table(spark, sf_dir, "orders", spread=True)
    base = orders.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    # the mutated row: the smallest orderkey whose md5 starts with '0'
    target = base.filter(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1) == "0"
    ).agg(F.min("o_orderkey").alias("tk"))
    replica_b = base.crossJoin(F.broadcast(target)).select(
        "o_orderkey",
        (
            F.col("cents")
            + F.when(F.col("o_orderkey") == F.col("tk"), F.lit(1)).otherwise(F.lit(0))
        ).alias("cents"),
    )

    def digests(df, side):
        h = F.expr(
            "CAST(conv(substring(md5(concat(CAST(o_orderkey AS STRING), ':', "
            "CAST(cents AS STRING))), 1, 15), 16, 10) AS BIGINT)"
        )
        hashed = df.select(
            (F.col("o_orderkey") % _MERKLE_COARSE).alias("coarse"),
            (F.col("o_orderkey") % _MERKLE_LEAF).alias("leaf"),
            h.alias("h"),
        )
        c = hashed.groupBy("coarse").agg(F.expr("bit_xor(h)").alias(f"d_{side}")).select(
            F.lit(0).alias("level"), F.col("coarse").alias("bucket"), f"d_{side}"
        )
        l = hashed.groupBy("leaf").agg(F.expr("bit_xor(h)").alias(f"d_{side}")).select(
            F.lit(1).alias("level"), F.col("leaf").alias("bucket"), f"d_{side}"
        )
        return c.unionAll(l)

    joined = digests(base, "a").join(digests(replica_b, "b"), ["level", "bucket"], "full_outer")
    return (
        joined.filter(~F.col("d_a").eqNullSafe(F.col("d_b")))
        .select(F.col("level").cast("int").alias("level"), F.col("bucket").cast("int").alias("bucket"))
        .orderBy("level", "bucket")
    )


MERKLE_DIFF_AUDIT_SQL = f"""
WITH base AS (
  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), target AS (
  SELECT min(o_orderkey) AS tk FROM base
  WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0'
), rb AS (
  SELECT o_orderkey,
         cents + CASE WHEN o_orderkey = (SELECT tk FROM target) THEN 1 ELSE 0 END AS cents
  FROM base
), ha AS (
  SELECT o_orderkey % {_MERKLE_COARSE} AS coarse, o_orderkey % {_MERKLE_LEAF} AS leaf,
         ('0x' || substring(md5(CAST(o_orderkey AS VARCHAR) || ':' || CAST(cents AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM base
), hb AS (
  SELECT o_orderkey % {_MERKLE_COARSE} AS coarse, o_orderkey % {_MERKLE_LEAF} AS leaf,
         ('0x' || substring(md5(CAST(o_orderkey AS VARCHAR) || ':' || CAST(cents AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM rb
), da AS (
  SELECT 0 AS level, coarse AS bucket, bit_xor(h) AS d_a FROM ha GROUP BY coarse
  UNION ALL
  SELECT 1, leaf, bit_xor(h) FROM ha GROUP BY leaf
), db AS (
  SELECT 0 AS level, coarse AS bucket, bit_xor(h) AS d_b FROM hb GROUP BY coarse
  UNION ALL
  SELECT 1, leaf, bit_xor(h) FROM hb GROUP BY leaf
)
SELECT CAST(level AS INTEGER) AS level, CAST(bucket AS INTEGER) AS bucket
FROM da JOIN db USING (level, bucket)
WHERE d_a IS DISTINCT FROM d_b
ORDER BY level, bucket
"""


def length_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test between the same two sources'
    length distributions — EMD's sibling statistic (sup-norm of the CDF
    gap instead of its integral), the standard drift detector between a
    training corpus and fresh data. Emits D, the n/m sizes, the α=0.05
    critical value c(α)·√((n+m)/nm) with c(0.05)=1.358, and the reject
    flag. Same bounded-histogram CDF machinery as length_emd: group to
    per-length counts first, one window over distinct lengths.
    """
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents", spread=True)
    a, b = _EMD_SRC
    hist = (
        docs.filter(F.col("source").isin(list(_EMD_SRC)))
        .groupBy("n_chars")
        .agg(
            F.sum((F.col("source") == a).cast("long")).alias("ca"),
            F.sum((F.col("source") == b).cast("long")).alias("cb"),
        )
    )
    tot = hist.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    w = W.orderBy("n_chars").rowsBetween(W.unboundedPreceding, W.currentRow)
    gaps = (
        hist.crossJoin(F.broadcast(tot))
        .withColumn("cuma", F.sum("ca").over(w))
        .withColumn("cumb", F.sum("cb").over(w))
        .select(
            "na",
            "nb",
            # try_divide(x2): zero-doc source -> undefined CDF -> NULL KS
            F.abs(
                F.try_divide(F.col("cuma").cast("double"), F.col("na"))
                - F.try_divide(F.col("cumb").cast("double"), F.col("nb"))
            ).alias("gap"),
        )
    )
    out = gaps.groupBy("na", "nb").agg(F.round(F.max("gap"), 6).alias("ks_d"))
    # double casts on BOTH factors: na*nb in bigint would overflow past
    # ~3e9-row samples; try_divide covers the zero-doc source
    crit = 1.358 * F.sqrt(
        F.try_divide(
            (F.col("na") + F.col("nb")).cast("double"),
            F.col("na").cast("double") * F.col("nb").cast("double"),
        )
    )
    return out.select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        "ks_d",
        F.round(crit, 6).alias("crit_05"),
        (F.col("ks_d") > F.round(crit, 6)).alias("reject_same_dist"),
    )


LENGTH_KS_TEST_SQL = f"""
WITH hist AS (
  SELECT n_chars,
         CAST(sum(CASE WHEN source = '{_EMD_SRC[0]}' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(sum(CASE WHEN source = '{_EMD_SRC[1]}' THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM documents WHERE source IN ('{_EMD_SRC[0]}', '{_EMD_SRC[1]}')
  GROUP BY n_chars
), tot AS (
  SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb FROM hist
), gaps AS (
  SELECT na, nb,
         abs(CAST(cuma AS DOUBLE) / na - CAST(cumb AS DOUBLE) / nb) AS gap
  FROM (
    SELECT n_chars,
           sum(ca) OVER (ORDER BY n_chars ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
           sum(cb) OVER (ORDER BY n_chars ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb
    FROM hist
  ) CROSS JOIN tot
)
SELECT na AS n_a, nb AS n_b,
       round(max(gap), 6) AS ks_d,
       round(1.358 * sqrt(CAST(na + nb AS DOUBLE) / (na * nb)), 6) AS crit_05,
       round(max(gap), 6) > round(1.358 * sqrt(CAST(na + nb AS DOUBLE) / (na * nb)), 6)
         AS reject_same_dist
FROM gaps
GROUP BY na, nb
"""


_BOOT_B = 32
#: cumulative Poisson(1) pmf thresholds for multiplicities 0..4 (tail mass
#: above 4 folds into 4); literal doubles so both engines compare equal.
_POIS_CDF = (0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
             0.9810118431238462, 1.0)


def bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence interval for mean order value — the
    resampling-with-replacement estimator that actually distributes
    (Chamandy et al., "Estimating uncertainty for massive data streams",
    Google 2012, public): instead of materializing B resamples, each row
    draws a Poisson(1) multiplicity per replicate from a DETERMINISTIC
    hash uniform, so one scan with a B-way map fan-out yields all B
    replicate means; the CI is the percentile band of those B values.
    No RNG state → same CI on every engine, retry, and partitioning.

    One row: point estimate, 2.5%/97.5% percentile bounds, replicate
    count. Scale shape: B-way explode then a B-key agg with map-side
    partials; the percentile runs over B=32 rows.
    """
    from pyspark.sql.window import Window as W

    orders = load_table(spark, sf_dir, "orders", spread=True)
    reps = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.explode(F.expr(f"sequence(0, {_BOOT_B - 1})")).alias("r"),
        "o_orderkey",
    ).withColumn(
        "u",
        F.expr(
            "CAST(conv(substring(md5(concat(CAST(o_orderkey AS STRING), '#', "
            "CAST(r AS STRING))), 1, 8), 16, 10) AS BIGINT)"
        )
        / F.lit(4294967296.0),
    )
    wexpr = (
        F.when(F.col("u") < _POIS_CDF[0], 0)
        .when(F.col("u") < _POIS_CDF[1], 1)
        .when(F.col("u") < _POIS_CDF[2], 2)
        .when(F.col("u") < _POIS_CDF[3], 3)
        .otherwise(4)
    )
    rep_means = (
        reps.withColumn("w", wexpr)
        .groupBy("r")
        .agg(
            (
                # ansi: w in 0..4, so the product is <= 4x cents and the sum
                # stays well inside int64's $92e15-in-cents headroom;
                # try_divide: an all-zero-weight replicate (p ~ e^-n) has an
                # undefined mean -> NULL on both engines
                F.try_divide(
                    F.sum(F.col("w") * F.col("cents")).cast("double"),  # ansi: w<=4
                    F.sum("w"),
                )
                / 100.0
            ).alias("m")
        )
    )
    point = orders.agg(
        (
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).cast("double")
            / F.count(F.lit(1))
            / 100.0
        ).alias("mean_order")
    )
    ci = rep_means.agg(
        F.count(F.lit(1)).cast("bigint").alias("b"),
        F.round(F.expr("percentile(m, 0.025)"), 2).alias("ci_lo"),
        F.round(F.expr("percentile(m, 0.975)"), 2).alias("ci_hi"),
    )
    return point.crossJoin(ci).select(
        F.round("mean_order", 2).alias("mean_order"), "b", "ci_lo", "ci_hi"
    )


BOOTSTRAP_MEAN_CI_SQL = f"""
WITH reps AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents, r.x AS r,
         ('0x' || substring(md5(CAST(o_orderkey AS VARCHAR) || '#' ||
                            CAST(r.x AS VARCHAR)), 1, 8))::BIGINT
           / 4294967296.0 AS u
  FROM orders, range(0, {_BOOT_B}) AS r(x)
), weighted AS (
  SELECT r, cents,
         CASE WHEN u < {_POIS_CDF[0]!r} THEN 0
              WHEN u < {_POIS_CDF[1]!r} THEN 1
              WHEN u < {_POIS_CDF[2]!r} THEN 2
              WHEN u < {_POIS_CDF[3]!r} THEN 3
              ELSE 4 END AS w
  FROM reps
), rep_means AS (
  SELECT r, CAST(sum(w * cents) AS DOUBLE) / sum(w) / 100.0 AS m
  FROM weighted GROUP BY r
), point AS (
  SELECT round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / count(*) / 100.0, 2) AS mean_order
  FROM orders
)
SELECT mean_order,
       CAST((SELECT count(*) FROM rep_means) AS BIGINT) AS b,
       (SELECT round(quantile_cont(m, 0.025), 2) FROM rep_means) AS ci_lo,
       (SELECT round(quantile_cont(m, 0.975), 2) FROM rep_means) AS ci_hi
FROM point
"""


_SUB_K = 8  # duplicated-substring shingle width (tokens)


def substring_dedup_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style duplicated-substring removal plan (Lee et al.,
    "Deduplicating Training Data Makes Language Models Better", ACL 2022):
    every SLIDING 8-token window that occurs more than once in the corpus
    (including within one doc) is a duplicate; all but its globally-first
    occurrence (lowest doc_id, then position) are marked for removal, and
    overlapping/adjacent marked windows merge into MAXIMAL spans — the
    per-doc byte-range delete list the cleanup pass consumes. Differs from
    span_dedup (C4 fixed non-overlapping spans) exactly the way the paper's
    suffix-array pass differs from C4's hash pass: sliding windows + span
    coalescing find duplicated regions at any alignment.

    Scale shape (100 TB): the paper builds a single suffix array, which
    does not distribute; the Spark-first equivalent is this
    shingle-exchange — extraction is a codegen map (split + transform, one
    explode), the only corpus-sized shuffle is the rank over the shingle
    HASH (same exchange C4/RefinedWeb run): the 8-token text is folded to
    a 60-bit md5-derived BIGINT *before* the exchange, so the shuffle
    carries (doc_id, pos, 8-byte key) instead of ~8× corpus text — ~10×
    fewer bytes, same answer modulo md5 collisions, and the DuckDB oracle
    hashes identically so even a collision would affect both engines the
    same way. The island merge is one per-doc sort window whose input is
    already reduced to the marked positions. No UDFs, no driver state;
    skew-safe because 8-token shingles are near-unique keys."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    words = docs.select("doc_id", F.split("text", " ").alias("w"))
    sh = (
        words.filter(F.size("w") >= _SUB_K)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(w) - {_SUB_K} + 1), "
                    f"i -> struct(i AS pos, array_join(slice(w, i, {_SUB_K}), ' ') AS shingle))"
                )
            ).alias("s"),
        )
        .select(
            "doc_id",
            F.col("s.pos").alias("pos"),
            # ansi: 15 hex digits = 60 bits < 2^63, cast never overflows
            F.expr("cast(conv(substring(md5(s.shingle), 1, 15), 16, 10) as bigint)").alias(
                "sh_h"
            ),
        )
    )
    rk = Window.partitionBy("sh_h").orderBy("doc_id", "pos")
    marked = (
        sh.withColumn("rn", F.row_number().over(rk))
        .filter(F.col("rn") > 1)
        .select("doc_id", F.col("pos").alias("s"), (F.col("pos") + _SUB_K - 1).alias("e"))
    )
    wprev = Window.partitionBy("doc_id").orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    wrun = Window.partitionBy("doc_id").orderBy("s")
    isl = (
        marked.withColumn("prev_e", F.max("e").over(wprev))
        .withColumn(
            "brk",
            F.when(
                F.col("prev_e").isNull() | (F.col("s") > F.col("prev_e") + 1), 1
            ).otherwise(0),
        )
        .withColumn("iid", F.sum("brk").over(wrun))
    )
    agg = isl.groupBy("doc_id", "iid").agg(F.min("s").alias("is_"), F.max("e").alias("ie"))
    span_len = F.col("ie") - F.col("is_") + 1
    perdoc = agg.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum(span_len).cast("long").alias("tokens_removed"),
        F.max(span_len).cast("long").alias("max_span_tokens"),
    )
    dupsh = marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("dup_windows")
    )
    base = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    return (
        base.join(perdoc, "doc_id", "left")
        .join(dupsh, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("dup_windows", F.lit(0)).cast("long").alias("dup_windows"),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("tokens_removed", F.lit(0)).cast("long").alias("tokens_removed"),
            # ansi: n_tokens >= 1 (split('') is ['']); try_divide mirrors DuckDB /
            F.round(
                F.try_divide(F.coalesce("tokens_removed", F.lit(0)), F.col("n_tokens")), 6
            ).alias("dup_token_frac"),
            F.coalesce("max_span_tokens", F.lit(0)).cast("long").alias("max_span_tokens"),
        )
        .orderBy("doc_id")
    )


SUBSTRING_DEDUP_PLAN_SQL = f"""
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
sh AS (
  SELECT doc_id, i AS pos,
         ('0x' || substring(md5(array_to_string(w[i:i + {_SUB_K} - 1], ' ')), 1, 15))::BIGINT
           AS sh_h
  FROM words,
       LATERAL (SELECT unnest(range(1, greatest(len(w) - {_SUB_K} + 2, 1)))) t(i)
),
marked AS (
  SELECT doc_id, pos AS s, pos + {_SUB_K} - 1 AS e
  FROM (SELECT doc_id, pos, row_number() OVER (PARTITION BY sh_h ORDER BY doc_id, pos) AS rn FROM sh)
  WHERE rn > 1
),
iv AS (
  SELECT doc_id, s, e,
         CASE WHEN max(e) OVER w IS NULL OR s > max(e) OVER w + 1 THEN 1 ELSE 0 END AS brk
  FROM marked
  WINDOW w AS (PARTITION BY doc_id ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
isl AS (
  SELECT doc_id, s, e, sum(brk) OVER (PARTITION BY doc_id ORDER BY s) AS iid FROM iv
),
spans AS (
  SELECT doc_id, iid, min(s) AS is_, max(e) AS ie FROM isl GROUP BY doc_id, iid
),
perdoc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
         CAST(sum(ie - is_ + 1) AS BIGINT) AS tokens_removed,
         CAST(max(ie - is_ + 1) AS BIGINT) AS max_span_tokens
  FROM spans GROUP BY doc_id
),
dupsh AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dup_windows FROM marked GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
       coalesce(dup_windows, 0) AS dup_windows,
       coalesce(n_spans, 0) AS n_spans,
       coalesce(tokens_removed, 0) AS tokens_removed,
       round(CAST(coalesce(tokens_removed, 0) AS DOUBLE)
             / len(string_split(d.text, ' ')), 6) AS dup_token_frac,
       coalesce(max_span_tokens, 0) AS max_span_tokens
FROM documents d
LEFT JOIN perdoc USING (doc_id)
LEFT JOIN dupsh USING (doc_id)
ORDER BY d.doc_id
"""


QUERIES = [
    QuerySpec("span_dedup", span_dedup, SPAN_DEDUP_SQL, "C4-style corpus span dedup"),
    QuerySpec("substring_dedup_plan", substring_dedup_plan, SUBSTRING_DEDUP_PLAN_SQL, "ExactSubstr sliding-window dedup: maximal duplicated-span removal plan"),
    QuerySpec("segment_priority_chi2", segment_priority_chi2, SEGMENT_PRIORITY_CHI2_SQL, "Pearson chi-square independence audit over one contingency agg"),
    QuerySpec("segment_priority_mi", segment_priority_mi, SEGMENT_PRIORITY_MI_SQL, "mutual information + NMI over the same contingency agg (integer-nanos exact)"),
    QuerySpec("benford_audit", benford_audit, BENFORD_AUDIT_SQL, "Benford first-digit distribution audit of order totals"),
    QuerySpec("data_contract_audit", data_contract_audit, DATA_CONTRACT_AUDIT_SQL, "Deequ-style declarative constraint suite in one report"),
    QuerySpec("quality_grid_sweep", quality_grid_sweep, QUALITY_GRID_SWEEP_SQL, "single-scan multi-config threshold grid evaluation"),
    QuerySpec("length_emd", length_emd, LENGTH_EMD_SQL, "1-D Wasserstein distance between source length distributions (CDF-gap exact)"),
    QuerySpec("length_ks_test", length_ks_test, LENGTH_KS_TEST_SQL, "two-sample Kolmogorov-Smirnov drift test over the same CDF machinery"),
    QuerySpec("revenue_gini", revenue_gini, REVENUE_GINI_SQL, "per-nation Gini revenue-concentration audit (exact integer rank formula)"),
    QuerySpec("null_repair_audit", null_repair_audit, NULL_REPAIR_AUDIT_SQL, "mask-and-recover imputation audit (mode + exact-median repairs, graded)"),
    QuerySpec("merkle_diff_audit", merkle_diff_audit, MERKLE_DIFF_AUDIT_SQL, "anti-entropy Merkle range digests localizing a single mutated row"),
    QuerySpec("bootstrap_mean_ci", bootstrap_mean_ci, BOOTSTRAP_MEAN_CI_SQL, "deterministic Poisson-bootstrap CI for the mean (B replicate means in one scan)"),
    QuerySpec("boilerplate_prefixes", boilerplate_prefixes, BOILERPLATE_PREFIXES_SQL, "RefinedWeb-style boilerplate-prefix detection"),
    QuerySpec("point_in_time_state", point_in_time_state, POINT_IN_TIME_STATE_SQL, "feature-store point-in-time join vs SCD2 dimension"),
    QuerySpec("zipf_fit", zipf_fit, ZIPF_FIT_SQL, "Zipf exponent corpus QA"),
    QuerySpec("ngram_diversity", ngram_diversity, NGRAM_DIVERSITY_SQL, "distinct-n / TTR diversity per source"),
    QuerySpec("key_skew_audit", key_skew_audit, KEY_SKEW_AUDIT_SQL, "hot-key / skew-ratio report for shuffle keys"),
    QuerySpec(
        "zorder_skipping", zorder_skipping, ZORDER_SKIPPING_SQL, "Z-order data-skipping audit"
    ),
    QuerySpec(
        "referential_audit", referential_audit, REFERENTIAL_AUDIT_SQL, "constraint audit report"
    ),
    QuerySpec(
        "user_state_intervals",
        user_state_intervals,
        USER_STATE_INTERVALS_SQL,
        "SCD2 gaps-and-islands interval build",
    ),
    QuerySpec("numeric_profile", numeric_profile, NUMERIC_PROFILE_SQL, "moment/regression profile"),
    QuerySpec(
        "robust_outliers", robust_outliers, ROBUST_OUTLIERS_SQL, "median/MAD modified-z outliers"
    ),
    QuerySpec("moving_median", moving_median, MOVING_MEDIAN_SQL, "windowed exact median"),
    QuerySpec("dow_hour_heatmap", dow_hour_heatmap, DOW_HOUR_HEATMAP_SQL, "calendar heatmap cells"),
]

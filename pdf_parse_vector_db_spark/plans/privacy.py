"""Privacy operators for training-data pipelines (north-star X5 extension).

PII handling is a standard pre-training stage: detect and mask direct
identifiers in text, and pseudonymize user keys in behavioural logs before
they enter a training corpus. Both queries are pure map + small agg — at
100 TB they are scan-bound with whole-stage codegen end to end (regexp and
hash functions are JVM built-ins, no UDFs).

The fixture corpus is synthetic word-salad with no real PII, so the PII
query first INJECTS deterministic identifiers derived from doc_id (the
same device as the language markers in plans/textanalysis.py) — every
doc_id ≡ 0 (mod 7) gains an email, ≡ 0 (mod 11) a phone — then the
detector must find exactly those. Determinism makes the query
oracle-checkable: both engines inject and detect identically.

No reference citation: the reference has no PII stage; driver-mandated
extension (BASELINE.json), modeled on public corpus-prep practice (e.g.
the C4/MassiveText cleanup stages).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_parse_vector_db_spark.plans.registry import QuerySpec
from pdf_parse_vector_db_spark.sources.registry import load_table

_EMAIL_RE = "[a-z0-9]+@[a-z]+\\.[a-z]+"
_PHONE_RE = "555-[0-9]{4}"

# doc_id-derived injection, identical on both engines
_INJECT_SPARK = (
    "concat_ws(' ', text, "
    "CASE WHEN doc_id % 7 = 0 THEN concat('contact user', cast(doc_id AS string), '@example.com') END, "
    "CASE WHEN doc_id % 11 = 0 THEN concat('call 555-', lpad(cast(doc_id % 10000 AS string), 4, '0')) END)"
)
_INJECT_DUCK = (
    "concat_ws(' ', text, "
    "CASE WHEN doc_id % 7 = 0 THEN concat('contact user', CAST(doc_id AS VARCHAR), '@example.com') END, "
    "CASE WHEN doc_id % 11 = 0 THEN concat('call 555-', lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')) END)"
)


def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc PII audit: email/phone hit counts, a has_pii flag, and the
    length of the text after masking both classes with fixed tags. The
    masking pass is what a real pipeline writes back; the counts are its
    audit trail."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    t = F.expr(_INJECT_SPARK)
    masked = F.regexp_replace(
        F.regexp_replace(t, _EMAIL_RE, "[EMAIL]"), _PHONE_RE, "[PHONE]"
    )
    n_emails = F.expr(f"regexp_count({_INJECT_SPARK}, '{_EMAIL_RE}')")
    n_phones = F.expr(f"regexp_count({_INJECT_SPARK}, '{_PHONE_RE}')")
    return (
        docs.select(
            "doc_id",
            n_emails.alias("n_emails"),
            n_phones.alias("n_phones"),
            ((n_emails + n_phones) > 0).alias("has_pii"),
            F.length(masked).alias("redacted_len"),
        )
        .orderBy("doc_id")
    )


PII_REDACTION_SQL = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all({_INJECT_DUCK}, '{_EMAIL_RE}')) AS BIGINT)
         AS n_emails,
       CAST(len(regexp_extract_all({_INJECT_DUCK}, '{_PHONE_RE}')) AS BIGINT)
         AS n_phones,
       len(regexp_extract_all({_INJECT_DUCK}, '{_EMAIL_RE}'))
         + len(regexp_extract_all({_INJECT_DUCK}, '{_PHONE_RE}')) > 0 AS has_pii,
       CAST(length(regexp_replace(regexp_replace({_INJECT_DUCK},
              '{_EMAIL_RE}', '[EMAIL]', 'g'), '{_PHONE_RE}', '[PHONE]', 'g'))
         AS BIGINT) AS redacted_len
FROM documents
ORDER BY doc_id
"""


def pseudonymize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-key pseudonymization of the events log: replace user_id with a
    sha256-derived token (16 hex chars — irreversible without the mapping,
    stable across engines/retries), then per-token activity stats. The
    groupBy shuffles 8-byte-ish tokens, never raw identifiers."""
    events = load_table(spark, sf_dir, "events", spread=True)
    token = F.substring(F.sha2(F.col("user_id").cast("string"), 256), 1, 16)
    return (
        events.select(token.alias("user_token"), "event_type", "value")
        .groupBy("user_token")
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.countDistinct("event_type").alias("event_types"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy("user_token")
    )


PSEUDONYMIZE_EVENTS_SQL = """
SELECT substring(sha256(CAST(user_id AS VARCHAR)), 1, 16) AS user_token,
       count(*) AS events,
       CAST(count(DISTINCT event_type) AS BIGINT) AS event_types,
       round(sum(value), 4) AS total_value
FROM events
GROUP BY 1
ORDER BY user_token
"""


def gdpr_delete_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten propagation audit: given a deletion-request
    dimension (deterministic stand-in: users with user_id % 29 == 0,
    customers with c_custkey % 97 == 0), report rows to delete vs keep in
    every user-keyed table — events by request key directly, orders by
    CASCADE through the customer table (orders of deleted customers).

    Scale shape: the request dim broadcasts; each fact table takes one
    scan with a broadcast semi-join flag and a 2-row agg — no fact table
    ever shuffles. The delete itself would be the same plans re-written
    as anti-join writes (upsert_chunks shows the write side); this query
    is the audit both runs."""
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")

    subjects = events.select("user_id").distinct().filter(F.col("user_id") % 29 == 0)
    del_cust = customer.select("c_custkey").filter(F.col("c_custkey") % 97 == 0)

    def audit(df: DataFrame, key: str, dim: DataFrame, dim_key: str, name: str) -> DataFrame:
        flagged = df.join(
            F.broadcast(dim.withColumnRenamed(dim_key, key).withColumn("__del", F.lit(True))),
            on=key,
            how="left",
        )
        return flagged.agg(
            F.lit(name).alias("table_name"),
            F.sum(F.when(F.col("__del"), 1).otherwise(0)).alias("rows_deleted"),
            F.sum(F.when(F.col("__del").isNull(), 1).otherwise(0)).alias("rows_kept"),
        )

    return (
        audit(events, "user_id", subjects, "user_id", "events")
        .unionByName(audit(customer, "c_custkey", del_cust, "c_custkey", "customer"))
        .unionByName(
            audit(
                orders.withColumnRenamed("o_custkey", "c_custkey"),
                "c_custkey",
                del_cust,
                "c_custkey",
                "orders",
            )
        )
        .orderBy("table_name")
    )


GDPR_DELETE_AUDIT_SQL = """
WITH subjects AS (
  SELECT DISTINCT user_id FROM events WHERE user_id % 29 = 0
),
del_cust AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0)
SELECT 'customer' AS table_name,
       CAST(sum(CASE WHEN c_custkey IN (SELECT c_custkey FROM del_cust) THEN 1 ELSE 0 END) AS BIGINT)
         AS rows_deleted,
       CAST(sum(CASE WHEN c_custkey IN (SELECT c_custkey FROM del_cust) THEN 0 ELSE 1 END) AS BIGINT)
         AS rows_kept
FROM customer
UNION ALL
SELECT 'events',
       CAST(sum(CASE WHEN user_id IN (SELECT user_id FROM subjects) THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(CASE WHEN user_id IN (SELECT user_id FROM subjects) THEN 0 ELSE 1 END) AS BIGINT)
FROM events
UNION ALL
SELECT 'orders',
       CAST(sum(CASE WHEN o_custkey IN (SELECT c_custkey FROM del_cust) THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(CASE WHEN o_custkey IN (SELECT c_custkey FROM del_cust) THEN 0 ELSE 1 END) AS BIGINT)
FROM orders
ORDER BY table_name
"""


def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (Sweeney 2002) over the customer table: group by
    the quasi-identifier tuple (nation, market segment, account-balance
    decile), then for each k threshold report how many equivalence classes
    and rows fall below k — the rows a release would have to suppress or
    generalize.

    Scale shape: one hash-aggregate on the QI tuple (map-side partial),
    then a tiny class-size histogram crossed with the 4-row k list — the
    QI agg is the only data-sized exchange, and its key space (nations ×
    segments × 10 deciles) is small and unskewed."""
    cust = load_table(spark, sf_dir, "customer", spread=True)
    classes = (
        cust.select(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000.0).alias("bal_bucket"),
        )
        .groupBy("c_nationkey", "c_mktsegment", "bal_bucket")
        .agg(F.count(F.lit(1)).alias("class_size"))
    )
    ks = spark.range(1).select(
        F.explode(F.array(*[F.lit(k) for k in (2, 5, 10, 20)])).alias("k")
    )
    return (
        classes.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("classes"),
            F.sum(F.when(F.col("class_size") < F.col("k"), 1).otherwise(0)).alias(
                "violating_classes"
            ),
            F.sum(
                F.when(F.col("class_size") < F.col("k"), F.col("class_size")).otherwise(0)
            ).alias("rows_at_risk"),
            F.round(
                F.sum(
                    F.when(F.col("class_size") < F.col("k"), F.col("class_size")).otherwise(0)
                )
                # ansi: sum of positive class sizes over a non-empty group
                / F.sum("class_size")
                * 100,
                4,
            ).alias("pct_at_risk"),
        )
        .orderBy("k")
    )


K_ANONYMITY_AUDIT_SQL = """
WITH classes AS (
  SELECT c_nationkey, c_mktsegment, floor(c_acctbal / 1000.0) AS bal_bucket,
         count(*) AS class_size
  FROM customer
  GROUP BY 1, 2, 3
),
ks AS (SELECT unnest([2, 5, 10, 20]) AS k)
SELECT CAST(k AS INT) AS k,
       count(*) AS classes,
       CAST(sum(CASE WHEN class_size < k THEN 1 ELSE 0 END) AS BIGINT)
         AS violating_classes,
       CAST(sum(CASE WHEN class_size < k THEN class_size ELSE 0 END) AS BIGINT)
         AS rows_at_risk,
       round(CAST(sum(CASE WHEN class_size < k THEN class_size ELSE 0 END) AS DOUBLE)
             / sum(class_size) * 100, 4) AS pct_at_risk
FROM classes CROSS JOIN ks
GROUP BY k
ORDER BY k
"""


#: inverse-CDF Laplace sampling from a DETERMINISTIC md5-derived uniform —
#: the same engine-portable hash device as hll_portable
#: (plans/relational.py:899-923), so the "noise" is bit-identical across
#: engines and the query stays oracle-checkable. u in (0,1), never 0.5.
_DP_EPSILONS = (0.1, 1.0)


def _dp_uniform_spark(key: str) -> str:
    return (
        f"(CAST(conv(substring(md5({key}), 1, 15), 16, 10) AS BIGINT) % 999999 + 0.5)"
        " / 1000000.0"
    )


def _dp_uniform_duck(key: str) -> str:
    return (
        f"((('0x' || substring(md5({key}), 1, 15))::BIGINT % 999999 + 0.5)"
        " / 1000000.0)"
    )


def dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private release of per-event-type counts via the
    Laplace mechanism (Dwork et al. 2006): count + Lap(1/eps) noise for a
    count query of sensitivity 1, at eps in {0.1, 1.0}.

    The Laplace draw uses inverse-CDF sampling from a deterministic
    md5-derived uniform (seeded by event_type and eps) instead of a PRNG —
    NOT private in production, but it makes the mechanism's arithmetic
    reproducible across engines and retries, which is what the correctness
    gate needs; swapping the uniform for rand() recovers the real
    mechanism unchanged. Scale: one partial-agg count plus per-group O(1)
    noise math."""
    events = load_table(spark, sf_dir, "events", spread=True)
    base = events.groupBy("event_type").agg(F.count(F.lit(1)).alias("true_count"))
    out = base
    for eps in _DP_EPSILONS:
        tag = str(eps).replace(".", "_")
        u = F.expr(_dp_uniform_spark(f"concat(event_type, ':{eps}')"))
        shifted = u - F.lit(0.5)
        noise = (
            F.lit(-1.0 / eps)  # ansi: Python constant math, eps > 0
            * F.signum(shifted)
            * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(shifted))
        )
        out = out.withColumn(
            f"noisy_eps{tag}", F.round(F.col("true_count") + noise, 4)
        )
    return out.orderBy("event_type")


def _dp_noise_duck(eps: float) -> str:
    u = _dp_uniform_duck(f"concat(event_type, ':{eps}')")
    return (
        f"(-1.0 / {eps}) * sign({u} - 0.5)"
        f" * ln(1.0 - 2.0 * abs({u} - 0.5))"
    )


_DP_NOISE_DUCK = {eps: _dp_noise_duck(eps) for eps in _DP_EPSILONS}

DP_NOISY_COUNTS_SQL = f"""
SELECT event_type,
       count(*) AS true_count,
       round(count(*) + {_DP_NOISE_DUCK[0.1]}, 4) AS noisy_eps0_1,
       round(count(*) + {_DP_NOISE_DUCK[1.0]}, 4) AS noisy_eps1_0
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007), the k-anonymity
    companion: a QI class can be k-large yet leak the sensitive attribute
    if every record in it shares one value. Release shape: one record per
    order carrying its customer's quasi-identifiers (nation, segment,
    balance-decile — the same QI as k_anonymity_audit) with
    o_orderpriority as the sensitive attribute; a class is l-diverse when
    it contains >= l distinct priorities. Report, per l in {2,3,4,5}:
    classes, violating classes, and records at risk.

    Scale shape: one fact-side shuffle — orders join the broadcast
    customer QI projection, then a single hash-agg on the QI tuple
    computing (class_size, distinct sensitive) with map-side partials;
    the l-grid cross join touches only the tiny class table. At 100 TB
    the distinct count per class is the only memory concern and its
    domain (5 priorities) is constant."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders", spread=True)
    qi = cust.select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).alias("bal_bucket"),
    )
    recs = orders.join(
        F.broadcast(qi), orders.o_custkey == qi.c_custkey
    ).select("c_nationkey", "c_mktsegment", "bal_bucket", "o_orderpriority")
    classes = recs.groupBy("c_nationkey", "c_mktsegment", "bal_bucket").agg(
        F.count(F.lit(1)).alias("class_size"),
        F.countDistinct("o_orderpriority").alias("l_actual"),
    )
    ls = spark.range(1).select(
        F.explode(F.array(*[F.lit(v) for v in (2, 3, 4, 5)])).alias("l")
    )
    return (
        classes.crossJoin(F.broadcast(ls))
        .groupBy("l")
        .agg(
            F.count(F.lit(1)).cast("long").alias("classes"),
            F.sum(F.when(F.col("l_actual") < F.col("l"), 1).otherwise(0))
            .cast("long")
            .alias("violating_classes"),
            F.sum(
                F.when(F.col("l_actual") < F.col("l"), F.col("class_size")).otherwise(0)
            )
            .cast("long")
            .alias("records_at_risk"),
            F.round(
                F.sum(
                    F.when(F.col("l_actual") < F.col("l"), F.col("class_size")).otherwise(
                        0
                    )
                )
                # ansi: sum of positive class sizes over a non-empty group
                / F.sum("class_size")
                * 100,
                4,
            ).alias("pct_at_risk"),
        )
        .orderBy("l")
    )


L_DIVERSITY_AUDIT_SQL = """
WITH classes AS (
  SELECT c.c_nationkey, c.c_mktsegment, floor(c.c_acctbal / 1000.0) AS bal_bucket,
         count(*) AS class_size,
         count(DISTINCT o.o_orderpriority) AS l_actual
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2, 3
),
ls AS (SELECT unnest([2, 3, 4, 5]) AS l)
SELECT CAST(l AS INT) AS l,
       CAST(count(*) AS BIGINT) AS classes,
       CAST(sum(CASE WHEN l_actual < l THEN 1 ELSE 0 END) AS BIGINT)
         AS violating_classes,
       CAST(sum(CASE WHEN l_actual < l THEN class_size ELSE 0 END) AS BIGINT)
         AS records_at_risk,
       round(CAST(sum(CASE WHEN l_actual < l THEN class_size ELSE 0 END) AS DOUBLE)
             / sum(class_size) * 100, 4) AS pct_at_risk
FROM classes CROSS JOIN ls
GROUP BY l
ORDER BY l
"""


QUERIES = [
    QuerySpec("l_diversity_audit", l_diversity_audit, L_DIVERSITY_AUDIT_SQL, "X5 l-diversity sensitive-attribute audit over the k-anonymity QI classes"),
    QuerySpec("pii_redaction", pii_redaction, PII_REDACTION_SQL, "X5 PII detect/mask audit"),
    QuerySpec("pseudonymize_events", pseudonymize_events, PSEUDONYMIZE_EVENTS_SQL, "X5 user-key pseudonymization"),
    QuerySpec("gdpr_delete_audit", gdpr_delete_audit, GDPR_DELETE_AUDIT_SQL, "X5 right-to-be-forgotten cascade audit"),
    QuerySpec("k_anonymity_audit", k_anonymity_audit, K_ANONYMITY_AUDIT_SQL, "X5 k-anonymity QI class-size audit"),
    QuerySpec("dp_noisy_counts", dp_noisy_counts, DP_NOISY_COUNTS_SQL, "X5 Laplace-mechanism DP counts (deterministic twin)"),
]

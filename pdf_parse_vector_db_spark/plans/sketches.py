"""Engine-portable approximate-query sketches (north-star §2.10 ext).

Companions to hll_portable (plans/relational.py:899): each sketch here is
built from md5-derived hashes that both engines compute bit-identically, so
the APPROXIMATION ITSELF — not just the exact audit columns — sits under the
driver's value hash. That is the difference from engine-internal sketches
(approx_count_distinct, approx_percentile), whose internals differ per
engine and can only be rows-only checked.

* cms_heavy_hitters — Count-Min sketch (Cormode & Muthukrishnan 2005):
  d=4 salted hash rows × w=512 counters; point estimate = min over rows of
  the counter at the key's bucket. Guarantees est >= true and
  est <= true + eps*N with eps = e/w. The query builds the sketch over the
  events stream, then reads back estimates for the exact top-10 users and
  reports the overestimate — the standard sketch-vs-truth audit.
* hist_quantiles — fixed-grid equi-width histogram (1000 bins) quantile
  estimator vs the exact interpolated percentile, per event type. The
  histogram is THE mergeable one-pass quantile structure that survives any
  partitioning; the audit column shows the grid-resolution error bound
  (width/2) holds.

Scale posture (100 TB):
* cms: the sketch agg has a FIXED key space (4×512 = 2048 cells) with
  map-side partial aggregation — each executor emits at most 2048 rows no
  matter the input size, the textbook mergeable-summary shuffle shape. The
  exact-counts side is the audit and would be dropped in production.
* hist: two passes over events (min/max, then binned counts) but the
  second agg's key space is |event_types| × 1000 — again a fixed-size
  exchange independent of row count. The window over cumulative bin counts
  orders ≤1000 rows per group.

No reference citation: the reference has no sketching; driver-mandated
extension (BASELINE.json north_star) modeled on the published CMS/HLL
literature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pdf_parse_vector_db_spark.plans.registry import QuerySpec
from pdf_parse_vector_db_spark.sources.registry import load_table

_CMS_D = 4
_CMS_W = 512
_TOPN = 10


def _cms_bucket_spark(i: int) -> str:
    return (
        f"CAST(conv(substring(md5(concat('{i}:', CAST(user_id AS STRING))), 1, 15),"
        f" 16, 10) AS BIGINT) % {_CMS_W}"
    )


def _cms_bucket_duck(i: int) -> str:
    return (
        f"('0x' || substring(md5(concat('{i}:', CAST(user_id AS VARCHAR))), 1, 15))"
        f"::BIGINT % {_CMS_W}"
    )


def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min point estimates for the exact top-10 users by event count,
    with the sketch's signature one-sided error surfaced as `overestimate`.

    The stack() fans each event into its d=4 (row, bucket) cells BEFORE the
    aggregate, so the shuffle carries at most d*w=2048 distinct keys after
    map-side combine — constant-size regardless of input rows."""
    events = load_table(spark, sf_dir, "events", spread=True)
    cells = ", ".join(f"{i}, {_cms_bucket_spark(i)}" for i in range(_CMS_D))
    sketch = (
        events.select(F.expr(f"stack({_CMS_D}, {cells}) AS (row_i, bucket)"))
        .groupBy("row_i", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("user_id"))
        .limit(_TOPN)
    )
    probes = top.select(
        "user_id",
        "exact_cnt",
        F.expr(f"stack({_CMS_D}, {cells}) AS (row_i, bucket)"),
    )
    return (
        probes.join(F.broadcast(sketch), on=["row_i", "bucket"])
        .groupBy("user_id", "exact_cnt")
        .agg(F.min("cnt").alias("cms_est"))
        .withColumn("overestimate", F.col("cms_est") - F.col("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("user_id"))
    )


_CMS_CELLS_DUCK = " UNION ALL ".join(
    f"SELECT {i} AS row_i, {_cms_bucket_duck(i)} AS bucket FROM events"
    for i in range(_CMS_D)
)
_CMS_PROBE_DUCK = " UNION ALL ".join(
    f"SELECT user_id, exact_cnt, {i} AS row_i, {_cms_bucket_duck(i)} AS bucket FROM top"
    for i in range(_CMS_D)
)

CMS_HEAVY_HITTERS_SQL = f"""
WITH cells AS ({_CMS_CELLS_DUCK}),
sketch AS (
  SELECT row_i, bucket, count(*) AS cnt FROM cells GROUP BY 1, 2
),
top AS (
  SELECT user_id, count(*) AS exact_cnt FROM events
  GROUP BY user_id ORDER BY exact_cnt DESC, user_id LIMIT {_TOPN}
),
probes AS ({_CMS_PROBE_DUCK})
SELECT p.user_id, p.exact_cnt, min(s.cnt) AS cms_est,
       min(s.cnt) - p.exact_cnt AS overestimate
FROM probes p JOIN sketch s USING (row_i, bucket)
GROUP BY p.user_id, p.exact_cnt
ORDER BY exact_cnt DESC, user_id
"""


_HIST_BINS = 1000
_HQS = (0.5, 0.9, 0.99)


def hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width-histogram quantile estimates vs exact percentiles per
    event type. Estimate for quantile q = center of the first bin whose
    cumulative count reaches q*n; `max_grid_err` is the bin half-width the
    estimate is guaranteed to stay within."""
    events = load_table(spark, sf_dir, "events", spread=True)
    stats = events.groupBy("event_type").agg(
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
        F.count(F.lit(1)).alias("n"),
    )
    binned = (
        events.join(F.broadcast(stats), on="event_type")
        .withColumn(
            "bin",
            # try_divide: a constant-valued event_type has mx = mn -> NULL
            # bin ratio; both engines' least() skips the NULL arm, so the
            # degenerate type collapses into the top bin identically
            F.least(
                F.lit(_HIST_BINS - 1),
                F.floor(
                    F.try_divide(
                        F.col("value") - F.col("mn"), F.col("mx") - F.col("mn")
                    )
                    * _HIST_BINS
                ),
            ),
        )
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("bc"))
    )
    cum = binned.withColumn(
        "cum",
        F.sum("bc").over(
            Window.partitionBy("event_type").orderBy("bin").rowsBetween(
                Window.unboundedPreceding, 0
            )
        ),
    ).join(F.broadcast(stats), on="event_type")
    qbins = cum.groupBy("event_type", "mn", "mx", "n").agg(
        *[
            F.min(F.when(F.col("cum") >= F.col("n") * q, F.col("bin"))).alias(
                f"qb{int(q * 100)}"
            )
            for q in _HQS
        ]
    )
    exact = events.groupBy("event_type").agg(
        *[
            F.expr(f"percentile(value, {q})").alias(f"exact_p{int(q * 100)}")
            for q in _HQS
        ]
    )
    # estimate arithmetic runs in EXACT integer micros: the 2-dp inputs put
    # ~10% of float estimates on a 4-dp half-way boundary, where Spark
    # (BigDecimal of the shortest repr, HALF_UP) and DuckDB (binary value)
    # round differently — integer div then /1e6 is bit-identical instead
    mn_mi = F.expr("CAST(round(mn * 1000000) AS BIGINT)")
    mx_mi = F.expr("CAST(round(mx * 1000000) AS BIGINT)")
    out = (
        qbins.join(exact, on="event_type")
        .withColumn("mn_mi", mn_mi)
        .withColumn("mx_mi", mx_mi)
        .select(
            "event_type",
            F.col("n"),
            *[
                (
                    F.expr(
                        f"(mn_mi * {2 * _HIST_BINS} + (2 * qb{int(q * 100)} + 1)"
                        f" * (mx_mi - mn_mi)) div {2 * _HIST_BINS}"
                    )
                    / 1000000.0
                ).alias(f"est_p{int(q * 100)}")
                for q in _HQS
            ],
            *[
                F.round(F.col(f"exact_p{int(q * 100)}"), 4).alias(
                    f"exact_p{int(q * 100)}"
                )
                for q in _HQS
            ],
            (
                F.expr(f"(mx_mi - mn_mi) div {2 * _HIST_BINS}") / 1000000.0
            ).alias("max_grid_err"),
        )
    )
    return out.orderBy("event_type")


# estimates in exact integer micros (see hist_quantiles docstring comment):
# integer div by 2*bins then /1e6 — no float rounding anywhere
_HQ_EST_DUCK = ",\n       ".join(
    f"CAST((mn_mi * {2 * _HIST_BINS} + (2 * qb{int(q * 100)} + 1)"
    f" * (mx_mi - mn_mi)) // {2 * _HIST_BINS} AS DOUBLE) / 1000000"
    f" AS est_p{int(q * 100)}"
    for q in _HQS
)
_HQ_QB_DUCK = ",\n         ".join(
    f"min(CASE WHEN cum >= n * {q} THEN bin END) AS qb{int(q * 100)}" for q in _HQS
)
_HQ_EXACT_DUCK = ",\n       ".join(
    f"round(quantile_cont(value, {q}), 4) AS exact_p{int(q * 100)}" for q in _HQS
)

HIST_QUANTILES_SQL = f"""
WITH stats AS (
  SELECT event_type, min(value) AS mn, max(value) AS mx, count(*) AS n
  FROM events GROUP BY 1
),
binned AS (
  SELECT e.event_type,
         least({_HIST_BINS - 1},
               CAST(floor((e.value - s.mn) / (s.mx - s.mn) * {_HIST_BINS}) AS BIGINT))
           AS bin,
         count(*) AS bc
  FROM events e JOIN stats s USING (event_type)
  GROUP BY 1, 2
),
cum AS (
  SELECT b.event_type, b.bin, s.mn, s.mx, s.n,
         sum(b.bc) OVER (PARTITION BY b.event_type ORDER BY b.bin
                         ROWS UNBOUNDED PRECEDING) AS cum
  FROM binned b JOIN stats s USING (event_type)
),
qbins AS (
  SELECT event_type, mn, mx, n,
         CAST(round(mn * 1000000) AS BIGINT) AS mn_mi,
         CAST(round(mx * 1000000) AS BIGINT) AS mx_mi,
         {_HQ_QB_DUCK}
  FROM cum GROUP BY 1, 2, 3, 4
),
exact AS (
  SELECT event_type,
       {_HQ_EXACT_DUCK}
  FROM events GROUP BY 1
)
SELECT q.event_type,
       q.n,
       {_HQ_EST_DUCK},
       exact_p50, exact_p90, exact_p99,
       CAST((mx_mi - mn_mi) // {2 * _HIST_BINS} AS DOUBLE) / 1000000
         AS max_grid_err
FROM qbins q JOIN exact USING (event_type)
ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Portable Bloom filter (Bloom 1970) — the third classic mergeable summary,
# next to CMS (frequency) and HLL (cardinality): set MEMBERSHIP with
# one-sided error. k=4 salted md5 hashes into m=16384 bits; the filter is
# the DISTINCT set of lit bit positions, a fixed-size (≤ m rows) exchange
# with map-side partials no matter the input row count — the same mergeable
# shape Spark's native bloom_filter_agg builds JVM-side (that one is the
# production twin; its serialized bits aren't cross-engine comparable, which
# is why this audit derives the bits from md5 so the WHOLE filter sits under
# the oracle hash).
#
# The audit: build over the distinct lineitem order keys, probe (a) every
# true member — zero false negatives is the structural guarantee the query
# proves — and (b) an equal-sized disjoint key set (keys + 10^7), whose hit
# rate IS the realized false-positive rate, reported next to the
# (1 - e^{-kn/m})^k prediction. Probing joins the probe keys' k positions
# against the broadcast filter; at scale that is a broadcast-hash join with
# a 16384-row build side.
# --------------------------------------------------------------------------

_BF_K = 4
_BF_M = 16384
_BF_SHIFT = 10_000_000


def _bf_pos_spark(i: int, key: str) -> str:
    return (
        f"CAST(conv(substring(md5(concat('{i}:', CAST({key} AS STRING))), 1, 15),"
        f" 16, 10) AS BIGINT) % {_BF_M}"
    )


def _bf_pos_duck(i: int, key: str) -> str:
    return (
        f"('0x' || substring(md5(concat('{i}:', CAST({key} AS VARCHAR))), 1, 15))"
        f"::BIGINT % {_BF_M}"
    )


def bloom_filter_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    # MEASURED: localCheckpoint()ing `keys`/`bits` here does NOT help
    # (2.7 s -> 3.0 s at sf0.1) — Catalyst already reuses the distinct's
    # exchange across the three consumers, so the eager cut only adds
    # materialization; contrast kcore_peel, where the re-derived subplan
    # is a multi-join no exchange reuse covers
    keys = li.select(F.col("l_orderkey").alias("key")).distinct()

    def stack_positions(df, key_expr):
        cells = ", ".join(_bf_pos_spark(i, key_expr) for i in range(_BF_K))
        return df.select("key", F.expr(f"stack({_BF_K}, {cells}) AS (pos)"))

    bits = stack_positions(keys, "key").select("pos").distinct()

    members = keys.withColumn("is_member", F.lit(True))
    ghosts = keys.select((F.col("key") + _BF_SHIFT).alias("key")).withColumn(
        "is_member", F.lit(False)
    )
    probes = members.unionByName(ghosts)
    cells = ", ".join(f"is_member, {_bf_pos_spark(i, 'key')}" for i in range(_BF_K))
    probe_pos = probes.select(
        "key", F.expr(f"stack({_BF_K}, {cells}) AS (is_member, pos)")
    )
    hits = (
        probe_pos.join(F.broadcast(bits.withColumn("lit_bit", F.lit(1))), on="pos", how="left")
        .groupBy("key", "is_member")
        .agg(F.sum(F.coalesce(F.col("lit_bit"), F.lit(0))).alias("hit_bits"))
        .withColumn("claimed", (F.col("hit_bits") == _BF_K).cast("int"))
    )
    n_bits = bits.agg(F.count(F.lit(1)).alias("bits_set"))
    return (
        hits.groupBy("is_member")
        .agg(
            F.count(F.lit(1)).alias("n_probed"),
            F.sum("claimed").alias("n_claimed"),
            F.round(F.sum("claimed").cast("double") / F.count(F.lit(1)), 6).alias("hit_rate"),
        )
        .crossJoin(F.broadcast(n_bits))
        .withColumn(
            "predicted_fpr",
            F.round(
                F.pow(
                    F.lit(1.0)
                    - F.exp(
                        -F.lit(float(_BF_K))
                        * (F.col("n_probed").cast("double") / _BF_M)
                    ),
                    F.lit(float(_BF_K)),
                ),
                6,
            ),
        )
        .select("is_member", "n_probed", "n_claimed", "hit_rate", "bits_set", "predicted_fpr")
        .orderBy("is_member")
    )


def _bf_sql() -> str:
    build_cells = "\n      UNION ALL\n      ".join(
        f"SELECT {_bf_pos_duck(i, 'key')} AS pos FROM keys" for i in range(_BF_K)
    )
    probe_cells = "\n      UNION ALL\n      ".join(
        f"SELECT key, is_member, {_bf_pos_duck(i, 'key')} AS pos FROM probes"
        for i in range(_BF_K)
    )
    return f"""
WITH keys AS (SELECT DISTINCT l_orderkey AS key FROM lineitem),
bits AS (SELECT DISTINCT pos FROM (
      {build_cells})),
probes AS (
  SELECT key, TRUE AS is_member FROM keys
  UNION ALL
  SELECT key + {_BF_SHIFT} AS key, FALSE AS is_member FROM keys),
probe_pos AS (
      {probe_cells}),
hits AS (
  SELECT p.key, p.is_member,
         sum(CASE WHEN b.pos IS NULL THEN 0 ELSE 1 END) AS hit_bits
  FROM probe_pos p LEFT JOIN bits b USING (pos)
  GROUP BY p.key, p.is_member),
nb AS (SELECT CAST(count(*) AS BIGINT) AS bits_set FROM bits)
SELECT is_member,
       CAST(count(*) AS BIGINT) AS n_probed,
       CAST(sum(CASE WHEN hit_bits = {_BF_K} THEN 1 ELSE 0 END) AS BIGINT) AS n_claimed,
       round(CAST(sum(CASE WHEN hit_bits = {_BF_K} THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS hit_rate,
       nb.bits_set,
       round(pow(1.0 - exp(-{float(_BF_K)} * (CAST(count(*) AS DOUBLE) / {_BF_M})),
                 {float(_BF_K)}), 6) AS predicted_fpr
FROM hits CROSS JOIN nb
GROUP BY is_member, nb.bits_set
ORDER BY is_member
"""


BLOOM_FILTER_AUDIT_SQL = _bf_sql()


# --------------------------------------------------------------------------
# Join-size estimation by Count-Min inner product (Cormode & Muthukrishnan
# 2005 §4.2): |R ⋈_k S| = Σ_k f_R(k)·f_S(k), estimated per sketch row as
# the inner product of the two frequency rows and taken as min over the d
# rows — a one-sided overestimate, like CMS point queries. This is the
# sketch a cost-based planner consults BEFORE choosing a join strategy:
# two fixed 2048-cell summaries replace scanning either table again. The
# inner product joins the sketches on (row_i, bucket) — a constant-size
# co-group regardless of input rows — and every quantity is an exact
# integer, so the estimator itself sits under the oracle hash. The exact
# side (the true orders⋈lineitem pair count) is the audit.
# --------------------------------------------------------------------------


def _cms_key_bucket_spark(i: int, key: str) -> str:
    return (
        f"CAST(conv(substring(md5(concat('{i}:', CAST({key} AS STRING))), 1, 15),"
        f" 16, 10) AS BIGINT) % {_CMS_W}"
    )


def _cms_key_bucket_duck(i: int, key: str) -> str:
    return (
        f"('0x' || substring(md5(concat('{i}:', CAST({key} AS VARCHAR))), 1, 15))"
        f"::BIGINT % {_CMS_W}"
    )


def cms_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    orders = load_table(spark, sf_dir, "orders")

    def sketch(df, key):
        cells = ", ".join(f"{i}, {_cms_key_bucket_spark(i, key)}" for i in range(_CMS_D))
        return (
            df.select(F.expr(f"stack({_CMS_D}, {cells}) AS (row_i, bucket)"))
            .groupBy("row_i", "bucket")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    sl = sketch(li, "l_orderkey").withColumnRenamed("cnt", "cnt_l")
    so = sketch(orders, "o_orderkey").withColumnRenamed("cnt", "cnt_o")
    ests = (
        sl.join(so, on=["row_i", "bucket"])
        .groupBy("row_i")
        # est_pairs ~ |L|*|O| / width crosses int64 only past ~1e19 candidate
        # pairs, where the exact-join audit half of this query is unrunnable
        # ansi: anyway; the estimate's contract is bigint by design
        .agg(F.sum(F.col("cnt_l") * F.col("cnt_o")).alias("est_pairs"))
    )
    exact = li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).agg(F.count(F.lit(1)).alias("exact_pairs"))
    est_min = ests.agg(F.min("est_pairs").alias("est_min"))
    return (
        ests.crossJoin(F.broadcast(exact))
        .crossJoin(F.broadcast(est_min))
        .select(
            "row_i",
            "est_pairs",
            "est_min",
            "exact_pairs",
            (F.col("est_pairs") - F.col("exact_pairs")).alias("overestimate"),
        )
        .orderBy("row_i")
    )


def _cms_join_sql() -> str:
    def cells(key, src):
        return "\n      UNION ALL\n      ".join(
            f"SELECT {i} AS row_i, {_cms_key_bucket_duck(i, key)} AS bucket FROM {src}"
            for i in range(_CMS_D)
        )

    return f"""
WITH sl AS (
  SELECT row_i, bucket, CAST(count(*) AS BIGINT) AS cnt_l FROM (
      {cells('l_orderkey', 'lineitem')}) GROUP BY row_i, bucket),
so AS (
  SELECT row_i, bucket, CAST(count(*) AS BIGINT) AS cnt_o FROM (
      {cells('o_orderkey', 'orders')}) GROUP BY row_i, bucket),
ests AS (
  SELECT sl.row_i, CAST(sum(cnt_l * cnt_o) AS BIGINT) AS est_pairs
  FROM sl JOIN so ON sl.row_i = so.row_i AND sl.bucket = so.bucket
  GROUP BY sl.row_i),
exact AS (
  SELECT CAST(count(*) AS BIGINT) AS exact_pairs
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
est_min AS (SELECT CAST(min(est_pairs) AS BIGINT) AS est_min FROM ests)
SELECT row_i, est_pairs, est_min, exact_pairs,
       CAST(est_pairs - exact_pairs AS BIGINT) AS overestimate
FROM ests CROSS JOIN exact CROSS JOIN est_min
ORDER BY row_i
"""


CMS_JOIN_SIZE_SQL = _cms_join_sql()


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch + set-overlap estimation
# (Bar-Yossef et al. 2002; Beyer et al. 2007 — public literature). The
# mergeable-sketch family's answer to "how much does corpus A overlap
# corpus B": keep the k smallest hash values per set; the k-th minimum θ
# estimates the distinct count as (k−1)/θ, the merged sketch estimates the
# union, and the fraction of merged-sketch members present in BOTH input
# sketches estimates Jaccard — so |A∩B| ≈ J · |A∪B| without ever comparing
# the sets. Sketch size is k rows per set regardless of corpus size; the
# sketches of disjoint partitions merge by "union then re-cut to k", which
# is exactly a k-row TakeOrdered — the same merge HLL/CMS rely on.
#
# Portability: h(x) = first 15 hex chars of md5(x) as a BIGINT in
# [0, 2^60); the normalizing constant 2^60 is an exact double, so the
# (k−1)/θ math is bit-identical across engines. Exact counts ride along
# as the audit columns, like every sketch query here.
# ---------------------------------------------------------------------------

_KMV_K = 128
_KMV_SRC = ("src0", "src1")
_KMV_NORM = float(2**60)


def kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV estimates of |A|, |B|, |A∪B|, |A∩B| over word-3-gram shingle
    sets of two sources, with exact counts as audit columns.

    Scale shape: the per-source shingle stream reduces to distinct
    (source, hash) map-side; each sketch is the k smallest hashes per
    source (a per-source TakeOrdered, k rows out); every estimate is
    arithmetic over ≤ 2k+1 rows. The exact audit columns are the only
    corpus-sized aggregation and exist to grade the sketch.
    """
    from pdf_parse_vector_db_spark.functions.text import shingles_expr

    docs = load_table(spark, sf_dir, "documents", spread=True)
    a, b = _KMV_SRC
    vals = (
        docs.filter(F.col("source").isin(list(_KMV_SRC)))
        .select("source", F.explode(shingles_expr("text")).alias("sh"))
        .select(
            "source",
            F.expr(
                "CAST(conv(substring(md5(sh), 1, 15), 16, 10) AS BIGINT)"
            ).alias("v"),
        )
        .distinct()
    )
    ranked = vals.withColumn(
        "rn", F.row_number().over(Window.partitionBy("source").orderBy("v"))
    ).filter(F.col("rn") <= _KMV_K)
    theta = ranked.filter(F.col("rn") == _KMV_K).select(
        # ansi: _KMV_NORM is a nonzero module constant
        "source", (F.col("v") / F.lit(_KMV_NORM)).alias("theta")
    )
    est_sizes = theta.select(
        # ansi: theta = k-th smallest normalized 64-bit hash; theta = 0
        # needs a literal zero hash (p ~ 2^-64), below contract
        # ansi: theta = 0 needs a literal zero 64-bit hash (p ~ 2^-64)
        "source", (F.lit(_KMV_K - 1) / F.col("theta")).alias("est")
    )
    merged = (
        ranked.select("v")
        .distinct()
        .withColumn("rn", F.row_number().over(Window.orderBy("v")))
        .filter(F.col("rn") <= _KMV_K)
    )
    theta_u = merged.filter(F.col("rn") == _KMV_K).select(
        # ansi: same zero-hash bound as est_sizes; _KMV_NORM nonzero constant
        (F.lit(_KMV_K - 1) / (F.col("v") / F.lit(_KMV_NORM))).alias("est_union")
    )
    in_a = ranked.filter(F.col("source") == a).select("v")
    in_b = ranked.filter(F.col("source") == b).select("v")
    j_est = (
        merged.join(in_a, "v").join(in_b, "v").agg(
            # ansi: _KMV_K is a nonzero module constant
            (F.count(F.lit(1)) / F.lit(_KMV_K)).alias("j_est")
        )
    )
    exact = vals.groupBy("v").agg(F.count(F.lit(1)).alias("nsrc")).agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_union"),
        F.sum((F.col("nsrc") == 2).cast("int")).cast("bigint").alias("exact_inter"),
    )
    est_a = est_sizes.filter(F.col("source") == a).select(F.col("est").alias("est_a"))
    est_b = est_sizes.filter(F.col("source") == b).select(F.col("est").alias("est_b"))
    return (
        est_a.crossJoin(est_b)
        .crossJoin(theta_u)
        .crossJoin(j_est)
        .crossJoin(exact)
        .select(
            F.lit(_KMV_K).cast("int").alias("k"),
            F.round("est_a", 2).alias("est_a"),
            F.round("est_b", 2).alias("est_b"),
            F.round("est_union", 2).alias("est_union"),
            F.round(F.col("j_est") * F.col("est_union"), 2).alias("est_inter"),
            "exact_union",
            "exact_inter",
        )
    )


def _kmv_sql() -> str:
    a, b = _KMV_SRC
    from pdf_parse_vector_db_spark.functions.text import shingles_sql

    sh_sql = f"unnest({shingles_sql('text')})"
    return f"""
WITH vals AS (
  SELECT DISTINCT source,
         ('0x' || substring(md5(sh), 1, 15))::BIGINT AS v
  FROM (SELECT source, {sh_sql} AS sh
        FROM documents WHERE source IN ('{a}', '{b}'))
), ranked AS (
  SELECT source, v, row_number() OVER (PARTITION BY source ORDER BY v) AS rn
  FROM vals QUALIFY rn <= {_KMV_K}
), est_sizes AS (
  SELECT source, ({_KMV_K} - 1) / (v / {_KMV_NORM!r}) AS est
  FROM ranked WHERE rn = {_KMV_K}
), merged AS (
  SELECT v, row_number() OVER (ORDER BY v) AS rn
  FROM (SELECT DISTINCT v FROM ranked) QUALIFY rn <= {_KMV_K}
), theta_u AS (
  SELECT ({_KMV_K} - 1) / (v / {_KMV_NORM!r}) AS est_union
  FROM merged WHERE rn = {_KMV_K}
), j_est AS (
  SELECT count(*) * 1.0 / {_KMV_K} AS j_est
  FROM merged m
  JOIN (SELECT v FROM ranked WHERE source = '{a}') sa USING (v)
  JOIN (SELECT v FROM ranked WHERE source = '{b}') sb USING (v)
), exact AS (
  SELECT CAST(count(*) AS BIGINT) AS exact_union,
         CAST(sum(CASE WHEN nsrc = 2 THEN 1 ELSE 0 END) AS BIGINT) AS exact_inter
  FROM (SELECT v, count(*) AS nsrc FROM vals GROUP BY v)
)
SELECT CAST({_KMV_K} AS INTEGER) AS k,
       round((SELECT est FROM est_sizes WHERE source = '{a}'), 2) AS est_a,
       round((SELECT est FROM est_sizes WHERE source = '{b}'), 2) AS est_b,
       round(est_union, 2) AS est_union,
       round(j_est * est_union, 2) AS est_inter,
       exact_union, exact_inter
FROM theta_u CROSS JOIN j_est CROSS JOIN exact
"""


KMV_OVERLAP_SQL = _kmv_sql()


QUERIES = [
    QuerySpec("cms_heavy_hitters", cms_heavy_hitters, CMS_HEAVY_HITTERS_SQL, "portable Count-Min sketch point estimates vs truth"),
    QuerySpec("hist_quantiles", hist_quantiles, HIST_QUANTILES_SQL, "portable equi-width histogram quantiles vs exact"),
    QuerySpec("bloom_filter_audit", bloom_filter_audit, BLOOM_FILTER_AUDIT_SQL, "portable Bloom filter: zero-FN proof + realized vs predicted FPR"),
    QuerySpec("cms_join_size", cms_join_size, CMS_JOIN_SIZE_SQL, "CMS inner-product join-cardinality estimate vs exact"),
    QuerySpec("kmv_overlap", kmv_overlap, KMV_OVERLAP_SQL, "KMV k-min-values sketch: union/intersection estimates vs exact"),
]

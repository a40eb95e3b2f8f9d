"""Model-evaluation operators: distributed AUC, calibration, ranking metrics.

A training-data pipeline doesn't stop at producing corpora — it has to
*evaluate* the classifiers that gate them (quality filters, language ID)
and the retrieval stacks that serve them. The reference itself surfaces a
win-rate statistic as its one evaluation number
(extract_and_search_v2.py:161-170); this module adds the standard
large-scale evaluation suite next to it, Spark-first:

- ``classifier_auc``    — ROC-AUC of a nearest-centroid classifier score
                          (cosine to the positive class's embedding
                          centroid) as a predictor of label membership,
                          computed by the tie-aware Mann-Whitney rank-sum
                          identity.
- ``score_calibration`` — reliability bins (decile bins of the score vs
                          observed positive rate), the other half of
                          classifier evaluation.
- ``retrieval_relevance`` — MRR and NDCG@10 for a pinned panel of query
                          vectors over ``embeddings``, relevance = label
                          match. Complements the recall@k contract in
                          tests/test_ann.py with graded ranking metrics.

Scale shape (100 TB):

- AUC never sorts the corpus. The per-row score is a pure map (the class
  centroid is a dim-row broadcast); rows reduce to a **score histogram**
  first (scores are rounded to 6 dp, so the group-by key domain is bounded
  at a few million regardless of corpus size), and the single-partition
  rank window runs over that bounded histogram, not over rows. This is
  the textbook distributed-AUC design: O(N) map + bounded reduce, vs the
  naive global sort's O(N log N) shuffle.
- Calibration bins are a 10-key map-side-combined aggregate — nothing
  wide.
- The retrieval panel broadcasts Q=5 query rows against the corpus scan
  (one BroadcastNestedLoopJoin over a 5-row side), then ranks within
  query_id — a Q-partition window whose input is Q×N rows. At real scale
  the candidate set per query would first be cut by the ANN index
  (plans/similarity.ivf_knn); the metric math downstream is identical.

Float discipline (registry contract): scores and metrics are computed in
float64 on both engines and rounded to 6 dp; ranking uses the ROUNDED
cosine with a vec_id tie-break so both engines cut identical top-k lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine_similarity
from ..sources.registry import load_table
from .registry import QuerySpec

#: Pinned evaluation panel: 5 query vectors spread across the id space.
QUERY_IDS = [3, 11, 19, 27, 42]
NDCG_K = 10


# ---------------------------------------------------------------------------
# classifier_auc — tie-aware Mann-Whitney rank-sum AUC over a score histogram
# ---------------------------------------------------------------------------

#: Positive class for the nearest-centroid classifier under evaluation.
POS_LABEL = 0


def _centroid_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(score, pos) per embedding: score = cos(v, centroid of POS_LABEL).

    The evaluated "classifier" is nearest-centroid scoring — the simplest
    embedding-space classifier and the one whose score actually carries
    signal in the fixtures (labels cluster in embedding space; the `lang`
    column of `documents` is deliberately independent of its text).

    Cross-engine determinism: the centroid is built from integer-micros
    element sums (exact, order-independent BIGINT adds) exactly like the
    SemDeDup tier (plans/similarity.py:777-799), then the cosine is rounded
    to 6 dp. Scale shape: the posexplode partial-aggregates per dimension
    map-side into a dim-row table that broadcasts back — the embedding
    column itself never shuffles.
    """
    emb = load_table(spark, sf_dir, "embeddings", spread=True)
    cent = (
        emb.filter(F.col("label") == POS_LABEL)
        .select(
            F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "val")
        )
        .withColumn("vmic", F.round(F.col("val") * 1e6).cast("bigint"))
        .groupBy("pos")
        .agg(F.sum("vmic").alias("smic"), F.count(F.lit(1)).alias("n"))
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "smic", "n"))),
                # ansi: n = per-position group count >= 1
                lambda s: s["smic"].cast("double") / (s["n"].cast("double") * 1e6),
            ).alias("cv")
        )
    )
    return emb.crossJoin(F.broadcast(cent)).select(
        F.round(cosine_similarity(F.col("embedding"), F.col("cv")), 6).alias("score"),
        (F.col("label") == POS_LABEL).cast("int").alias("pos"),
    )


def classifier_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC of the nearest-centroid score predicting label membership.

    AUC = (R_pos − n_pos(n_pos+1)/2) / (n_pos · n_neg) where R_pos is the
    sum of average ranks of the positives — exact under ties because tied
    scores share their average rank. Ranks are derived from a cumulative
    count over the (bounded) distinct-score histogram, never from a global
    per-row sort.
    """
    scored = _centroid_scored(spark, sf_dir)
    grp = scored.groupBy("score").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("pos").alias("pos_cnt")
    )
    # Bounded input: one row per distinct 6-dp score. The unpartitioned
    # window is over ≤1e6 rows by construction.
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = grp.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "avg_rank", F.col("cum") - F.col("cnt") + (F.col("cnt") + 1) / F.lit(2.0)
    )
    tot = ranked.agg(
        F.sum("pos_cnt").cast("bigint").alias("n_pos"),
        (F.sum("cnt") - F.sum("pos_cnt")).cast("bigint").alias("n_neg"),
        # ansi: avg_rank is DOUBLE (built from (cnt+1)/2.0) -> double sum
        F.sum(F.col("pos_cnt") * F.col("avg_rank")).alias("rank_sum"),
    )
    return tot.select(
        "n_pos",
        "n_neg",
        # try_divide: AUC is undefined when either class is empty
        # (n_pos or n_neg = 0) -> NULL on both engines
        F.round(
            F.try_divide(
                F.col("rank_sum") - F.col("n_pos") * (F.col("n_pos") + 1) / F.lit(2.0),
                F.col("n_pos") * F.col("n_neg").cast("double"),
            ),
            6,
        ).alias("auc"),
    )


#: Shared oracle CTE text: (score, pos) per embedding, centroid via exact
#: integer-micros sums — mirror of ``_centroid_scored``.
_SCORED_CTE = f"""
el AS (
  SELECT label,
         CAST(round(unnest(CAST(embedding AS DOUBLE[])) * 1e6) AS BIGINT) AS vmic,
         generate_subscripts(embedding, 1) AS pos
  FROM embeddings WHERE label = {POS_LABEL}
), cent AS (
  SELECT list(CAST(smic AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6) ORDER BY pos) AS cv
  FROM (SELECT pos, CAST(sum(vmic) AS BIGINT) AS smic, count(*) AS n
        FROM el GROUP BY pos)
), scored AS (
  SELECT round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), cent.cv), 6) AS score,
         CASE WHEN e.label = {POS_LABEL} THEN 1 ELSE 0 END AS pos
  FROM embeddings e CROSS JOIN cent
)"""

CLASSIFIER_AUC_SQL = f"""
WITH {_SCORED_CTE}, grp AS (
  SELECT score, count(*) AS cnt, sum(pos) AS pos_cnt FROM scored GROUP BY score
), ranked AS (
  SELECT cnt, pos_cnt,
         sum(cnt) OVER (ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - cnt + (cnt + 1) / 2.0 AS avg_rank
  FROM grp
), tot AS (
  SELECT CAST(sum(pos_cnt) AS BIGINT) AS n_pos,
         CAST(sum(cnt) - sum(pos_cnt) AS BIGINT) AS n_neg,
         sum(pos_cnt * avg_rank) AS rank_sum
  FROM ranked
)
SELECT n_pos, n_neg,
       round((rank_sum - n_pos * (n_pos + 1) / 2.0)
             / (n_pos * CAST(n_neg AS DOUBLE)), 6) AS auc
FROM tot
"""


# ---------------------------------------------------------------------------
# score_calibration — reliability bins
# ---------------------------------------------------------------------------

def score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile reliability bins: per score bin, observed positive rate.

    Ten fixed-width bins on [0, 1]; cosine scores outside that range clamp
    into the end bins, so the bin domain is closed. Pure two-level
    aggregate on top of the shared scored stream: per-bin partial counts
    combine map-side; no row ever leaves its scan partition except as one
    of ≤10 partial rows.
    """
    scored = _centroid_scored(spark, sf_dir)
    binned = scored.withColumn(
        "bin",
        F.least(F.greatest(F.floor(F.col("score") * 10), F.lit(0)), F.lit(9)).cast("int"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.avg("score"), 6).alias("avg_score"),
            F.round(F.avg("pos"), 6).alias("pos_rate"),
        )
        .orderBy("bin")
    )


SCORE_CALIBRATION_SQL = f"""
WITH {_SCORED_CTE}
SELECT CAST(least(greatest(floor(score * 10), 0), 9) AS INTEGER) AS bin,
       CAST(count(*) AS BIGINT) AS n,
       round(avg(score), 6) AS avg_score,
       round(avg(CAST(pos AS DOUBLE)), 6) AS pos_rate
FROM scored
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# retrieval_relevance — MRR + NDCG@10 over a pinned query panel
# ---------------------------------------------------------------------------

def retrieval_relevance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR and NDCG@10 per panel query; relevance = label match.

    For each query vector q: rank every other embedding by cosine
    similarity (rounded 6 dp, vec_id tie-break), cut the top 10, score
    rel_i = [label_i == label_q]. NDCG normalizes by the ideal DCG for
    min(n_relevant, 10) hits, so a query whose class has fewer than 10
    members is not penalized for the impossible.
    """
    emb = load_table(spark, sf_dir, "embeddings", spread=True)
    qs = emb.filter(F.col("vec_id").isin(QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_vec"),
        F.col("label").alias("q_label"),
    )
    pairs = emb.join(F.broadcast(qs), F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        "vec_id",
        (F.col("label") == F.col("q_label")).cast("int").alias("rel"),
        F.round(cosine_similarity(F.col("embedding"), F.col("q_vec")), 6).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    ranked = pairs.withColumn("rank", F.row_number().over(w))
    top = ranked.filter(F.col("rank") <= NDCG_K)
    n_rel = pairs.groupBy("query_id").agg(F.sum("rel").cast("bigint").alias("n_rel"))
    per_q = top.groupBy("query_id").agg(
        # ansi: rank = row_number >= 1 -> log2(rank+1) >= 1 > 0
        F.sum(F.col("rel") / F.log2(F.col("rank") + 1)).alias("dcg"),
        F.min(F.when(F.col("rel") == 1, F.col("rank"))).cast("int").alias("first_rel_rank"),
    )
    # NULL-guard the n_rel = 0 query: sequence(1, 0) descends through i = 0,
    # where log2(i+1) = 0 would raise under ANSI — NDCG is undefined with no
    # relevant documents, so both engines yield NULL there instead
    idcg = F.expr(
        "CASE WHEN n_rel = 0 THEN CAST(NULL AS DOUBLE) ELSE "
        f"aggregate(sequence(1, CAST(least(n_rel, {NDCG_K}) AS INT)), 0d,"
        " (acc, i) -> acc + 1.0 / log2(i + 1)) END"  # ansi: i >= 1 in branch
    )
    return (
        per_q.join(n_rel, "query_id")
        .select(
            "query_id",
            "n_rel",
            "first_rel_rank",
            F.round(
                # first_rel_rank is a row_number (>= 1) or NULL, and NULL
                # ansi: propagates into the coalesce fallback
                F.coalesce(1.0 / F.col("first_rel_rank"), F.lit(0.0)), 6
            ).alias("rr"),
            F.round(F.try_divide(F.col("dcg"), idcg), 6).alias("ndcg10"),
        )
        .orderBy("query_id")
    )


_PANEL_SQL = ", ".join(str(i) for i in QUERY_IDS)

RETRIEVAL_RELEVANCE_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS q_vec, label AS q_label
  FROM embeddings WHERE vec_id IN ({_PANEL_SQL})
), pairs AS (
  SELECT q.query_id, e.vec_id,
         CASE WHEN e.label = q.q_label THEN 1 ELSE 0 END AS rel,
         round(list_cosine_similarity(e.embedding, q.q_vec), 6) AS cos
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rank
  FROM pairs
), nrel AS (
  SELECT query_id, CAST(sum(rel) AS BIGINT) AS n_rel FROM pairs GROUP BY query_id
), perq AS (
  SELECT query_id,
         sum(rel / log2(rank + 1)) AS dcg,
         CAST(min(CASE WHEN rel = 1 THEN rank END) AS INTEGER) AS first_rel_rank
  FROM ranked WHERE rank <= {NDCG_K}
  GROUP BY query_id
)
SELECT p.query_id, n.n_rel, p.first_rel_rank,
       round(coalesce(1.0 / p.first_rel_rank, 0.0), 6) AS rr,
       round(p.dcg / list_sum(list_transform(range(1, CAST(least(n.n_rel, {NDCG_K}) AS BIGINT) + 1),
                                             i -> 1.0 / log2(i + 1))), 6) AS ndcg10
FROM perq p JOIN nrel n USING (query_id)
ORDER BY p.query_id
"""


QUERIES = [
    QuerySpec(
        "classifier_auc",
        classifier_auc,
        CLASSIFIER_AUC_SQL,
        "tie-aware Mann-Whitney ROC-AUC over a bounded score histogram",
    ),
    QuerySpec(
        "score_calibration",
        score_calibration,
        SCORE_CALIBRATION_SQL,
        "decile reliability bins: classifier score vs observed positive rate",
    ),
    QuerySpec(
        "retrieval_relevance",
        retrieval_relevance,
        RETRIEVAL_RELEVANCE_SQL,
        "MRR + NDCG@10 for a pinned query panel, relevance = label match",
    ),
]

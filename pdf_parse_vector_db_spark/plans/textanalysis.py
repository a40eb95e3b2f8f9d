"""Text-analysis queries over `documents` (north-star X5 + X1).

Every query is a pure map/agg over the documents scan — no joins, no UDFs —
so at 100 TB they are scan-bound and embarrassingly parallel; the only
shuffles are the final small hash-aggs. Language-ID branch coverage comes
from deterministic marker injection (same device as plans/ingest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_parse_vector_db_spark.functions import text as T
from pdf_parse_vector_db_spark.plans.registry import QuerySpec
from pdf_parse_vector_db_spark.sources.registry import load_table

# marker injection: one doc in six per language gets that language's marker
# words appended, the sixth stays pure word-salad.
_LANG_SNIPPETS = [
    "",
    "der die das und nicht ist",
    "the and of is not with",
    "el la los las es y",
    "le les des est et ne",
    "de5 shi4 bu4 le5 zai4 he2",
]


def _marked_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    m = F.col("doc_id") % len(_LANG_SNIPPETS)
    expr = None
    for i, s in enumerate(_LANG_SNIPPETS):
        expr = F.when(m == i, F.lit(s)) if expr is None else expr.when(m == i, F.lit(s))
    return docs.withColumn("marked", F.concat_ws(" ", F.col("text"), expr))


_MARKED_SQL = (
    "concat_ws(' ', text, CASE doc_id % 6 "
    + " ".join(f"WHEN {i} THEN '{s}'" for i, s in enumerate(_LANG_SNIPPETS))
    + " END)"
)


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic per doc + agreement flag against the fixture's
    lang column (what a real pipeline audits its classifier with)."""
    docs = _marked_docs(spark, sf_dir)
    pred = T.lang_pred_expr("marked")
    return docs.select(
        "doc_id",
        F.col("lang").alias("lang_true"),
        pred.alias("lang_pred"),
        (pred == F.col("lang")).alias("agree"),
    )


LANG_ID_SQL = f"""
SELECT doc_id,
       lang AS lang_true,
       {T.lang_pred_sql(_MARKED_SQL)} AS lang_pred,
       {T.lang_pred_sql(_MARKED_SQL)} = lang AS agree
FROM documents
"""


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality metrics (length/punct/stopword ratios)."""
    docs = load_table(spark, sf_dir, "documents")
    metrics = T.quality_metrics_expr("text")
    return docs.select("doc_id", *[c.alias(n) for n, c in metrics.items()])


_QUALITY_COLS_SQL = ",\n       ".join(
    f"{s} AS {n}" for n, s in T.quality_metrics_sql("text").items()
)
TEXT_QUALITY_SQL = f"""
SELECT doc_id,
       {_QUALITY_COLS_SQL}
FROM documents
"""


def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token accounting per (lang, source) — the budgeting query run
    before an LLM training job."""
    docs = load_table(spark, sf_dir, "documents")
    counts = T.token_counts_expr("text")
    return (
        docs.select("lang", "source", *[c.alias(n) for n, c in counts.items()])
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("ws_tokens").alias("ws_tokens"),
            F.sum("bpe_tokens").alias("bpe_tokens"),
            F.sum("est_tokens").alias("est_tokens"),
        )
        .orderBy("lang", "source")
    )


_COUNTS = T.token_counts_sql("text")
TOKEN_STATS_SQL = f"""
SELECT lang, source,
       count(*) AS docs,
       sum({_COUNTS['ws_tokens']}) AS ws_tokens,
       sum({_COUNTS['bpe_tokens']}) AS bpe_tokens,
       sum({_COUNTS['est_tokens']}) AS est_tokens
FROM documents
GROUP BY lang, source
ORDER BY lang, source
"""


def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 exact-dup key per doc: canonicalized md5 + band prefix."""
    docs = load_table(spark, sf_dir, "documents")
    fp = T.fingerprint_expr("text")
    return docs.select(
        "doc_id", fp["fingerprint"].alias("fingerprint"), fp["fp_band"].alias("fp_band")
    )


_FP = T.fingerprint_sql("text")
DOC_FINGERPRINTS_SQL = f"""
SELECT doc_id,
       {_FP['fingerprint']} AS fingerprint,
       {_FP['fp_band']} AS fp_band
FROM documents
"""


def exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 exact dedup accounting: fingerprint groups with >1 member, plus
    the kept representative (min doc_id) — the hash-groupBy dedup shape.
    One shuffle on the 16-byte hash, never on the text."""
    docs = load_table(spark, sf_dir, "documents")
    fp = T.fingerprint_expr("text")["fingerprint"]
    return (
        docs.select("doc_id", fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("copies"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .filter(F.col("copies") > 1)
        .orderBy("fingerprint")
    )


EXACT_DUP_GROUPS_SQL = f"""
SELECT {_FP['fingerprint']} AS fingerprint,
       count(*) AS copies,
       min(doc_id) AS keep_doc_id
FROM documents
GROUP BY 1
HAVING count(*) > 1
ORDER BY fingerprint
"""



def corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composite training-data-prep pipeline (the 100 TB flagship use):
    quality gate → exact dedup (md5 canon fingerprint, lowest-id keeper) →
    deterministic 20% hash sample (md5 prefix — reproducible across engines
    and retries, unlike rand()) → per-lang corpus accounting.

    All stages are scan + one semi-join + one agg; at scale the quality gate
    prunes before anything shuffles and the only wide exchanges are the
    16-byte-fingerprint groupBy and the final small agg."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    q = T.quality_metrics_expr("text")
    fp = T.fingerprint_expr("text")["fingerprint"]
    gated = (
        docs.withColumn("n_tokens", q["n_tokens"])
        .withColumn("avg_token_len", q["avg_token_len"])
        .filter((F.col("n_tokens") >= 20) & F.col("avg_token_len").between(3, 10))
        .withColumn("__fp", fp)
    )
    keep = gated.groupBy("__fp").agg(F.min("doc_id").alias("doc_id")).drop("__fp")
    deduped = gated.join(keep, on="doc_id", how="left_semi")
    sampled = deduped.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "34"
    )
    return (
        sampled.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_tokens").alias("tokens"),
            F.round(F.avg("avg_token_len"), 4).alias("mean_token_len"),
        )
        .orderBy("lang")
    )


_CP_TOKS = "len(string_split_regex(trim(text), '\\s+'))"
CORPUS_PREP_SQL = f"""
WITH gated AS (
  SELECT doc_id, lang,
         CAST({_CP_TOKS} AS BIGINT) AS n_tokens,
         round(CAST(length(text) - ({_CP_TOKS} - 1) AS DOUBLE) / {_CP_TOKS}, 4)
           AS avg_token_len,
         md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
  FROM documents
  WHERE {_CP_TOKS} >= 20
    AND round(CAST(length(text) - ({_CP_TOKS} - 1) AS DOUBLE) / {_CP_TOKS}, 4)
        BETWEEN 3 AND 10
),
keep AS (SELECT min(doc_id) AS doc_id FROM gated GROUP BY fp),
sampled AS (
  SELECT g.* FROM gated g
  WHERE g.doc_id IN (SELECT doc_id FROM keep)
    AND substring(md5(CAST(g.doc_id AS VARCHAR)), 1, 2) < '34'
)
SELECT lang, count(*) AS docs, sum(n_tokens) AS tokens,
       round(avg(avg_token_len), 4) AS mean_token_len
FROM sampled
GROUP BY lang
ORDER BY lang
"""


QUERIES = [
    QuerySpec("corpus_prep", corpus_prep, CORPUS_PREP_SQL, "X1+X5 composite training-data prep"),
    QuerySpec("lang_id", lang_id, LANG_ID_SQL, "X5 language-ID heuristic"),
    QuerySpec("text_quality", text_quality, TEXT_QUALITY_SQL, "X5 quality metrics"),
    QuerySpec("token_stats", token_stats, TOKEN_STATS_SQL, "X5 token accounting"),
    QuerySpec("doc_fingerprints", doc_fingerprints, DOC_FINGERPRINTS_SQL, "X1 content hash"),
    QuerySpec("exact_dup_groups", exact_dup_groups, EXACT_DUP_GROUPS_SQL, "X1 exact dedup"),
]

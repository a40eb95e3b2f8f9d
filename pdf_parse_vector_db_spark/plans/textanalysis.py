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


def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiclass confusion matrix for the lang-ID heuristic vs the
    fixture's ground-truth lang: one row per (true, predicted) cell with
    count, per-true-class recall share and per-predicted-class precision
    share — the eval artifact a pipeline reviews before trusting a
    classifier gate at scale (lang_id emits per-doc agreement; this is
    the corpus-level roll-up).

    Scale shape: one hash-agg on the (true, pred) pair — |langs|² cells —
    then the recall/precision windows run over that constant-size cell
    table, never the corpus."""
    docs = _marked_docs(spark, sf_dir)
    from pyspark.sql import Window

    pred = T.lang_pred_expr("marked")
    cells = (
        docs.select(F.col("lang").alias("lang_true"), pred.alias("lang_pred"))
        .groupBy("lang_true", "lang_pred")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    wt = Window.partitionBy("lang_true")
    wp = Window.partitionBy("lang_pred")
    return (
        cells.select(
            "lang_true",
            "lang_pred",
            "n",
            # ansi: both window sums >= n >= 1 on every existing cell
            F.round(F.col("n") / F.sum("n").over(wt), 6).alias("recall_share"),
            # ansi: sum over lang_pred partition >= n >= 1 likewise
            F.round(F.col("n") / F.sum("n").over(wp), 6).alias("precision_share"),
        )
        .orderBy("lang_true", "lang_pred")
    )


LANG_ID_CONFUSION_SQL = f"""
WITH cells AS (
  SELECT lang AS lang_true,
         {T.lang_pred_sql(_MARKED_SQL)} AS lang_pred,
         CAST(count(*) AS BIGINT) AS n
  FROM documents
  GROUP BY 1, 2
)
SELECT lang_true, lang_pred, n,
       round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY lang_true), 6)
         AS recall_share,
       round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY lang_pred), 6)
         AS precision_share
FROM cells
ORDER BY lang_true, lang_pred
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
       CAST(sum({_COUNTS['ws_tokens']}) AS BIGINT) AS ws_tokens,
       CAST(sum({_COUNTS['bpe_tokens']}) AS BIGINT) AS bpe_tokens,
       CAST(sum({_COUNTS['est_tokens']}) AS BIGINT) AS est_tokens
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
SELECT lang, count(*) AS docs, CAST(sum(n_tokens) AS BIGINT) AS tokens,
       round(avg(avg_token_len), 4) AS mean_token_len
FROM sampled
GROUP BY lang
ORDER BY lang
"""



def _winnow_fps(spark: SparkSession, sf_dir: str, k: int = 8, w: int = 4):
    """Winnowing (Schleimer/Wilkerson/Aiken) as a relational plan: md5 every
    char k-gram, take the sliding-window minimum, distinct per doc. Any
    shared substring of length ≥ k+w-1 between two docs is guaranteed to
    share a fingerprint.

    The whole computation is per-document array algebra — gram hashing,
    window minima (array_min over slices), and dedup (array_distinct) all
    happen map-side inside ONE generator expression, so the subplan is
    shuffle-FREE: at 100 TB it is scan-bound with zero exchanges, versus
    the obvious posexplode + ROWS-frame window formulation whose
    partitionBy(doc_id) sort-shuffles every gram (measured 5x slower at
    sf0.1). The canonicalized text and the gram array are each bound ONCE
    via single-element-array transform lambdas — inlining them instead
    would re-evaluate the regexp canonicalization per gram position
    (projection collapse does exactly that to a naive two-step select).
    Docs with fewer than w full windows yield no fingerprints (same as the
    window formulation's full-window filter)."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    canon = "lower(trim(regexp_replace(text, '\\\\s+', ' ')))"
    fps = (
        f"explode(flatten(transform(array({canon}), c -> "
        f"flatten(transform(array(transform(sequence(1, greatest(length(c) - {k - 1}, 0)), "
        f"p -> md5(substring(c, p, {k})))), g -> "
        f"if(size(g) < {w}, slice(g, 1, 0), "
        f"array_distinct(transform(sequence(1, size(g) - {w - 1}), "
        f"i -> array_min(slice(g, i, {w}))))))))))"
    )
    return docs.select("doc_id", F.expr(fps).alias("fp"))


_WINNOW_CANON = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
_WINNOW_GRAMS = (
    f"list_transform(range(1, greatest(length({_WINNOW_CANON}) - 7, 0) + 1), "
    f"p -> md5(substring({_WINNOW_CANON}, p, 8)))"
)
_WINNOW_FPS_SQL = f"""
WITH g AS (
  SELECT doc_id, {_WINNOW_GRAMS} AS grams FROM documents
),
e AS (
  SELECT doc_id, unnest(grams) AS h, generate_subscripts(grams, 1) - 1 AS pos,
         len(grams) AS n
  FROM g
),
wm AS (
  SELECT doc_id,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
         pos, n
  FROM e
)
SELECT DISTINCT doc_id, fp FROM wm WHERE pos <= n - 4
"""


def winnow_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprinting (winnowing) accounting: distinct
    fingerprints per doc + the lexicographic minimum (the doc's 'super-
    fingerprint')."""
    fps = _winnow_fps(spark, sf_dir)
    return (
        fps.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_fps"), F.min("fp").alias("min_fp"))
        .orderBy("doc_id")
    )


WINNOW_STATS_SQL = f"""
WITH fps AS ({_WINNOW_FPS_SQL})
SELECT doc_id, count(*) AS n_fps, min(fp) AS min_fp
FROM fps GROUP BY doc_id ORDER BY doc_id
"""


def winnow_shared_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-overlap near-dup pairs a la MOSS: docs sharing ≥ 3 RARE
    winnowed fingerprints (document frequency ≤ 10 — ubiquitous grams are
    dropped like stopwords, which is also what bounds pair cost to
    Σ docfreq² over rare fps only).

    Shape: the expensive fps subplan (explode + window min + distinct) is
    evaluated ONCE — group doc_ids per fingerprint, drop ubiquitous fps,
    then emit every ordered pair map-side from each ≤10-element array
    (≤45 pairs per fp). Versus the rfps⋈rfps self-join this halves the
    gram work and replaces the join exchange with a map. At 100 TB the
    per-key agg state is bounded for real corpora (a pathologically hot
    boilerplate fingerprint holding ~10M doc_ids is an ~80 MB spillable
    array; the cheap scan-bound remedy is a map-side-combined df count
    pre-pass that pre-drops hot fps before the collect)."""
    fps = _winnow_fps(spark, sf_dir)
    grouped = (
        fps.groupBy("fp")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids").between(2, 10))
    )
    pairs = F.expr(
        """
        flatten(transform(array_sort(ids), (x, i) ->
          transform(slice(array_sort(ids), i + 2, size(ids)), y ->
            struct(x AS id_a, y AS id_b))))
        """
    )
    return (
        grouped.select(F.explode(pairs).alias("p"))
        .select("p.id_a", "p.id_b")
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= 3)
        .orderBy("id_a", "id_b")
    )


WINNOW_SHARED_PAIRS_SQL = f"""
WITH fps AS ({_WINNOW_FPS_SQL}),
rare AS (
  SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 10
),
rfps AS (SELECT f.* FROM fps f WHERE f.fp IN (SELECT fp FROM rare))
SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared_fps
FROM rfps a JOIN rfps b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= 3
ORDER BY id_a, id_b
"""


def gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: Gopher-rule document gate (Rae et al. 2021 §A1.1) — word count,
    mean word length, symbol ratio, alphabetic-word fraction, stopword
    presence, and the conjunction pass flag actually used to gate training
    data. Pure map over the scan; at 100 TB this runs as the first stage of
    corpus prep and prunes before anything shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    metrics = T.gopher_metrics_expr("text")
    return docs.select("doc_id", *[c.alias(n) for n, c in metrics.items()])


_GOPHER_COLS_SQL = ",\n       ".join(
    f"{s} AS {n}" for n, s in T.gopher_metrics_sql("text").items()
)
GOPHER_QUALITY_SQL = f"""
SELECT doc_id,
       {_GOPHER_COLS_SQL}
FROM documents
"""


def decontaminate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: benchmark decontamination — flag training docs sharing any word
    3-gram with the holdout set (docs with doc_id % 100 == 0 stand in for
    the benchmark). Output: contaminated doc, overlapping-shingle count,
    total shingles, contamination ratio.

    Scale shape: the holdout's distinct shingles BROADCAST (benchmark sets
    are tiny next to the corpus); the training side streams through a
    broadcast hash join map-side, so the corpus text never shuffles — the
    only exchange is the per-doc count agg on (doc_id, 8-byte rows)."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    holdout_grams = (
        docs.filter(F.col("doc_id") % 100 == 0)
        .select(F.explode(T.shingles_expr("text", 3)).alias("sh"))
        .distinct()
    )
    train = docs.filter(F.col("doc_id") % 100 != 0).select(
        "doc_id", T.shingles_expr("text", 3).alias("shingles")
    )
    train_grams = train.select(
        "doc_id", F.size("shingles").cast("bigint").alias("n_shingles"), F.explode("shingles").alias("sh")
    )
    return (
        train_grams.join(F.broadcast(holdout_grams), on="sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_overlap"),
            F.max("n_shingles").alias("n_shingles"),
        )
        .withColumn(
            "contamination",
            # ansi: n_shingles >= 1 for any doc that produced a shingle row
            F.round(F.col("n_overlap").cast("double") / F.col("n_shingles"), 6),
        )
        .orderBy("doc_id")
    )


DECONTAMINATE_OVERLAP_SQL = f"""
WITH hg AS (
  SELECT DISTINCT unnest({T.shingles_sql('text')}) AS sh
  FROM documents WHERE doc_id % 100 = 0
),
train AS (
  SELECT doc_id, {T.shingles_sql('text')} AS shingles
  FROM documents WHERE doc_id % 100 <> 0
),
tg AS (
  SELECT doc_id, len(shingles) AS n_shingles, unnest(shingles) AS sh FROM train
)
SELECT t.doc_id,
       count(*) AS n_overlap,
       max(t.n_shingles) AS n_shingles,
       round(CAST(count(*) AS DOUBLE) / max(t.n_shingles), 6) AS contamination
FROM tg t JOIN hg ON t.sh = hg.sh
GROUP BY t.doc_id
ORDER BY t.doc_id
"""


def _ngrams_nd_spark(n: int) -> str:
    """NON-distinct word n-gram list (repetition analysis needs the
    duplicates that shingles_expr's array_distinct removes), token array
    bound once — same single-bind discipline as shingles_expr."""
    parts = ", ".join(f"element_at(t, i + {j})" for j in range(n))
    return (
        "flatten(transform(array(split(lower(trim(text)), '\\\\s+')), t -> "
        f"CASE WHEN size(t) >= {n} THEN "
        f"transform(sequence(1, size(t) - {n - 1}), i -> concat_ws(' ', {parts})) "
        "ELSE array() END))"
    )


def _ngrams_nd_duck(n: int) -> str:
    toks = "string_split_regex(lower(trim(text)), '\\s+')"
    parts = " || ' ' || ".join(f"({toks})[i + {j}]" for j in range(n))
    return (
        f"CASE WHEN len({toks}) >= {n} THEN "
        f"list_transform(range(1, len({toks}) - {n - 1} + 1), i -> {parts}) "
        "ELSE [] END"
    )


def _dup_frac_spark(n: int) -> str:
    # fraction of n-gram occurrences that are repeats of an earlier one
    return (
        f"flatten(transform(array({_ngrams_nd_spark(n)}), g -> "
        "array(IF(size(g) = 0, cast(0 AS double), "
        "cast(1 AS double) - cast(size(array_distinct(g)) AS double) / size(g)))))[0]"
    )


def _dup_frac_duck(n: int) -> str:
    g = _ngrams_nd_duck(n)
    return (
        f"CASE WHEN len({g}) = 0 THEN CAST(0 AS DOUBLE) "
        f"ELSE CAST(1 AS DOUBLE) - CAST(len(list_distinct({g})) AS DOUBLE) / len({g}) END"
    )


def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: within-doc repetition metrics (the Gopher A1.1 repetition-rule
    skeleton): duplicate word/2-gram/3-gram occurrence fractions, and the
    fraction of characters covered by the most frequent 2-gram.

    Scale shape: the dup fractions are pure map-side array algebra (zero
    exchanges). Only the top-2-gram needs occurrence COUNTS, so it takes
    the explode + two-stage agg path — partial agg combines each doc's
    repeated grams map-side, so the exchange carries at most the distinct
    2-grams per doc, not every occurrence."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    flat = docs.select(
        "doc_id",
        "n_chars",
        F.round(F.expr(_dup_frac_spark(1)), 6).alias("dup_word_frac"),
        F.round(F.expr(_dup_frac_spark(2)), 6).alias("dup_2gram_frac"),
        F.round(F.expr(_dup_frac_spark(3)), 6).alias("dup_3gram_frac"),
    )
    top2 = (
        docs.select(
            "doc_id", "n_chars", F.explode(F.expr(_ngrams_nd_spark(2))).alias("g")
        )
        .groupBy("doc_id", "n_chars", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.round(
                # ansi: a doc with a 2-gram row has n_chars >= 2
                F.max(F.col("c") * F.length("g")).cast("double") / F.first("n_chars"),
                6,
            ).alias("top_2gram_char_frac")
        )
    )
    return (
        flat.join(top2, on="doc_id")
        .select(
            "doc_id",
            "dup_word_frac",
            "dup_2gram_frac",
            "dup_3gram_frac",
            "top_2gram_char_frac",
            (
                (F.col("dup_3gram_frac") < 0.6)
                & (F.col("top_2gram_char_frac") < 0.2)
            ).alias("rep_pass"),
        )
        .orderBy("doc_id")
    )


REPETITION_STATS_SQL = f"""
WITH flat AS (
  SELECT doc_id, n_chars,
         round({_dup_frac_duck(1)}, 6) AS dup_word_frac,
         round({_dup_frac_duck(2)}, 6) AS dup_2gram_frac,
         round({_dup_frac_duck(3)}, 6) AS dup_3gram_frac
  FROM documents
),
g AS (
  SELECT doc_id, n_chars, unnest({_ngrams_nd_duck(2)}) AS g FROM documents
),
c AS (
  SELECT doc_id, n_chars, g, count(*) AS c FROM g GROUP BY 1, 2, 3
),
top2 AS (
  SELECT doc_id,
         round(CAST(max(c * length(g)) AS DOUBLE) / any_value(n_chars), 6)
           AS top_2gram_char_frac
  FROM c GROUP BY doc_id
)
SELECT f.doc_id, f.dup_word_frac, f.dup_2gram_frac, f.dup_3gram_frac,
       t.top_2gram_char_frac,
       f.dup_3gram_frac < 0.6 AND t.top_2gram_char_frac < 0.2 AS rep_pass
FROM flat f JOIN top2 t ON f.doc_id = t.doc_id
ORDER BY f.doc_id
"""


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: top-5 characteristic terms per source by TF-IDF — the corpus-
    exploration query run to understand what a source contributes before
    weighting it (see domain_mixture_epochs).

    Scale shape: the token explode is scan-bound; tf and df both partial-
    aggregate map-side and exchange on the SAME key (term), so the tf⋈df
    join is co-partitioned (no extra shuffle under AQE); the corpus size
    attaches as a broadcast 1-row scalar, never a driver collect; top-5 is
    a windowed row_number over the small (source × vocab) agg result."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents", spread=True)
    tok = docs.select(
        "doc_id",
        "source",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("term"),
    )
    tf = tok.groupBy("source", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(df, on="term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                # ansi: df = doc-frequency count >= 1, so df + 1 >= 2
                * (F.log((F.col("n") + 1).cast("double") / (F.col("df") + 1)) + 1),
                6,
            ),
        )
    )
    w = Window.partitionBy("source").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("source", "term", "tf", "df", "tfidf")
        .orderBy("source", F.desc("tfidf"), "term")
    )


TFIDF_TOP_TERMS_SQL = """
WITH tok AS (
  SELECT doc_id, source,
         unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
  FROM documents
),
tf AS (SELECT source, term, count(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
       FROM tok GROUP BY 1),
n AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT f.source, f.term, f.tf, d.df,
         round(f.tf * (ln(CAST(n.n + 1 AS DOUBLE) / (d.df + 1)) + 1), 6)
           AS tfidf
  FROM tf f JOIN df d USING (term) CROSS JOIN n
)
SELECT source, term, tf, df, tfidf
FROM (SELECT *, row_number() OVER (PARTITION BY source
                                   ORDER BY tfidf DESC, term) AS rn
      FROM scored)
WHERE rn <= 5
ORDER BY source, tfidf DESC, term
"""


def collocation_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: top-50 bigram collocations by pointwise mutual information —
    the classic collocation-extraction pass (Church & Hanks 1990) a
    tokenizer/phrase-mining pipeline runs over a corpus. PMI(a,b) =
    ln(p(ab) / (p(a)p(b))) with a min-count gate of 5 to kill the
    low-frequency PMI bias.

    Scale shape: bigrams come from one map-side zip_with (no self-join);
    unigram and bigram counts partial-aggregate before their exchanges;
    the two unigram joins are on the term key (co-partitioned with the
    bigram agg under AQE); corpus totals ride partition-less windows over
    the vocab-sized aggs so no branch ever re-scans the corpus. Final
    top-50 is a TakeOrderedAndProject, not a full sort."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    toked = docs.filter(F.length(F.trim("text")) > 0).select(
        F.expr("filter(split(lower(trim(text)), '\\\\s+'), x -> x <> '')").alias("toks")
    )
    from pyspark.sql import Window

    tok = toked.select(F.explode("toks").alias("term"))
    # corpus totals attach as partition-less windows OVER THE AGGS, not as
    # separate agg branches: a branch re-derives (and re-scans) the whole
    # subtree, so at 100 TB each total would cost another corpus read. The
    # window's single partition only ever holds the vocab-sized count
    # table (Heaps-law sublinear), never the corpus.
    uni = (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("n", F.sum("c").over(Window.partitionBy()))
    )
    bg = toked.select(
        F.explode(
            F.expr(
                "zip_with(slice(toks, 1, size(toks) - 1), slice(toks, 2, size(toks) - 1), "
                "(a, b) -> struct(a AS w1, b AS w2))"
            )
        ).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    bgc = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .withColumn("m", F.sum("c_ab").over(Window.partitionBy()))
        .filter(F.col("c_ab") >= 5)
    )
    scored = (
        bgc.join(uni.select(F.col("term").alias("w1"), F.col("c").alias("c_a"), "n"), on="w1")
        .join(uni.select(F.col("term").alias("w2"), F.col("c").alias("c_b")), on="w2")
        .withColumn(
            "pmi",
            F.round(
                F.log(
                    F.col("c_ab").cast("double")
                    * F.col("n").cast("double")
                    * F.col("n").cast("double")
                    # ansi: m/c_a/c_b are counts >= 1 (inner-joined)
                    / (
                        F.col("m").cast("double")
                        * F.col("c_a").cast("double")
                        * F.col("c_b").cast("double")
                    )
                ),
                6,
            ),
        )
    )
    return (
        scored.select(
            F.concat_ws(" ", "w1", "w2").alias("bigram"), "c_ab", "c_a", "c_b", "pmi"
        )
        .orderBy(F.desc("pmi"), "bigram")
        .limit(50)
    )


COLLOCATION_PMI_SQL = """
WITH t AS (
  SELECT list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS toks
  FROM documents WHERE length(trim(text)) > 0
),
tok AS (SELECT unnest(toks) AS term FROM t),
uni AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1),
n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni),
bg AS (
  SELECT unnest(list_transform(range(1, len(toks)), i -> [toks[i], toks[i + 1]])) AS p
  FROM t
),
bgc AS (SELECT p[1] AS w1, p[2] AS w2, CAST(count(*) AS BIGINT) AS c_ab
        FROM bg GROUP BY 1, 2),
m AS (SELECT CAST(sum(c_ab) AS BIGINT) AS m FROM bgc),
scored AS (
  SELECT g.w1 || ' ' || g.w2 AS bigram, g.c_ab, a.c AS c_a, b.c AS c_b,
         round(ln(CAST(g.c_ab AS DOUBLE) * n.n * n.n
                  / (CAST(m.m AS DOUBLE) * a.c * b.c)), 6) AS pmi
  FROM bgc g
  JOIN uni a ON g.w1 = a.term
  JOIN uni b ON g.w2 = b.term
  CROSS JOIN n CROSS JOIN m
  WHERE g.c_ab >= 5
)
SELECT bigram, c_ab, c_a, c_b, pmi FROM scored
ORDER BY pmi DESC, bigram
LIMIT 50
"""


def source_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: per-source unigram KL divergence from the corpus distribution —
    the domain-shift metric a mixture designer reads next to
    dsir_importance: KL(P_source ‖ P_corpus) = Σ_w p_s(w) ln(p_s(w)/p(w)).
    Every source term exists in the corpus, so the sum is well-defined.

    Cross-engine determinism: per-term contributions are rounded to
    integer picos (1e12) and summed as BIGINTs, so the float summation
    order can't flip the hash (same trick as clip_pair mean-cosine); the
    per-source weighted sum is bounded (weights sum to 1), so the scaled
    longs can't overflow at any corpus size.

    Scale shape — ONE corpus scan, provable from the plan: the (source,
    term) agg is the only consumer of the token explode, the term
    marginal rides a term-partitioned window over that agg, the source
    total a source-partitioned window, and ln(n) enters via the identity
    KL = Σ p_s·ln(p_s/ctc) + ln(n) as a partition-less window over the
    |sources|-row result — no branch ever re-derives (= re-scans) the
    corpus subtree."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents", spread=True)
    tok = docs.filter(F.length(F.trim("text")) > 0).select(
        "source",
        F.explode(
            F.expr("filter(split(lower(trim(text)), '\\\\s+'), x -> x <> '')")
        ).alias("term"),
    )
    st = (
        tok.groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("stc"))
        .withColumn("ctc", F.sum("stc").over(Window.partitionBy("term")))
        .withColumn("stot", F.sum("stc").over(Window.partitionBy("source")))
    )
    # ansi: stot = partition sum >= own stc >= 1; ctc likewise >= 1
    ps = F.col("stc").cast("double") / F.col("stot").cast("double")
    contrib = F.round(ps * F.log(ps / F.col("ctc").cast("double")) * F.lit(1e12)).cast(  # ansi: ctc >= 1
        "long"
    )
    per_source = (
        st.withColumn("pico", contrib)
        .groupBy("source")
        .agg(
            F.max("stot").alias("tokens"),
            F.count(F.lit(1)).alias("vocab"),
            F.sum("pico").alias("s_pico"),
        )
        .withColumn("n", F.sum("tokens").over(Window.partitionBy()))
    )
    return per_source.select(
        "source",
        "tokens",
        "vocab",
        F.round(
            F.col("s_pico").cast("double") / F.lit(1e12)
            + F.log(F.col("n").cast("double")),
            6,
        ).alias("kl"),
    ).orderBy("source")


SOURCE_KL_SQL = """
WITH tok AS (
  SELECT source,
         unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')) AS term
  FROM documents WHERE length(trim(text)) > 0
),
st AS (SELECT source, term, CAST(count(*) AS BIGINT) AS stc FROM tok GROUP BY 1, 2),
w AS (
  SELECT source, term, stc,
         CAST(sum(stc) OVER (PARTITION BY term) AS BIGINT) AS ctc,
         CAST(sum(stc) OVER (PARTITION BY source) AS BIGINT) AS stot
  FROM st
),
contrib AS (
  SELECT source, stot,
         CAST(round((CAST(stc AS DOUBLE) / stot)
                    * ln((CAST(stc AS DOUBLE) / stot) / CAST(ctc AS DOUBLE))
                    * 1e12) AS BIGINT) AS pico
  FROM w
),
per_source AS (
  SELECT source,
         CAST(max(stot) AS BIGINT) AS tokens,
         CAST(count(*) AS BIGINT) AS vocab,
         CAST(sum(pico) AS BIGINT) AS s_pico
  FROM contrib
  GROUP BY source
),
with_n AS (
  SELECT source, tokens, vocab, s_pico,
         CAST(sum(tokens) OVER () AS BIGINT) AS n
  FROM per_source
)
SELECT source, tokens, vocab,
       round(CAST(s_pico AS DOUBLE) / 1e12 + ln(CAST(n AS DOUBLE)), 6) AS kl
FROM with_n
ORDER BY source
"""


def pack_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 extension: greedy sequence packing — per-language, docs in doc_id
    order packed into 256-whitespace-token training sequences (the step
    between corpus prep and the training job; see operators/packing.py).
    Output is sequence-level accounting incl. padding waste. The greedy
    fold is order-dependent per group — not expressible as a single-pass
    window — but IS expressible as a recursive CTE that closes one
    sequence per recursion level (boundary = largest prefix fitting the
    budget, via the per-group cumulative sum), which is exactly what the
    DuckDB oracle does; semantics are additionally golden- and
    property-tested in tests/test_packing.py."""
    from pdf_parse_vector_db_spark.operators.packing import pack_sequences

    budget = 256
    docs = load_table(spark, sf_dir, "documents", spread=True)
    assigned = pack_sequences(docs, budget=budget, group_col="lang")
    return (
        assigned.groupBy(F.col("grp").alias("lang"), "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("seq_tokens"),
        )
        .withColumn(
            "padding_waste",
            F.when(F.col("seq_tokens") < budget, F.lit(budget) - F.col("seq_tokens"))
            .otherwise(F.lit(0)),
        )
        .orderBy("lang", "seq_id")
    )


# --------------------------------------------------------------------------
# X5: tokenizer vocabulary coverage / OOV-rate audit. The question a
# tokenizer team asks before training: with a top-V frequency vocabulary,
# what fraction of each document's tokens falls out-of-vocabulary? Vocab =
# top-1000 corpus terms (count desc, term asc — a total order, so both
# engines elect the same boundary terms); per-doc OOV rate is one division
# of two exact counts, reproducible to the bit.
#
# Scale (100 TB): the term-frequency agg is partial+final over the token
# stream (map-side combine shrinks to |vocab| keys); top-V is
# TakeOrderedAndProject (never a full sort); the 1000-term vocab broadcasts
# back onto the token stream, so the only doc-grain shuffle is the final
# groupBy(doc_id) — the same key the corpus is naturally laid out on.
# --------------------------------------------------------------------------

_VOCAB_V = 1000


def vocab_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", spread=True)
    tok = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("term"),
    )
    vocab = (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("term"))
        .limit(_VOCAB_V)
        .select("term", F.lit(True).alias("in_vocab"))
    )
    return (
        tok.join(F.broadcast(vocab), on="term", how="left")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
        .withColumn(
            "oov_rate",
            # ansi: n_tokens = group count >= 1
            F.round(F.col("n_oov").cast("double") / F.col("n_tokens"), 6),
        )
        .orderBy("doc_id")
    )


VOCAB_OOV_SQL = f"""
WITH tok AS (
  SELECT doc_id, lang,
         unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
  FROM documents
),
vocab AS (
  SELECT term FROM tok GROUP BY term
  ORDER BY count(*) DESC, term
  LIMIT {_VOCAB_V}
)
SELECT doc_id, lang,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       round(CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS oov_rate
FROM tok LEFT JOIN vocab v USING (term)
GROUP BY doc_id, lang
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Content-defined chunking dedup (Rabin-style CDC; Muthitacharoen et al.
# 2001 "LBFS", public). The storage-tier complement of the document/span
# dedup tiers above: split every text at content-derived boundaries (hash
# of an 8-char window has first hex nibble '0' → ~1/16 cut probability,
# ~16-char expected chunks), fingerprint each chunk, and measure corpus
# redundancy as bytes_total / bytes_distinct. Because boundaries derive
# from CONTENT, an insertion early in a document shifts only the chunks it
# touches — unlike fixed-size blocks, where one inserted byte re-aligns
# (and re-uploads) everything after it.
# ---------------------------------------------------------------------------

_CDC_CANON = "lower(trim(regexp_replace(text, '\\\\s+', ' ')))"
_CDC_CANON_DUCK = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"


def cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus CDC-dedup accounting: one row with chunk counts, byte
    totals, the dedup ratio, and the most-replicated chunk's frequency.

    Scale shape: boundary detection, slicing, and fingerprinting are all
    per-document array algebra inside one generator expression (the
    winnowing discipline above — canon and the cut array each bind ONCE),
    so the subplan is shuffle-free; the only exchange carries 16-byte
    chunk fingerprints + a length, grouped with map-side partials. That
    is exactly how a dedup store scales: content never shuffles, only
    fingerprints do.
    """
    docs = load_table(spark, sf_dir, "documents", spread=True)
    chunks_expr = (
        f"explode(flatten(transform(array({_CDC_CANON}), c -> "
        "if(length(c) < 8, array(c), "
        "flatten(transform(array(array_distinct(concat(array(1), "
        "transform(filter(sequence(1, length(c) - 7), "
        "p -> substring(md5(substring(c, p, 8)), 1, 1) = '0'), p -> p + 8), "
        "array(length(c) + 1)))), cuts -> "
        "transform(sequence(1, size(cuts) - 1), "
        "i -> substring(c, element_at(cuts, i), "
        "element_at(cuts, i + 1) - element_at(cuts, i)))))))))"
    )
    ch = docs.select(F.expr(chunks_expr).alias("chunk")).select(
        F.md5("chunk").alias("fp"), F.length("chunk").alias("ln")
    )
    g = ch.groupBy("fp").agg(
        F.count(F.lit(1)).alias("cnt"), F.min("ln").alias("ln")
    )
    return g.agg(
        F.sum("cnt").cast("bigint").alias("n_chunks"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        # ansi: sum(cnt*ln) = total corpus bytes, bounded by input size
        F.sum(F.col("cnt") * F.col("ln")).cast("bigint").alias("bytes_total"),
        F.sum("ln").cast("bigint").alias("bytes_distinct"),
        F.round(
            # ansi: corpus-bytes bound again; ln sums >= 1 per distinct chunk
            F.sum(F.col("cnt") * F.col("ln")).cast("double") / F.sum("ln"), 4
        ).alias("dedup_ratio"),
        F.max("cnt").cast("bigint").alias("max_dup"),
    )


CDC_CHUNK_DEDUP_SQL = f"""
WITH c AS (
  SELECT {_CDC_CANON_DUCK} AS c FROM documents
), cut AS (
  SELECT c,
         CASE WHEN length(c) < 8 THEN NULL ELSE
           list_sort(list_distinct([1]
             || list_transform(list_filter(range(1, length(c) - 7 + 1),
                  p -> substring(md5(substring(c, p, 8)), 1, 1) = '0'),
                  p -> p + 8)
             || [length(c) + 1]))
         END AS cuts
  FROM c
), chunks AS (
  SELECT unnest(CASE WHEN cuts IS NULL THEN [c] ELSE
           list_transform(range(1, len(cuts)),
                          i -> substring(c, cuts[i], cuts[i + 1] - cuts[i]))
         END) AS chunk
  FROM cut
), fps AS (
  SELECT md5(chunk) AS fp, length(chunk) AS ln FROM chunks
), g AS (
  SELECT fp, CAST(count(*) AS BIGINT) AS cnt, min(ln) AS ln FROM fps GROUP BY fp
)
SELECT CAST(sum(cnt) AS BIGINT) AS n_chunks,
       CAST(count(*) AS BIGINT) AS n_distinct,
       CAST(sum(cnt * ln) AS BIGINT) AS bytes_total,
       CAST(sum(ln) AS BIGINT) AS bytes_distinct,
       round(CAST(sum(cnt * ln) AS DOUBLE) / sum(ln), 4) AS dedup_ratio,
       CAST(max(cnt) AS BIGINT) AS max_dup
FROM g
"""




PACK_TRAINING_SEQUENCES_SQL = """
WITH RECURSIVE d AS (
  SELECT lang, doc_id,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
         row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS pos,
         sum(CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT))
           OVER (PARTITION BY lang ORDER BY doc_id) AS cum
  FROM documents
),
maxp AS (SELECT lang, max(pos) AS mx FROM d GROUP BY lang),
seqs AS (
  SELECT l.lang, 0 AS seq_id, CAST(1 AS BIGINT) AS start_pos,
         coalesce((SELECT max(d2.pos) FROM d d2
                   WHERE d2.lang = l.lang AND d2.cum <= 256), CAST(1 AS BIGINT)) AS end_pos
  FROM (SELECT DISTINCT lang FROM d) l
  UNION ALL
  SELECT s.lang, s.seq_id + 1, s.end_pos + 1,
         coalesce((SELECT max(d2.pos) FROM d d2
                   WHERE d2.lang = s.lang AND d2.pos > s.end_pos
                     AND d2.cum - (SELECT d3.cum FROM d d3
                                   WHERE d3.lang = s.lang AND d3.pos = s.end_pos) <= 256),
                  s.end_pos + 1) AS end_pos
  FROM seqs s JOIN maxp m ON s.lang = m.lang
  WHERE s.end_pos < m.mx
)
SELECT d.lang, CAST(s.seq_id AS INTEGER) AS seq_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(d.n_tokens) AS BIGINT) AS seq_tokens,
       CAST(CASE WHEN sum(d.n_tokens) < 256 THEN 256 - sum(d.n_tokens)
                 ELSE 0 END AS BIGINT) AS padding_waste
FROM d JOIN seqs s ON d.lang = s.lang AND d.pos BETWEEN s.start_pos AND s.end_pos
GROUP BY 1, 2
ORDER BY 1, 2
"""


_COVERAGE_NS = (1, 10, 100)


def ngram_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: head-coverage curve — what fraction of all 2-gram OCCURRENCES
    the top-1/10/100 most frequent 2-grams account for. The companion
    diagnostic to zipf_fit: the Zipf exponent says how fast the tail
    decays, the coverage curve says how much of the corpus a head-only
    treatment (stopword lists, cached tokenizations, hot-key handling)
    actually touches.

    Scale shape: one explode + hash-agg on the gram (map-side partials
    carry per-partition counts, the exchange is distinct-grams-sized);
    the head cut is TakeOrderedAndProject(100) — the global row_number
    runs on those 100 rows only, never on the full vocabulary — and the
    N-grid/total cross joins touch constant-size relations."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents", spread=True)
    counts = (
        docs.select(F.explode(F.expr(_ngrams_nd_spark(2))).alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    total = counts.agg(F.sum("c").cast("long").alias("total_occurrences"))
    top = (
        counts.orderBy(F.desc("c"), F.asc("g"))
        .limit(max(_COVERAGE_NS))
        .withColumn("rn", F.row_number().over(Window.orderBy(F.desc("c"), F.asc("g"))))
    )
    ns = spark.range(1).select(
        F.explode(F.array(*[F.lit(n) for n in _COVERAGE_NS])).alias("n_top")
    )
    return (
        top.crossJoin(F.broadcast(ns))
        .groupBy("n_top")
        .agg(
            F.sum(F.when(F.col("rn") <= F.col("n_top"), F.col("c")).otherwise(0))
            .cast("long")
            .alias("covered_occurrences")
        )
        .crossJoin(F.broadcast(total))
        .select(
            "n_top",
            "covered_occurrences",
            "total_occurrences",
            # ansi: total >= covered >= 0 and total >= 1 on any non-empty corpus
            F.round(
                F.try_divide(F.col("covered_occurrences"), F.col("total_occurrences")), 6
            ).alias("coverage_frac"),
        )
        .orderBy("n_top")
    )


NGRAM_COVERAGE_CURVE_SQL = f"""
WITH grams AS (
  SELECT unnest({_ngrams_nd_duck(2)}) AS g FROM documents
),
counts AS (SELECT g, count(*) AS c FROM grams GROUP BY g),
total AS (SELECT CAST(sum(c) AS BIGINT) AS total_occurrences FROM counts),
top AS (
  SELECT g, c, row_number() OVER (ORDER BY c DESC, g) AS rn
  FROM counts ORDER BY c DESC, g LIMIT {max(_COVERAGE_NS)}
),
ns AS (SELECT unnest({list(_COVERAGE_NS)}) AS n_top)
SELECT CAST(n_top AS INT) AS n_top,
       CAST(sum(CASE WHEN rn <= n_top THEN c ELSE 0 END) AS BIGINT)
         AS covered_occurrences,
       max(total_occurrences) AS total_occurrences,
       round(CAST(sum(CASE WHEN rn <= n_top THEN c ELSE 0 END) AS DOUBLE)
             / max(total_occurrences), 6) AS coverage_frac
FROM top CROSS JOIN ns CROSS JOIN total
GROUP BY n_top
ORDER BY n_top
"""


QUERIES = [
    QuerySpec("corpus_prep", corpus_prep, CORPUS_PREP_SQL, "X1+X5 composite training-data prep"),
    QuerySpec("ngram_coverage_curve", ngram_coverage_curve, NGRAM_COVERAGE_CURVE_SQL, "X5 head-coverage curve: corpus share of top-1/10/100 2-grams"),
    QuerySpec("cdc_chunk_dedup", cdc_chunk_dedup, CDC_CHUNK_DEDUP_SQL, "X1 content-defined-chunking storage dedup accounting"),
    QuerySpec("vocab_oov", vocab_oov, VOCAB_OOV_SQL, "X5 vocab-coverage / OOV-rate audit"),
    QuerySpec("pack_training_sequences", pack_training_sequences, PACK_TRAINING_SEQUENCES_SQL, "X5 greedy sequence packing (recursive-CTE oracle closes one sequence per level)"),
    QuerySpec("gopher_quality", gopher_quality, GOPHER_QUALITY_SQL, "X5 Gopher-rule quality gate"),
    QuerySpec("repetition_stats", repetition_stats, REPETITION_STATS_SQL, "X5 within-doc repetition metrics (Gopher A1.1 skeleton)"),
    QuerySpec("tfidf_top_terms", tfidf_top_terms, TFIDF_TOP_TERMS_SQL, "X5 TF-IDF top terms per source"),
    QuerySpec("collocation_pmi", collocation_pmi, COLLOCATION_PMI_SQL, "X5 bigram collocations by PMI"),
    QuerySpec("source_kl_divergence", source_kl_divergence, SOURCE_KL_SQL, "X5 per-source unigram KL from corpus"),
    QuerySpec("decontaminate_overlap", decontaminate_overlap, DECONTAMINATE_OVERLAP_SQL, "X5 benchmark decontamination"),
    QuerySpec("winnow_stats", winnow_stats, WINNOW_STATS_SQL, "rolling-hash winnowing fingerprints"),
    QuerySpec("winnow_shared_pairs", winnow_shared_pairs, WINNOW_SHARED_PAIRS_SQL, "substring-overlap near-dup (MOSS shape)"),
    QuerySpec("lang_id", lang_id, LANG_ID_SQL, "X5 language-ID heuristic"),
    QuerySpec("lang_id_confusion", lang_id_confusion, LANG_ID_CONFUSION_SQL, "X5 lang-ID confusion matrix: per-cell recall/precision shares"),
    QuerySpec("text_quality", text_quality, TEXT_QUALITY_SQL, "X5 quality metrics"),
    QuerySpec("token_stats", token_stats, TOKEN_STATS_SQL, "X5 token accounting"),
    QuerySpec("doc_fingerprints", doc_fingerprints, DOC_FINGERPRINTS_SQL, "X1 content hash"),
    QuerySpec("exact_dup_groups", exact_dup_groups, EXACT_DUP_GROUPS_SQL, "X1 exact dedup"),
]

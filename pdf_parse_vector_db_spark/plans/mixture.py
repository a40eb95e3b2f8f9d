"""Training-mixture planning queries (north-star X5 extension).

The step after corpus prep in an LLM data pipeline: deciding HOW MUCH of
each language / domain / source actually enters the training run, and how
the chosen corpus is physically laid out into shards. All four planning
queries are group-by aggregations whose post-processing (normalisation,
temperature scaling, share math) happens on the tiny grouped result via
unpartitioned windows — at 100 TB the scan-side agg is map-combined and the
window sees ≤ |langs| × |sources| rows, so nothing here adds a data-sized
shuffle. The shard query's row_number is per-lang, mirroring the physical
writer in operators/shards.py (repartitionByRange + maxRecordsPerFile).

No reference citation: the reference (Suyash906/pdf_parse_vector_db) has no
mixture planning; these are the driver-mandated LLM-data-pipeline extensions
(BASELINE.json), modeled on public practice: temperature sampling per
XLM-R (Conneau et al. 2020, alpha=0.3) and epochs-per-domain accounting per
Gopher/MassiveText (Rae et al. 2021, table A3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pdf_parse_vector_db_spark.plans.registry import QuerySpec
from pdf_parse_vector_db_spark.sources.registry import load_table

_ALPHA = 0.3
_SAMPLE_BUDGET = 10_000


def lang_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language sampling weights (p_l^alpha, alpha=0.3):
    the XLM-R recipe that up-samples tail languages. Output per lang: raw
    share, temperature weight, and expected docs drawn at a 10k budget."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_chars").alias("chars"),
    )
    w = Window.partitionBy()  # grouped result is |langs| rows — driver-tiny
    # ansi: window sum includes this row's docs >= 1
    p = F.col("docs") / F.sum("docs").over(w)
    # p_l^a / sum p^a == docs^a / sum docs^a (total cancels) — the latter
    # avoids nesting a window inside a window, which DuckDB rejects
    pa = F.pow(F.col("docs").cast("double"), F.lit(_ALPHA))
    tw = pa / F.sum(pa).over(w)  # ansi: sum of positive pow terms incl. own > 0
    return (
        counts.select(
            "lang",
            "docs",
            "chars",
            F.round(p, 6).alias("p_raw"),
            F.round(tw, 6).alias("p_temp"),
            F.round(tw * _SAMPLE_BUDGET, 1).alias("expected_docs"),
        )
        .orderBy("lang")
    )


LANG_TEMPERATURE_MIX_SQL = f"""
WITH c AS (
  SELECT lang, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS chars
  FROM documents GROUP BY lang
)
SELECT lang, docs, chars,
       round(docs / sum(docs) OVER (), 6) AS p_raw,
       round(pow(CAST(docs AS DOUBLE), {_ALPHA})
             / sum(pow(CAST(docs AS DOUBLE), {_ALPHA})) OVER (), 6) AS p_temp,
       round(pow(CAST(docs AS DOUBLE), {_ALPHA})
             / sum(pow(CAST(docs AS DOUBLE), {_ALPHA})) OVER ()
             * {_SAMPLE_BUDGET}, 1) AS expected_docs
FROM c
ORDER BY lang
"""


# Per-source deterministic sampling rate: a 2-hex-digit md5(doc_id) prefix
# threshold, so the SAME doc is kept on every engine and every retry (the
# reason corpus_prep rejects rand() applies here too).
_RATE_CASE_SPARK = (
    "CASE cast(substring(source, 4, 10) AS int) % 4 "
    "WHEN 0 THEN '80' WHEN 1 THEN '40' WHEN 2 THEN '1a' ELSE '0d' END"
)
_RATE_CASE_DUCK = (
    "CASE CAST(substring(source, 4) AS INT) % 4 "
    "WHEN 0 THEN '80' WHEN 1 THEN '40' WHEN 2 THEN '1a' ELSE '0d' END"
)
# decimal literals make DECIMAL results in both engines — divide as DOUBLE
_NOMINAL_SPARK = (
    "CAST(CASE cast(substring(source, 4, 10) AS int) % 4 "
    "WHEN 0 THEN 128 WHEN 1 THEN 64 WHEN 2 THEN 26 ELSE 13 END AS DOUBLE) / 256"
)
_NOMINAL_DUCK = (
    "CAST(CASE CAST(substring(source, 4) AS INT) % 4 "
    "WHEN 0 THEN 128 WHEN 1 THEN 64 WHEN 2 THEN 26 ELSE 13 END AS DOUBLE) / 256"
)


def stratified_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source stratified sampling audit: deterministic hash sample at a
    source-dependent rate, reporting nominal vs observed rate. One scan, one
    small agg — the sample predicate is a map-side md5 prefix compare."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    kept = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < F.expr(
        _RATE_CASE_SPARK
    )
    return (
        docs.select("source", kept.cast("bigint").alias("kept"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.sum("kept").alias("sampled"),
        )
        .select(
            "source",
            "total",
            "sampled",
            F.round(F.expr(_NOMINAL_SPARK), 6).alias("nominal_rate"),
            # ansi: total = group count >= 1
            F.round(F.col("sampled") / F.col("total"), 6).alias("observed_rate"),
        )
        .orderBy("source")
    )


STRATIFIED_SAMPLE_COUNTS_SQL = f"""
SELECT source,
       count(*) AS total,
       CAST(sum(CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                          < {_RATE_CASE_DUCK}
                THEN 1 ELSE 0 END) AS BIGINT) AS sampled,
       round({_NOMINAL_DUCK}, 6) AS nominal_rate,
       round(CAST(sum(CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                                < {_RATE_CASE_DUCK}
                      THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
         AS observed_rate
FROM documents
GROUP BY source
ORDER BY source
"""


_SHARD_SIZE = 512


def training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logical shard manifest: per-lang doc_id-ordered row_number folded into
    512-doc shards — the accounting twin of the physical writer
    (operators/shards.py: repartitionByRange(lang, doc_id) +
    maxRecordsPerFile), which produces exactly these file boundaries.
    The per-lang sort is the one exchange; at 100 TB it is the same
    range-partitioned sort the writer needs anyway, so the manifest is free."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    rn = F.row_number().over(Window.partitionBy("lang").orderBy("doc_id"))
    return (
        docs.select("lang", "doc_id", "n_chars")
        .withColumn("shard_id", ((rn - F.lit(1)) / _SHARD_SIZE).cast("bigint"))
        .groupBy("lang", "shard_id")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_chars").alias("chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("lang", "shard_id")
    )


TRAINING_SHARDS_SQL = f"""
WITH numbered AS (
  SELECT lang, doc_id, n_chars,
         CAST(floor((row_number() OVER (PARTITION BY lang ORDER BY doc_id) - 1)
                    / {_SHARD_SIZE}) AS BIGINT) AS shard_id
  FROM documents
)
SELECT lang, shard_id, count(*) AS docs,
       CAST(sum(n_chars) AS BIGINT) AS chars,
       min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
FROM numbered
GROUP BY lang, shard_id
ORDER BY lang, shard_id
"""


# Domain map: src<k> → k % 3 ∈ {web, books, code}; target mixture shares are
# the Gopher-style fixed dial the run is configured with.
_DOMAIN_SPARK = (
    "CASE cast(substring(source, 4, 10) AS int) % 3 "
    "WHEN 0 THEN 'web' WHEN 1 THEN 'books' ELSE 'code' END"
)
_DOMAIN_DUCK = (
    "CASE CAST(substring(source, 4) AS INT) % 3 "
    "WHEN 0 THEN 'web' WHEN 1 THEN 'books' ELSE 'code' END"
)
_SHARE_SPARK = (
    "CAST(CASE domain WHEN 'web' THEN 0.5 WHEN 'books' THEN 0.3 ELSE 0.2 END"
    " AS DOUBLE)"
)
_SHARE_DUCK = _SHARE_SPARK


def domain_mixture_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epochs-per-domain accounting (MassiveText style): given target mixture
    shares and a token budget of 2x the corpus, how many passes over each
    domain's data the run makes — epochs > 1 flags up-sampling."""
    docs = load_table(spark, sf_dir, "documents")
    by_domain = (
        docs.withColumn("domain", F.expr(_DOMAIN_SPARK))
        .groupBy("domain")
        .agg(F.sum("n_chars").alias("chars"))
    )
    w = Window.partitionBy()  # 3 rows
    budget = F.sum("chars").over(w) * 2
    share = F.expr(_SHARE_SPARK)
    # ansi: chars = per-domain char sum, >= 1 for any emitted group
    epochs = F.round(budget * share / F.col("chars"), 4)
    return (
        by_domain.select(
            "domain",
            "chars",
            share.cast("double").alias("target_share"),
            epochs.alias("epochs"),
            (epochs > 1.0).alias("upsampled"),
        )
        .orderBy("domain")
    )


DOMAIN_MIXTURE_EPOCHS_SQL = f"""
WITH d AS (
  SELECT {_DOMAIN_DUCK} AS domain, CAST(sum(n_chars) AS BIGINT) AS chars
  FROM documents GROUP BY 1
)
SELECT domain, chars,
       CAST({_SHARE_DUCK} AS DOUBLE) AS target_share,
       round(sum(chars) OVER () * 2 * ({_SHARE_DUCK}) / chars, 4) AS epochs,
       round(sum(chars) OVER () * 2 * ({_SHARE_DUCK}) / chars, 4) > 1.0
         AS upsampled
FROM d
ORDER BY domain
"""


# Split thresholds on the first two hex digits of md5(doc_id): < 'f0' train
# (93.75%), < 'f8' val (3.125%), rest test (3.125%) — deterministic across
# engines, retries, and cluster sizes, unlike randomSplit.
_SPLIT_SPARK = (
    "CASE WHEN substring(md5(cast(doc_id AS string)), 1, 2) < 'f0' THEN 'train' "
    "WHEN substring(md5(cast(doc_id AS string)), 1, 2) < 'f8' THEN 'val' "
    "ELSE 'test' END"
)
_SPLIT_DUCK = (
    "CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f0' THEN 'train' "
    "WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f8' THEN 'val' "
    "ELSE 'test' END"
)


def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based train/val/test assignment with per-split,
    per-lang accounting — the split a training job freezes before anything
    else runs. Hash-derived (not randomSplit): the same doc lands in the
    same split on every engine, retry, and partition layout."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("split", F.expr(_SPLIT_SPARK))
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_chars").alias("chars"),
        )
        .orderBy("split", "lang")
    )


TRAIN_VAL_TEST_SPLIT_SQL = f"""
SELECT {_SPLIT_DUCK} AS split, lang,
       count(*) AS docs,
       CAST(sum(n_chars) AS BIGINT) AS chars
FROM documents
GROUP BY 1, 2
ORDER BY split, lang
"""


def seq_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two document-length histogram per lang — the context-length
    planning query (how much of the corpus fits a 2^k-token window). Pure
    map + small agg; log2/floor are exact on the power-of-two boundaries."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.pow(
        F.lit(2.0), F.floor(F.log2(F.greatest(F.col("n_chars"), F.lit(1))))
    ).cast("bigint")
    return (
        docs.select("lang", bucket.alias("len_bucket"))
        .groupBy("lang", "len_bucket")
        .agg(F.count(F.lit(1)).alias("docs"))
        .orderBy("lang", "len_bucket")
    )


SEQ_LENGTH_HISTOGRAM_SQL = """
SELECT lang,
       CAST(pow(2, floor(log2(greatest(n_chars, 1)))) AS BIGINT) AS len_bucket,
       count(*) AS docs
FROM documents
GROUP BY lang, len_bucket
ORDER BY lang, len_bucket
"""


def corpus_to_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end prep DAG as ONE plan: Gopher quality gate → exact
    dedup (md5 canon fingerprint, min-doc_id keeper) → per-lang 256-doc
    shard manifest — what plans/textanalysis.corpus_prep accounts for,
    continued through to the physical layout operators/shards.py writes.

    Scale shape: the gate prunes before anything shuffles; dedup exchanges
    16-byte fingerprints; the manifest's per-lang row_number rides the same
    sort the shard writer needs — three exchanges total, none data-sized
    after the gate."""
    from pdf_parse_vector_db_spark.functions import text as T

    docs = load_table(spark, sf_dir, "documents", spread=True)
    g = T.gopher_metrics_expr("text")
    fp = T.fingerprint_expr("text")["fingerprint"]
    gated = docs.withColumn("gopher_pass", g["gopher_pass"]).filter(
        F.col("gopher_pass")
    ).withColumn("__fp", fp)
    keep = gated.groupBy("__fp").agg(F.min("doc_id").alias("doc_id"))
    deduped = gated.join(keep.select("doc_id"), on="doc_id", how="left_semi")
    rn = F.row_number().over(Window.partitionBy("lang").orderBy("doc_id"))
    return (
        deduped.select("lang", "doc_id", "n_chars")
        .withColumn("shard_id", ((rn - F.lit(1)) / 256).cast("bigint"))
        .groupBy("lang", "shard_id")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_chars").alias("chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("lang", "shard_id")
    )


def _corpus_to_shards_sql() -> str:
    from pdf_parse_vector_db_spark.functions import text as T

    gopher_pass = T.gopher_metrics_sql("text")["gopher_pass"]
    return f"""
WITH gated AS (
  SELECT doc_id, lang, n_chars,
         md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
  FROM documents
  WHERE {gopher_pass}
),
keep AS (SELECT min(doc_id) AS doc_id FROM gated GROUP BY fp),
deduped AS (
  SELECT g.* FROM gated g WHERE g.doc_id IN (SELECT doc_id FROM keep)
),
numbered AS (
  SELECT lang, doc_id, n_chars,
         CAST(floor((row_number() OVER (PARTITION BY lang ORDER BY doc_id) - 1)
                    / 256) AS BIGINT) AS shard_id
  FROM deduped
)
SELECT lang, shard_id, count(*) AS docs,
       CAST(sum(n_chars) AS BIGINT) AS chars,
       min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
FROM numbered
GROUP BY lang, shard_id
ORDER BY lang, shard_id
"""


CORPUS_TO_SHARDS_SQL = _corpus_to_shards_sql()


def negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-matched negative sampling for contrastive training: pair each
    doc with the next doc_id in its n_chars bucket — a 'hard' negative that
    matches on length (the easiest give-away feature) while (usually)
    differing in content. One window over the bucket sort; deterministic,
    so the pairing is reproducible across engines and retries (the property
    random negative sampling loses on repartition)."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("n_chars").orderBy("doc_id")
    return (
        docs.select(
            "doc_id",
            "lang",
            F.col("n_chars").alias("len_bucket"),
            F.lead("doc_id").over(w).alias("neg_doc_id"),
            (F.lead("lang").over(w) == F.col("lang")).alias("same_lang"),
        )
        .filter(F.col("neg_doc_id").isNotNull())
        .orderBy("doc_id")
    )


NEGATIVE_PAIRS_SQL = """
SELECT doc_id, lang, len_bucket, neg_doc_id, same_lang
FROM (
  SELECT doc_id, lang, n_chars AS len_bucket,
         lead(doc_id) OVER (PARTITION BY n_chars ORDER BY doc_id) AS neg_doc_id,
         lead(lang) OVER (PARTITION BY n_chars ORDER BY doc_id) = lang
           AS same_lang
  FROM documents
)
WHERE neg_doc_id IS NOT NULL
ORDER BY doc_id
"""


def es_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis–Spirakis (2006, public) weighted reservoir sample:
    k orders drawn WITHOUT replacement with probability proportional to
    o_totalprice, via the order-sampling identity — give each row the key
    u^(1/w) (equivalently rank by ln(u)/w, monotone) for hash-uniform
    u ∈ (0,1), keep the k largest keys.

    Determinism: u = (md5-derived 32-bit int + 0.5) / 2^32 — no RNG state,
    so the same sample materializes on every engine, retry, and partition
    layout (the property that makes weighted sampling safe to re-run
    mid-pipeline at 100 TB). The weight is normalized by 1e5 so keys have
    ~unit magnitude before the 6-dp round; ordering uses the ROUNDED key
    with an orderkey tie-break so both engines cut the same k rows.

    Scale shape: key assignment is a pure map; the k-largest cut is
    orderBy+limit → TakeOrderedAndProject (per-partition k-heaps + a k-row
    driver merge), never a global sort.
    """
    k = 50
    orders = load_table(spark, sf_dir, "orders")
    u = (
        F.expr(
            "CAST(conv(substring(md5(CAST(o_orderkey AS STRING)), 1, 8), 16, 10) AS BIGINT)"
        )
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    # ansi: o_totalprice > 0 in TPC-H (weights of the ES reservoir)
    key = F.round(F.log(u) / (F.col("o_totalprice") / F.lit(1e5)), 6)
    return (
        orders.select(
            "o_orderkey",
            F.round("o_totalprice", 2).alias("price"),
            key.alias("es_key"),
        )
        .orderBy(F.desc("es_key"), F.asc("o_orderkey"))
        .limit(k)
    )


ES_WEIGHTED_RESERVOIR_SQL = """
SELECT o_orderkey,
       round(o_totalprice, 2) AS price,
       round(ln((('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT + 0.5)
                / 4294967296.0)
             / (o_totalprice / 100000.0), 6) AS es_key
FROM orders
ORDER BY es_key DESC, o_orderkey ASC
LIMIT 50
"""


def weighted_sample_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document WEIGHTED inclusion sampling (Horvitz-Thompson style):
    keep doc ⟺ hash-uniform(doc_id) < weight, with length-proportional
    weights w = min(1, n_chars/1500) — the generalization of corpus_prep's
    fixed-rate md5 gate to importance sampling (up-weight long documents
    toward a token budget). Deterministic: same doc kept on every engine,
    retry, and partition layout; no RNG state.

    The audit reports per-source totals, realized keeps, and the
    Horvitz-Thompson expected keep count (Σw, integer-micros exact) so
    drift between realized and expected is visible at a glance."""
    docs = load_table(spark, sf_dir, "documents")
    u = F.expr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT)"
    ) / F.lit(4294967296.0)
    w = F.least(F.lit(1.0), F.col("n_chars") / F.lit(1500.0))
    d = docs.select(
        "source",
        u.alias("u"),
        w.alias("w"),
    ).withColumn("keep", (F.col("u") < F.col("w")).cast("long"))
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("keep").alias("kept"),
            F.round(
                F.sum(F.round(F.col("w") * 1e6).cast("long")).cast("double") / 1e6, 4
            ).alias("expected_kept"),
            F.round(F.sum("keep").cast("double") / F.count(F.lit(1)), 4).alias(
                "keep_rate"
            ),
        )
        .orderBy("source")
    )


WEIGHTED_SAMPLE_AUDIT_SQL = """
WITH d AS (
  SELECT source,
         ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           / 4294967296.0 AS u,
         least(CAST(1.0 AS DOUBLE), n_chars / CAST(1500.0 AS DOUBLE)) AS w
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS docs,
       CAST(sum(CASE WHEN u < w THEN 1 ELSE 0 END) AS BIGINT) AS kept,
       round(CAST(sum(CAST(round(w * 1000000) AS BIGINT)) AS DOUBLE) / 1000000, 4)
         AS expected_kept,
       round(CAST(sum(CASE WHEN u < w THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4)
         AS keep_rate
FROM d
GROUP BY source
ORDER BY source
"""


def stratified_topk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-stratum sampling: exactly 3 docs per (source,
    lang) cell, chosen by md5 hash rank — the "give me a bounded, stable
    inspection sample from every stratum" op (eval-set seeding, manual QA
    draws). Hash-ranked, not random: the same docs come back on every
    engine, retry, and partition layout, and adding data only perturbs
    cells whose hash frontier moved.

    Scale shape: one row_number window partitioned by the stratum key —
    a single exchange of (stratum, hash, id); no per-group limit collect,
    no skew (rank cutoff applies within each partition's heap)."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source", "lang").orderBy(
        F.md5(F.col("doc_id").cast("string")).asc(), F.col("doc_id").asc()
    )
    return (
        docs.select("source", "lang", "doc_id", "n_chars")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("source", "lang", F.col("rk").alias("rank"), "doc_id", "n_chars")
        .orderBy("source", "lang", "rank")
    )


STRATIFIED_TOPK_SAMPLE_SQL = """
SELECT source, lang, rk AS rank, doc_id, n_chars
FROM (
  SELECT source, lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY source, lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rk
  FROM documents
)
WHERE rk <= 3
ORDER BY source, lang, rank
"""


def split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-leakage audit: near-duplicate pairs (asymmetric shingle
    containment tier, same contract as containment_dups) whose members
    landed in DIFFERENT train/val/test splits — each such pair is
    evaluation data the model effectively trained on. The standard fix is
    cluster-level split assignment (dup_components then split by
    component); this query is the detector that says whether you need it.
    Pair generation reuses the bucketed dedup tier, so the audit costs one
    doc-keyed join more than the dedup itself."""
    from pdf_parse_vector_db_spark.plans.similarity import containment_dups

    pairs = containment_dups(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    splits = docs.select("doc_id", F.expr(_SPLIT_SPARK).alias("split"))
    a = splits.select(F.col("doc_id").alias("id_a"), F.col("split").alias("split_a"))
    b = splits.select(F.col("doc_id").alias("id_b"), F.col("split").alias("split_b"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .select("id_a", "id_b", "containment", "split_a", "split_b")
        .orderBy("id_a", "id_b")
    )


def _split_leakage_sql() -> str:
    from pdf_parse_vector_db_spark.plans.similarity import CONTAINMENT_DUPS_SQL

    return f"""
WITH pairs AS ({CONTAINMENT_DUPS_SQL}),
splits AS (SELECT doc_id, {_SPLIT_DUCK} AS split FROM documents)
SELECT p.id_a, p.id_b, p.containment, a.split AS split_a, b.split AS split_b
FROM pairs p
JOIN splits a ON p.id_a = a.doc_id
JOIN splits b ON p.id_b = b.doc_id
WHERE a.split <> b.split
ORDER BY p.id_a, p.id_b
"""


# --------------------------------------------------------------------------
# T5-style span-corruption planning (Raffel et al. 2020 §3.1.4): pick ~5% of
# token positions as span STARTS from a deterministic md5 uniform (so the
# plan — unlike rand() — is retry-safe, engine-portable, and sits under the
# oracle hash; swapping the hash for rand() recovers the production
# sampler), extend each start over a fixed 3-token span, and account the
# mask: masked tokens are the union of spans (overlaps collapse), sentinels
# are maximal masked runs (each run becomes ONE sentinel token in the
# corrupted sequence, the T5 encoding). Union and run detection are two
# windows over the per-doc token order — no self-join: covered(i) =
# any start in [i-2, i] (a ROWS BETWEEN 2 PRECEDING window, positions are
# dense by construction), run-start = covered AND NOT lag(covered).
#
# Scale: tokens explode map-side; both windows partition by doc_id and
# share one (doc_id, pos) sort; the final agg returns one row per doc on
# the same key — a single exchange end to end.
# --------------------------------------------------------------------------

_SPAN_LEN = 3  # fixed span length (mean-3 spans, deterministic variant)
_SPAN_START_PCT = 5  # start probability: md5-uniform % 100 < 5


def span_corruption_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents", spread=True)
    tok = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("pos", "term"),
    )
    start = (
        F.expr(
            "CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), ':',"
            " CAST(pos AS STRING))), 1, 15), 16, 10) AS BIGINT)"
        )
        % 100
        < _SPAN_START_PCT
    ).cast("int")
    w_cover = W.partitionBy("doc_id").orderBy("pos").rowsBetween(-(_SPAN_LEN - 1), 0)
    w_lag = W.partitionBy("doc_id").orderBy("pos")
    marked = (
        tok.withColumn("is_start", start)
        .withColumn("covered", (F.max("is_start").over(w_cover) == 1).cast("int"))
        .withColumn(
            "run_start",
            (
                (F.col("covered") == 1)
                & (F.coalesce(F.lag("covered").over(w_lag), F.lit(0)) == 0)
            ).cast("int"),
        )
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("is_start").alias("n_starts"),
            F.sum("covered").alias("n_masked"),
            F.sum("run_start").alias("n_sentinels"),
        )
        .withColumn(
            "mask_ratio",
            # ansi: n_tokens = per-doc token count >= 1 (split emits >= 1)
            F.round(F.col("n_masked").cast("double") / F.col("n_tokens"), 6),
        )
        .orderBy("doc_id")
    )


SPAN_CORRUPTION_SQL = f"""
WITH tok AS (
  SELECT doc_id,
         generate_subscripts(toks, 1) - 1 AS pos,
         unnest(toks) AS term
  FROM (SELECT doc_id,
               string_split_regex(lower(trim(text)), '\\s+') AS toks
        FROM documents)),
marked AS (
  SELECT doc_id, pos,
         CASE WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':'
                    || CAST(pos AS VARCHAR)), 1, 15))::BIGINT % 100
                   < {_SPAN_START_PCT}
              THEN 1 ELSE 0 END AS is_start
  FROM tok),
covered AS (
  SELECT doc_id, pos, is_start,
         CASE WHEN max(is_start) OVER (PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN {_SPAN_LEN - 1} PRECEDING AND CURRENT ROW) = 1
              THEN 1 ELSE 0 END AS covered
  FROM marked),
runs AS (
  SELECT doc_id, pos, is_start, covered,
         CASE WHEN covered = 1
               AND coalesce(lag(covered) OVER (PARTITION BY doc_id ORDER BY pos), 0) = 0
              THEN 1 ELSE 0 END AS run_start
  FROM covered)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(is_start) AS BIGINT) AS n_starts,
       CAST(sum(covered) AS BIGINT) AS n_masked,
       CAST(sum(run_start) AS BIGINT) AS n_sentinels,
       round(CAST(sum(covered) AS DOUBLE) / count(*), 6) AS mask_ratio
FROM runs
GROUP BY doc_id
ORDER BY doc_id
"""


def correlated_sample_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-preserving (correlated) sampling vs independent row sampling
    (universe sampling in the AQP literature — e.g. BlinkDB/Quickr,
    public): sampling BOTH fact tables by the same hash of the JOIN KEY
    (custkey) keeps every sampled customer's orders AND their lineitems,
    so join results over the sample are unbiased; sampling each table's
    ROWS independently at the same rate destroys the join (an order
    survives without its lineitems with prob (1-p), and the join
    cardinality collapses to ~p² of truth). The audit measures both
    strategies' retained join cardinality against the full join.

    One row: full join size, correlated-sample join size (≈ p of full),
    independent-sample join size (≈ p² of full), and the realized ratios
    — the numbers that justify key-correlated sampling at 100 TB.
    """
    p_pct = 20  # sampling rate, percent
    orders = load_table(spark, sf_dir, "orders", spread=True)
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    cust_gate = (
        F.expr(
            "CAST(conv(substring(md5(CAST(o_custkey AS STRING)), 1, 8), 16, 10) AS BIGINT) % 100"
        )
        < p_pct
    )
    row_gate_o = (
        F.expr(
            "CAST(conv(substring(md5(concat('o:', CAST(o_orderkey AS STRING))), 1, 8), 16, 10) AS BIGINT) % 100"
        )
        < p_pct
    )
    row_gate_l = (
        F.expr(
            "CAST(conv(substring(md5(concat('l:', CAST(l_orderkey AS STRING), ':', "
            "CAST(l_linenumber AS STRING))), 1, 8), 16, 10) AS BIGINT) % 100"
        )
        < p_pct
    )
    full = li.join(orders, li.l_orderkey == orders.o_orderkey)
    corr = li.join(orders.filter(cust_gate), li.l_orderkey == orders.o_orderkey)
    indep = li.filter(row_gate_l).join(
        orders.filter(row_gate_o), li.l_orderkey == orders.o_orderkey
    )
    return (
        full.agg(F.count(F.lit(1)).cast("bigint").alias("full_join"))
        .crossJoin(corr.agg(F.count(F.lit(1)).cast("bigint").alias("corr_join")))
        .crossJoin(indep.agg(F.count(F.lit(1)).cast("bigint").alias("indep_join")))
        .select(
            "full_join",
            "corr_join",
            "indep_join",
            # try_divide(x2): an empty full-sample join leaves both
            # ratios undefined -> NULL on both engines
            F.round(
                F.try_divide(F.col("corr_join"), F.col("full_join").cast("double")), 4
            ).alias("corr_ratio"),
            F.round(
                F.try_divide(F.col("indep_join"), F.col("full_join").cast("double")), 4
            ).alias("indep_ratio"),
        )
    )


CORRELATED_SAMPLE_AUDIT_SQL = """
WITH co AS (
  SELECT * FROM orders
  WHERE ('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT % 100 < 20
), ro AS (
  SELECT * FROM orders
  WHERE ('0x' || substring(md5('o:' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT % 100 < 20
), rl AS (
  SELECT * FROM lineitem
  WHERE ('0x' || substring(md5('l:' || CAST(l_orderkey AS VARCHAR) || ':' ||
                              CAST(l_linenumber AS VARCHAR)), 1, 8))::BIGINT % 100 < 20
), f AS (
  SELECT CAST(count(*) AS BIGINT) AS full_join
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), c AS (
  SELECT CAST(count(*) AS BIGINT) AS corr_join
  FROM lineitem JOIN co ON l_orderkey = o_orderkey
), i AS (
  SELECT CAST(count(*) AS BIGINT) AS indep_join
  FROM rl JOIN ro ON l_orderkey = o_orderkey
)
SELECT full_join, corr_join, indep_join,
       round(CAST(corr_join AS DOUBLE) / full_join, 4) AS corr_ratio,
       round(CAST(indep_join AS DOUBLE) / full_join, 4) AS indep_ratio
FROM f CROSS JOIN c CROSS JOIN i
"""


_APPORTION_BUDGET = 1000


def apportion_sample_slots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamilton largest-remainder apportionment (public electoral method):
    turn fractional per-language sampling shares into INTEGER slot counts
    that sum EXACTLY to the budget — the step lang_temperature_mix leaves
    open (its expected_docs are fractional; a sampler needs whole docs).
    Quota = budget·share; every lang gets floor(quota); the leftover
    slots go to the largest remainders (doc-count tie-break, then lang,
    so the allocation is deterministic on both engines).

    Exactness: quotas are rationals over exact integers — remainders
    compare as budget·docs % total (exact BIGINT modulo), never as
    floats, so ranking can't be perturbed by rounding. Scale shape: one
    |langs|-row agg; the remainder ranking is a window over ≤|langs|
    rows.
    """
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents", spread=True)
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("docs"))
    tot = counts.agg(F.sum("docs").alias("total"))
    base = counts.crossJoin(F.broadcast(tot)).select(
        "lang",
        "docs",
        "total",
        F.expr(f"({_APPORTION_BUDGET}L * docs) div total").alias("floor_slots"),
        F.expr(f"({_APPORTION_BUDGET}L * docs) % total").alias("rem_num"),
    )
    leftover = base.agg(
        (F.lit(_APPORTION_BUDGET) - F.sum("floor_slots")).alias("left")
    )
    ranked = base.crossJoin(F.broadcast(leftover)).withColumn(
        "rk",
        F.row_number().over(W.orderBy(F.desc("rem_num"), F.desc("docs"), F.asc("lang"))),
    )
    return (
        ranked.select(
            "lang",
            "docs",
            (
                F.col("floor_slots")
                + F.when(F.col("rk") <= F.col("left"), F.lit(1)).otherwise(F.lit(0))
            ).cast("bigint").alias("slots"),
            F.round(
                # ansi: total = global doc count >= own docs >= 1
                F.lit(_APPORTION_BUDGET) * F.col("docs") / F.col("total").cast("double"),
                4,
            ).alias("exact_quota"),
        )
        .orderBy("lang")
    )


APPORTION_SAMPLE_SLOTS_SQL = f"""
WITH counts AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS docs FROM documents GROUP BY lang
), tot AS (SELECT CAST(sum(docs) AS BIGINT) AS total FROM counts),
base AS (
  SELECT lang, docs, total,
         ({_APPORTION_BUDGET} * docs) // total AS floor_slots,
         ({_APPORTION_BUDGET} * docs) % total AS rem_num
  FROM counts CROSS JOIN tot
), leftover AS (
  SELECT {_APPORTION_BUDGET} - CAST(sum(floor_slots) AS BIGINT) AS leftover FROM base
), ranked AS (
  SELECT *, row_number() OVER (ORDER BY rem_num DESC, docs DESC, lang ASC) AS rk
  FROM base CROSS JOIN leftover
)
SELECT lang, docs,
       CAST(floor_slots + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS slots,
       round({_APPORTION_BUDGET} * CAST(docs AS DOUBLE) / total, 4) AS exact_quota
FROM ranked
ORDER BY lang
"""


def fair_share_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-min fair (water-filling) allocation of a token budget across
    sources — the multi-tenant scheduler classic: small demands are met
    in full; the rest split the remainder equally at the water level λ.
    Closed form, no iteration: sort demands ascending; the level is set
    by the LAST prefix position k where demand_k fits the equal split of
    what remains after fully satisfying 1..k−1; every later tenant gets
    that split. Budget = half the total corpus tokens, demands =
    per-source whitespace token counts.

    Exactness: demands and prefix sums are exact BIGINTs; the equal
    split uses integer division with the division remainder granted to
    the lexicographically-first capped tenants (largest-remainder
    discipline, cf. apportion_sample_slots) so allocations sum EXACTLY
    to min(budget, total demand). One |sources|-row agg + bounded
    windows.
    """
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents", spread=True)
    toks = F.expr(r"size(split(trim(text), '\\s+'))").cast("bigint")
    demand = docs.groupBy("source").agg(F.sum(toks).alias("demand"))
    tot = demand.agg(
        F.sum("demand").alias("total"), F.count(F.lit(1)).alias("n")
    ).select("total", "n", F.expr("total div 2").alias("budget"))
    w = W.orderBy("demand", "source")
    ranked = (
        demand.crossJoin(F.broadcast(tot))
        .withColumn("rk", F.row_number().over(w))
        .withColumn(
            "prefix",
            F.sum("demand").over(w.rowsBetween(W.unboundedPreceding, -1)),
        )
        .withColumn("prefix", F.coalesce(F.col("prefix"), F.lit(0)))
        # tenant rk is fully satisfiable iff demand_rk <= equal share of
        # the budget left after meeting all smaller demands
        .withColumn(
            "fits",
            F.col("demand")
            <= F.expr("(budget - prefix) div (n - rk + 1)"),
        )
    )
    kmax = ranked.agg(
        F.max(F.when(F.col("fits"), F.col("rk"))).alias("kfit"),
    )
    # water level: equal split of what remains after the last fitting tenant
    level_base = ranked.crossJoin(F.broadcast(kmax)).filter(
        (F.col("rk") == F.col("kfit")) | (F.col("kfit").isNull() & (F.col("rk") == 1))
    ).select(
        F.when(
            F.col("kfit").isNotNull(),
            F.expr("(budget - (prefix + demand)) div (n - kfit)"),
        ).otherwise(F.expr("budget div n")).alias("level"),
        F.when(
            F.col("kfit").isNotNull(),
            F.expr("(budget - (prefix + demand)) % (n - kfit)"),
        ).otherwise(F.expr("budget % n")).alias("slack"),
        F.coalesce(F.col("kfit"), F.lit(0)).alias("kfit2"),
    )
    out = (
        ranked.crossJoin(F.broadcast(level_base))
        .withColumn(
            "alloc",
            F.when(F.col("rk") <= F.col("kfit2"), F.col("demand")).otherwise(
                F.least(
                    F.col("demand"),
                    F.col("level")
                    + F.when(
                        F.col("rk") - F.col("kfit2") <= F.col("slack"), F.lit(1)
                    ).otherwise(F.lit(0)),
                )
            ),
        )
    )
    return out.select(
        "source",
        "demand",
        F.col("alloc").cast("bigint").alias("allocated"),
        (F.col("alloc") == F.col("demand")).alias("fully_served"),
    ).orderBy("source")


FAIR_SHARE_ALLOCATION_SQL = r"""
WITH demand AS (
  SELECT source,
         CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS demand
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST(sum(demand) AS BIGINT) AS total, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(demand) AS BIGINT) // 2 AS budget
  FROM demand
), ranked AS (
  SELECT source, demand, total, n, budget,
         row_number() OVER (ORDER BY demand, source) AS rk,
         coalesce(sum(demand) OVER (ORDER BY demand, source
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
  FROM demand CROSS JOIN tot
), fits AS (
  SELECT *, demand <= (budget - prefix) // (n - rk + 1) AS fit FROM ranked
), km AS (
  SELECT max(CASE WHEN fit THEN rk END) AS kfit FROM fits
), lvl AS (
  SELECT CASE WHEN km.kfit IS NOT NULL
              THEN (f.budget - (f.prefix + f.demand)) // (f.n - km.kfit)
              ELSE f.budget // f.n END AS level,
         CASE WHEN km.kfit IS NOT NULL
              THEN (f.budget - (f.prefix + f.demand)) % (f.n - km.kfit)
              ELSE f.budget % f.n END AS slack,
         coalesce(km.kfit, 0) AS kfit2
  FROM fits f CROSS JOIN km
  WHERE (km.kfit IS NOT NULL AND f.rk = km.kfit)
     OR (km.kfit IS NULL AND f.rk = 1)
)
SELECT f.source, f.demand,
       CAST(CASE WHEN f.rk <= l.kfit2 THEN f.demand
                 ELSE least(f.demand,
                            l.level + CASE WHEN f.rk - l.kfit2 <= l.slack
                                           THEN 1 ELSE 0 END)
            END AS BIGINT) AS allocated,
       (CASE WHEN f.rk <= l.kfit2 THEN f.demand
             ELSE least(f.demand,
                        l.level + CASE WHEN f.rk - l.kfit2 <= l.slack
                                       THEN 1 ELSE 0 END) END) = f.demand
         AS fully_served
FROM fits f CROSS JOIN lvl l
ORDER BY f.source
"""



# ---------------------------------------------------------------------------
# Inference batch packing: the padding-waste ledger of batched LLM inference
# (every serving/embedding pipeline pads each batch to its longest sequence;
# batching in arrival order wastes the padding gap, length-sorted batching
# minimizes it — the standard bucketed-batching optimization). Both
# strategies are priced on the same corpus with exact integer token counts,
# so the whole comparison sits under the oracle hash.
# ---------------------------------------------------------------------------

_INFER_BATCH = 32


def inference_batch_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding waste at batch=32: arrival-order (doc_id) vs length-sorted
    batching. Per strategy: batches, useful tokens, padded slots
    (Σ batch_max·batch_size − Σ tokens), waste percent (4 dp, micros-exact
    division).

    Scale shape: two row_number windows (the sort a batching writer runs
    anyway — at scale repartitionByRange on the sort key replaces the
    global window), one (strategy, batch) agg, one 2-row rollup."""
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents", spread=True)
    toks = docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint").alias("n_tok"),
    )
    ranked = toks.select(
        "n_tok",
        F.row_number().over(W.orderBy("doc_id")).alias("r_arr"),
        F.row_number().over(W.orderBy("n_tok", "doc_id")).alias("r_len"),
    )
    long = ranked.select(
        F.expr(
            f"stack(2, 'arrival', (r_arr - 1) div {_INFER_BATCH},"
            f" 'length_sorted', (r_len - 1) div {_INFER_BATCH}) AS (strategy, batch)"
        ),
        "n_tok",
    )
    per_batch = long.groupBy("strategy", "batch").agg(
        F.count(F.lit(1)).alias("bsz"),
        F.max("n_tok").alias("mx"),
        F.sum("n_tok").alias("useful"),
    )
    return (
        per_batch.groupBy("strategy")
        .agg(
            F.count(F.lit(1)).alias("n_batches"),
            F.sum("useful").alias("useful_tokens"),
            # mx*bsz <= 32x the longest doc's tokens; the sum is
            # ansi: bounded by 32x total corpus tokens << int64
            F.sum(F.col("mx") * F.col("bsz") - F.col("useful")).alias("padded_slots"),
            F.round(
                # ansi: same 32x-corpus-tokens bound as padded_slots
                F.sum(F.col("mx") * F.col("bsz") - F.col("useful")).cast("double")
                # ansi: total slots >= useful tokens >= 1 on a non-empty corpus
                / F.sum(F.col("mx") * F.col("bsz")).cast("double")
                * 100,
                4,
            ).alias("waste_pct"),
        )
        .orderBy("strategy")
    )


INFERENCE_BATCH_PACKING_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tok
  FROM documents
), ranked AS (
  SELECT n_tok,
         row_number() OVER (ORDER BY doc_id) AS r_arr,
         row_number() OVER (ORDER BY n_tok, doc_id) AS r_len
  FROM toks
), long AS (
  SELECT 'arrival' AS strategy, (r_arr - 1) // {_INFER_BATCH} AS batch, n_tok FROM ranked
  UNION ALL
  SELECT 'length_sorted', (r_len - 1) // {_INFER_BATCH}, n_tok FROM ranked
), per_batch AS (
  SELECT strategy, batch, count(*) AS bsz, max(n_tok) AS mx,
         CAST(sum(n_tok) AS BIGINT) AS useful
  FROM long GROUP BY strategy, batch
)
SELECT strategy,
       count(*) AS n_batches,
       CAST(sum(useful) AS BIGINT) AS useful_tokens,
       CAST(sum(mx * bsz - useful) AS BIGINT) AS padded_slots,
       round(CAST(sum(mx * bsz - useful) AS DOUBLE)
             / CAST(sum(mx * bsz) AS DOUBLE) * 100, 4) AS waste_pct
FROM per_batch
GROUP BY strategy
ORDER BY strategy
"""

QUERIES = [
    QuerySpec("span_corruption_plan", span_corruption_plan, SPAN_CORRUPTION_SQL, "X5 T5-style span-corruption mask accounting"),
    QuerySpec(
        "split_leakage",
        split_leakage,
        _split_leakage_sql(),
        "X5 cross-split near-dup leakage audit",
    ),
    QuerySpec(
        "negative_pairs",
        negative_pairs,
        NEGATIVE_PAIRS_SQL,
        "X5 length-matched hard-negative pairing (contrastive training)",
    ),
    QuerySpec(
        "corpus_to_shards",
        corpus_to_shards,
        CORPUS_TO_SHARDS_SQL,
        "X1+X5 composite: Gopher gate → exact dedup → shard manifest",
    ),
    QuerySpec(
        "lang_temperature_mix",
        lang_temperature_mix,
        LANG_TEMPERATURE_MIX_SQL,
        "X5 temperature-scaled language sampling weights (XLM-R alpha=0.3)",
    ),
    QuerySpec(
        "stratified_sample_counts",
        stratified_sample_counts,
        STRATIFIED_SAMPLE_COUNTS_SQL,
        "X5 per-source deterministic stratified sampling audit",
    ),
    QuerySpec(
        "training_shards",
        training_shards,
        TRAINING_SHARDS_SQL,
        "X5 logical shard manifest (512-doc shards per lang)",
    ),
    QuerySpec(
        "domain_mixture_epochs",
        domain_mixture_epochs,
        DOMAIN_MIXTURE_EPOCHS_SQL,
        "X5 epochs-per-domain mixture accounting",
    ),
    QuerySpec(
        "train_val_test_split",
        train_val_test_split,
        TRAIN_VAL_TEST_SPLIT_SQL,
        "X5 deterministic hash train/val/test split accounting",
    ),
    QuerySpec(
        "seq_length_histogram",
        seq_length_histogram,
        SEQ_LENGTH_HISTOGRAM_SQL,
        "X5 power-of-two length histogram per lang",
    ),
    QuerySpec(
        "weighted_sample_audit",
        weighted_sample_audit,
        WEIGHTED_SAMPLE_AUDIT_SQL,
        "X5 Horvitz-Thompson weighted inclusion sampling audit",
    ),
    QuerySpec(
        "stratified_topk_sample",
        stratified_topk_sample,
        STRATIFIED_TOPK_SAMPLE_SQL,
        "X5 deterministic k-per-stratum hash-rank sample",
    ),
    QuerySpec(
        "es_weighted_reservoir",
        es_weighted_reservoir,
        ES_WEIGHTED_RESERVOIR_SQL,
        "X5 Efraimidis-Spirakis weight-proportional reservoir sample (deterministic keys)",
    ),
    QuerySpec(
        "correlated_sample_audit",
        correlated_sample_audit,
        CORRELATED_SAMPLE_AUDIT_SQL,
        "X5 join-preserving key-correlated sampling vs independent row sampling",
    ),
    QuerySpec(
        "apportion_sample_slots",
        apportion_sample_slots,
        APPORTION_SAMPLE_SLOTS_SQL,
        "X5 Hamilton largest-remainder integer slot apportionment (exact modular remainders)",
    ),
    QuerySpec(
        "fair_share_allocation",
        fair_share_allocation,
        FAIR_SHARE_ALLOCATION_SQL,
        "X5 max-min fair (water-filling) token-budget allocation, closed form, integer-exact",
    ),
    QuerySpec("inference_batch_packing", inference_batch_packing, INFERENCE_BATCH_PACKING_SQL, "X5 padding-waste ledger: arrival vs length-sorted inference batching"),
]

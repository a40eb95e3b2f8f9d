"""Positional inverted index + prefix-filter set-similarity join.

The reference serves every read through a dense-vector index
(extract_and_search.py:94-131); the classic text-side complement is the
*inverted index* — the structure under every lexical retrieval and
set-similarity system. This module builds one as a DataFrame (a postings
relation, not a server-side structure) and runs the two canonical
consumers on it:

- ``phrase_search``     — exact phrase match ("table hash") via adjacency
                          self-join on positional postings.
- ``proximity_search``  — two terms within a ±3-token window, the NEAR
                          operator of classical IR.
- ``ppjoin_near_dups``  — exact-Jaccard set-similarity self-join with
                          AllPairs/PPJoin prefix filtering (Bayardo et
                          al. 2007; Xiao et al. 2008, both public):
                          candidates must share a token in their
                          rarest-first prefixes, which bounds the pair
                          space without losing a single true pair
                          (completeness is exactly what the all-pairs
                          DuckDB oracle cross-checks).

Scale shape (100 TB):

- The postings build is a scan-bound explode; **only postings of the
  queried terms shuffle** — the term filter sits between the explode and
  the exchange, so a 2-term phrase query moves bytes proportional to those
  two posting lists, never to the corpus. That is the Catalyst analog of
  seeking two posting lists in Lucene.
- The adjacency/proximity join shuffles both (tiny) posting lists on
  doc_id — co-partitioned, no broadcast needed, no skew (a term's
  per-doc positions are bounded by doc length).
- PPJoin's candidate join is keyed on *prefix tokens only*: each doc
  contributes |d| − ⌈t·|d|⌉ + 1 rarest tokens, so the self-join's fan-out
  is Σ_token prefix-df² over low-df tokens — the 1/t-approximation of the
  output size, not corpus². The global token order (ascending document
  frequency) comes from a vocabulary-sized side table; its rank window is
  bounded by |vocab|, and the verification join touches full token sets
  only for surviving candidates.

Float discipline: jaccard is rounded to 6 dp in both engines; the
threshold compares the ROUNDED value so both engines keep identical pairs.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .registry import QuerySpec

PHRASE = ("table", "hash")
NEAR_TERMS = ("vector", "merge")
NEAR_DIST = 3
TOP_DOCS = 20
JACC_T = 0.8
# Exact rational form of the threshold (4/5): every PPJoin bound below is
# evaluated in INTEGER arithmetic so no float ceil can overshoot the exact
# rational bound (ceil((0.8/1.8)*s) computed through the double
# 0.4444444444444445 > 4/9 first overshoots at s = 63, wrongly pruning
# pairs whose jaccard is exactly 0.8 — the unpruned oracle keeps them).
_JACC_FRAC = Fraction(str(JACC_T))
_JP, _JQ = _JACC_FRAC.numerator, _JACC_FRAC.denominator  # τ = _JP/_JQ = 4/5

_TOKS_EXPR = "filter(split(lower(trim(text)), '\\\\s+'), x -> x != '')"
_TOKS_SQL = "list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')"


def _postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional postings relation: (doc_id, pos, term), pos 0-based."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return docs.select(
        "doc_id", F.posexplode(F.expr(_TOKS_EXPR)).alias("pos", "term")
    )


_POSTINGS_SQL = f"""
  SELECT doc_id,
         generate_subscripts(toks, 1) AS pos,
         unnest(toks) AS term
  FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents)
"""


def phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs containing the exact phrase, ranked by occurrence count.

    Postings of the two words are filtered BEFORE the doc_id exchange;
    the adjacency condition is p2.pos == p1.pos + 1.
    """
    post = _postings(spark, sf_dir)
    p1 = post.filter(F.col("term") == PHRASE[0]).select(
        "doc_id", F.col("pos").alias("pos1")
    )
    p2 = post.filter(F.col("term") == PHRASE[1]).select(
        "doc_id", F.col("pos").alias("pos2")
    )
    return (
        p1.join(p2, (p1.doc_id == p2.doc_id) & (p2.pos2 == p1.pos1 + 1))
        .groupBy(p1.doc_id)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
        .orderBy(F.desc("n_hits"), F.asc("doc_id"))
        .limit(TOP_DOCS)
    )


PHRASE_SEARCH_SQL = f"""
WITH post AS ({_POSTINGS_SQL})
SELECT p1.doc_id, CAST(count(*) AS BIGINT) AS n_hits
FROM post p1 JOIN post p2
  ON p1.doc_id = p2.doc_id AND p2.pos = p1.pos + 1
WHERE p1.term = '{PHRASE[0]}' AND p2.term = '{PHRASE[1]}'
GROUP BY p1.doc_id
ORDER BY n_hits DESC, p1.doc_id ASC
LIMIT {TOP_DOCS}
"""


def proximity_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs where the two terms co-occur within ±NEAR_DIST tokens.

    Counts qualifying position pairs per doc — the NEAR/k operator.
    """
    post = _postings(spark, sf_dir)
    p1 = post.filter(F.col("term") == NEAR_TERMS[0]).select(
        "doc_id", F.col("pos").alias("pos1")
    )
    p2 = post.filter(F.col("term") == NEAR_TERMS[1]).select(
        "doc_id", F.col("pos").alias("pos2")
    )
    return (
        p1.join(
            p2,
            (p1.doc_id == p2.doc_id)
            & (F.abs(p2.pos2 - p1.pos1) <= NEAR_DIST),
        )
        .groupBy(p1.doc_id)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .orderBy(F.desc("n_pairs"), F.asc("doc_id"))
        .limit(TOP_DOCS)
    )


PROXIMITY_SEARCH_SQL = f"""
WITH post AS ({_POSTINGS_SQL})
SELECT p1.doc_id, CAST(count(*) AS BIGINT) AS n_pairs
FROM post p1 JOIN post p2
  ON p1.doc_id = p2.doc_id AND abs(p2.pos - p1.pos) <= {NEAR_DIST}
WHERE p1.term = '{NEAR_TERMS[0]}' AND p2.term = '{NEAR_TERMS[1]}'
GROUP BY p1.doc_id
ORDER BY n_pairs DESC, p1.doc_id ASC
LIMIT {TOP_DOCS}
"""


#: token-set builders — word TRIGRAMS, not unigrams: the fixture draws
#: every doc from one ~100-word vocabulary, so unigram sets overlap almost
#: completely (measured: J ≥ 0.5 for >40% of ALL pairs — candidate space
#: ≈ all-pairs and ANY exact set-similarity join degenerates; the first
#: cut of this operator used unigrams and clocked 50 s at sf0.1). Word
#: 3-gram sets have a ~30k Zipfian-df vocabulary — the regime prefix
#: filtering is designed for: measured Σ prefix-df² at sf0.1 is 1.3M
#: (vs 12.5M all-pairs), and the t=0.8 survivors are exactly the
#: generator's planted near-duplicate pairs.
_NGRAMS_EXPR = (
    "transform(array(" + _TOKS_EXPR + "), tk -> "
    "if(size(tk) < 3, array(), array_distinct(transform(sequence(1, size(tk) - 2), "
    "i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1), ' ', element_at(tk, i + 2))))))[0]"
)
_NGRAMS_SQL = (
    "CASE WHEN len(tk) < 3 THEN [] ELSE "
    "list_distinct(list_transform(range(1, len(tk) - 1), "
    "i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2])) END"
)


def ppjoin_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc set-similarity summary at Jaccard ≥ JACC_T over word-trigram sets.

    AllPairs/PPJoin shape: (1) distinct word sets, (2) global rarest-first
    token order from the document-frequency table, (3) per-doc prefix of
    the |d| − ⌈t·|d|⌉ + 1 rarest tokens, (4) candidate pairs = prefix
    self-join on token, (5) exact-intersection verify restricted to
    candidates, (6) per-doc rollup (partner count + max jaccard). The
    oracle is the unpruned all-pairs join — any pair lost to over-pruning
    would hash-mismatch.
    """
    docs = load_table(spark, sf_dir, "documents", spread=True)
    # trigram strings collapse to 8-byte xxhash64 keys immediately: every
    # downstream exchange (df count, rank join, prefix self-join, verify
    # join) carries fixed-width ints, never ~20-byte trigram strings. A
    # hash collision would need two of the ~30k distinct trigrams to agree
    # on 64 bits (p ≈ 2e-11) — the engine-internal risk every hash-keyed
    # dedup tier here accepts (cf. operators/dedup.py).
    # NEGATIVE RESULT (round-10 optimization pass): lazily checkpointing
    # tok (5 consumers) and sizes (3 consumers) to stop the trigram-explode
    # re-derivation (120 Exchange nodes in the plan) measured +21% in the
    # full before/after bench — the checkpointed leaves lose size stats, so
    # the prefix/verify joins stop broadcasting; runtime ReusedExchange was
    # already deduping the repeated subtrees. Kept uncut.
    tok = docs.select(
        "doc_id",
        F.explode(F.expr(f"transform({_NGRAMS_EXPR}, g -> xxhash64(g))")).alias("term"),
    )
    sizes = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    df = tok.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # global order over the vocabulary-sized df table (bounded window)
    rank = df.withColumn(
        "trank", F.row_number().over(Window.orderBy("df", "term"))
    ).select("term", "trank")
    ordered = (
        tok.join(F.broadcast(rank), "term")
        .join(F.broadcast(sizes), "doc_id")
        .withColumn(
            "rn", F.row_number().over(Window.partitionBy("doc_id").orderBy("trank"))
        )
    )
    # rn ≤ n − ⌈τ·n⌉ + 1  ⟺  ⌈_JP·n/_JQ⌉ ≤ n − rn + 1  ⟺ (integer RHS)
    # _JP·n ≤ _JQ·(n − rn + 1) — exact, no float ceil.
    prefix = ordered.filter(
        F.lit(_JP) * F.col("n") <= F.lit(_JQ) * (F.col("n") - F.col("rn") + 1)
    ).select("doc_id", "term", "rn", "n")
    pa = prefix.select(
        F.col("doc_id").alias("id_a"),
        "term",
        F.col("rn").alias("rn_a"),
        F.col("n").alias("na"),
    )
    pb = prefix.select(
        F.col("doc_id").alias("id_b"),
        "term",
        F.col("rn").alias("rn_b"),
        F.col("n").alias("nb"),
    )
    # Overlap lower bound α = ⌈τ/(1+τ)·(na+nb)⌉ (Xiao et al., PPJoin,
    # WWW 2008). Both extra filters are LOSSLESS for jacc ≥ τ — any pair
    # they drop provably cannot reach the threshold — so the oracle (the
    # unpruned all-pairs join) still hash-matches; they exist because on a
    # token-saturated corpus (tiny vocab ⇒ every df grows ∝ N) the bare
    # prefix join degenerates toward all-pairs: measured at sf1, they cut
    # the candidate exchange ~10×.
    # α = ⌈τ/(1+τ)·(na+nb)⌉ = ⌈_JP·s/(_JP+_JQ)⌉; integer x ≥ ⌈p/q⌉ ⟺
    # q·x ≥ p, so the comparison needs no ceil (and no float) at all.
    _apq = _JP + _JQ  # τ/(1+τ) = _JP/(_JP+_JQ) = 4/9 exactly
    cand = (
        pa.join(pb, "term")
        .filter(F.col("id_a") < F.col("id_b"))
        # length filter (Arasu/Bayardo AllPairs): τ·na ≤ nb ≤ na/τ,
        # as exact integers: _JP·na ≤ _JQ·nb ∧ _JP·nb ≤ _JQ·na
        .filter(
            (F.lit(_JQ) * F.col("nb") >= F.lit(_JP) * F.col("na"))
            & (F.lit(_JQ) * F.col("na") >= F.lit(_JP) * F.col("nb"))
        )
        # positional filter: tokens before the match can't contribute, so
        # overlap ≤ 1 + min(remaining suffix lengths); require ≥ α:
        # (_JP+_JQ)·(1 + least(...)) ≥ _JP·(na+nb)
        .filter(
            F.lit(_apq)
            * (
                F.lit(1)
                + F.least(F.col("na") - F.col("rn_a"), F.col("nb") - F.col("rn_b"))
            )
            >= F.lit(_JP) * (F.col("na") + F.col("nb"))
        )
        .select("id_a", "id_b")
        .distinct()
    )
    # verify: exact intersection for candidates only
    ta = tok.select(F.col("doc_id").alias("id_a"), "term")
    tb = tok.select(F.col("doc_id").alias("id_b"), "term")
    inter = (
        cand.join(ta, "id_a")
        .join(tb, ["id_b", "term"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    pairs = (
        inter.join(F.broadcast(na), "id_a")
        .join(F.broadcast(nb), "id_b")
        .withColumn(
            "jacc",
            F.round(
                F.col("inter")
                # ansi: union = na + nb - inter >= max(na, nb) >= 1 per candidate
                    / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jacc") >= JACC_T)
    )
    both = pairs.select(F.col("id_a").alias("doc_id"), "jacc").unionAll(
        pairs.select(F.col("id_b").alias("doc_id"), "jacc")
    )
    return (
        both.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_partners"),
            F.max("jacc").alias("max_jacc"),
        )
        .orderBy("doc_id")
    )


PPJOIN_NEAR_DUPS_SQL = f"""
WITH raw AS (
  SELECT doc_id, {_TOKS_SQL} AS tk FROM documents
), t AS (
  SELECT doc_id, {_NGRAMS_SQL} AS toks FROM raw
), tok AS (
  SELECT doc_id, len(toks) AS n, unnest(toks) AS term FROM t
), pair AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb,
         count(*) AS inter
  FROM tok a JOIN tok b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
), keep AS (
  SELECT id_a, id_b,
         round(inter / CAST(na + nb - inter AS DOUBLE), 6) AS jacc
  FROM pair
  WHERE round(inter / CAST(na + nb - inter AS DOUBLE), 6) >= {JACC_T}
), sides AS (
  SELECT id_a AS doc_id, jacc FROM keep
  UNION ALL
  SELECT id_b AS doc_id, jacc FROM keep
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_partners, max(jacc) AS max_jacc
FROM sides
GROUP BY doc_id
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# CDC-maintained inverted index (round 10): the lexical analog of the
# IVF / k-NN-graph / compressed-layout maintenance loops — the index a
# full-text search serves from is WRITTEN AT INGEST and maintained
# incrementally, never rebuilt per query (Milvus 2.5 builds its BM25
# sparse index the same way: per segment at insert time).


def postings_columns(docs: DataFrame) -> DataFrame:
    """(doc_id, term, tf, dl) under the standard analyzer (lowercase,
    non-alphanumeric split, stopword removal — plans/retrieval's
    analyzer) — the stored posting row shape shared by the bulk build
    and the CDC sync so batch and stream cannot disagree on
    tokenization. Pure per-row explode + one (doc_id, term) combine —
    no global state, so incremental maintenance is append-only (the
    cheapest loop in the family, like the X61 layout sync)."""
    from pdf_parse_vector_db_spark.plans.retrieval import ANALYZER_STOPWORDS

    toks = docs.select(
        "doc_id",
        F.filter(
            F.split(F.lower(F.col("text")), r"[^a-z0-9]+"),
            lambda t: (t != "") & ~t.isin(ANALYZER_STOPWORDS),
        ).alias("toks"),
    )
    return (
        toks.select(
            "doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term")
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"), F.first("dl").alias("dl"))
    )


def sync_postings_from_feed(
    spark: SparkSession, source_table: str, postings_table: str, cursor: int
) -> int:
    """CDC-driven inverted-index maintenance: documents appended to the
    manifested `source_table` since `cursor` are analyzed and their
    postings committed to `postings_table`, exactly once (idempotency
    key = source version window — replaying a crashed loop is a no-op).
    Returns the new cursor. Document erasures ride the table layer's
    delete path (an anti-join rewrite of the postings table keyed
    doc_id — the same GDPR shape as forget_file); this loop is the
    append half."""
    from pdf_parse_vector_db_spark.sources import manifest as M

    to, feed = M.table_changes(
        spark, source_table, from_version=cursor, ignore_replaces=True
    )
    if feed is None:
        return to
    M.commit_append(
        spark,
        postings_table,
        postings_columns(feed),
        idempotency_key=f"postings-sync-v{cursor}-v{to}",
        stats_cols=("doc_id",),
    )
    return to


def search_stored_postings(
    spark: SparkSession,
    postings_table: str,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 top-k served from the MAINTAINED postings table — no
    tokenization anywhere at query time: tf/dl are stored, df and the
    corpus constants are aggregates over the stored relation (at scale:
    a term-bucketed layout makes the term filter partition pruning, and
    df/avgdl ride precomputed stats). The scoring core is the exact
    expression plans/retrieval.bm25_topk pins against DuckDB."""
    from pdf_parse_vector_db_spark.sources import manifest as M

    _, post = M.snapshot(spark, postings_table)
    if post is None:
        raise ValueError("search_stored_postings needs a non-empty postings table")
    doclen = post.groupBy("doc_id").agg(F.first("dl").alias("dl"))
    stats = doclen.agg(F.avg("dl").alias("avgdl"), F.count(F.lit(1)).alias("n_docs"))
    tf = post.filter(F.col("term").isin(list(terms)))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "contrib",
            F.log(
                F.lit(1.0)
                # ansi: df >= 1 on every joined row
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            )
            * (F.col("tf") * (k1 + 1))
            # ansi: tf >= 1 keeps the denominator positive
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(k)
    )


QUERIES = [
    QuerySpec(
        "phrase_search",
        phrase_search,
        PHRASE_SEARCH_SQL,
        "exact-phrase retrieval via positional-postings adjacency join",
    ),
    QuerySpec(
        "proximity_search",
        proximity_search,
        PROXIMITY_SEARCH_SQL,
        "NEAR/k proximity retrieval over positional postings",
    ),
    QuerySpec(
        "ppjoin_near_dups",
        ppjoin_near_dups,
        PPJOIN_NEAR_DUPS_SQL,
        "PPJoin prefix-filter exact-Jaccard set-similarity self-join",
    ),
]

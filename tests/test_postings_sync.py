"""CDC-maintained inverted index (round 10): stream==batch postings,
replay idempotence, and BM25 served from the stored index matching the
corpus-scan scorer."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_parse_vector_db_spark.plans.postings import (
    postings_columns,
    search_stored_postings,
    sync_postings_from_feed,
)
from pdf_parse_vector_db_spark.sources import manifest as M

_DOCS = [
    (0, "The quick brown fox jumps over the lazy dog"),
    (1, "vector search with a dup vector and a merge pass"),
    (2, "spark shuffles the merge of the vector dup"),
    (3, "dup dup dup vector"),
    (4, "unrelated prose about dogs and foxes entirely"),
    (5, "merge spark merge spark merge"),
]


def _batch(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_postings_sync_stream_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    post = str(tmp_path / "post")
    cursor = 0
    for i in range(0, len(_DOCS), 2):
        M.commit_append(spark, src, _batch(spark, _DOCS[i : i + 2]),
                        idempotency_key=f"docs-b{i}")
        cursor = sync_postings_from_feed(spark, src, post, cursor)
    _, stored = M.snapshot(spark, post)
    got = {tuple(r) for r in stored.collect()}
    want = {
        tuple(r)
        for r in postings_columns(_batch(spark, _DOCS)).collect()
    }
    assert got == want  # three incremental syncs == one-shot build, bit-for-bit


def test_postings_sync_replay_is_noop(spark, tmp_path):
    src = str(tmp_path / "src")
    post = str(tmp_path / "post")
    M.commit_append(spark, src, _batch(spark, _DOCS[:3]), idempotency_key="b0")
    cursor = sync_postings_from_feed(spark, src, post, 0)
    n1 = M.snapshot(spark, post)[1].count()
    # crashed-loop replay: same window again must not duplicate postings
    again = sync_postings_from_feed(spark, src, post, 0)
    assert again == cursor
    assert M.snapshot(spark, post)[1].count() == n1
    # quiescent window: nothing new, nothing committed
    v = M.head_version(spark, post)
    assert sync_postings_from_feed(spark, src, post, cursor) == cursor
    assert M.head_version(spark, post) == v


def test_search_stored_postings_matches_corpus_scan(spark, tmp_path):
    """BM25 over the maintained index == BM25 recomputed from the raw
    text with the same analyzer — the index adds no scoring drift."""
    src = str(tmp_path / "src")
    post = str(tmp_path / "post")
    M.commit_append(spark, src, _batch(spark, _DOCS), idempotency_key="b0")
    sync_postings_from_feed(spark, src, post, 0)
    terms = ["dup", "vector", "merge", "spark"]
    got = [tuple(r) for r in search_stored_postings(spark, post, terms).collect()]

    # reference: the identical scoring expression over a fresh analyze
    ref_post = postings_columns(_batch(spark, _DOCS))
    doclen = ref_post.groupBy("doc_id").agg(F.first("dl").alias("dl"))
    stats = doclen.agg(F.avg("dl").alias("avgdl"), F.count(F.lit(1)).alias("n_docs"))
    tf = ref_post.filter(F.col("term").isin(terms))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    want = [
        tuple(r)
        for r in tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "contrib",
            F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
            * (F.col("tf") * (1.2 + 1))
            / (F.col("tf") + 1.2 * (1 - 0.75 + 0.75 * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(10)
        .collect()
    ]
    assert got == want
    # sanity: the term-heavy docs outrank the stopword-only ones
    assert {g[0] for g in got} <= {1, 2, 3, 5}

"""Deterministic embedder contract tests (SURVEY §2.8 U1/U3)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pdf_parse_vector_db_spark.operators.embedder import (
    embed_text_py,
    embedding_is_valid,
    hashing_embedder,
)


def test_deterministic_and_normalized():
    a = embed_text_py("the quick brown fox")
    b = embed_text_py("the quick brown fox")
    assert a == b
    assert len(a) == 64
    norm = math.sqrt(sum(x * x for x in a))
    assert abs(norm - 1.0) < 1e-5


def test_distinct_texts_differ():
    assert embed_text_py("alpha beta") != embed_text_py("gamma delta")


def test_empty_returns_none():
    assert embed_text_py("") is None
    assert embed_text_py(None) is None
    assert embed_text_py("   ") is None


def test_udf_matches_pure_python(spark):
    texts = ["hello world", "", "spark engine", None, "a b c d e"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id bigint, text string")
    rows = (
        df.withColumn("emb", hashing_embedder()(F.col("text")))
        .orderBy("id")
        .collect()
    )
    for r, t in zip(rows, texts):
        assert r.emb == embed_text_py(t)


def test_validity_filter_drops_failed_rows(spark):
    """U3 semantics: failed/empty embeddings become NULL and are filtered,
    pipeline continues (extract_and_embed.py:100-115)."""
    df = spark.createDataFrame(
        [(0, "good text"), (1, ""), (2, None)], "id bigint, text string"
    )
    out = (
        df.withColumn("emb", hashing_embedder()(F.col("text")))
        .filter(embedding_is_valid(F.col("emb")))
        .collect()
    )
    assert [r.id for r in out] == [0]

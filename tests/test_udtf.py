"""Python UDTF surface: lateral-join n-grams must be row-identical to the
engine's codegen n-gram derivation (the fast path it mirrors)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_parse_vector_db_spark.functions.udtfs import register_udtfs
from pdf_parse_vector_db_spark.sources.registry import load_table
from tests.conftest import SF_ORACLE


def test_word_ngrams_udtf_matches_codegen(spark):
    register_udtfs(spark)
    docs = load_table(spark, SF_ORACLE, "documents").filter(F.col("doc_id") < 20)
    docs.createOrReplaceTempView("udtf_docs")

    via_udtf = spark.sql(
        """
        SELECT d.doc_id, t.pos, t.term
        FROM udtf_docs d, LATERAL word_ngrams(d.text, 2) t
        """
    )
    via_codegen = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(0, size(split(text, ' ')) - 2), "
                "i -> concat_ws(' ', slice(split(text, ' '), i + 1, 2)))"
            )
        ).alias("pos", "term"),
    )
    a = sorted(map(tuple, via_udtf.collect()))
    b = sorted(map(tuple, via_codegen.collect()))
    assert a == b and len(a) > 0


def test_word_ngrams_null_and_short_inputs(spark):
    register_udtfs(spark)
    rows = spark.sql(
        "SELECT * FROM word_ngrams(CAST(NULL AS STRING), 2)"
    ).collect()
    assert rows == []
    rows = spark.sql("SELECT * FROM word_ngrams('one', 2)").collect()
    assert rows == []


def test_native_udtf_tier_matches_mapinpandas(spark):
    """The Spark 4 LATERAL UDTF spelling must emit exactly the mapInPandas
    tier's rows — same fold, different physical operator."""
    from pdf_parse_vector_db_spark.operators.chunker import (
        chunk_documents,
        chunk_documents_udtf,
    )
    from pdf_parse_vector_db_spark.sources.registry import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").limit(100)
    a = sorted(
        (r.doc_id, r.chunk_idx, r.chunk_text)
        for r in chunk_documents(docs, max_tokens=50).collect()
    )
    b = sorted(
        (r.doc_id, r.chunk_idx, r.chunk_text)
        for r in chunk_documents_udtf(docs, max_tokens=50).collect()
    )
    assert a == b and a

"""Hybrid retrieval semantics: BM25 scoring and RRF fusion invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_parse_vector_db_spark.plans import retrieval as R
from tests.conftest import SF_ORACLE


def test_bm25_topk_shape_and_order(spark):
    rows = R.bm25_topk(spark, SF_ORACLE).collect()
    assert 0 < len(rows) <= R.TOP_K
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # every hit actually contains at least one query term
    hit_ids = [r["doc_id"] for r in rows]
    docs = (
        spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
        .filter(F.col("doc_id").isin(hit_ids))
        .select("doc_id", F.lower("text").alias("t"))
        .collect()
    )
    for d in docs:
        assert any(term in d["t"].split() for term in R.QUERY_TERMS)


def test_bm25_rare_term_outweighs_common(spark):
    """A doc matching the rare term ('dup', df≈5%) must outrank docs that
    match only ubiquitous terms — the idf property BM25 exists for."""
    scored = R._bm25_scored(spark, SF_ORACLE)
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").select(
        "doc_id", F.lower("text").alias("t")
    )
    joined = scored.join(docs, "doc_id").withColumn(
        "has_rare", F.array_contains(F.split(F.col("t"), r"\s+"), "dup")
    )
    best_rare = joined.filter("has_rare").agg(F.max("bm25")).first()[0]
    best_common = joined.filter("NOT has_rare").agg(F.max("bm25")).first()[0]
    if best_rare is not None and best_common is not None:
        assert best_rare > best_common


def test_hybrid_rrf_scores_consistent(spark):
    rows = R.hybrid_rrf(spark, SF_ORACLE).collect()
    assert 0 < len(rows) <= R.TOP_K
    for r in rows:
        expected = 0.0
        if r["lex_rank"] is not None:
            expected += 1.0 / (R.RRF_K + r["lex_rank"])
        if r["vec_rank"] is not None:
            expected += 1.0 / (R.RRF_K + r["vec_rank"])
        assert abs(r["rrf"] - round(expected, 6)) < 1e-9
    vals = [r["rrf"] for r in rows]
    assert vals == sorted(vals, reverse=True)


def test_bm25_plan_is_pure_codegen(spark):
    """The lexical leg must stay JVM-side: no BatchEvalPython / Arrow eval
    nodes in the physical plan (registry codegen-purity contract)."""
    plan = R._bm25_scored(spark, SF_ORACLE)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan

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


def _mmr_candidates(spark):
    """Rebuild the candidate stage of mmr_rerank for invariant checks."""
    from pdf_parse_vector_db_spark.functions.vector import cosine_similarity
    from pyspark.sql import Window

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") % 50 == 7).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
        F.col("label").alias("qlabel"),
    )
    cand = (
        q.join(emb, on=(F.col("qlabel") == F.col("label")))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("rel", F.round(cosine_similarity(F.col("qvec"), F.col("embedding")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("vec_id"))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("query_id", "vec_id", "embedding", "rel", "rn")
    )


def test_mmr_shape_and_first_pick(spark):
    """Each query yields ≤5 distinct picks from its candidate set, ranks are
    1..k, and the FIRST pick is the plain argmax of relevance (MMR's
    diversity term is zero when nothing is selected yet)."""
    out = {(r.query_id, r.rank): r.vec_id for r in R.mmr_rerank(spark, SF_ORACLE).collect()}
    cands = _mmr_candidates(spark).collect()
    byq = {}
    for r in cands:
        byq.setdefault(r.query_id, []).append(r)
    assert out
    for qid, rows in byq.items():
        picks = [out[(qid, k)] for k in range(1, 6) if (qid, k) in out]
        assert len(picks) == len(set(picks)) > 0
        cand_ids = {r.vec_id for r in rows}
        assert set(picks) <= cand_ids
        best = min((r for r in rows if r.rn == 1), key=lambda r: r.vec_id)
        assert picks[0] == best.vec_id


def test_mmr_lambda_one_is_plain_topk(spark):
    """λ=1 removes the diversity term: MMR must reduce exactly to the
    top-5-by-relevance cut (rounded-rel ordering with vec_id tie-break)."""
    from pdf_parse_vector_db_spark.operators.knn import mmr_rerank_groups

    cands = _mmr_candidates(spark)
    got = {
        (r.query_id, r.rank): r.vec_id
        for r in mmr_rerank_groups(
            cands.select("query_id", "vec_id", "embedding", "rel"), lam=1.0, k=5
        ).collect()
    }
    want = {
        (r.query_id, r.rn): r.vec_id for r in cands.filter(F.col("rn") <= 5).collect()
    }
    assert got == want


def test_mmr_diversifies_vs_plain_cut(spark):
    """At λ=0.7 the selected set's max pairwise cosine must not exceed the
    plain top-5 cut's (the whole point of the diversity term)."""
    import numpy as np

    cands = _mmr_candidates(spark).collect()
    mmr = {}
    for r in R.mmr_rerank(spark, SF_ORACLE).collect():
        mmr.setdefault(r.query_id, []).append(r.vec_id)
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in cands}
    plain = {}
    for r in cands:
        if r.rn <= 5:
            plain.setdefault(r.query_id, []).append(r.vec_id)

    def max_pair_cos(ids):
        vs = [vecs[i] / np.linalg.norm(vecs[i]) for i in ids]
        return max(
            (float(a @ b) for i, a in enumerate(vs) for b in vs[i + 1 :]),
            default=0.0,
        )

    worse = 0
    for qid in mmr:
        if max_pair_cos(mmr[qid]) > max_pair_cos(plain[qid]) + 1e-9:
            worse += 1
    assert worse == 0

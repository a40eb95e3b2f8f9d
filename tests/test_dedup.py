"""Dedup operator validation on corpora with PLANTED near-duplicates —
the correctness contract for the hash-based (non-oracle-able) tiers."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pdf_parse_vector_db_spark.operators import dedup


def make_corpus(spark):
    base = " ".join(f"tok{i}" for i in range(60))
    near = base.replace("tok30", "changed30")  # 1-token edit → jaccard ≈ 0.9
    far = " ".join(f"other{i}" for i in range(60))
    exact = base
    rows = [
        (0, base, len(base)),
        (1, near, len(near)),
        (2, far, len(far)),
        (3, exact, len(exact)),
        (4, "tiny text", 9),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string, n_chars bigint")


def test_exact_dedup_keeps_lowest_id(spark):
    docs = make_corpus(spark)
    kept = sorted(r.doc_id for r in dedup.exact_dedup(docs).collect())
    assert kept == [0, 1, 2, 4]  # 3 is an exact copy of 0


def test_ngram_jaccard_finds_planted_pair(spark):
    docs = make_corpus(spark)
    pairs = dedup.ngram_jaccard_pairs(docs, bucket=F.lit(1), n=3, threshold=0.5).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert (0, 3) in got  # exact copy, jaccard 1.0
    assert (0, 1) in got and (1, 3) in got  # planted near-dup
    assert all(2 not in p for p in got)  # unrelated doc never pairs
    j = {(r.id_a, r.id_b): r.jaccard for r in pairs}
    assert j[(0, 3)] == 1.0
    assert 0.7 < j[(0, 1)] < 1.0


def test_minhash_lsh_recovers_exact_pairs(spark):
    docs = make_corpus(spark)
    cands = {(r.id_a, r.id_b) for r in dedup.minhash_lsh_pairs(docs).collect()}
    # high-jaccard pairs must be candidates (LSH recall on near-identical docs)
    assert {(0, 1), (0, 3), (1, 3)} <= cands
    # the unrelated doc shares no shingles: collision probability ~0
    assert all(2 not in p for p in cands)


def test_simhash_near_pairs(spark):
    docs = make_corpus(spark)
    pairs = {(r.id_a, r.id_b): r.hamming for r in dedup.simhash_near_pairs(docs, max_hamming=10).collect()}
    assert pairs.get((0, 3)) == 0  # identical text → identical fingerprint
    assert (0, 1) in pairs  # 1-token edit → small hamming
    assert all(2 not in p for p in pairs)


def test_simhash_portable_pairs(spark):
    docs = make_corpus(spark)
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in dedup.simhash_portable_pairs(docs, max_hamming=10).collect()
    }
    assert pairs.get((0, 3)) == 0  # identical text → identical signature
    assert (0, 1) in pairs  # 1-token edit → small hamming
    assert all(2 not in p for p in pairs)


def test_embedding_near_dup_pairs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),  # near-dup of 0
        (2, [0.0, 1.0, 0.0, 0.0]),  # orthogonal
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    pairs = {(r.id_a, r.id_b): r.cosine for r in dedup.embedding_near_dup_pairs(emb, threshold=0.95).collect()}
    assert list(pairs) == [(0, 1)]
    assert pairs[(0, 1)] > 0.99


def test_minhash_agrees_with_exact_jaccard_on_fixture(spark):
    """find→verify: every verified LSH pair at jaccard ≥ 0.5 must also be
    found by the exact bucket-blocked tier (here: one global bucket)."""
    docs = make_corpus(spark)
    exact = {
        (r.id_a, r.id_b)
        for r in dedup.ngram_jaccard_pairs(docs, bucket=F.lit(1), threshold=0.5).collect()
    }
    cands = {(r.id_a, r.id_b) for r in dedup.minhash_lsh_pairs(docs).collect()}
    assert exact <= cands


def test_ivf_bucketed_near_dups_subset_of_exact(spark):
    """The IVF-bucketed semantic tier must emit a SUBSET of the exact
    all-pairs tier with identical cosines — bucketing may lose cross-cell
    pairs (the recall trade) but can never invent or re-score one."""
    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    qs = entrymod.queries()
    exact = {
        (r.id_a, r.id_b): r.cosine for r in qs["embedding_near_dups"](spark, sf).collect()
    }
    bucketed = {
        (r.id_a, r.id_b): r.cosine
        for r in qs["embedding_near_dups_ivf"](spark, sf).collect()
    }
    assert bucketed, "bucketed tier found nothing at all"
    for pair, cos in bucketed.items():
        assert pair in exact, f"{pair} not in exact tier"
        assert abs(exact[pair] - cos) < 1e-9

"""Golden + property tests for sequence packing (operators/packing.py) —
the chunker's inverse; edge semantics mirror tests/test_chunker.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_parse_vector_db_spark.operators.packing import pack_greedy, pack_sequences

SF = "/root/testdata/sf0.001"


def test_pack_greedy_basic():
    # budget 10: [4,4] fits, 5 overflows -> new seq
    assert pack_greedy([4, 4, 5, 9, 2], 10) == [0, 0, 1, 2, 3]


def test_pack_greedy_oversized_doc_gets_own_sequence():
    # doc of 15 > budget 10: closes seq 0, sits alone in seq 1, next doc opens seq 2
    assert pack_greedy([3, 15, 3], 10) == [0, 1, 2]


def test_pack_greedy_oversized_first_doc():
    # running total 0: the oversized doc is admitted (never split), no empty seq
    assert pack_greedy([15, 3], 10) == [0, 1]


def test_pack_greedy_exact_fit():
    assert pack_greedy([5, 5, 1], 10) == [0, 0, 1]


def test_pack_greedy_empty():
    assert pack_greedy([], 10) == []


def test_pack_sequences_contract(spark):
    budget = 256
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = pack_sequences(docs, budget=budget, group_col="lang").collect()

    # every doc assigned exactly once
    assert len(out) == docs.count()
    assert len({(r.grp, r.doc_id) for r in out}) == len(out)

    by_seq: dict = {}
    for r in out:
        by_seq.setdefault((r.grp, r.seq_id), []).append(r)
    # budget respected unless the sequence holds a single overweight doc
    for rows in by_seq.values():
        total = sum(r.n_tokens for r in rows)
        assert total <= budget or len(rows) == 1
    # seq ids contiguous from 0 per group
    for grp in {r.grp for r in out}:
        seqs = sorted({r.seq_id for r in out if r.grp == grp})
        assert seqs == list(range(len(seqs)))


def test_pack_sequences_matches_pure_fold(spark):
    """The distributed fold must equal pack_greedy run per group on the
    driver (doc_id order)."""
    budget = 256
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = {
        (r.grp, r.doc_id): r.seq_id
        for r in pack_sequences(docs, budget=budget, group_col="lang").collect()
    }
    rows = (
        docs.select(
            "lang", "doc_id",
            F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"),
        )
        .orderBy("lang", "doc_id")
        .collect()
    )
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        expected = pack_greedy([r.n_tokens for r in rs], budget)
        for r, seq in zip(rs, expected):
            assert out[(lang, r.doc_id)] == seq

"""Golden tests for the exact greedy chunker (SURVEY §2.9 T1, edge cases
a-c from extract_and_embed.py:62-77 semantics)."""

from __future__ import annotations

from pdf_parse_vector_db_spark.operators.chunker import chunk_documents, chunk_text


def words(n: int, w: str = "w") -> str:
    return " ".join(f"{w}{i}" for i in range(n))


def test_single_small_paragraph():
    assert chunk_text("hello world") == ["hello world"]


def test_blank_paragraphs_dropped():
    assert chunk_text("\n\n  \n\n a \n\n\n\n b \n\n") == ["a\nb"]


def test_empty_text():
    assert chunk_text("") == []
    assert chunk_text("   \n\n   ") == []


def test_packing_joins_with_newline():
    text = "aa bb\n\ncc dd\n\nee"
    assert chunk_text(text, max_tokens=400) == ["aa bb\ncc dd\nee"]


def test_budget_boundary_starts_new_chunk():
    # two 3-word paragraphs with budget 5: "p1p2" concat (no separator!)
    # merges last word of p1 with first of p2 → 5 tokens, not < 5 → split.
    p1, p2 = "a b c", "d e f"
    assert chunk_text(f"{p1}\n\n{p2}", max_tokens=5) == [p1, p2]
    # budget 6: concat "a b cd e f" counts 5 < 6 → packed together
    assert chunk_text(f"{p1}\n\n{p2}", max_tokens=6) == ["a b c\nd e f"]


def test_edge_a_oversized_first_paragraph_emits_empty_chunk():
    big = words(500)
    out = chunk_text(f"{big}\n\nsmall tail", max_tokens=400)
    # reference fold emits "".strip() before carrying the oversized paragraph
    assert out[0] == ""
    assert out[1] == big
    assert out[-1] == "small tail" or out[1].endswith("small tail")


def test_edge_b_oversized_paragraph_never_split():
    big = words(1000)
    out = chunk_text(big, max_tokens=400)
    assert out == ["", big]


def test_edge_c_trailing_chunk_emitted():
    out = chunk_text(f"{words(399)}\n\n{words(10, 'x')}", max_tokens=400)
    assert out[-1].endswith("x9")


def test_concat_preserves_all_words():
    text = "\n\n".join(words(37, f"p{i}_") for i in range(20))
    out = chunk_text(text, max_tokens=50)
    joined = " ".join(" ".join(c.split()) for c in out).split()
    assert joined == text.split()


def test_chunk_documents_matches_pure_python(spark):
    rows = [
        (0, "hello world"),
        (1, f"{words(500)}\n\nsmall"),
        (2, ""),
        (3, "\n\n".join(words(100, f"p{i}_") for i in range(9))),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = (
        chunk_documents(df)
        .orderBy("doc_id", "chunk_idx")
        .collect()
    )
    expect = []
    for doc_id, text in rows:
        for idx, c in enumerate(chunk_text(text)):
            expect.append((doc_id, idx, c))
    assert [(r.doc_id, r.chunk_idx, r.chunk_text) for r in got] == expect


def test_chunk_documents_keep_cols(spark):
    df = spark.createDataFrame(
        [(0, "a b", 7), (1, "c", 9)], "doc_id bigint, text string, lvl int"
    )
    got = chunk_documents(df, keep_cols=("lvl",)).orderBy("doc_id").collect()
    assert [(r.doc_id, r.lvl, r.chunk_text) for r in got] == [(0, 7, "a b"), (1, 9, "c")]

"""Golden tests for the F4/F5/F6 cascades — branch coverage + rule-order
semantics (SURVEY §5.2.2: dismissed-before-allowed ordering,
extract_and_embed_v2.py:104 precedes :107)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pdf_parse_vector_db_spark.functions.classifiers import (
    case_decision_expr,
    case_decision_sql,
    document_context_expr,
    document_type_expr,
    document_type_sql,
)

DECISION_CASES = [
    ("The appeal is allowed in full.", "appellant_won"),
    ("the appeal is allowed by way of remand", "appellant_won"),
    ("The impugned order is set-aside.", "appellant_won"),
    ("the impugned order is set aside entirely", "appellant_won"),
    ("we remand to the commissioner for fresh adjudication", "appellant_won"),
    ("the matter needs to be remanded", "appellant_won"),
    ("Appeal dismissed with costs.", "appellant_lost"),
    ("we dismiss the appeal", "appellant_lost"),
    ("Appeal allowed in part.", "appellant_won"),
    ("we allow the appeal", "appellant_won"),
    ("judgment affirmed", "appellant_lost"),
    ("we affirm the judgment below", "appellant_lost"),
    ("judgment reversed", "appellant_won"),
    ("we reverse the judgment", "appellant_won"),
    ("the order is upheld", "appellant_lost"),
    ("the tribunal upheld the order", "appellant_lost"),
    ("the refund claim is rejected", "appellant_lost"),
    ("the petition is rejected", "appellant_lost"),
    ("the refund claim is accepted", "appellant_won"),
    ("the petition is accepted", "appellant_won"),
    ("decided in favor of appellant", "appellant_won"),
    ("the appellant prevails", "appellant_won"),
    ("we grant the appeal", "appellant_won"),
    ("they succeed on appeal", "appellant_won"),
    ("the appeal is successful", "appellant_won"),
    ("judgment set aside", "appellant_won"),
    ("order set aside", "appellant_won"),
    ("the appeal is partly allowed", "appellant_won"),
    ("relief granted to the petitioner", "appellant_won"),
    ("relief is granted", "appellant_won"),
    ("nothing legal here at all", "invalid"),
    ("", "invalid"),
    # order conflicts: earlier rule must win
    ("appeal dismissed; in the alternative appeal allowed", "appellant_lost"),
    ("the appeal is allowed although the petition is rejected", "appellant_won"),
    ("judgment affirmed even though relief granted", "appellant_lost"),
    # case-insensitivity (reference lowers text before matching)
    ("APPEAL DISMISSED", "appellant_lost"),
]

DOCTYPE_CASES = [
    ("before the appellate tribunal", "appellate_tribunal"),
    ("CESTAT final order", "appellate_tribunal"),
    ("Coram: Hon'ble Justice X", "appellate_tribunal"),
    ("order-in-original dated", "order_in_original"),
    ("office of the commissioner of customs", "order_in_original"),
    ("writ petition in the high court", "high_court"),
    ("heard by the division bench", "high_court"),
    ("civil appeal no 12 of 2020", "supreme_court"),
    ("constitution bench of the supreme court", "supreme_court"),
    ("an ordinary contract", "generic_legal_document"),
    # order: appellate_tribunal rule fires before high_court on mixed text
    ("cestat order reviewed by high court", "appellate_tribunal"),
    # supreme_court rule is tested AFTER high_court in the reference
    ("supreme court writ petition", "high_court"),
]


@pytest.fixture(scope="module")
def classified(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(DECISION_CASES)], "id bigint, text string"
    )
    rows = df.select("id", case_decision_expr(F.col("text")).alias("d")).collect()
    return {r.id: r.d for r in rows}


def test_decision_cascade(classified):
    for i, (text, expected) in enumerate(DECISION_CASES):
        assert classified[i] == expected, f"{text!r}: got {classified[i]}, want {expected}"


def test_doctype_cascade(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(DOCTYPE_CASES)], "id bigint, text string"
    )
    rows = df.select("id", document_type_expr(F.col("text")).alias("d")).collect()
    got = {r.id: r.d for r in rows}
    for i, (text, expected) in enumerate(DOCTYPE_CASES):
        assert got[i] == expected, f"{text!r}: got {got[i]}, want {expected}"


def test_context_cascade(spark):
    cases = [
        ("service tax dispute", "a Customs/Tax Appellate Tribunal case"),
        ("writ petition filed", "a High Court judgment"),
        ("criminal appeal pending", "a Supreme Court judgment"),
        ("the commissioner ordered", "an administrative order from a tax/customs authority"),
        ("plain text", "a legal document"),
    ]
    df = spark.createDataFrame([(i, t) for i, (t, _) in enumerate(cases)], "id bigint, text string")
    rows = df.select("id", document_context_expr(F.col("text")).alias("d")).collect()
    got = {r.id: r.d for r in rows}
    for i, (text, expected) in enumerate(cases):
        assert got[i] == expected


def test_sql_cascade_agrees_with_python_re(duck):
    """The generated DuckDB CASE must agree with Python `re.search` over the
    same rule table — the cross-engine regex-portability audit (SURVEY §7
    hard part 5)."""
    import re

    from pdf_parse_vector_db_spark.functions.classifiers import DECISION_RULES

    def py_ref(text: str) -> str:
        lo = text.lower()
        for pat, label in DECISION_RULES:
            if re.search(pat, lo):
                return label
        return "invalid"

    for text, expected in DECISION_CASES:
        assert py_ref(text) == expected
        got = duck.execute(
            f"SELECT {case_decision_sql('t')} FROM (SELECT ? AS t)", [text]
        ).fetchone()[0]
        assert got == expected, f"duckdb {text!r}: {got}"


def test_doctype_sql(duck):
    for text, expected in DOCTYPE_CASES:
        got = duck.execute(
            f"SELECT {document_type_sql('t')} FROM (SELECT ? AS t)", [text]
        ).fetchone()[0]
        assert got == expected


def test_context_cascade_branches(spark):
    """F6 (identify_document_context): every rule fires, default fires, and
    rule 1 shadows rule 2 on conflict — mirrors the reference's ordered
    short-circuit at extract_and_embed_v2.py:302-320."""
    from pdf_parse_vector_db_spark.functions.classifiers import (
        CONTEXT_DEFAULT,
        document_context_expr,
    )

    rows = [
        (0, "plain narrative with nothing legal"),
        (1, "dispute before the appellate tribunal over excise"),
        (2, "a writ petition was filed"),
        (3, "civil appeal admitted by the supreme court"),
        (4, "order-in-original issued by the central board"),
        (5, "writ petition concerning service tax"),  # rule 1 beats rule 2
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        r.doc_id: r.ctx
        for r in df.select(
            "doc_id", document_context_expr(F.col("text")).alias("ctx")
        ).collect()
    }
    assert out[0] == CONTEXT_DEFAULT
    assert out[1] == "a Customs/Tax Appellate Tribunal case"
    assert out[2] == "a High Court judgment"
    assert out[3] == "a Supreme Court judgment"
    assert out[4] == "an administrative order from a tax/customs authority"
    assert out[5] == "a Customs/Tax Appellate Tribunal case"

"""Rule-cascade classifiers (SURVEY §2.7 F4/F5/F6).

The reference's case-decision, document-type, and document-context
classifiers are ordered short-circuit cascades of case-insensitive regex
searches over the lowered full text (determine_case_decision at
extract_and_embed_v2.py:87-159, detect_document_type at :162-185,
identify_document_context at :302-320). Order is semantics: "appeal
dismissed" (rule 4) must be tested before "appeal allowed" (rule 5).

Design: each cascade is a DATA TABLE of (regex, label) rules — one source
of truth compiled two ways:
  * `*_expr()`  → a chained Catalyst `when(...rlike...)` CASE expression.
    CASE evaluates lazily in order, exactly matching the reference's
    short-circuit `if re.search` chain, and stays inside whole-stage
    codegen — zero Python in the hot path, scales to 100 TB of text.
  * `*_sql()`   → the equivalent DuckDB `CASE WHEN regexp_matches(...)`
    oracle SQL, so correctness is machine-checked from the same table.

Every pattern uses only `\\s+`, literals, and alternation — portable across
Python `re`, Java regex (Spark), and RE2 (DuckDB); patterns are applied to
`lower(text)` just like the reference lowers before matching.

The LLM fallback stage of the v2 ingest cascade (extract_and_embed_v2.py:
145-156) is NOT part of these pure expressions — it lives in
operators/conclusion.py as a separate pandas_udf applied only to rows the cascade
leaves 'invalid' (filter-then-coalesce keeps the expensive path off hot
rows). The v2 search-service variant of the cascade omits the fallback
entirely (extract_and_search_v2.py:227-232) and equals `*_expr()` as-is.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from pdf_parse_vector_db_spark.schemas import (
    DECISION_INVALID,
    DECISION_LOST,
    DECISION_WON,
)

# ---------------------------------------------------------------------------
# F4 — case decision (extract_and_embed_v2.py:87-143; each `if a or b` pair
# of the reference is one alternation rule here; order preserved exactly).
# ---------------------------------------------------------------------------

_WIN_INDICATORS = "|".join(
    [
        r"in\s+favor\s+of\s+appellant",
        r"appellant\s+prevails",
        r"grant\s+the\s+appeal",
        r"succeed\s+on\s+appeal",
        r"appeal\s+is\s+successful",
        r"judgment\s+set\s+aside",
        r"order\s+set\s+aside",
        r"appeal\s+is\s+partly\s+allowed",
        r"relief\s+granted",
        r"relief\s+is\s+granted",
    ]
)

DECISION_RULES: list[tuple[str, str]] = [
    (r"appeal\s+is\s+allowed|the\s+appeal\s+is\s+allowed\s+by\s+way\s+of", DECISION_WON),
    (r"impugned\s+order\s+is\s+set-aside|impugned\s+order\s+is\s+set\s+aside", DECISION_WON),
    (r"remand\s+to\s+the\s+commissioner|matter\s+needs\s+to\s+be\s+remanded", DECISION_WON),
    (r"appeal\s+dismissed|dismiss\s+the\s+appeal", DECISION_LOST),
    (r"appeal\s+allowed|allow\s+the\s+appeal", DECISION_WON),
    (r"judgment\s+affirmed|affirm\s+the\s+judgment", DECISION_LOST),
    (r"judgment\s+reversed|reverse\s+the\s+judgment", DECISION_WON),
    (r"order\s+is\s+upheld|upheld\s+the\s+order", DECISION_LOST),
    (r"refund\s+claim\s+is\s+rejected|petition\s+is\s+rejected", DECISION_LOST),
    (r"refund\s+claim\s+is\s+accepted|petition\s+is\s+accepted", DECISION_WON),
    (_WIN_INDICATORS, DECISION_WON),
]

# ---------------------------------------------------------------------------
# F5 — document type (extract_and_embed_v2.py:162-185).
# ---------------------------------------------------------------------------

DOCTYPE_RULES: list[tuple[str, str]] = [
    (r"appellate tribunal|cestat|final order no|coram|hon'ble", "appellate_tribunal"),
    (
        r"order-in-original|commissioner of customs|central board of indirect taxes|office of the commissioner",
        "order_in_original",
    ),
    (r"high court|writ petition|division bench|single bench", "high_court"),
    (r"supreme court|civil appeal no|criminal appeal no|constitution bench", "supreme_court"),
]
DOCTYPE_DEFAULT = "generic_legal_document"

# ---------------------------------------------------------------------------
# F6 — document context for the LLM prompt (extract_and_embed_v2.py:302-320).
# ---------------------------------------------------------------------------

CONTEXT_RULES: list[tuple[str, str]] = [
    (r"customs|cestat|excise|service tax|appellate tribunal", "a Customs/Tax Appellate Tribunal case"),
    (r"writ petition|high court", "a High Court judgment"),
    (r"supreme court|civil appeal|criminal appeal", "a Supreme Court judgment"),
    (r"commissioner|order-in-original|central board", "an administrative order from a tax/customs authority"),
]
CONTEXT_DEFAULT = "a legal document"


def _cascade_expr(rules: list[tuple[str, str]], default: str, col: Column) -> Column:
    lowered = F.lower(col)
    expr: Column | None = None
    for pattern, label in rules:
        cond = lowered.rlike(pattern)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    assert expr is not None
    return expr.otherwise(F.lit(default))


def _sql_quote(s: str) -> str:
    return s.replace("'", "''")


def _cascade_sql(rules: list[tuple[str, str]], default: str, col_sql: str) -> str:
    branches = " ".join(
        f"WHEN regexp_matches(lower({col_sql}), '{_sql_quote(p)}') THEN '{_sql_quote(l)}'"
        for p, l in rules
    )
    return f"CASE {branches} ELSE '{_sql_quote(default)}' END"


def case_decision_expr(text: Column) -> Column:
    """F4 cascade → {appellant_won, appellant_lost, invalid}; the pure-rule
    stage shared by v2 ingest (pre-LLM) and v2 search (entire classifier)."""
    return _cascade_expr(DECISION_RULES, DECISION_INVALID, text)


def case_decision_sql(col_sql: str) -> str:
    return _cascade_sql(DECISION_RULES, DECISION_INVALID, col_sql)


def document_type_expr(text: Column) -> Column:
    """F5 cascade → 5-value doc-type domain."""
    return _cascade_expr(DOCTYPE_RULES, DOCTYPE_DEFAULT, text)


def document_type_sql(col_sql: str) -> str:
    return _cascade_sql(DOCTYPE_RULES, DOCTYPE_DEFAULT, col_sql)


def document_context_expr(text: Column) -> Column:
    """F6 cascade → human-readable context string."""
    return _cascade_expr(CONTEXT_RULES, CONTEXT_DEFAULT, text)


def document_context_sql(col_sql: str) -> str:
    return _cascade_sql(CONTEXT_RULES, CONTEXT_DEFAULT, col_sql)

"""Conclusion extraction + LLM-fallback decision stage (SURVEY §2.7 F7,
§2.8 U2, §2.9 T3).

The reference extracts a doc-type-dependent "conclusion section" — the text
region most likely to state the outcome — then asks gpt-4o to classify it
when the regex cascade failed (extract_and_embed_v2.py:188-261, 264-300).
The extraction needs last-regex-match windowing (W4: `matches[-1]` at
:229-233), which has no native Spark expression, so this stage is an
Arrow-batched pandas_udf; it runs ONLY on rows the pure-Catalyst cascade
left 'invalid' (filter-then-coalesce), so at 100 TB the Python path touches
the small residue, not the corpus.

Semantics preserved from the reference (golden-tested):
  * appellate_tribunal docs with >2 numbered paragraphs → text from the
    3rd-last numbered paragraph onward (:200-204);
  * otherwise: last case-insensitive match of the doc-type's indicator
    alternation, +2000 chars (:226-233);
  * else: first order-phrase match ±500 chars (:236-249);
  * else positional: last 20% if len>5000 (:253-255), last 1000 chars if
    len>1000 (:258-259), else whole text (:261).
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from pdf_parse_vector_db_spark.functions.classifiers import (
    case_decision_expr,
    document_type_expr,
)
from pdf_parse_vector_db_spark.schemas import (
    DECISION_INVALID,
    DECISION_LOST,
    DECISION_WON,
    VALID_DECISIONS,
)

#: Doc-type → conclusion-indicator alternations (extract_and_embed_v2.py:
#: 195-198, 208-211, 215-220). The tribunal list is reachable only when the
#: numbered-paragraph shortcut doesn't fire.
CONCLUSION_INDICATORS: dict[str, list[str]] = {
    "appellate_tribunal": [
        r"accordingly", r"in\s+result", r"the\s+appeal\s+is", r"order",
        r"final\s+order", r"for\s+these\s+reasons", r"therefore",
    ],
    "order_in_original": [
        r"i\s+order\s+that", r"i\s+hereby\s+order", r"hereby\s+ordered\s+that",
        r"decision", r"conclusion", r"adjudication", r"in\s+view\s+of\s+above",
    ],
    "__generic__": [
        r"CONCLUSION", r"DISPOSITION", r"ORDER", r"JUDGMENT",
        r"FOR THESE REASONS", r"THEREFORE", r"ACCORDINGLY",
        r"IT IS ORDERED THAT", r"IT IS SO ORDERED", r"In the result",
        r"In view of the above",
    ],
}

#: Fallback order phrases searched with ±500-char context
#: (extract_and_embed_v2.py:236-241).
ORDER_PHRASES = [
    r"appeal\s+is\s+allowed", r"appeal\s+is\s+dismissed",
    r"petition\s+is\s+allowed", r"petition\s+is\s+dismissed",
    r"affirm\s+the\s+judgment", r"set\s+aside\s+the\s+order",
    r"impugned\s+order\s+is",
]

_NUMBERED_PARA = re.compile(r"\n\s*\d+\.\s+")


def extract_conclusion_py(text: str, document_type: str = "generic_legal_document") -> str:
    """Pure-Python exact semantics; called inside Arrow batches and directly
    unit-testable."""
    if not text:
        return text or ""
    if document_type == "appellate_tribunal":
        numbered = list(_NUMBERED_PARA.finditer(text))
        if len(numbered) > 2:
            return text[numbered[-3].start():]
    indicators = CONCLUSION_INDICATORS.get(
        document_type, CONCLUSION_INDICATORS["__generic__"]
    )
    if document_type not in ("appellate_tribunal", "order_in_original"):
        indicators = CONCLUSION_INDICATORS["__generic__"]
    pattern = "|".join(indicators)
    matches = list(re.finditer(pattern, text, re.IGNORECASE))
    if matches:
        start = matches[-1].start()
        return text[start : start + 2000]
    for phrase in ORDER_PHRASES:
        m = re.search(phrase, text, re.IGNORECASE)
        if m:
            lo = max(0, m.start() - 500)
            hi = min(len(text), m.end() + 500)
            return text[lo:hi]
    n = len(text)
    if n > 5000:
        return text[int(n * 0.8):]
    if n > 1000:
        return text[-1000:]
    return text


def extract_conclusion_udf():
    @F.pandas_udf(StringType())
    def extract(texts: pd.Series, doctypes: pd.Series) -> pd.Series:
        return pd.Series(
            [extract_conclusion_py(t, d) for t, d in zip(texts, doctypes)]
        )

    return extract


# ---------------------------------------------------------------------------
# U2: LLM fallback. The production variant calls a chat model with the
# reference's prompt shape (max_tokens 10, temperature 0.3, response
# validated against the closed domain, extract_and_embed_v2.py:283-297);
# offline we substitute a deterministic rule model over the conclusion text
# so plans are reproducible and machine-checkable. Domain validation —
# anything outside the 3 labels collapses to 'invalid' (:294-297) — applies
# to BOTH implementations at the call site.
# ---------------------------------------------------------------------------

_STUB_WON = re.compile(
    r"allow|grant|set[-\s]+aside|accepted|succeed|remand|in\s+favor|reversed", re.IGNORECASE
)
_STUB_LOST = re.compile(r"dismiss|reject|upheld|affirm|denied|fails", re.IGNORECASE)


def analyze_conclusion_py(conclusion: str) -> str:
    """Deterministic stand-in for the gpt-4o call: first-match-position
    arbitration between win and loss vocabularies."""
    if not conclusion:
        return DECISION_INVALID
    w = _STUB_WON.search(conclusion)
    l = _STUB_LOST.search(conclusion)
    if w and (not l or w.start() <= l.start()):
        return DECISION_WON
    if l:
        return DECISION_LOST
    return DECISION_INVALID


def analyze_conclusion_udf():
    @F.pandas_udf(StringType())
    def analyze(conclusions: pd.Series) -> pd.Series:
        return conclusions.map(analyze_conclusion_py)

    return analyze


def validated_decision(col: Column) -> Column:
    """Closed-domain validation (extract_and_embed_v2.py:294-297)."""
    return F.when(col.isin(DECISION_WON, DECISION_LOST, DECISION_INVALID), col).otherwise(
        F.lit(DECISION_INVALID)
    )


# ---------------------------------------------------------------------------
# Full v2-embed decision pipeline: cascade → (invalid only) conclusion + LLM
# → (still invalid, metadata present) retry with enriched text (T3,
# extract_and_embed_v2.py:339-343).
# ---------------------------------------------------------------------------


def decision_pipeline(
    docs: DataFrame, text_col: str = "text", metadata_col: str | None = None
) -> DataFrame:
    """Adds `case_decision` (and intermediates) to a documents DataFrame
    with the complete v2 semantics. The expensive UDF stages run only where
    the cheap cascade failed — expressed as conditional columns, which
    Catalyst short-circuits per-row inside the same map stage (no
    filter/union/shuffle needed)."""
    text = F.col(text_col)
    out = docs.withColumn("document_type", document_type_expr(text))
    out = out.withColumn("rule_decision", case_decision_expr(text))
    needs_llm = F.col("rule_decision") == DECISION_INVALID
    conclusion = extract_conclusion_udf()(text, F.col("document_type"))
    llm = validated_decision(analyze_conclusion_udf()(conclusion))
    # reference accepts the AI label only if it is won/lost (:153-154)
    llm_final = F.when(llm.isin(*VALID_DECISIONS), llm).otherwise(F.lit(DECISION_INVALID))
    out = out.withColumn(
        "case_decision",
        F.when(needs_llm, llm_final).otherwise(F.col("rule_decision")),
    )
    if metadata_col is not None:
        enriched = F.concat_ws("\n\n", F.col(metadata_col), text)
        retry = case_decision_expr(enriched)
        out = out.withColumn(
            "case_decision",
            F.when(
                (F.col("case_decision") == DECISION_INVALID)
                & F.col(metadata_col).isNotNull()
                & (F.col(metadata_col) != ""),
                retry,
            ).otherwise(F.col("case_decision")),
        )
    return out

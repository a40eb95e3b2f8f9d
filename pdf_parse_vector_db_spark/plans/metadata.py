"""PDF-metadata extraction queries (SURVEY §2.7 F10/F11, §2.9 T3, §2.8 U2).

The reference pulls case numbers, dates, and party names off page 1 with
regexes (extract_pdf_metadata, extract_and_embed_v2.py:387-423). Here those
are pure `regexp_extract`/`regexp_extract_all` projections — map-side,
codegen, scan-bound at any scale. Branch coverage again comes from
deterministic marker injection (fixture word-salad contains no legal
metadata).

`decision_pipeline` is the full v2-embed classifier — cascade → conclusion
extraction (pandas_udf, last-match windowing) → deterministic LLM stand-in →
closed-domain validation. Oracle-backed since round 6: the W4 last-match
windowing is recovered exactly in SQL via sentinel-insertion (see
full_decision_pipeline's docstring); its per-branch behavior remains
golden-tested in tests/test_conclusion.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_parse_vector_db_spark.operators.conclusion import decision_pipeline
from pdf_parse_vector_db_spark.plans.registry import QuerySpec
from pdf_parse_vector_db_spark.sources.registry import load_table

#: Reference patterns (extract_and_embed_v2.py:401,407,413), applied
#: case-insensitively — `(?i)` prefix on the Spark side, 'i' option in DuckDB.
CASE_NO_RE = r"(?:appeal|application|petition|case|c\.a\.)\s+no\.?\s*([\w\d\.\-\/]+)"
DATE_RE = (
    r"\d{1,2}[\/\.\-]\d{1,2}[\/\.\-]\d{2,4}"
    r"|\d{1,2}(?:st|nd|rd|th)?\s+(?:jan|feb|mar|apr|may|jun|jul|aug|sep|oct|nov|dec)[a-z]*\.?\s+\d{2,4}"
)
PARTIES_RE = r"([A-Za-z\s\.,]+)\s+(?:versus|vs\.?|v\.)\s+([A-Za-z\s\.,]+)"

_META_MARKERS = [
    "",
    "Customs Appeal No. C-4-2012 decided on 29-03-2023",
    "Application No. 77/2019 heard 1st Jan 2020 and 15.06.2021",
    "Alpha Traders versus Commissioner of Customs",
    "Case No. X-9 Beta Exports vs. Union of India on 3/4/22",
]


def _marked(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", spread=True)
    m = F.col("doc_id") % len(_META_MARKERS)
    expr = None
    for i, s in enumerate(_META_MARKERS):
        expr = F.when(m == i, F.lit(s)) if expr is None else expr.when(m == i, F.lit(s))
    return docs.withColumn("page1", F.concat_ws(" ", F.col("text"), expr))


_MARKED_SQL = (
    "concat_ws(' ', text, CASE doc_id % 5 "
    + " ".join(f"WHEN {i} THEN '{s}'" for i, s in enumerate(_META_MARKERS))
    + " END)"
)


def doc_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10/F11: case number, party names, date mentions per document.
    NULLIF('') normalizes Spark's empty-string no-match to NULL so both
    engines agree on absence."""
    docs = _marked(spark, sf_dir)
    page1 = F.col("page1")
    dates = F.regexp_extract_all(page1, F.lit("(?i)" + DATE_RE), 0)
    # PARTIES_RE backtracks catastrophically on *failing* inputs (the \s+
    # separator is also inside the capture classes). A match requires one of
    # the literal separators, so gate the expensive scan behind a cheap
    # linear alternation — semantics are identical (no separator → no match).
    has_sep = page1.rlike(r"(?i)versus|vs\.?|v\.")

    def _party(group: int) -> Column:
        ext = F.regexp_extract(page1, "(?i)" + PARTIES_RE, group)
        return F.nullif(F.trim(F.when(has_sep, ext).otherwise(F.lit(""))), F.lit(""))

    return docs.select(
        "doc_id",
        F.nullif(F.trim(F.regexp_extract(page1, "(?i)" + CASE_NO_RE, 1)), F.lit("")).alias(
            "case_number"
        ),
        _party(1).alias("appellant"),
        _party(2).alias("respondent"),
        F.size(dates).cast("bigint").alias("n_dates"),
        F.try_element_at(dates, F.lit(1)).alias("first_date"),
        F.try_element_at(dates, F.lit(-1)).alias("last_date"),
    )


def _sq(pattern: str) -> str:
    return pattern.replace("'", "''")


DOC_METADATA_SQL = f"""
WITH marked AS (
  SELECT doc_id, {_MARKED_SQL} AS page1 FROM documents
),
ext AS (
  SELECT doc_id,
         NULLIF(trim(regexp_extract(page1, '{_sq(CASE_NO_RE)}', 1, 'i')), '') AS case_number,
         NULLIF(trim(regexp_extract(page1, '{_sq(PARTIES_RE)}', 1, 'i')), '') AS appellant,
         NULLIF(trim(regexp_extract(page1, '{_sq(PARTIES_RE)}', 2, 'i')), '') AS respondent,
         regexp_extract_all(page1, '{_sq(DATE_RE)}', 0, 'i') AS dates
  FROM marked
)
SELECT doc_id, case_number, appellant, respondent,
       CAST(len(dates) AS BIGINT) AS n_dates,
       CASE WHEN len(dates) >= 1 THEN dates[1] END AS first_date,
       CASE WHEN len(dates) >= 1 THEN dates[-1] END AS last_date
FROM ext
"""


def full_decision_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3/U2: complete v2 decision pipeline on marker-augmented docs.

    ORACLE-BACKED since round 6 (was the last composite rows-only entry):
    every stage is deterministic offline, and the one construct with no
    native SQL analog — Python's ``re.finditer`` last-match / 3rd-last-
    match windowing inside extract_conclusion_py — is recovered exactly in
    DuckDB by the SENTINEL-INSERTION trick: a global
    ``regexp_replace(t, '(PAT)', chr(1) || '\\1', 'g')`` performs the SAME
    non-overlapping leftmost scan as finditer, so the original start of
    the k-th-from-last match is ``len(t)`` minus the lengths of the last k
    sentinel-delimited segments (verified against finditer on adversarial
    overlapping inputs, e.g. 'ORDER' inside 'IT IS ORDERED THAT' — tests/
    test_conclusion.py). The Spark side is untouched (Arrow-batched
    pandas_udf pinning reference semantics, extract_and_embed_v2.py:
    188-300); only the oracle gained the exact SQL twin."""
    docs = _marked(spark, sf_dir).withColumnRenamed("page1", "full_text")
    out = decision_pipeline(docs, text_col="full_text")
    return out.select("doc_id", "document_type", "rule_decision", "case_decision").orderBy(
        "doc_id"
    )


def _full_decision_pipeline_sql() -> str:
    """Exact DuckDB twin of decision_pipeline (see full_decision_pipeline
    docstring for the sentinel-insertion finditer recovery)."""
    from pdf_parse_vector_db_spark.functions.classifiers import (
        case_decision_sql,
        document_type_sql,
    )
    from pdf_parse_vector_db_spark.operators.conclusion import (
        CONCLUSION_INDICATORS,
        ORDER_PHRASES,
    )

    np_pat = r"\n\s*\d+\.\s+"
    ind_tribunal = "|".join(CONCLUSION_INDICATORS["appellate_tribunal"])
    ind_oio = "|".join(CONCLUSION_INDICATORS["order_in_original"])
    ind_generic = "|".join(CONCLUSION_INDICATORS["__generic__"])

    def _sent(pat: str, flags: str = "?i") -> str:
        # sentinel-insertion global replace == finditer's scan
        return rf"regexp_replace(t, '({flags}:{pat})', chr(1) || '\0', 'g')"

    # DuckDB RE2: use a non-capturing inline-flag group and \0 (whole match)
    # in the rewrite so alternation order/priority is preserved verbatim.
    # Order-phrase tier: Python tries each phrase IN LIST ORDER and takes
    # the first one with any match; window = [start-500, end+500).
    phrase_arms = []
    for p in ORDER_PHRASES:
        start0 = rf"length(regexp_replace(t, '(?is)(?:{p}).*$', ''))"
        mlen = rf"length(regexp_extract(t, '(?i)({p})', 1))"
        phrase_arms.append(
            f"WHEN regexp_matches(t, '(?i)(?:{p})') THEN "
            f"substring(t, greatest(0, {start0} - 500) + 1, "
            f"least(length(t), {start0} + {mlen} + 500) - greatest(0, {start0} - 500))"
        )
    phrase_case = "\n              ".join(phrase_arms)

    return f"""
WITH marked AS (
  SELECT doc_id, {_MARKED_SQL} AS t FROM documents
), cls AS (
  SELECT doc_id, t,
         {document_type_sql("t")} AS document_type,
         {case_decision_sql("t")} AS rule_decision
  FROM marked
), sent AS (
  SELECT *,
         CASE WHEN document_type = 'appellate_tribunal'
              THEN {_sent(np_pat, "?")} END AS np_s,
         CASE document_type
           WHEN 'appellate_tribunal' THEN {_sent(ind_tribunal)}
           WHEN 'order_in_original'  THEN {_sent(ind_oio)}
           ELSE {_sent(ind_generic)} END AS ind_s
  FROM cls
), cnt AS (
  SELECT *,
         coalesce(length(np_s) - length(replace(np_s, chr(1), '')), 0) AS np_k,
         length(ind_s) - length(replace(ind_s, chr(1), '')) AS ind_k
  FROM sent
), concl AS (
  SELECT doc_id, document_type, rule_decision,
         CASE
           WHEN np_k > 2 THEN
             -- tribunal shortcut: text from the 3rd-last numbered para
             substring(t, length(t)
               - (length(split_part(reverse(np_s), chr(1), 1))
                + length(split_part(reverse(np_s), chr(1), 2))
                + length(split_part(reverse(np_s), chr(1), 3))) + 1)
           WHEN ind_k > 0 THEN
             -- last indicator match, +2000 chars
             substring(t, length(t)
               - length(split_part(reverse(ind_s), chr(1), 1)) + 1, 2000)
           {phrase_case}
           WHEN length(t) > 5000
             THEN substring(t, CAST(floor(length(t) * 0.8) AS BIGINT) + 1)
           WHEN length(t) > 1000 THEN substring(t, length(t) - 999)
           ELSE t
         END AS conclusion
  FROM cnt
), pos AS (
  SELECT doc_id, document_type, rule_decision,
         CASE WHEN conclusion IS NULL OR conclusion = '' THEN NULL
              WHEN regexp_matches(conclusion, '(?i){_STUB_WON_RE}')
                THEN length(regexp_replace(conclusion, '(?is)({_STUB_WON_RE}).*$', '')) END AS w_pos,
         CASE WHEN conclusion IS NULL OR conclusion = '' THEN NULL
              WHEN regexp_matches(conclusion, '(?i){_STUB_LOST_RE}')
                THEN length(regexp_replace(conclusion, '(?is)({_STUB_LOST_RE}).*$', '')) END AS l_pos
  FROM concl
), llm AS (
  SELECT doc_id, document_type, rule_decision,
         CASE WHEN w_pos IS NOT NULL AND (l_pos IS NULL OR w_pos <= l_pos)
                THEN 'appellant_won'
              WHEN l_pos IS NOT NULL THEN 'appellant_lost'
              ELSE 'invalid' END AS llm_decision
  FROM pos
)
SELECT doc_id, document_type, rule_decision,
       CASE WHEN rule_decision = 'invalid' THEN llm_decision
            ELSE rule_decision END AS case_decision
FROM llm
ORDER BY doc_id
"""


#: LLM-stub vocabularies (operators/conclusion.py:131-134), re-exported as
#: raw pattern text so the oracle can mirror the first-match-position
#: arbitration in RE2.
_STUB_WON_RE = r"allow|grant|set[-\s]+aside|accepted|succeed|remand|in\s+favor|reversed"
_STUB_LOST_RE = r"dismiss|reject|upheld|affirm|denied|fails"


def decision_llm_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2/T3 decomposed and oracle-backed (round-3 conversion): the
    rule-cascade → LLM-stub → closed-domain-validation → gating chain of
    the v2 pipeline (extract_and_embed_v2.py:283-297,339-343), with the
    conclusion input pinned to the POSITIONAL tier (the only extractor
    tier both engines can compute; the indicator/last-match tiers stay in
    full_decision_pipeline's pandas_udf, golden-tested).

    What sits under the value hash here that was rows-only before: the
    analyze-conclusion pandas_udf itself (first-match-position arbitration
    between win/loss vocabularies — the DuckDB twin recovers each match
    position as length(prefix after replacing from the first match), the
    domain validation, and the needs-LLM gate. Scale shape: pure map —
    cascade CASE, substring, one Arrow-batched UDF."""
    from pdf_parse_vector_db_spark.functions.classifiers import case_decision_expr
    from pdf_parse_vector_db_spark.operators.conclusion import (
        analyze_conclusion_udf,
        validated_decision,
    )
    from pdf_parse_vector_db_spark.schemas import (
        DECISION_INVALID,
        VALID_DECISIONS,
    )

    docs = load_table(spark, sf_dir, "documents", spread=True)
    text = F.col("text")
    n = F.length(text)
    start80 = (F.floor(n.cast("double") * 0.8) + 1).cast("int")
    conclusion = (
        F.when(n > 5000, text.substr(start80, n))
        .when(n > 1000, text.substr(n - 999, F.lit(1000)))
        .otherwise(text)
    )
    staged = docs.select(
        "doc_id",
        case_decision_expr(text).alias("rule_decision"),
        conclusion.alias("conclusion"),
    )
    llm = validated_decision(analyze_conclusion_udf()(F.col("conclusion")))
    llm_final = F.when(llm.isin(*VALID_DECISIONS), llm).otherwise(
        F.lit(DECISION_INVALID)
    )
    return (
        staged.withColumn("llm_decision", llm_final)
        .select(
            "doc_id",
            "rule_decision",
            "llm_decision",
            F.when(
                F.col("rule_decision") == DECISION_INVALID, F.col("llm_decision")
            )
            .otherwise(F.col("rule_decision"))
            .alias("case_decision"),
        )
        .orderBy("doc_id")
    )


def _decision_llm_stage_sql() -> str:
    from pdf_parse_vector_db_spark.functions.classifiers import case_decision_sql

    # first-match position in RE2: replace from the first (pattern-then-
    # anything) occurrence with '' — the surviving prefix length IS
    # re.search(pattern).start()
    w_strip = f"regexp_replace(conclusion, '(?is)({_STUB_WON_RE}).*$', '')"
    l_strip = f"regexp_replace(conclusion, '(?is)({_STUB_LOST_RE}).*$', '')"
    return f"""
WITH c AS (
  SELECT doc_id,
         {case_decision_sql("text")} AS rule_decision,
         CASE WHEN length(text) > 5000
                THEN substring(text, CAST(floor(length(text) * 0.8) AS BIGINT) + 1)
              WHEN length(text) > 1000 THEN substring(text, length(text) - 999)
              ELSE text END AS conclusion
  FROM documents
), pos AS (
  SELECT doc_id, rule_decision,
         CASE WHEN conclusion IS NULL OR conclusion = '' THEN NULL
              WHEN regexp_matches(conclusion, '(?i){_STUB_WON_RE}')
                THEN length({w_strip}) END AS w_pos,
         CASE WHEN conclusion IS NULL OR conclusion = '' THEN NULL
              WHEN regexp_matches(conclusion, '(?i){_STUB_LOST_RE}')
                THEN length({l_strip}) END AS l_pos
  FROM c
), llm AS (
  SELECT doc_id, rule_decision,
         CASE WHEN w_pos IS NOT NULL AND (l_pos IS NULL OR w_pos <= l_pos)
                THEN 'appellant_won'
              WHEN l_pos IS NOT NULL THEN 'appellant_lost'
              ELSE 'invalid' END AS llm_decision
  FROM pos
)
SELECT doc_id, rule_decision, llm_decision,
       CASE WHEN rule_decision = 'invalid' THEN llm_decision
            ELSE rule_decision END AS case_decision
FROM llm
ORDER BY doc_id
"""


DECISION_LLM_STAGE_SQL = _decision_llm_stage_sql()


def conclusion_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 positional-fallback tier in isolation (extract_and_embed_v2.py:
    253-261): last 20% if len>5000, last 1000 chars if len>1000, else the
    whole text — pure substring/length SQL, so this slice of the conclusion
    extractor is driver-oracle-checked (the indicator/last-match tiers stay
    in the pandas_udf, golden-tested). Texts are inflated deterministically
    with repeat() so all three branches fire on the fixture corpus; output
    carries md5(conclusion) rather than the inflated text so result size
    stays bounded at any scale factor.

    Python slice semantics mapped exactly: text[int(n*0.8):] starts at
    0-based floor(n*0.8) → 1-based floor(n*0.8)+1 (floor, not cast —
    DuckDB CAST rounds half away from zero); text[-1000:] → substring at
    n-999. Equivalence with extract_conclusion_py is pinned in
    tests/test_conclusion.py."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    t = F.expr("repeat(text, CAST(doc_id % 20 AS INT) + 1)")
    n = F.length(t)
    start80 = (F.floor(n.cast("double") * 0.8) + 1).cast("int")
    conclusion = (
        F.when(n > 5000, t.substr(start80, n))
        .when(n > 1000, t.substr(n - 999, F.lit(1000)))
        .otherwise(t)
    )
    branch = (
        F.when(n > 5000, F.lit("tail20"))
        .when(n > 1000, F.lit("last1000"))
        .otherwise(F.lit("whole"))
    )
    return docs.select(
        "doc_id",
        n.cast("bigint").alias("n_chars"),
        branch.alias("branch"),
        F.length(conclusion).cast("bigint").alias("conclusion_len"),
        F.md5(conclusion).alias("conclusion_md5"),
    )


CONCLUSION_POSITIONAL_SQL = """
WITH inflated AS (
  SELECT doc_id, repeat(text, CAST(doc_id % 20 AS INTEGER) + 1) AS t
  FROM documents
),
c AS (
  SELECT doc_id, length(t) AS n,
         CASE WHEN length(t) > 5000 THEN 'tail20'
              WHEN length(t) > 1000 THEN 'last1000'
              ELSE 'whole' END AS branch,
         CASE WHEN length(t) > 5000
                THEN substring(t, CAST(floor(length(t) * 0.8) AS BIGINT) + 1)
              WHEN length(t) > 1000 THEN substring(t, length(t) - 999)
              ELSE t END AS conclusion
  FROM inflated
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_chars,
       branch,
       CAST(length(conclusion) AS BIGINT) AS conclusion_len,
       md5(conclusion) AS conclusion_md5
FROM c
"""


# --------------------------------------------------------------------------
# ANALYZE-style column profiling: the statistics pass a cost-based optimizer
# (and any data-quality monitor) runs per table — null count, exact NDV,
# min/max per column. One scan per table: all metrics compute in a single
# multi-distinct aggregate, then unpivot to (column, metric) rows. Both
# engines generate their SQL/plan from the SAME column list so the output
# rows align by construction. At 100 TB swap exact NDV for HLL++
# (approx_count_distinct, sketch tier pinned by ndv_sketch_accuracy).
# --------------------------------------------------------------------------

_PROFILE_COLS = {
    "documents": ["doc_id", "text", "lang", "source", "n_chars"],
    "orders": ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"],
}


def table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for table, cols in _PROFILE_COLS.items():
        df = load_table(spark, sf_dir, table)
        aggs = [F.count(F.lit(1)).alias("__n")]
        for c in cols:
            aggs += [
                F.count(c).alias(f"__c_{c}"),
                # aggregate in the native type, cast the RESULT — casting
                # first would turn numeric min/max lexicographic
                F.min(c).cast("string").alias(f"__mn_{c}"),
                F.max(c).cast("string").alias(f"__mx_{c}"),
            ]
        # NDVs as SEPARATE single-distinct aggregates crossJoined back as
        # 1-row frames (round 11, guide §2.3): k countDistinct columns in
        # one agg planned an Expand (×(k+1) input rows) feeding a
        # SORT-aggregate whose grouping key included every profiled column
        # — the documents table's full TEXT was sorted k+1 times over.
        # A lone countDistinct plans as a clean two-phase hash agg over
        # its ONE (column-pruned) column; values identical.
        one = df.agg(*aggs)
        for c in cols:
            one = one.crossJoin(df.agg(F.countDistinct(c).alias(f"__d_{c}")))
        stack = ", ".join(
            f"'{c}', __n - __c_{c}, __d_{c}, __mn_{c}, __mx_{c}" for c in cols
        )
        rows = one.selectExpr(
            f"'{table}' AS tbl",
            f"stack({len(cols)}, {stack}) AS (col, n_nulls, ndv, min_val, max_val)",
        )
        out = rows if out is None else out.unionByName(rows)
    return out.orderBy("tbl", "col")


def _table_stats_sql() -> str:
    parts = []
    for table, cols in _PROFILE_COLS.items():
        aggs = ["count(*) AS __n"]
        for c in cols:
            aggs += [
                f"count({c}) AS __c_{c}",
                f"CAST(count(DISTINCT {c}) AS BIGINT) AS __d_{c}",
                f"CAST(min({c}) AS VARCHAR) AS __mn_{c}",
                f"CAST(max({c}) AS VARCHAR) AS __mx_{c}",
            ]
        base = f"SELECT {', '.join(aggs)} FROM {table}"
        for c in cols:
            parts.append(
                f"SELECT '{table}' AS tbl, '{c}' AS col, __n - __c_{c} AS n_nulls, "
                f"__d_{c} AS ndv, __mn_{c} AS min_val, __mx_{c} AS max_val "
                f"FROM ({base})"
            )
    return " UNION ALL ".join(parts) + " ORDER BY tbl, col"


TABLE_STATS_SQL = _table_stats_sql()


# --------------------------------------------------------------------------
# U5 user-defined AGGREGATE surface (SURVEY §2.8 — the one UDF class the
# reference never exercises): a pandas GROUPED_AGG UDAF computing the
# per-priority geometric mean of order totals. GROUPED_AGG hands the whole
# group to one Arrow batch (no partial aggregation), and the log-sum runs
# in integer micros with explicit round-half-up — independent of Arrow
# batch row order, so even the Python aggregate sits under the oracle hash.
# Scale: one shuffle on the grouping key; groups stream through Arrow.
# The pure-Catalyst twin is exp(avg(ln(x))) — prefer it in production; this
# query exists to prove the UDAF extension point works and stays exact.
# --------------------------------------------------------------------------


def geomean_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _geomean(v):
        import numpy as np

        x = v.to_numpy(dtype="float64")
        smic = int(np.floor(np.log(x) * 1e6 + 0.5).astype("int64").sum())
        g = np.exp(smic / (len(x) * 1e6))  # ansi: Python/numpy; len(x) >= 1 per group
        return float(np.floor(g * 1e6 + 0.5) / 1e6)

    # module-level `from __future__ import annotations` stringifies hints,
    # which pandas_udf's GROUPED_AGG inference rejects — set them directly
    _geomean.__annotations__ = {"v": pd.Series, "return": float}
    geomean = pandas_udf("double")(_geomean)

    orders = load_table(spark, sf_dir, "orders", spread=True)
    # Spark disallows mixing GROUPED_AGG pandas UDFs with built-in
    # aggregates in one agg — the count comes from a second agg joined on
    # the (5-row) grouping key, a broadcast-sized reconciliation
    gm = orders.groupBy("o_orderpriority").agg(
        geomean(F.col("o_totalprice")).alias("geomean_price")
    )
    cnts = orders.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))
    return gm.join(cnts, on="o_orderpriority").orderBy("o_orderpriority")


GEOMEAN_UDAF_SQL = """
SELECT o_orderpriority,
       floor(exp(CAST(sum(CAST(floor(ln(o_totalprice) * 1e6 + 0.5) AS BIGINT))
                      AS DOUBLE)
                 / (count(*) * 1e6)) * 1e6 + 0.5) / 1e6 AS geomean_price,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


QUERIES = [
    QuerySpec("doc_metadata", doc_metadata, DOC_METADATA_SQL, "F10/F11 metadata extraction"),
    QuerySpec("geomean_udaf", geomean_udaf, GEOMEAN_UDAF_SQL, "U5 pandas GROUPED_AGG UDAF, integer-micros exact"),
    QuerySpec("table_stats", table_stats, TABLE_STATS_SQL, "ANALYZE-style column profiling (nulls/NDV/min/max)"),
    QuerySpec("full_decision_pipeline", full_decision_pipeline, _full_decision_pipeline_sql(), "T3+U2 cascade→LLM-stub pipeline (oracle-backed since r6: sentinel-insertion finditer recovery)"),
    QuerySpec("decision_llm_stage", decision_llm_stage, DECISION_LLM_STAGE_SQL, "U2/T3 LLM-stub + gating stage (oracle-backed since r3)"),
    QuerySpec("conclusion_positional", conclusion_positional, CONCLUSION_POSITIONAL_SQL, "F7 positional fallback tier"),
]

"""Greedy paragraph chunker (SURVEY §2.9 T1) — the reference's chunk_text
(extract_and_embed.py:62-77), re-expressed for row-parallel execution.

Reference semantics, preserved bit-for-bit (golden-tested in
tests/test_chunker.py):
  * paragraphs = non-blank, stripped splits of the text on "\\n\\n";
  * fold paragraphs in order: while the whitespace-token count of
    current_chunk + para (concatenated WITHOUT separator, :68) is < budget,
    the paragraph joins the current chunk with a "\\n" separator (:69);
    otherwise the current chunk is emitted stripped and the paragraph
    starts the next chunk;
  * edge (a): an over-budget FIRST paragraph emits a stripped-EMPTY chunk
    before it (the fold appends "".strip() at :70-72);
  * edge (b): a single paragraph longer than the budget is never split, so
    chunks may exceed max_tokens;
  * edge (c): a trailing non-empty chunk is always emitted (:74-75).

Scale design: chunking is per-document sequential but document-parallel.
Because each input row carries its whole document text, this is a pure map —
``mapInPandas`` with NO shuffle (one Arrow batch in, N chunk rows out).
We deliberately do NOT use groupBy().applyInPandas here: that would add a
full shuffle of 100 TB of text for grouping that already exists. When text
arrives page-per-row (the PDF source, sources/pdf.py), pages are first
assembled per doc with sort_array(collect_list(struct(page, text))) —
that one shuffle is unavoidable there and is keyed on doc_id.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

from pdf_parse_vector_db_spark.schemas import CHUNK_MAX_TOKENS


def chunk_text(text: str, max_tokens: int = CHUNK_MAX_TOKENS) -> list[str]:
    """Pure-Python exact fold; used inside the Arrow batches and directly
    unit-testable. Mirrors extract_and_embed.py:62-77 semantics exactly."""
    paragraphs = [p.strip() for p in text.split("\n\n") if p.strip()]
    chunks: list[str] = []
    current = ""
    for para in paragraphs:
        # budget check concatenates WITHOUT separator (:68), join uses "\n" (:69)
        if len((current + para).split()) < max_tokens:
            current += "\n" + para
        else:
            chunks.append(current.strip())
            current = para
    if current:
        chunks.append(current.strip())
    return chunks


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = CHUNK_MAX_TOKENS,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """UDTF-shaped operator: one doc row → N chunk rows (doc_id, chunk_idx,
    text, *keep_cols). Shuffle-free mapInPandas; Arrow-batched."""
    keep = [c for c in keep_cols if c not in (id_col, text_col)]
    out_fields = docs.select(id_col, *keep).schema.fields
    schema_parts = [f"{f.name} {f.dataType.simpleString()}" for f in out_fields]
    out_schema = ", ".join(schema_parts + ["chunk_idx int", "chunk_text string"])

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {f.name: [] for f in out_fields}
            rows["chunk_idx"] = []
            rows["chunk_text"] = []
            for rec in pdf.itertuples(index=False):
                d = rec._asdict()
                for idx, chunk in enumerate(chunk_text(d[text_col] or "", max_tokens)):
                    for f in out_fields:
                        rows[f.name].append(d[f.name])
                    rows["chunk_idx"].append(idx)
                    rows["chunk_text"].append(chunk)
            yield pd.DataFrame(rows)

    cols = [id_col, *keep, text_col]
    return docs.select(*cols).mapInPandas(emit, schema=out_schema)


def chunk_documents_udtf(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = CHUNK_MAX_TOKENS,
) -> DataFrame:
    """Spark 4 native Python UDTF tier: the same greedy fold as a LATERAL
    table function — `FROM docs, LATERAL chunk_text_udtf(text, budget)` —
    the SQL-facing spelling of the 1→N expansion for users who live in
    spark.sql() rather than the DataFrame API. Emits exactly
    chunk_documents()'s rows (parity pinned in tests/test_udtf.py); the
    mapInPandas tier remains the hot path (Arrow-batched vs the UDTF's
    per-row eval)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk_text string")
    class ChunkTextUdtf:
        def eval(self, text: str, budget: int):
            for idx, chunk in enumerate(chunk_text(text or "", int(budget))):
                yield idx, chunk

    spark = docs.sparkSession
    spark.udtf.register("chunk_text_udtf", ChunkTextUdtf)
    view = "__chunk_udtf_input"
    docs.select(id_col, text_col).createOrReplaceTempView(view)
    return spark.sql(
        f"SELECT {id_col}, chunk_idx, chunk_text "
        f"FROM {view}, LATERAL chunk_text_udtf({text_col}, {int(max_tokens)})"
    )

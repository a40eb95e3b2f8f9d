"""PDF file source (SURVEY §2.1 S1/S2).

The reference opens each uploaded PDF with PyMuPDF, extracts text per page,
and joins pages with "\\n" (extract_and_embed.py:90-91; sorted variant for
page 1 at extract_and_embed_v2.py:398). The engine restatement:

  staging directory → spark.read.format("binaryFile")  (S2: the batch
  analog of the multipart upload; readStream on the same format is the
  continuous analog, streaming/ingest_stream.py)
  → Arrow-batched extraction UDF (one PDF per row, pages joined in order)
  → documents-shaped DataFrame (file_name, file_id = sha2(name), text)

Three extraction tiers (round 10 made the real one dependency-free):

  * tier="pdf" (the default for real=True): the pure-stdlib PDF parser in
    operators/pdf_codec.py — actual %PDF bytes in (xref tables/streams,
    FlateDecode, content-stream text machine), per-page text out. Same
    posture as the JPEG/PNG/WAV codecs: the format is implemented, not
    faked, so `real=True` works in this container.
  * tier="fitz": PyMuPDF behind an import-try (NotImplementedError when
    absent) — the optional parity upgrade for exotic wild PDFs.
  * tier="offline" (default): payload treated as UTF-8 with form-feed
    page breaks — the fast deterministic tier for plumbing tests; the
    page-iteration and "\\n"-join semantics are identical across tiers.

Scale: binaryFile scans split per file and prune on path glob; extraction
is a pure map (no shuffle); the 16 MB request cap (extract_and_embed.py:20)
maps to `maxBytesPerFile`-style admission checks, enforced here as a
filterable `length` column rather than a hard error.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Page separator for the offline extraction tier (ASCII form feed — the
#: conventional page-break byte in text renderings of PDFs).
PAGE_BREAK = "\f"

#: Flask MAX_CONTENT_LENGTH in the reference (extract_and_embed.py:20).
MAX_UPLOAD_BYTES = 16 * 1024 * 1024


def _extract_pages_offline(content: bytes) -> list[str]:
    return content.decode("utf-8", errors="replace").split(PAGE_BREAK)


def _extract_pages_fitz(content: bytes) -> list[str]:
    try:
        import fitz  # noqa: PLC0415  (PyMuPDF; absent in this container)
    except ImportError as e:  # pragma: no cover - depends on environment
        raise NotImplementedError(
            "real PDF extraction needs PyMuPDF (pip install pymupdf); "
            "use real=False for the deterministic offline tier"
        ) from e
    doc = fitz.open(stream=content, filetype="pdf")
    return [page.get_text() for page in doc]


def _extract_pages_pdf(content: bytes) -> list[str]:
    """Real tier: parse the actual PDF byte stream (operators/pdf_codec —
    xref, filters, page tree, BT/ET text machine) and return per-page text
    in raw reading order, the `[page.get_text() for page in doc]` analog
    (extract_and_embed.py:90-91)."""
    from pdf_parse_vector_db_spark.operators import pdf_codec  # noqa: PLC0415

    return pdf_codec.parse_pdf(bytes(content)).extract_pages()


def _first_page_pdf(content: bytes) -> str:
    """Real tier, metadata path: page-1 text in top-to-bottom /
    left-to-right DEVICE order — the doc[0].get_text(sort=True) analog
    (extract_and_embed_v2.py:398)."""
    from pdf_parse_vector_db_spark.operators import pdf_codec  # noqa: PLC0415

    return pdf_codec.first_page_sorted(bytes(content))


def _resolve_tier(real: bool, tier: str | None) -> str:
    if tier is None:
        tier = "pdf" if real else "offline"
    if tier not in ("offline", "pdf", "fitz"):
        raise ValueError(f"unknown PDF extraction tier {tier!r}")
    return tier


_PAGES_BY_TIER = {}  # populated below once all tiers are defined
_FIRST_BY_TIER = {}


def _first_page_offline(content: bytes) -> str:
    pages = _extract_pages_offline(content)
    return pages[0] if pages else ""


def _first_page_fitz(content: bytes) -> str:
    """Page-1 text in READING ORDER — the reference's metadata path reads
    `doc[0].get_text(sort=True)` (extract_and_embed_v2.py:398), which
    re-orders blocks top-to-bottom/left-to-right; on multi-column PDFs it
    differs from the raw extraction stream the full-text path uses, so the
    two tiers are deliberately separate calls here too."""
    try:
        import fitz  # noqa: PLC0415  (PyMuPDF; absent in this container)
    except ImportError as e:  # pragma: no cover - depends on environment
        raise NotImplementedError(
            "real PDF extraction needs PyMuPDF (pip install pymupdf); "
            "use real=False for the deterministic offline tier"
        ) from e
    doc = fitz.open(stream=content, filetype="pdf")
    return doc[0].get_text(sort=True) if doc.page_count else ""


_PAGES_BY_TIER.update(
    offline=_extract_pages_offline, pdf=_extract_pages_pdf, fitz=_extract_pages_fitz
)
_FIRST_BY_TIER.update(
    offline=_first_page_offline, pdf=_first_page_pdf, fitz=_first_page_fitz
)


def first_page_text_udf(real: bool = False, tier: str | None = None):
    """binary content → page-1 text for the metadata extractors (case
    number / parties / dates, plans/metadata.py). Real tiers: sorted
    reading-order text per the reference; offline tier: the first
    form-feed segment (identical on the fixtures, where pages are
    single-column by construction)."""
    extract = _FIRST_BY_TIER[_resolve_tier(real, tier)]

    @F.pandas_udf("string")
    def first_page(contents: pd.Series) -> pd.Series:
        return pd.Series([extract(c) if c is not None else "" for c in contents])

    return first_page


def extract_text_udf(real: bool = False, tier: str | None = None):
    """binary content → full text: per-page extraction + ordered "\\n" join
    (the A7 concatenating aggregate happens inside the batch — pages of one
    file never cross rows, so no shuffle is involved)."""
    extract = _PAGES_BY_TIER[_resolve_tier(real, tier)]

    @F.pandas_udf("string")
    def extract_text(contents: pd.Series) -> pd.Series:
        return pd.Series(
            ["\n".join(extract(c)) if c is not None else "" for c in contents]
        )

    return extract_text


def read_pdf_dir(spark: SparkSession, path: str, glob: str = "*.pdf") -> DataFrame:
    """S2: staging-directory scan — one row per file with (path,
    modificationTime, length, content). The `.pdf` suffix check (P4,
    extract_and_embed.py:160) rides in as the pathGlobFilter."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def pdf_documents(
    spark: SparkSession,
    path: str,
    real: bool = False,
    enforce_upload_cap: bool = True,
    tier: str | None = None,
) -> DataFrame:
    """Full S1 source: directory → documents-shaped DataFrame
    (file_name, file_id, n_bytes, text), ready for the ingest plan
    (plans/ingest.build_chunks consumes exactly this shape + doc_id)."""
    files = read_pdf_dir(spark, path)
    if enforce_upload_cap:
        files = files.filter(F.col("length") <= MAX_UPLOAD_BYTES)
    return files.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
        F.col("length").alias("n_bytes"),
        extract_text_udf(real, tier)(F.col("content")).alias("text"),
        # metadata extractors read page 1 in reading order (sort=True in
        # the real tier) — a separate extraction call, like the reference
        first_page_text_udf(real, tier)(F.col("content")).alias("page1"),
    ).withColumn("file_id", F.sha2(F.col("file_name"), 256))

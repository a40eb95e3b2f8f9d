"""S1/S2 PDF source: binaryFile staging scan → page extraction → identity.

Fake PDFs are UTF-8 payloads with form-feed page breaks — the offline
extraction tier's contract — so the page-join semantics
(extract_and_embed.py:90-91: per-page text joined by "\\n") are provable.
"""

from __future__ import annotations

import hashlib

import pytest

from pdf_parse_vector_db_spark.sources.pdf import (
    MAX_UPLOAD_BYTES,
    extract_text_udf,
    pdf_documents,
)


@pytest.fixture()
def staging(tmp_path):
    (tmp_path / "a.pdf").write_bytes(b"page one\x0cpage two\x0cpage three")
    (tmp_path / "b.pdf").write_bytes(b"single page")
    (tmp_path / "ignored.txt").write_bytes(b"not a pdf")
    return str(tmp_path)


def test_pdf_documents_extraction_and_identity(spark, staging):
    docs = {r.file_name: r for r in pdf_documents(spark, staging).collect()}
    # P4: the non-.pdf file never enters the pipeline
    assert set(docs) == {"a.pdf", "b.pdf"}
    # per-page extraction joined by \n, page order preserved
    assert docs["a.pdf"].text == "page one\npage two\npage three"
    assert docs["b.pdf"].text == "single page"
    # F8: file_id = sha256(file_name), bit-identical to the reference
    for name, row in docs.items():
        assert row.file_id == hashlib.sha256(name.encode()).hexdigest()
        assert row.n_bytes > 0


def test_upload_cap_filter(spark, tmp_path):
    (tmp_path / "ok.pdf").write_bytes(b"x")
    big = tmp_path / "big.pdf"
    big.write_bytes(b"y" * (MAX_UPLOAD_BYTES + 1))
    names = {r.file_name for r in pdf_documents(spark, str(tmp_path)).collect()}
    assert names == {"ok.pdf"}  # 16 MB cap (extract_and_embed.py:20)
    uncapped = pdf_documents(spark, str(tmp_path), enforce_upload_cap=False)
    assert {r.file_name for r in uncapped.select("file_name").collect()} == {
        "ok.pdf",
        "big.pdf",
    }


def test_real_decoder_gated(spark, staging):
    """real=True marks where PyMuPDF plugs in; without the library the
    task must fail with NotImplementedError, not silently fall back."""
    df = pdf_documents(spark, staging, real=True)
    try:
        import fitz  # noqa: F401

        pytest.skip("PyMuPDF present; gating not exercised")
    except ImportError:
        pass
    with pytest.raises(Exception, match="NotImplementedError|PyMuPDF|pymupdf"):
        df.collect()


def test_pdf_to_chunks_end_to_end(spark, staging):
    """Full §3.1 write path: staging dir → binaryFile → extract → classify →
    chunk → embed → chunks-table schema (the complete reference ingest,
    process_pdf_to_milvus, from real files)."""
    from pyspark.sql import functions as F

    from pdf_parse_vector_db_spark.streaming.ingest_stream import _ingest_transform

    # bounded synthetic id: chunk_id = doc_id*1000 + idx must not overflow
    docs = pdf_documents(spark, staging).withColumn(
        "doc_id", F.pmod(F.xxhash64("file_id"), F.lit(10**12))
    )
    chunks = _ingest_transform(docs)
    rows = chunks.collect()
    assert len(rows) >= 2  # at least one chunk per file
    for r in rows:
        assert r.case_decision in {"appellant_won", "appellant_lost", "invalid"}
        assert len(r.embedding) == 64
        assert r.text.strip()


def test_first_page_column_offline_tier(spark, staging):
    """Round-5 fidelity: the metadata path reads page 1 through a SEPARATE
    extraction call (reference: doc[0].get_text(sort=True),
    extract_and_embed_v2.py:398). Offline tier: first form-feed segment."""
    docs = {r.file_name: r for r in pdf_documents(spark, staging).collect()}
    assert docs["a.pdf"].page1 == "page one"
    assert docs["b.pdf"].page1 == "single page"

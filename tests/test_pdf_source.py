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


def test_fitz_tier_gated(spark, staging):
    """tier='fitz' marks where PyMuPDF plugs in; without the library the
    task must fail with NotImplementedError, not silently fall back."""
    df = pdf_documents(spark, staging, tier="fitz")
    try:
        import fitz  # noqa: F401

        pytest.skip("PyMuPDF present; gating not exercised")
    except ImportError:
        pass
    with pytest.raises(Exception, match="NotImplementedError|PyMuPDF|pymupdf"):
        df.collect()


@pytest.fixture()
def real_staging(tmp_path):
    """Actual %PDF byte streams (operators/pdf_codec writer) — classic
    xref, xref-stream, and ObjStm layouts side by side in one staging
    directory, as a mixed-generator corpus would arrive."""
    from pdf_parse_vector_db_spark.operators import pdf_codec as P

    d = tmp_path / "real"
    d.mkdir()
    (d / "classic.pdf").write_bytes(
        P.write_pdf(["COURT OF APPEALS\nCase No. 7\nthe appeal is allowed",
                     "page two\nwith detail"])
    )
    (d / "modern.pdf").write_bytes(
        P.write_pdf(["SUPREME COURT\npetition dismissed"], use_objstm=True)
    )
    (d / "notes.txt").write_bytes(b"not a pdf")
    return str(d)


def test_real_tier_parses_actual_pdf_bytes(spark, real_staging):
    """real=True now parses the actual PDF format in-container (round-10
    pure tier, operators/pdf_codec.py) — no PyMuPDF, no offline fake."""
    docs = {r.file_name: r for r in pdf_documents(spark, real_staging, real=True).collect()}
    assert set(docs) == {"classic.pdf", "modern.pdf"}
    assert docs["classic.pdf"].text == (
        "COURT OF APPEALS\nCase No. 7\nthe appeal is allowed\npage two\nwith detail"
    )
    assert docs["modern.pdf"].text == "SUPREME COURT\npetition dismissed"
    # metadata path: page-1 only, sorted device order (sort=True analog)
    assert docs["classic.pdf"].page1 == (
        "COURT OF APPEALS\nCase No. 7\nthe appeal is allowed"
    )
    for name, row in docs.items():
        assert row.file_id == hashlib.sha256(name.encode()).hexdigest()


def test_real_tier_end_to_end_ingest(spark, real_staging):
    """Staging dir of REAL PDFs → parse → classify → chunk → embed — the
    complete reference write path (process_pdf_to_milvus) with zero fakes
    anywhere: binary scan, pure-python PDF parse, regex cascade, greedy
    chunker, deterministic embedder."""
    from pyspark.sql import functions as F

    from pdf_parse_vector_db_spark.streaming.ingest_stream import _ingest_transform

    docs = pdf_documents(spark, real_staging, real=True).withColumn(
        "doc_id", F.pmod(F.xxhash64("file_id"), F.lit(10**12))
    )
    rows = _ingest_transform(docs).collect()
    assert len(rows) >= 2
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
        assert r.case_decision in {"appellant_won", "appellant_lost", "invalid"}
        assert len(r.embedding) == 64
    assert len(by_doc) == 2  # both real PDFs made it through


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

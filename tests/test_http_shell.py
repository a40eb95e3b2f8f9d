"""HTTP shell (http_shell.py): the reference's Flask surface end-to-end —
multipart requests through Flask's in-process test client, asserting route
names, field names, validation messages/status codes, and that the HTTP
response body equals the facade's own return for the same input (shell =
transport only, zero semantics). Twin of tests/test_api.py one layer up;
the golden response SHAPE is already pinned there and in test_golden.py.
"""

from __future__ import annotations

import io

import pytest

from pdf_parse_vector_db_spark.api import SparkVectorService
from pdf_parse_vector_db_spark.http_shell import create_app
from tests.test_api import DOC, QUERY


@pytest.fixture()
def shell(spark, tmp_path):
    svc = SparkVectorService(spark, str(tmp_path / "warehouse"))
    app = create_app(svc)
    app.config["TESTING"] = True
    return svc, app.test_client()


def _pdf(text: str):
    # offline extraction tier: bytes are the text itself (form-feed pages)
    return (io.BytesIO(text.encode()), "case.pdf")


def test_ingest_then_search_roundtrip(shell):
    svc, client = shell
    r = client.post(
        "/api/v1/ingest-legal-document",
        data={"file": (io.BytesIO(DOC.encode()), "case_a.pdf"), "court_level": "3"},
        content_type="multipart/form-data",
    )
    assert r.status_code == 200
    body = r.get_json()
    assert body["status"] == "success"
    assert body["message"] == "Document processed successfully"
    assert body["chunks_inserted"] >= 1
    assert body["collection"] == "case_files"

    r = client.post(
        "/api/v1/search-similar-cases",
        data={"case_file": _pdf(QUERY), "court_level": "2"},
        content_type="multipart/form-data",
    )
    assert r.status_code == 200
    resp = r.get_json()
    # transport-only contract: byte-for-byte the facade's answer
    assert resp == svc.search_similar_cases("case.pdf", QUERY, 2)
    assert resp["query"]["target_court_level"] == 3
    assert resp["result_count"] >= 1


def test_validation_messages_mirror_reference(shell):
    _svc, client = shell
    # ingest: missing file part (:389)
    r = client.post("/api/v1/ingest-legal-document", data={"court_level": "2"})
    assert (r.status_code, r.get_json()["error"]) == (400, "No file part in the request")
    # ingest: non-pdf (:399)
    r = client.post(
        "/api/v1/ingest-legal-document",
        data={"file": (io.BytesIO(b"x"), "notes.txt"), "court_level": "2"},
        content_type="multipart/form-data",
    )
    assert (r.status_code, r.get_json()["error"]) == (400, "Only PDF files are supported")
    # ingest: bad court_level (:407-412)
    r = client.post(
        "/api/v1/ingest-legal-document",
        data={"file": (io.BytesIO(b"x"), "a.pdf"), "court_level": "high"},
        content_type="multipart/form-data",
    )
    assert r.status_code == 400
    assert r.get_json()["error"] == "Invalid or missing court_level. It must be an integer."
    # search: missing court_level (:306)
    r = client.post(
        "/api/v1/search-similar-cases",
        data={"case_file": _pdf(QUERY)},
        content_type="multipart/form-data",
    )
    assert (r.status_code, r.get_json()["error"]) == (400, "Missing court_level parameter")
    # search: missing case_file (:317)
    r = client.post("/api/v1/search-similar-cases", data={"court_level": "2"})
    assert (r.status_code, r.get_json()["error"]) == (400, "No case_file in the request")
    # search: empty text reaches the facade's semantic check -> 400
    r = client.post(
        "/api/v1/search-similar-cases",
        data={"case_file": (io.BytesIO(b"   "), "q.pdf"), "court_level": "2"},
        content_type="multipart/form-data",
    )
    assert r.status_code == 400
    assert "No text" in r.get_json()["error"]


def test_health_route(shell):
    _svc, client = shell
    r = client.get("/api/v1/health")
    assert r.status_code == 200
    body = r.get_json()
    assert body["status"] == "healthy"
    assert body["service"] == "legal-case-search-api"
    assert body["chunks_indexed"] == 0


def test_legacy_collection_dir_fallback(spark, tmp_path):
    """Round-6 ADVICE: collections persisted under the pre-digest layout
    `__collections__/{safe}` must stay reachable — when the legacy dir
    exists and the digest-suffixed one doesn't, the shell serves the
    legacy dir instead of silently starting an empty collection."""
    import os

    base = str(tmp_path / "warehouse")
    svc = SparkVectorService(spark, base)
    # simulate an upgrade: a collection persisted under the OLD naming
    legacy_svc = SparkVectorService(spark, f"{base}/__collections__/old_cases")
    legacy_svc.ingest_legal_document("case_a.pdf", DOC, 3)
    app = create_app(svc)
    app.config["TESTING"] = True
    client = app.test_client()
    r = client.post(
        "/api/v1/search-similar-cases",
        data={"case_file": _pdf(QUERY), "court_level": "2", "collection": "old_cases"},
        content_type="multipart/form-data",
    )
    assert r.status_code == 200
    assert r.get_json()["result_count"] >= 1  # found the legacy document
    # fresh names (no legacy dir) still get the digest-suffixed namespace
    r = client.post(
        "/api/v1/ingest-legal-document",
        data={
            "file": (io.BytesIO(DOC.encode()), "b.pdf"),
            "court_level": "2",
            "collection": "new cases",
        },
        content_type="multipart/form-data",
    )
    assert r.status_code == 200
    dirs = os.listdir(f"{base}/__collections__")
    assert any(d.startswith("new_cases-") for d in dirs), dirs

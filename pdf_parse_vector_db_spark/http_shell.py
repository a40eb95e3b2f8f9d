"""HTTP shell: the reference's three Flask endpoints over SparkVectorService.

The reference IS a Flask app (extract_and_search_v2.py:297,383,446 — routes,
multipart field names, validation messages, and error-JSON shapes); this
module reproduces that surface verbatim over the engine facade (api.py), so
a reference user's existing `curl` calls work unchanged:

  * POST /api/v1/ingest-legal-document   multipart: file, court_level[, collection]
  * POST /api/v1/search-similar-cases    multipart: case_file, court_level[, collection]
  * GET  /api/v1/health

Request validation happens HERE with the reference's exact messages and
status codes (:300-330, :389-412); semantic validation (empty text, bad
levels) raises ValueError inside the facade and maps to 400. Text
extraction uses the same tiered source as everything else
(sources/pdf.py): PyMuPDF when `real=True` and installed, the deterministic
form-feed splitter otherwise.

Run: ``python -m pdf_parse_vector_db_spark.http_shell /path/to/warehouse``
(listens on :5001 like the reference). Tests drive it in-process through
Flask's test client — no port needed.
"""

from __future__ import annotations

import hashlib
import os

from pdf_parse_vector_db_spark.api import SparkVectorService
from pdf_parse_vector_db_spark.sources.pdf import (
    MAX_UPLOAD_BYTES,
    _extract_pages_fitz,
    _extract_pages_offline,
)


DEFAULT_COLLECTION = "case_files"  # extract_and_search_v2.py default


def create_app(service: SparkVectorService, real_pdf: bool = False):
    from flask import Flask, jsonify, request

    app = Flask("pdf_parse_vector_db_spark")
    app.config["MAX_CONTENT_LENGTH"] = MAX_UPLOAD_BYTES  # reference :20
    extract = _extract_pages_fitz if real_pdf else _extract_pages_offline

    # Per-collection routing (the reference keeps one Milvus collection per
    # `collection` form field): the passed-in service owns the default
    # collection; any other name gets its own warehouse namespace under
    # `<base>/__collections__/<name>` so documents from different
    # collections never mix.
    services: dict[str, SparkVectorService] = {DEFAULT_COLLECTION: service}

    def _service_for(collection: str) -> SparkVectorService:
        svc = services.get(collection)
        if svc is None:
            # Sanitization alone maps distinct names to the same dir
            # ('a b' and 'a_b' both become 'a_b'), mixing two logical
            # collections' documents; a short hash of the RAW name keeps
            # sanitized collisions isolated.
            safe = "".join(c if c.isalnum() or c in "-_" else "_" for c in collection)
            digest = hashlib.md5(collection.encode("utf-8")).hexdigest()[:8]
            path = f"{service.path}/__collections__/{safe}-{digest}"
            # Pre-digest layouts used bare `{safe}`; if such a dir exists
            # and the digest-suffixed one doesn't, keep serving the legacy
            # dir so persisted collections stay reachable after upgrade.
            legacy = f"{service.path}/__collections__/{safe}"
            if not os.path.isdir(path) and os.path.isdir(legacy):
                path = legacy
            svc = SparkVectorService(service.spark, path, dim=service.dim)
            services[collection] = svc
        return svc

    def _text(file_storage) -> str:
        return "\n".join(extract(file_storage.read()))

    @app.route("/api/v1/ingest-legal-document", methods=["POST"])
    def ingest():  # extract_and_search_v2.py:383-443
        if "file" not in request.files:
            return jsonify({"error": "No file part in the request"}), 400
        file = request.files["file"]
        if file.filename == "":
            return jsonify({"error": "No file selected"}), 400
        if not file.filename.lower().endswith(".pdf"):
            return jsonify({"error": "Only PDF files are supported"}), 400
        collection = request.form.get("collection", DEFAULT_COLLECTION)
        try:
            court_level = int(request.form.get("court_level"))
        except (TypeError, ValueError):
            return (
                jsonify({"error": "Invalid or missing court_level. It must be an integer."}),
                400,
            )
        try:
            out = _service_for(collection).ingest_legal_document(
                file.filename, _text(file), court_level
            )
        except ValueError as e:
            return jsonify({"error": str(e)}), 400
        except Exception as e:  # noqa: BLE001 — reference maps all else to 500
            return jsonify({"error": str(e)}), 500
        return (
            jsonify(
                {
                    "status": "success",
                    "message": "Document processed successfully",
                    "chunks_inserted": out["chunks_inserted"],
                    "case_decision": out["case_decision"],
                    "collection": collection,
                }
            ),
            200,
        )

    @app.route("/api/v1/search-similar-cases", methods=["POST"])
    def search():  # extract_and_search_v2.py:297-380
        if "court_level" not in request.form:
            return jsonify({"error": "Missing court_level parameter"}), 400
        try:
            court_level = int(request.form.get("court_level"))
        except (TypeError, ValueError):
            return jsonify({"error": "Invalid court_level. It must be an integer."}), 400
        if "case_file" not in request.files:
            return jsonify({"error": "No case_file in the request"}), 400
        file = request.files["case_file"]
        if file.filename == "":
            return jsonify({"error": "No file selected"}), 400
        if not file.filename.lower().endswith(".pdf"):
            return jsonify({"error": "Only PDF files are supported"}), 400
        collection = request.form.get("collection", DEFAULT_COLLECTION)  # ref :330-331
        try:
            resp = _service_for(collection).search_similar_cases(
                file.filename, _text(file), court_level
            )
        except ValueError as e:
            return jsonify({"error": str(e)}), 400
        except Exception as e:  # noqa: BLE001
            return jsonify({"error": str(e)}), 500
        return jsonify(resp), 200

    @app.route("/api/v1/health", methods=["GET"])
    def health():  # extract_and_search_v2.py:446-448
        out = service.health()
        out["service"] = "legal-case-search-api"
        return jsonify(out), 200

    return app


def main() -> None:  # pragma: no cover — manual entry point
    import sys

    from pdf_parse_vector_db_spark.session import get_spark

    warehouse = sys.argv[1] if len(sys.argv) > 1 else "spark-warehouse/chunks"
    service = SparkVectorService(get_spark("http-shell"), warehouse)
    create_app(service).run(host="0.0.0.0", port=5001)


if __name__ == "__main__":
    main()

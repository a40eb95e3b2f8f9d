"""Serving-throughput audit: search QPS vs concurrent client threads.

The reference deployment is a Flask service taking concurrent requests;
this measures what the engine sustains in that shape — one long-lived
FAIR-scheduled SparkSession, N client threads looping the facade's
search path over a warehouse ingested through the facade's write path.

Prints ONE JSON line:
  {"metric": "search_qps", "per_threads": {"1": qps, "2": qps, ...},
   "searches_per_thread": N, "scaleup_8v1": x}

Interpretation: each search is scheduling-floor-bound (~0.3 s of driver
round-trips on local mode), so single-thread QPS is low and flat;
concurrency should RAISE aggregate QPS until executor cores saturate —
a scaleup_8v1 well above 1 is the evidence that the session multiplexes
requests instead of serializing them.

Usage:  python tools/concurrency_audit.py [searches_per_thread]
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

DOC = (
    "The appellant filed a motion for review. " * 30
    + "\n\n"
    + "The court finds in favor of the appellant and the appeal is allowed. " * 20
)


def main() -> None:
    import tempfile

    from pdf_parse_vector_db_spark.api import SparkVectorService
    from pdf_parse_vector_db_spark.session import get_spark

    n_per_thread = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark("concurrency_audit")
    spark.sparkContext.setLogLevel("ERROR")

    with tempfile.TemporaryDirectory() as tmp:
        svc = SparkVectorService(spark, os.path.join(tmp, "warehouse"))
        for i in range(6):
            svc.ingest_legal_document(f"case_{i}.pdf", DOC + f" v{i}", court_level=3)
        svc.search_similar_cases("warm.pdf", DOC, court_level=2)  # prime codegen

        per_threads: dict[str, float] = {}
        for n_threads in (1, 2, 4, 8):
            errors: list[BaseException] = []

            def client():
                try:
                    for j in range(n_per_thread):
                        svc.search_similar_cases(f"q{j}.pdf", DOC + f" p{j}", 2)
                except BaseException as exc:  # noqa: BLE001
                    errors.append(exc)

            threads = [threading.Thread(target=client) for _ in range(n_threads)]
            t0 = time.perf_counter()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            wall = time.perf_counter() - t0
            if errors:
                raise errors[0]
            per_threads[str(n_threads)] = round(n_threads * n_per_thread / wall, 2)

    print(
        json.dumps(
            {
                "metric": "search_qps",
                "per_threads": per_threads,
                "searches_per_thread": n_per_thread,
                "scaleup_8v1": round(per_threads["8"] / per_threads["1"], 2),
            }
        )
    )


if __name__ == "__main__":
    main()

"""Concurrent serving certification (round 6).

The reference is a multi-request Flask service (extract_and_search_v2.py
serves ingest/search/health concurrently from one process over one
module-global Milvus client). The engine's analog — one long-lived
SparkSession shared by request threads — is certified here:

  * concurrent searches return exactly the serial answers (thread-safe
    read path, no cross-request state bleed);
  * concurrent ingests lose no writes (the facade serializes parquet
    COMMITS within the process — two concurrent append jobs on one root
    share ``_temporary/0`` under the default committer and can delete
    each other's in-flight task files);
  * a mixed ingest+search storm completes with every response correct;
  * scheduler pools are request-thread-local (scoped_pool) and the
    session runs the FAIR scheduler, so an analytic job cannot
    head-of-line block the interactive search path.
"""

from __future__ import annotations

import threading

import pytest

from pdf_parse_vector_db_spark.api import SparkVectorService
from pdf_parse_vector_db_spark.session import scoped_pool

DOC = (
    "The appellant filed a motion for review. " * 30
    + "\n\n"
    + "The court finds in favor of the appellant and the appeal is allowed. " * 20
)


@pytest.fixture()
def svc(spark, tmp_path):
    return SparkVectorService(spark, str(tmp_path / "warehouse"))


def _run_threads(fns):
    """Run callables concurrently; return per-thread results, re-raising
    the first worker exception (a swallowed assert is a fake pass)."""
    results = [None] * len(fns)
    errors: list[BaseException] = []

    def wrap(i, fn):
        try:
            results[i] = fn()
        except BaseException as exc:  # noqa: BLE001 — surfaced below
            errors.append(exc)

    threads = [
        threading.Thread(target=wrap, args=(i, fn)) for i, fn in enumerate(fns)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(300)
    if errors:
        raise errors[0]
    return results


def test_concurrent_searches_match_serial(svc):
    for i in range(4):
        svc.ingest_legal_document(f"case_{i}.pdf", DOC + f" variant {i}", court_level=3)
    queries = [f"{DOC} probe {j}" for j in range(6)]
    serial = [
        svc.search_similar_cases(f"q{j}.pdf", q, court_level=2)
        for j, q in enumerate(queries)
    ]
    for _ in range(2):  # two storms: reuse of the session must stay clean
        concurrent = _run_threads(
            [
                (lambda j=j, q=q: svc.search_similar_cases(f"q{j}.pdf", q, court_level=2))
                for j, q in enumerate(queries)
            ]
        )
        assert concurrent == serial


def test_concurrent_ingests_lose_no_writes(svc):
    # the warehouse must exist before threads race (first write creates it)
    first = svc.ingest_legal_document("case_seed.pdf", DOC, court_level=3)
    outs = _run_threads(
        [
            (
                lambda i=i: svc.ingest_legal_document(
                    f"case_{i}.pdf", DOC + f" variant {i}", court_level=3 + (i % 2)
                )
            )
            for i in range(8)
        ]
    )
    assert all(o["chunks_inserted"] >= 1 for o in outs)
    total = svc._chunks().count()
    assert total == first["chunks_inserted"] + sum(o["chunks_inserted"] for o in outs)


def test_mixed_ingest_search_storm(svc):
    for i in range(3):
        svc.ingest_legal_document(f"base_{i}.pdf", DOC + f" base {i}", court_level=3)
    want = svc.search_similar_cases("probe.pdf", DOC, court_level=2)

    def search():
        resp = svc.search_similar_cases("probe.pdf", DOC, court_level=2)
        # ingests land concurrently, so the result set may grow — but the
        # response must stay well-formed, deduped, ascending, and include
        # everything that was already committed before the storm
        assert resp["status"] == "success"
        ids = [r["file_id"] for r in resp["results"]]
        assert len(ids) == len(set(ids))
        scores = [r["score"] for r in resp["results"]]
        assert scores == sorted(scores)
        assert resp["result_count"] >= want["result_count"]
        return resp

    def ingest(i):
        return svc.ingest_legal_document(
            f"storm_{i}.pdf", DOC + f" storm {i}", court_level=3
        )

    _run_threads(
        [lambda i=i: ingest(i) for i in range(3)] + [search] * 5
    )
    # quiescent check: all storm ingests visible to a final search
    final = svc.search_similar_cases("probe.pdf", DOC, court_level=2)
    assert final["result_count"] >= want["result_count"]
    assert svc.health()["chunks_indexed"] == svc._chunks().count()


def test_scheduler_is_fair_and_pools_are_thread_local(spark):
    assert spark.sparkContext.getConf().get("spark.scheduler.mode") == "FAIR"
    sc = spark.sparkContext
    seen = {}
    barrier = threading.Barrier(2)

    def worker(name):
        with scoped_pool(spark, name):
            barrier.wait(30)  # both threads inside their scopes at once
            seen[name] = sc.getLocalProperty("spark.scheduler.pool")
            spark.range(10).count()  # a real job under the pool tag
            barrier.wait(30)
        seen[name + "_after"] = sc.getLocalProperty("spark.scheduler.pool")

    _run_threads([lambda: worker("alpha"), lambda: worker("beta")])
    assert seen["alpha"] == "alpha" and seen["beta"] == "beta"
    assert seen["alpha_after"] is None and seen["beta_after"] is None


def test_search_response_cache_hits_and_invalidates(svc, spark):
    svc.ingest_legal_document("c0.pdf", DOC, court_level=3)
    r1 = svc.search_similar_cases("q.pdf", DOC, court_level=2)
    assert (svc.cache_hits, svc.cache_misses) == (0, 1)
    # identical request: served from cache, byte-identical
    jobs_before = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    r2 = svc.search_similar_cases("q.pdf", DOC, court_level=2)
    assert r2 == r1 and svc.cache_hits == 1
    assert spark.sparkContext.statusTracker().getJobIdsForGroup(None) == jobs_before
    # different file_name is a different response (it echoes the query)
    r3 = svc.search_similar_cases("other.pdf", DOC, court_level=2)
    assert r3["query"]["file_name"] == "other.pdf" and svc.cache_misses == 2
    # ingest invalidates: the repeated query must see the new document
    svc.ingest_legal_document("c1.pdf", DOC + " fresher", court_level=3)
    r4 = svc.search_similar_cases("q.pdf", DOC, court_level=2)
    assert svc.cache_misses == 3
    assert r4["result_count"] == r1["result_count"] + 1


def test_cache_never_serves_stale_across_concurrent_ingest(svc):
    """A search that straddles an ingest commit may cache its pre-ingest
    answer only under the pre-ingest version: the next lookup (post-bump)
    must MISS and recompute."""
    svc.ingest_legal_document("c0.pdf", DOC, court_level=3)
    r1 = svc.search_similar_cases("q.pdf", DOC, court_level=2)
    # simulate the straddle: the bump lands after r1's key was built
    svc.ingest_legal_document("c1.pdf", DOC + " newer", court_level=3)
    r2 = svc.search_similar_cases("q.pdf", DOC, court_level=2)
    assert r2["result_count"] > r1["result_count"]


@pytest.mark.slow
def test_manifested_service_matches_raw_and_survives_ingest_race(spark, tmp_path):
    """The manifested warehouse returns the same search answers as the
    raw-append warehouse over the same documents, and concurrent ingests
    land via rename-CAS with distinct versions and no lost chunks."""
    raw = SparkVectorService(spark, str(tmp_path / "raw"))
    man = SparkVectorService(spark, str(tmp_path / "man"), manifested=True)
    for i in range(3):
        raw.ingest_legal_document(f"c{i}.pdf", DOC + f" v{i}", court_level=3)
        man.ingest_legal_document(f"c{i}.pdf", DOC + f" v{i}", court_level=3)
    r_raw = raw.search_similar_cases("q.pdf", DOC, court_level=2)
    r_man = man.search_similar_cases("q.pdf", DOC, court_level=2)
    assert r_man == r_raw
    # cache invalidation rides the manifest head version
    man.ingest_legal_document("c9.pdf", DOC + " fresh", court_level=3)
    r2 = man.search_similar_cases("q.pdf", DOC, court_level=2)
    assert r2["result_count"] == r_man["result_count"] + 1
    # concurrent manifested ingests: every chunk lands
    before = man._chunks().count()
    outs = _run_threads(
        [
            (
                lambda i=i: man.ingest_legal_document(
                    f"race{i}.pdf", DOC + f" race {i}", court_level=3
                )
            )
            for i in range(4)
        ]
    )
    assert man._chunks().count() == before + sum(o["chunks_inserted"] for o in outs)

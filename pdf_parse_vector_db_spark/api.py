"""Service facade: the reference's three REST entry points as engine calls.

A user of Suyash906/pdf_parse_vector_db interacts through three endpoints;
this module is the drop-in surface a Flask/FastAPI shell would wrap, with
every HTTP hop collapsed into one Spark job (SURVEY §3 lifecycle maps):

  * ``ingest_legal_document``  ≙ POST /api/v1/ingest-legal-document
    (extract_and_search_v2.py:383-443 → process_pdf_to_milvus :234-287)
  * ``search_similar_cases``   ≙ POST /api/v1/search-similar-cases
    (extract_and_search_v2.py:297-380 → :124-170)
  * ``health``                 ≙ GET /api/v1/health (:446-448)

Text extraction happens upstream (sources/pdf.py — PyMuPDF env-gated, the
form-feed splitter is the in-container tier), so the facade takes extracted
text + file name, mirroring the reference's post-fitz state. Validation
errors raise ValueError with the reference's message semantics (a web shell
maps them to 400s).

State is a parquet chunk warehouse (partitioned by court_level, the search
filter column → partition pruning on the hot path) instead of a Milvus
collection; the long-lived SparkSession plays the module-global client
(extract_and_search.py:133-138).
"""

from __future__ import annotations

import copy
import hashlib
import json
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_parse_vector_db_spark.functions.classifiers import case_decision_expr
from pdf_parse_vector_db_spark.functions.vector import l2_distance
from pdf_parse_vector_db_spark.operators import knn
from pdf_parse_vector_db_spark.operators.chunker import chunk_documents, chunk_text
from pdf_parse_vector_db_spark.operators.embedder import embed_text_py, hashing_embedder
from pdf_parse_vector_db_spark.schemas import (
    EMBEDDING_DIM,
    SEARCH_FETCH_K,
    SEARCH_TOP_K,
)
from pdf_parse_vector_db_spark.session import scoped_pool


class SparkVectorService:
    """One instance per warehouse — the engine-side analog of the reference's
    module-global Milvus client + collection pair."""

    def __init__(
        self,
        spark: SparkSession,
        warehouse_path: str,
        dim: int = EMBEDDING_DIM,
        manifested: bool = False,
        auto_compact_commits: int = 16,
    ):
        self.spark = spark
        self.path = warehouse_path
        self.dim = dim
        # manifested=True stores chunks through the manifest-committed
        # table layer (sources/manifest.py): ingest publishes via
        # rename-CAS instead of a raw parquet append, so writers are safe
        # across PROCESSES (the in-process write lock below still
        # serializes this instance's committers, but correctness no
        # longer depends on it), and searches read a true snapshot. The
        # manifest head version doubles as the cache version.
        self.manifested = manifested
        # every ingest is one manifest commit, so a long-lived service
        # accretes commit legs (each scan unions them all) — measured:
        # 6 legs cost 2.2x search wall vs one (concurrency_audit's
        # manifested_qps vs manifested_compacted_qps). maybe_compact
        # after ingest keeps the leg count bounded; 0 disables.
        self.auto_compact_commits = auto_compact_commits
        # Concurrent requests (round 6): searches are lock-free — they
        # only read. Ingest COMMITS must serialize within the process:
        # two concurrent append jobs on one parquet root share
        # ``_temporary/0`` under the default FileOutputCommitter, and
        # either job's cleanup can delete the other's in-flight task
        # files (silently lost writes). A single service process is the
        # reference's deployment shape; multi-process writers need a
        # table format with a real commit protocol instead.
        self._write_lock = threading.Lock()
        # Response cache (round 6): the reference re-embeds and re-runs
        # every identical search (extract_and_search_v2.py has no cache);
        # a serving engine should not pay a Spark job for a repeated
        # query. Keys include the warehouse VERSION — bumped under the
        # write lock on every ingest — so a hit can never return
        # pre-ingest results (external writers bypassing this facade are
        # out of cache scope, as they are for the write lock itself).
        self._cache: dict = {}
        self._cache_lock = threading.Lock()
        self._version = 0
        self.cache_hits = 0
        self.cache_misses = 0
        self.search_cache_size = 128

    # -- write path --------------------------------------------------------

    def ingest_legal_document(
        self, file_name: str, text: str, court_level: int
    ) -> dict:
        """Validate → classify → chunk → embed → append; returns
        {chunks_inserted, case_decision} (extract_and_search_v2.py:433-439)."""
        if not file_name or not file_name.lower().endswith(".pdf"):
            raise ValueError("File must be a PDF")
        if not isinstance(court_level, int):
            raise ValueError("court_level must be an integer")
        if not text or not text.strip():
            raise ValueError("No text could be extracted from the PDF")

        # deterministic doc_id from the file name (hash(), salted per run,
        # would break re-ingest idempotence tests); 48 bits so
        # doc_id * 1000 + chunk_idx stays inside int64 under ANSI arithmetic
        import hashlib

        doc_id = int(hashlib.sha256(file_name.encode()).hexdigest()[:12], 16)
        docs = self.spark.createDataFrame(
            [(doc_id, text, int(court_level))], "doc_id long, text string, court_level int"
        ).withColumn("case_decision", case_decision_expr(F.col("text")))

        chunks = chunk_documents(docs, keep_cols=("court_level", "case_decision"))
        chunks = (
            chunks.withColumn("file_name", F.lit(file_name))
            .withColumn("file_id", F.sha2(F.lit(file_name), 256))
            .withColumn("chunk_id", F.col("doc_id") * 1000 + F.col("chunk_idx"))
            .withColumn("embedding", hashing_embedder(self.dim)(F.col("chunk_text")))
            # the reference drops chunks whose embedding came back empty
            # (extract_and_embed.py:102,112-113) — e.g. chunker edge (a)'s
            # empty first chunk
            .filter(F.col("embedding").isNotNull())
            .select(
                "chunk_id",
                "doc_id",
                "chunk_idx",
                F.col("chunk_text").alias("text"),
                "embedding",
                "file_name",
                "file_id",
                F.col("court_level").cast("tinyint").alias("court_level"),
                "case_decision",
            )
        )
        with scoped_pool(self.spark, "ingest"):
            with self._write_lock:
                if self.manifested:
                    from pdf_parse_vector_db_spark.sources import manifest as M

                    # file_id zone maps let forget_file() prune commits
                    self._version = M.commit_append(
                        self.spark,
                        self.path,
                        chunks,
                        partition_by=("court_level",),
                        stats_cols=("file_id",),
                    )
                    if self.auto_compact_commits:
                        try:
                            self._version = max(
                                self._version,
                                M.maybe_compact(
                                    self.spark,
                                    self.path,
                                    max_live_commits=self.auto_compact_commits,
                                    partition_by=("court_level",),
                                    stats_cols=("file_id",),
                                ),
                            )
                        except IOError:
                            # another instance compacted the same commits
                            # first — maintenance lost a race it can lose;
                            # OUR append is already committed, the ingest
                            # must not fail
                            pass
                else:
                    chunks.write.mode("append").partitionBy("court_level").parquet(
                        self.path
                    )
                    self._version += 1  # invalidates every cached search
            written = self._chunks().filter(
                F.col("file_id") == F.sha2(F.lit(file_name), 256)
            )
            row = written.agg(
                F.count(F.lit(1)).alias("n"), F.first("case_decision").alias("d")
            ).collect()[0]
        return {"chunks_inserted": row.n, "case_decision": row.d}

    # -- read path ---------------------------------------------------------

    def search_similar_cases(
        self, file_name: str, text: str, court_level: int, top_k: int = SEARCH_TOP_K
    ) -> dict:
        """First-chunk embed → pruned scan at target level → L2 over-fetch →
        best-per-file dedup → ascending top-k → stats → nested response
        (golden shape README.md:17-65)."""
        if not text or not text.strip():
            raise ValueError("No text could be extracted from the PDF")
        target = int(court_level) + 1

        import hashlib

        # version read is deliberately pre-search: a concurrent ingest
        # committing mid-search bumps the version, so this entry is
        # already stale at insert and can never serve post-ingest readers.
        # Manifested mode exists for MULTI-PROCESS writers, so the local
        # counter is not enough there — key on the manifest head (one
        # cheap globStatus), which any process's commit advances.
        if self.manifested:
            from pdf_parse_vector_db_spark.sources import manifest as M

            version = M.head_version(self.spark, self.path)
        else:
            version = self._version
        key = (
            hashlib.sha256(text.encode()).hexdigest(),
            file_name,
            target,
            int(top_k),
            version,
        )
        with self._cache_lock:
            if key in self._cache:
                self.cache_hits += 1
                # defensive copy: a caller annotating the response must
                # not poison every later hit on this key
                return copy.deepcopy(self._cache[key])

        # the reference embeds every chunk and keeps [0]
        # (extract_and_search_v2.py:124-135); embedding only the first chunk
        # with a usable embedding is the same result without the discarded
        # calls (empty-embedding chunks are dropped upstream there too)
        qvec = None
        for first_chunk in chunk_text(text):
            qvec = embed_text_py(first_chunk, self.dim)
            if qvec is not None:
                break
        if qvec is None:
            raise ValueError("No text could be extracted from the PDF")
        q = F.array(*[F.lit(float(x)) for x in qvec])

        with scoped_pool(self.spark, "search"):
            hits = (
                self._chunks()
                .filter(F.col("court_level") == target)
                .withColumn("dist", l2_distance(F.col("embedding"), q))
                .orderBy(F.col("dist").asc(), F.col("chunk_id").asc())
                .limit(SEARCH_FETCH_K)
            )
            best = knn.dedup_best_per_group(
                hits, group_col="file_id", score_col="dist", tiebreak_cols=("chunk_id",)
            )
            top = (
                best.orderBy(F.col("dist").asc(), F.col("chunk_id").asc())
                .limit(top_k)
                .withColumn("score", F.round(F.col("dist"), 4))
            )
            resp = knn.search_response(top, file_name, int(court_level))
            out = json.loads(resp.collect()[0][0])
        with self._cache_lock:
            self.cache_misses += 1
            if len(self._cache) >= self.search_cache_size:
                # FIFO eviction: dicts preserve insertion order; the
                # version bump already evicts whole generations, so
                # recency bookkeeping buys little here
                self._cache.pop(next(iter(self._cache)))
            # store our own private copy for the same reason as the hit path
            self._cache[key] = copy.deepcopy(out)
        return out

    # -- maintenance (manifested mode) ---------------------------------------

    def forget_file(self, file_name: str) -> int:
        """GDPR erasure through the table layer: row-level DELETE of every
        chunk of `file_name` (the reference's delete-by-expr analog). The
        per-commit file_id zone maps written at ingest prune the rewrite
        to the commits that actually contain the document; the physical
        bytes of replaced commits remain until vacuum (same erasure
        window Delta documents). Manifested mode only — the raw-parquet
        path has no commit protocol to rewrite safely under readers."""
        if not self.manifested:
            raise ValueError("forget_file requires manifested=True")
        from pdf_parse_vector_db_spark.sources import manifest as M

        fid = hashlib.sha256(file_name.encode()).hexdigest()
        with scoped_pool(self.spark, "maintenance"):
            with self._write_lock:
                v, _ = M.commit_delete(
                    self.spark,
                    self.path,
                    "file_id",
                    fid,
                    fid,
                    stats_cols=("file_id",),
                    partition_by=("court_level",),
                )
                self._version = max(self._version, v)
        return self._version

    def restore(self, version: int) -> int:
        """Roll the warehouse back to `version` (Delta RESTORE parity —
        one manifest CAS, history keeps rolling forward). The search
        cache keys on the manifest head, so post-restore searches never
        serve pre-restore results."""
        if not self.manifested:
            raise ValueError("restore requires manifested=True")
        from pdf_parse_vector_db_spark.sources import manifest as M

        with scoped_pool(self.spark, "maintenance"):
            with self._write_lock:
                self._version = max(
                    self._version, M.restore_table(self.spark, self.path, version)
                )
        return self._version

    def changes_since(
        self, version: int, to_version: int | None = None
    ) -> tuple[int, DataFrame | None]:
        """Row-level audit feed (Delta CDF parity, X58): every chunk
        change strictly after `version` up to `to_version` (head when
        None), as the chunk schema plus `_change_type` and
        `_commit_version`. Ingests stream as inserts straight from their
        commit dirs.

        Returns ``(to_version, df)`` — the resume-cursor contract: the
        returned `to_version` is the version the returned rows are
        complete THROUGH, resolved atomically with the read, so an
        exactly-once consumer passes it back as the next call's
        `version`. (Reading `head_version` separately before the call
        can double-deliver and after the call can skip versions; `df`
        may be None on an empty window, so max(_commit_version) over the
        rows is NOT a safe cursor.)

        DELIBERATE exception: `forget_file` erasures do NOT write change
        files — a change feed that retained the deleted rows would
        defeat GDPR erasure — so a window crossing an erasure version
        raises; resume the feed from the erasure version forward (the
        same tension Delta documents for CDF + VACUUM of change data)."""
        if not self.manifested:
            raise ValueError("changes_since requires manifested=True")
        from pdf_parse_vector_db_spark.sources import manifest as M

        with scoped_pool(self.spark, "maintenance"):
            to, df = M.table_changes_cdf(self.spark, self.path, version, to_version)
        return to, df

    # -- liveness ----------------------------------------------------------

    def health(self) -> dict:
        """Static-JSON analog with a real liveness probe: one no-op job."""
        with scoped_pool(self.spark, "health"):
            self.spark.range(1).count()
            try:
                n = self._chunks().count()
            except Exception:
                n = 0
        return {"status": "healthy", "chunks_indexed": n}

    def _chunks(self) -> DataFrame:
        if self.manifested:
            from pdf_parse_vector_db_spark.sources import manifest as M

            _, df = M.snapshot(self.spark, self.path)
            if df is None:  # parity with the raw path's missing-dir error
                raise FileNotFoundError(f"empty manifested warehouse: {self.path}")
            return df
        return self.spark.read.parquet(self.path)

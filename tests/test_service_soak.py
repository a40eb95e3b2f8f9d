"""Service soak: the WHOLE reference lifecycle running concurrently.

The reference deployment is a long-lived service doing all of these at
once: inserts streaming into the vector index, searches serving, the
index being maintained (segment merges, GDPR erasure) underneath. This
test runs every lifecycle operation simultaneously in one SparkSession
under the documented concurrency contract (readers lock-free via
search_ivf_index_consistent; writers serialized by one maintenance
mutex) and asserts EXACT answers throughout:

  * the ingested and deleted vectors are chosen provably FAR from the
    query (beyond rank 100 by distance), so the correct top-5 is the
    same fixed answer at every instant of the storm — any deviation is
    a real consistency bug, not test slack;
  * streaming ingest goes through the frozen-quantizer checkpointed
    path (exactly-once), compaction and deletion through the
    rename-swap publish;
  * quiescent post-conditions: exact final count, victims gone, search
    still exact, maintenance idempotent.
"""

from __future__ import annotations

import pytest

import os
import threading

from pyspark.sql import functions as F

from pdf_parse_vector_db_spark.functions.vector import l2_distance
from pdf_parse_vector_db_spark.operators import ivf_index
from pdf_parse_vector_db_spark.plans.similarity import _IVF_NPROBE, _ivf_seeds
from pdf_parse_vector_db_spark.session import scoped_pool

SF = "/root/testdata/sf0.01"
N_INITIAL = 200
N_TOTAL = 280
N_INGEST_BATCHES = 4
N_DELETES = 3
N_READS = 8


@pytest.mark.slow
def test_full_lifecycle_soak(spark, tmp_path):
    emb_all = spark.read.parquet(f"{SF}/embeddings.parquet").filter(
        F.col("vec_id") < N_TOTAL
    )
    emb_initial = emb_all.filter(F.col("vec_id") < N_INITIAL)
    # the quantizer is frozen over the initial corpus — later inserts only
    # assign (the standard IVF contract)
    seeds = _ivf_seeds(emb_initial)
    path = str(tmp_path / "index")
    ivf_index.build_ivf_index(emb_initial, seeds, path)
    q = emb_all.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    cids = ivf_index.probe_cells(seeds, q, _IVF_NPROBE)

    # rank every candidate by distance to the query; far = beyond rank 100,
    # so no far vector can ever displace the top-5
    ranked = [
        int(r["vec_id"])
        for r in emb_all.crossJoin(F.broadcast(q))
        .select("vec_id", l2_distance(F.col("embedding"), F.col("qvec")).alias("d"))
        .orderBy("d", "vec_id")
        .collect()
    ]
    far = set(ranked[100:])
    ingest_ids = [v for v in ranked[100:] if v >= N_INITIAL][: N_INGEST_BATCHES * 10]
    delete_ids = [v for v in ranked[100:] if v < N_INITIAL][:N_DELETES]
    assert len(ingest_ids) == N_INGEST_BATCHES * 10 and len(delete_ids) == N_DELETES

    expected = [
        tuple(r) for r in ivf_index.search_ivf_index(spark, path, q, cids).collect()
    ]
    assert expected and all(int(t[0]) not in far for t in expected)

    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing)
    write_lock = threading.Lock()  # the documented single-mutator contract
    errors: list[BaseException] = []
    stop = threading.Event()

    def ingestor():
        """Streaming ingest: drop a landing file, drain it through the
        frozen quantizer with checkpointed exactly-once replay."""
        from pdf_parse_vector_db_spark.streaming.ann_stream import stream_ingest_ivf

        try:
            with scoped_pool(spark, "ingest"):
                for b in range(N_INGEST_BATCHES):
                    batch = ingest_ids[b * 10 : (b + 1) * 10]
                    emb_all.filter(F.col("vec_id").isin(batch)).coalesce(1).write.mode(
                        "append"
                    ).parquet(landing)
                    with write_lock:
                        stream_ingest_ivf(
                            spark, landing, path, ckpt, seeds
                        ).awaitTermination(120)
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)

    def maintainer():
        """Compaction + GDPR deletes, each publish a rename swap."""
        try:
            with scoped_pool(spark, "maintenance"):
                for victim in delete_ids:
                    with write_lock:
                        ivf_index.compact_ivf_index(spark, path, max_files_per_cell=2)
                    with write_lock:
                        ivf_index.delete_from_ivf_index(spark, path, [victim])
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)

    def reader():
        """Lock-free consistent searches: the answer never wavers."""
        try:
            with scoped_pool(spark, "search"):
                n = 0
                while n < N_READS and not stop.is_set():
                    rows = ivf_index.search_ivf_index_consistent(
                        spark, path, q, cids, max_retries=40
                    )
                    assert [tuple(r) for r in rows] == expected
                    n += 1
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [
        threading.Thread(target=ingestor),
        threading.Thread(target=maintainer),
        threading.Thread(target=reader),
        threading.Thread(target=reader),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(500)
    stop.set()
    assert not errors, errors

    # quiescent post-conditions
    final = spark.read.parquet(path)
    assert final.count() == N_INITIAL + len(ingest_ids) - len(delete_ids)
    assert final.filter(F.col("vec_id").isin(delete_ids)).count() == 0
    assert final.filter(F.col("vec_id").isin(ingest_ids)).count() == len(ingest_ids)
    got = [tuple(r) for r in ivf_index.search_ivf_index(spark, path, q, cids).collect()]
    assert got == expected
    # maintenance is idempotent at rest
    assert ivf_index.delete_from_ivf_index(spark, path, delete_ids) == 0
    ivf_index.compact_ivf_index(spark, path, max_files_per_cell=2)
    assert [
        tuple(r) for r in ivf_index.search_ivf_index(spark, path, q, cids).collect()
    ] == expected

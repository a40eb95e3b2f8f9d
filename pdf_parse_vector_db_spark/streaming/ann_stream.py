"""Streaming vector ingest into the cell-partitioned IVF index (T4 × X3).

The reference's service loop is ingest-then-search: each uploaded PDF's
chunks are embedded and INSERTED into the Milvus IVF collection, and
searches immediately see them (extract_and_search_v2.py:234-287). This
module is that loop as Structured Streaming: a landing directory of new
vectors drained via foreachBatch, each micro-batch assigned to its coarse
cell by the FROZEN quantizer and appended to the same
partitionBy("cluster_id") parquet layout the batch build
(operators/ivf_index.build_ivf_index) writes — so a probe-pruned search
over the index sees every vector streamed so far, and batch and stream
produce byte-identical layouts.

Freezing the quantizer is the standard IVF contract (Milvus, FAISS: the
coarse centroids are trained once; inserts only assign). It is also what
makes streaming ingest embarrassingly parallel at 100 TB: each micro-batch
is a broadcast argmin against ~√N static seeds + a partitioned append —
no shuffle, no state store, no coordination with other batches.
checkpointed file-source replay gives exactly-once appends.

stream==batch contract: tests/test_ivf_index.py streams the corpus in
4 micro-batches and asserts the probe-pruned search equals the
batch-built index's answer (and plans/similarity.ivf_knn's answer)
hash-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from pdf_parse_vector_db_spark.operators.ivf_index import assign_cells

EMB_SCHEMA = "vec_id bigint, embedding array<float>, label int"


def stream_ingest_ivf(
    spark: SparkSession,
    landing_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    seeds: DataFrame,
    available_now: bool = True,
) -> StreamingQuery:
    """Drain `landing_dir` into the cell-partitioned index at `index_dir`.

    `seeds` is the frozen coarse quantizer (cid, cvec) — pass the same
    relation the batch build used. foreachBatch (not a stateful op): the
    index lives on storage, each trigger is a pure append, and replay
    after a crash re-appends only unprocessed source files."""
    seeds.cache().count()  # freeze: one materialization, every batch reuses it

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        assign_cells(batch_df, seeds).write.mode("append").partitionBy(
            "cluster_id"
        ).parquet(index_dir)

    src = spark.readStream.schema(EMB_SCHEMA).option("maxFilesPerTrigger", 1).parquet(
        landing_dir
    )
    writer = src.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

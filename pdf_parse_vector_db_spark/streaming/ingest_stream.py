"""Continuous ingest (SURVEY §2.9 T4 [ext], §3.1 streaming restatement).

The reference ingests one uploaded PDF per HTTP request (S2); the streaming
analog is a landing directory watched by a file-source stream, pushed
through the SAME ingest plan as the batch path (plans/ingest.py — doc-level
classify → chunk → embed → file identity) and appended to the chunks table
via foreachBatch.

foreachBatch (rather than a direct parquet sink) because the ingest plan
contains mapInPandas/pandas_udf stages and we want per-batch atomic appends
partitioned by court_level — each micro-batch is exactly one reference
"request" worth of work, checkpointed for exactly-once file-source replay.

Scale: the file source lists the landing dir incrementally (maxFilesPerTrigger
bounds batch size); everything downstream is the batch plan's map-only
pipeline, so streaming throughput ≈ batch throughput at equal resources.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from pdf_parse_vector_db_spark.functions.classifiers import case_decision_expr
from pdf_parse_vector_db_spark.operators.chunker import chunk_documents
from pdf_parse_vector_db_spark.operators.embedder import hashing_embedder


def _ingest_transform(docs: DataFrame, with_embeddings: bool = True) -> DataFrame:
    """The shared (batch ≡ streaming) ingest plan body over a documents-shaped
    DataFrame; mirrors plans/ingest.build_chunks."""
    docs = docs.withColumn("court_level", (F.col("doc_id") % 5).cast("tinyint")).withColumn(
        "case_decision", case_decision_expr(F.col("text"))
    )
    chunks = chunk_documents(docs, keep_cols=("court_level", "case_decision"))
    chunks = (
        chunks.withColumn(
            "file_name", F.concat(F.lit("doc_"), F.col("doc_id").cast("string"), F.lit(".pdf"))
        )
        .withColumn("file_id", F.sha2(F.col("file_name"), 256))
        .withColumn("chunk_id", F.col("doc_id") * 1000 + F.col("chunk_idx"))
    )
    if with_embeddings:
        chunks = chunks.withColumn("embedding", hashing_embedder()(F.col("chunk_text")))
    return chunks.withColumnRenamed("chunk_text", "text")


def stream_ingest_documents(
    spark: SparkSession,
    landing_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema: str = "doc_id bigint, text string, lang string, source string, n_chars bigint",
    with_embeddings: bool = True,
    available_now: bool = True,
) -> StreamingQuery:
    """readStream(landing parquet) → ingest plan → foreachBatch append.
    available_now=True drains the backlog then stops (test/replay mode);
    False runs continuously."""
    stream = spark.readStream.schema(schema).parquet(landing_dir)
    chunks = _ingest_transform(stream, with_embeddings=with_embeddings)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").partitionBy("court_level").parquet(output_dir)

    writer = chunks.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

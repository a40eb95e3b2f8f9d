"""pdf_parse_vector_db_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of Suyash906/pdf_parse_vector_db.

The reference is a Flask + Milvus + OpenAI service that ingests PDFs into a
single chunk/embedding collection and serves filtered L2 nearest-neighbor
search with win-rate statistics (see /root/reference, SURVEY.md). This
package re-expresses that computation — plus the LLM-data-pipeline
extensions (dedup, similarity search, multimodal columns, text analysis) —
as idiomatic Spark DataFrame plans over Parquet tables, designed for
1000-executor / 100 TB scale but testable on local[*].

Layout:
  session      SparkSession factory with scale-tuned defaults
  schemas      explicit StructTypes for the chunk table and fixtures
  sources/     Parquet table registry, PDF/binary sources
  functions/   column-level functions (vector math, text, hashing, classifiers)
  operators/   multi-op building blocks (chunker, embedder, knn, dedup, ann)
  plans/       end-to-end query plans (ingest, search, relational suite)
  streaming/   Structured Streaming ingest + event-time analytics
"""

__version__ = "0.1.0"

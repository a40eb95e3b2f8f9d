"""Explicit schemas (SURVEY §1.2).

The reference declares its collection schema field-by-field with fixed types
(extract_and_embed_v2.py:44-51); we do the same with StructTypes. The chunk
table mirrors the Milvus `case_files` collection; EMBEDDING_DIM differs (64
vs the reference's 1536, extract_and_embed.py:46) because the driver fixtures
use dim-64 vectors — the dimension is a parameter everywhere, never a
hard-coded literal in operators.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    ByteType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Reference: OpenAI ada-002 is 1536-d (extract_and_embed.py:46); driver
#: fixtures are 64-d. Operators take dim as an argument; this is the default.
EMBEDDING_DIM = 64

#: Closed label domain of the case-decision classifier
#: (extract_and_embed_v2.py:153-159).
DECISION_WON = "appellant_won"
DECISION_LOST = "appellant_lost"
DECISION_INVALID = "invalid"
DECISIONS = [DECISION_WON, DECISION_LOST, DECISION_INVALID]
VALID_DECISIONS = [DECISION_WON, DECISION_LOST]

#: Greedy chunker budget in whitespace tokens (extract_and_embed.py:62).
CHUNK_MAX_TOKENS = 400

#: ANN search shape: over-fetch 100, return 5 (extract_and_search.py:94,100).
SEARCH_FETCH_K = 100
SEARCH_TOP_K = 5

#: Milvus `case_files` collection schema, Spark-typed
#: (extract_and_embed_v2.py:45-51 → SURVEY §1.2 mapping).
CHUNKS_SCHEMA = StructType(
    [
        StructField("chunk_id", LongType(), False),
        StructField("doc_id", LongType(), False),
        StructField("chunk_idx", IntegerType(), False),
        StructField("text", StringType(), True),
        StructField("embedding", ArrayType(FloatType(), False), True),
        StructField("file_name", StringType(), True),
        StructField("file_id", StringType(), True),
        StructField("court_level", ByteType(), True),
        StructField("case_decision", StringType(), True),
    ]
)

#: CHUNKS_SCHEMA as column DDL for CREATE TABLE (sources/catalog.py S5).
#: court_level LAST: Spark DDL requires partition columns to close the list.
CHUNKS_TABLE_COLUMNS_DDL = (
    "chunk_id BIGINT, doc_id BIGINT, chunk_idx INT, text STRING, "
    "embedding ARRAY<FLOAT>, file_name STRING, file_id STRING, "
    "case_decision STRING, court_level TINYINT"
)

#: Output schema of the chunker UDTF (operators/chunker.py) before embedding.
CHUNKED_DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("chunk_idx", IntegerType(), False),
        StructField("text", StringType(), True),
    ]
)

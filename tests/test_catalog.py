"""S4/S5/S6 catalog lifecycle: probe → idempotent create → append → scan
with partition pruning — the engine's create_schema/has_collection/insert
flow (extract_and_embed_v2.py:29-61)."""

from __future__ import annotations

import uuid

import pytest

from pyspark.sql import functions as F

from pdf_parse_vector_db_spark.plans.ingest import build_chunks
from pdf_parse_vector_db_spark.sources import catalog
from tests.conftest import SF_ORACLE


@pytest.fixture()
def table(spark, tmp_path):
    name = f"chunks_{uuid.uuid4().hex[:8]}"
    yield name, str(tmp_path / "tbl")
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_catalog_lifecycle(spark, table):
    name, loc = table
    assert not catalog.has_table(spark, name)
    assert catalog.ensure_chunks_table(spark, name, loc) is True
    # idempotent create-if-not-exists guard (extract_and_embed_v2.py:39-41)
    assert catalog.ensure_chunks_table(spark, name, loc) is False
    assert catalog.has_table(spark, name)
    assert name in catalog.list_tables(spark)

    chunks = build_chunks(spark, SF_ORACLE, with_embeddings=True)
    # insertInto is positional: order columns as the table DDL declares them
    catalog.append_chunks(
        chunks.select(
            "chunk_id", "doc_id", "chunk_idx", "text", "embedding",
            "file_name", "file_id", "case_decision", "court_level",
        ),
        name,
    )
    n = chunks.count()
    assert spark.table(name).count() == n
    # append semantics, not upsert — the reference re-inserts (SURVEY §2.3)
    catalog.append_chunks(
        chunks.select(
            "chunk_id", "doc_id", "chunk_idx", "text", "embedding",
            "file_name", "file_id", "case_decision", "court_level",
        ),
        name,
    )
    assert spark.table(name).count() == 2 * n


def test_partition_pruning_on_catalog_table(spark, table):
    name, loc = table
    catalog.ensure_chunks_table(spark, name, loc)
    chunks = build_chunks(spark, SF_ORACLE, with_embeddings=False).withColumn(
        "embedding", F.lit(None).cast("array<float>")
    )
    catalog.append_chunks(
        chunks.select(
            "chunk_id", "doc_id", "chunk_idx", "text", "embedding",
            "file_name", "file_id", "case_decision", "court_level",
        ),
        name,
    )
    df = spark.table(name).filter(F.col("court_level") == 2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # S3: the equality predicate must prune partitions, not just filter rows
    assert "PartitionFilters: [isnotnull(court_level" in plan, plan
    got = {r.court_level for r in df.select("court_level").distinct().collect()}
    assert got == {2}

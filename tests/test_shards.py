"""Physical shard writer (operators/shards.py): file-size bound, ordering,
and agreement with the logical manifest (plans/mixture.py:training_shards)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_parse_vector_db_spark.operators.shards import (
    shard_manifest,
    write_training_shards,
)
from pdf_parse_vector_db_spark.plans.mixture import training_shards

SF = "/root/testdata/sf0.001"


def test_shard_files_respect_row_bound_and_ordering(spark, tmp_path):
    out = str(tmp_path / "shards")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    write_training_shards(docs, out, shard_size=128)

    manifest = shard_manifest(spark, out).collect()
    assert manifest, "writer produced no files"
    for row in manifest:
        assert row.docs <= 128, f"{row.file} exceeds maxRecordsPerFile"

    # within each (lang, file), doc_ids must be contiguous-ordered on read:
    # sortWithinPartitions wrote them sorted, parquet preserves row order
    per_file = (
        spark.read.parquet(out)
        .select("doc_id", "lang", F.input_file_name().alias("file"))
        .groupBy("file")
        .agg(
            F.expr("collect_list(doc_id)").alias("ids"),
            F.expr("array_sort(collect_list(doc_id))").alias("sorted_ids"),
        )
        .collect()
    )
    for row in per_file:
        assert row.ids == row.sorted_ids, f"{row.file} not doc_id-ordered"


def test_shard_files_partition_prune_by_lang(spark, tmp_path):
    out = str(tmp_path / "shards")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    write_training_shards(docs, out, shard_size=128)

    plan = (
        spark.read.parquet(out)
        .filter(F.col("lang") == "en")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [isnotnull(lang" in plan, plan[:2000]


def test_writer_totals_match_logical_manifest(spark, tmp_path):
    out = str(tmp_path / "shards")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    write_training_shards(docs, out, shard_size=512)

    logical = (
        training_shards(spark, SF)
        .groupBy("lang")
        .agg(F.sum("docs").alias("docs"), F.sum("chars").alias("chars"))
        .collect()
    )
    physical = (
        spark.read.parquet(out)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("docs"), F.sum("n_chars").alias("chars"))
        .collect()
    )
    assert {(r.lang, r.docs, r.chars) for r in logical} == {
        (r.lang, r.docs, r.chars) for r in physical
    }


def test_compact_shards_bin_packs_small_files(spark, tmp_path):
    """Simulate a micro-batch-fragmented shard dir (many tiny appends),
    compact, and assert: far fewer files, every row preserved, doc_id
    ordering within each output file intact."""
    from pyspark.sql import functions as F

    from pdf_parse_vector_db_spark.operators.shards import compact_shards

    frag = str(tmp_path / "frag")
    compacted = str(tmp_path / "compacted")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "n_chars", "lang"
    )
    # 10 tiny appends of 50 docs each, like 10 streaming triggers
    for i in range(10):
        docs.filter((F.col("doc_id") % 10) == i).coalesce(1).write.mode(
            "append"
        ).partitionBy("lang").parquet(frag)

    audit = {r.lang: r for r in compact_shards(spark, frag, compacted, 512).collect()}
    assert audit
    for lang, r in audit.items():
        assert r.files_after <= max(1, -(-r.rows // 512)) + 1, (lang, r)
        assert r.files_after < r.files_before, (lang, r)

    a = sorted(r.doc_id for r in spark.read.parquet(frag).collect())
    b = sorted(r.doc_id for r in spark.read.parquet(compacted).collect())
    assert a == b
    # within-file ordering: each output file's rows are doc_id-sorted
    per_file = (
        spark.read.parquet(compacted)
        .select("doc_id", F.input_file_name().alias("f"))
        .groupBy("f")
        .agg(F.collect_list("doc_id").alias("ids"))
        .collect()
    )
    for r in per_file:
        assert r.ids == sorted(r.ids), r.f

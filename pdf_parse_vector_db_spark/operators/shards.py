"""Physical training-shard writer (north-star X5 extension).

Materialises the corpus as size-bounded parquet shards whose boundaries
match the logical manifest in plans/mixture.py:training_shards: docs are
range-partitioned by (lang, doc_id), sorted within partitions, and written
with ``maxRecordsPerFile`` so every output file holds at most one shard's
worth of consecutive docs per lang.

Scale shape: ``repartitionByRange`` samples the keyspace to build balanced
range bounds (one pass + one exchange), the sort is partition-local, and
the writer streams — no stage holds a shard in memory. At 100 TB this is
the standard layout pass before a training job: downstream readers get
lang-clustered, doc_id-ordered files they can range-prune.

No reference citation: the reference (a Flask/Milvus service) has no bulk
writer; this is the driver-mandated pipeline extension (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SHARD_SIZE = 512


def write_training_shards(
    docs: DataFrame,
    out_dir: str,
    shard_size: int = SHARD_SIZE,
    num_ranges: int = 8,
) -> None:
    """Write `docs` as lang-partitioned, doc_id-ordered parquet shards of at
    most `shard_size` rows per file.

    partitionBy("lang") gives directory-level partition pruning;
    repartitionByRange + sortWithinPartitions gives doc_id clustering
    INSIDE each file so a reader's doc_id range predicate maps to whole
    files; maxRecordsPerFile enforces the shard row bound without a
    per-shard shuffle (the writer splits files as it streams).
    """
    (
        docs.repartitionByRange(num_ranges, "lang", "doc_id")
        .sortWithinPartitions("lang", "doc_id")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", shard_size)
        .partitionBy("lang")
        .parquet(out_dir)
    )


def compact_shards(
    spark,
    shard_dir: str,
    out_dir: str,
    target_rows_per_file: int = SHARD_SIZE,
) -> DataFrame:
    """OPTIMIZE-style bin-packing compaction: rewrite a shard directory so
    each (lang) partition holds ceil(rows / target) files of ~target rows,
    doc_id order preserved — the small-files maintenance job every
    streaming/incremental writer needs (each micro-batch append creates
    per-trigger files; a million 10 KB files kills both the driver's file
    listing and scan throughput at 100 TB).

    Shape: one scan + ONE range exchange keyed (lang, doc_id) — identical
    to the initial layout pass, so compaction cost equals a rewrite of the
    touched partitions, never a per-file loop. Returns the before/after
    file accounting per lang so callers can assert the compaction ratio.
    Production refinement: filter to partitions whose file count exceeds
    the target before rewriting (partition pruning makes the scan touch
    only those), and swap directories atomically at the catalog layer.
    """
    before = (
        spark.read.parquet(shard_dir)
        .select("lang", F.input_file_name().alias("file"))
        .groupBy("lang")
        .agg(F.countDistinct("file").alias("files_before"), F.count(F.lit(1)).alias("rows"))
    )
    docs = spark.read.parquet(shard_dir)
    n_rows = docs.count()
    num_ranges = max(1, -(-n_rows // target_rows_per_file))
    (
        docs.repartitionByRange(num_ranges, "lang", "doc_id")
        .sortWithinPartitions("lang", "doc_id")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", target_rows_per_file)
        .partitionBy("lang")
        .parquet(out_dir)
    )
    after = (
        spark.read.parquet(out_dir)
        .select("lang", F.input_file_name().alias("file"))
        .groupBy("lang")
        .agg(F.countDistinct("file").alias("files_after"))
    )
    return before.join(after, on="lang").orderBy("lang")


def shard_manifest(spark, out_dir: str) -> DataFrame:
    """Read back the written shards' per-file accounting (file, lang, rows,
    doc_id span) — the physical twin of plans/mixture.py:training_shards.
    Uses the parquet scan's input_file_name, so it is itself a distributed
    scan, not a driver-side directory walk."""
    return (
        spark.read.parquet(out_dir)
        .select("doc_id", "n_chars", "lang", F.input_file_name().alias("file"))
        .groupBy("lang", "file")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )

"""Streaming incremental dedup (SURVEY §2.9 T4 [ext] × north-star X1/X2).

The batch operator (plans/curation.incremental_dedup) probes an incoming
batch's MinHash band keys against the historical corpus; this module is its
Structured Streaming twin: a landing directory of new documents drained via
foreachBatch, each micro-batch probed against a PERSISTED history band
table, flagged docs dropped, survivors appended to the corpus AND their
band keys appended to the history table — so the index grows with the
corpus and later batches dedup against everything that came before,
including earlier batches.

foreachBatch (not a stateful operator) is the right Spark shape here: the
dedup state is corpus-sized — far beyond executor state stores — and
already has a natural home as a bucketed table on storage. State-store
operators (dropDuplicatesWithinWatermark, transformWithState) cover the
bounded-window tiers (streaming/windows.dedup_events); this module covers
the unbounded exact/near tier the way a 100 TB pipeline actually runs it:
band table on disk, batch-sized probe join per trigger, checkpointed
file-source replay for exactly-once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from pdf_parse_vector_db_spark.functions.text import shingles_expr
from pdf_parse_vector_db_spark.operators.dedup import (
    jaccard_expr,
    minhash_portable_banded,
)

_DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def _near_dup_ids(
    batch_df: DataFrame,
    history_bands: DataFrame,
    history_docs: DataFrame,
    threshold: float,
    banded: DataFrame | None = None,
) -> DataFrame:
    """doc_ids in `batch_df` whose verified Jaccard vs any historical doc
    meets the threshold. Probe join is batch-sized on the left; exact
    verification touches only band-colliding candidates.

    `banded` (optional): the batch's already-computed band table — passed
    by stream_dedup_ingest so the md5-per-shingle signature fold runs once
    per micro-batch instead of once for the probe and once for the band
    sink (round-10 optimization, guide §1.2 "don't compute things twice")."""
    nb = (banded if banded is not None else minhash_portable_banded(batch_df)).withColumnRenamed(
        "__id", "new_id"
    )
    cands = (
        nb.join(history_bands, on=["band_idx", "key"])
        .select("new_id", "hist_id")
        .distinct()
    )
    nsh = batch_df.select(F.col("doc_id").alias("new_id"), shingles_expr("text").alias("sh_n"))
    hsh = history_docs.select(
        F.col("doc_id").alias("hist_id"), shingles_expr("text").alias("sh_h")
    )
    return (
        cands.join(nsh, on="new_id")
        .join(hsh, on="hist_id")
        .filter(F.round(jaccard_expr(F.col("sh_n"), F.col("sh_h")), 6) >= threshold)
        .select(F.col("new_id").alias("doc_id"))
        .distinct()
    )


def stream_dedup_ingest(
    spark: SparkSession,
    landing_dir: str,
    corpus_dir: str,
    bands_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    available_now: bool = True,
) -> StreamingQuery:
    """readStream(landing parquet) → probe history bands → drop near-dups →
    append survivors to the corpus and their band keys to the band table.

    Both sinks append within one foreachBatch call; the checkpoint makes
    file-source replay idempotent at the batch level (the same batch never
    reprocesses after a successful commit). At scale the band table is
    written bucketed by `key` so the probe join co-locates without a
    shuffle of history."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        import os

        batch_df = batch_df.persist()
        # ONE signature pass per micro-batch: the banded frame serves both
        # the history probe and (filtered to survivors) the band-table
        # sink — the old shape folded every shingle through md5 twice
        banded = minhash_portable_banded(batch_df).persist()
        spark_b = batch_df.sparkSession
        have_history = os.path.isdir(bands_dir) and any(
            f.endswith(".parquet") for f in os.listdir(bands_dir)
        )
        if have_history:
            bands = spark_b.read.parquet(bands_dir).select(
                F.col("__id").alias("hist_id"), "band_idx", "key"
            )
            hist_docs = spark_b.read.parquet(corpus_dir)
            dup_ids = _near_dup_ids(
                batch_df, bands, hist_docs, threshold, banded=banded
            )
            survivors = batch_df.join(dup_ids, on="doc_id", how="left_anti")
        else:
            # first batch: nothing to probe, but still dedup WITHIN the batch
            # (keep lowest id per band-verified pair) via the exact fingerprint
            from pdf_parse_vector_db_spark.operators.dedup import exact_dedup

            survivors = exact_dedup(batch_df)
        survivors = survivors.persist()
        survivors.write.mode("append").parquet(corpus_dir)
        banded.join(
            survivors.select(F.col("doc_id").alias("__id")), on="__id", how="left_semi"
        ).write.mode("append").parquet(bands_dir)
        survivors.unpersist()
        banded.unpersist()
        batch_df.unpersist()

    stream = spark.readStream.schema(_DOC_SCHEMA).parquet(landing_dir)
    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

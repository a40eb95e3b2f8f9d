"""IVF index as a STORAGE LAYOUT: cell-partitioned parquet + pruned probe.

The reference's vector store is a Milvus IVF_FLAT collection
(extract_and_embed.py:53-58): vectors are assigned to nlist coarse cells
at insert time and a query scans only its nprobe nearest cells. The
engine's query-time IVF (plans/similarity.ivf_knn) folds the assignment
into each query; its docstring has promised since round 3 that "at real
scale the assignment is written once at ingest and cluster_id becomes a
Parquet partition key, making the IN (probe cells) filter partition
pruning". This module makes that claim true in code — the Spark-native
analog of the Milvus index file:

  * build_ivf_index      — assign once, write partitionBy("cluster_id").
    With nlist ∝ √N cells, partitions stay both few (listing cost) and
    fat (scan efficiency) at any corpus size.
  * probe_cells          — nprobe nearest cell ids for a query vector; a
    driver-side bootstrap of nprobe ints (like the 1-row query-vector
    collects), so the cell filter is a LITERAL IN — static partition
    pruning, visible as PartitionFilters in the scan, no dynamic-filter
    machinery needed.
  * search_ivf_index     — read only the probed partitions, exact rerank.
  * stream-ingest twin   — streaming/ann_stream.stream_ingest_ivf drains
    a landing dir through the same FROZEN quantizer (standard IVF
    practice: the coarse quantizer is trained once; inserts only assign)
    and appends to the same partition layout.

All assignment/probe arithmetic reuses the pinned quantizer's integer
(distance-micros, cid) argmin pack so the end-to-end answer stays
hash-identical to plans/similarity.ivf_knn and its DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_parse_vector_db_spark.functions.vector import l2_distance

#: (distance-micros, cid) BIGINT argmin pack base — must match
#: plans/similarity._IVF_KEY_BASE (the seeds carry a raise_error guard
#: against cid overflow, so a drift here fails loudly, not silently).
KEY_BASE = 10_000_000


def _key(vec, cvec, cid):
    return F.round(l2_distance(vec, cvec) * 1e6).cast("bigint") * KEY_BASE + cid


def assign_cells(emb: DataFrame, seeds: DataFrame) -> DataFrame:
    """Input rows + their coarse cell: broadcast nested-loop argmin folded
    into one MIN aggregate per vector (seeds are ~√N rows). Shared by the
    batch index build and the streaming ingest path — one definition, so
    batch and stream cannot disagree on the layout."""
    assign = (
        emb.crossJoin(F.broadcast(seeds))
        .groupBy("vec_id")
        .agg(F.min(_key(F.col("embedding"), F.col("cvec"), F.col("cid"))).alias("ak"))
        .select("vec_id", (F.col("ak") % KEY_BASE).alias("cluster_id"))
    )
    return emb.join(assign, on="vec_id")


def build_ivf_index(emb: DataFrame, seeds: DataFrame, path: str) -> None:
    """Assign once, write cell-partitioned — the insert-time work Milvus
    does per segment. Overwrite semantics: rebuilding an index is
    idempotent."""
    assign_cells(emb, seeds).write.mode("overwrite").partitionBy("cluster_id").parquet(
        path
    )


def probe_cells(seeds: DataFrame, q: DataFrame, nprobe: int) -> list[int]:
    """nprobe nearest cell ids for the (1-row) query vector `q(qvec)`.
    Driver-side bootstrap of nprobe ints — the query-plan equivalent of
    binding nprobe at session level, which is what makes the partition
    filter static."""
    rows = (
        seeds.crossJoin(F.broadcast(q))
        .select("cid", _key(F.col("cvec"), F.col("qvec"), F.col("cid")).alias("k"))
        .orderBy("k")
        .limit(nprobe)
        .collect()
    )
    return [int(r["cid"]) for r in rows]


def compact_ivf_index(
    spark: SparkSession, path: str, max_files_per_cell: int = 4
) -> int:
    """Rewrite cells fragmented by streaming appends (one file per
    micro-batch per cell) into one file each — the Milvus segment-merge
    analog, and the standard cure for the small-file problem a
    foreachBatch append accumulates at scale. Only cells OVER the budget
    are rewritten (an idle index compacts to a no-op). Each cell rewrites
    through a temp subtree + checked rename swap (the SCD2 publish
    protocol, streaming/scd2_stream.checked_rename) on the Hadoop
    FileSystem API, so it works on HDFS/object stores and a crash at any
    point leaves the cell readable from either the old or new subtree.
    Returns the number of cells rewritten."""
    from pdf_parse_vector_db_spark.streaming.scd2_stream import checked_rename

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    root_p = jvm.org.apache.hadoop.fs.Path(path)
    fs = root_p.getFileSystem(conf)
    # recover from a crash in a PRIOR compaction: a cell stranded with
    # only its __old subtree is restored; a leftover __old beside a live
    # cell (crash after the second rename, before the delete) is dropped;
    # orphan __tmp subtrees are always dropped (incomplete rewrites).
    for st in (
        fs.globStatus(jvm.org.apache.hadoop.fs.Path(path + "/cluster_id=*__old")) or []
    ):
        old_p = st.getPath()
        live = jvm.org.apache.hadoop.fs.Path(str(old_p).removesuffix("__old"))
        if fs.exists(live):
            fs.delete(old_p, True)
        else:
            checked_rename(fs, old_p, live)
    for st in (
        fs.globStatus(jvm.org.apache.hadoop.fs.Path(path + "/cluster_id=*__tmp")) or []
    ):
        fs.delete(st.getPath(), True)

    frag = (
        spark.read.parquet(path)
        .select("cluster_id", F.input_file_name().alias("f"))
        .groupBy("cluster_id")
        .agg(F.countDistinct("f").alias("nf"))
        .filter(F.col("nf") > max_files_per_cell)
        .collect()
    )
    for row in frag:
        cell_dir = f"{path}/cluster_id={int(row['cluster_id'])}"
        tmp_dir = cell_dir + "__tmp"
        old_dir = cell_dir + "__old"
        (
            spark.read.parquet(cell_dir)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp_dir)  # _SUCCESS markers are underscore-prefixed → ignored by readers
        )
        cell_p = jvm.org.apache.hadoop.fs.Path(cell_dir)
        tmp_p = jvm.org.apache.hadoop.fs.Path(tmp_dir)
        old_p = jvm.org.apache.hadoop.fs.Path(old_dir)
        checked_rename(fs, cell_p, old_p)
        checked_rename(fs, tmp_p, cell_p)
        fs.delete(old_p, True)
    return len(frag)


def delete_from_ivf_index(spark: SparkSession, path: str, vec_ids: list[int]) -> int:
    """Hard-delete vectors (the GDPR erasure path, plans/privacy's
    gdpr_delete_audit applied to the index): only cells CONTAINING a
    victim are rewritten — at nlist ∝ √N cells the blast radius of a
    deletion batch is ~len(vec_ids) cells out of √N, everything else is
    untouched metadata-only. Each rewrite goes through the same
    temp-write + checked-rename swap as compaction (crash leaves the cell
    readable; a replayed delete of an absent id is a no-op). Returns the
    number of cells rewritten."""
    from pdf_parse_vector_db_spark.streaming.scd2_stream import checked_rename

    hit = (
        spark.read.parquet(path)
        .filter(F.col("vec_id").isin([int(v) for v in vec_ids]))
        .select("cluster_id")
        .distinct()
        .collect()
    )
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    for row in hit:
        cell_dir = f"{path}/cluster_id={int(row['cluster_id'])}"
        tmp_dir = cell_dir + "__tmp"
        old_dir = cell_dir + "__old"
        (
            spark.read.parquet(cell_dir)
            .filter(~F.col("vec_id").isin([int(v) for v in vec_ids]))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp_dir)
        )
        cell_p = jvm.org.apache.hadoop.fs.Path(cell_dir)
        tmp_p = jvm.org.apache.hadoop.fs.Path(tmp_dir)
        old_p = jvm.org.apache.hadoop.fs.Path(old_dir)
        fs = cell_p.getFileSystem(conf)
        checked_rename(fs, cell_p, old_p)
        checked_rename(fs, tmp_p, cell_p)
        fs.delete(old_p, True)
    return len(hit)


def search_ivf_index(
    spark: SparkSession, path: str, q: DataFrame, cids: list[int], k: int = 5
) -> DataFrame:
    """Exact rerank over ONLY the probed partitions. The literal IN on the
    partition column reaches the scan as PartitionFilters (pinned in
    tests/test_ivf_index.py): non-probed cells are never listed, read, or
    decoded — the 100 TB property an in-query IVF cannot have."""
    idx = spark.read.parquet(path).filter(F.col("cluster_id").isin(cids))
    return (
        idx.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(l2_distance(F.col("embedding"), F.col("qvec")), 6).alias("d"),
        )
        .orderBy("d", "vec_id")
        .limit(k)
        .select("vec_id", "label", F.round(F.col("d"), 4).alias("score"))
    )

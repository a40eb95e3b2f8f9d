"""Streaming SCD Type-2 apply (SURVEY §2.9 T4 [ext] × X30).

The batch operator (plans/advanced.scd2_customer_history) merges one change
batch into a dimension; this module is the Structured Streaming twin: a
landing directory of CDC change rows drained via foreachBatch, each
micro-batch MERGEd into the persisted dimension — close the current version
of every changed key, open the successor, insert brand-new keys, and leave
closed history untouched. This is the standing CDC-apply loop every
lakehouse dimension runs (Delta/Iceberg MERGE INTO per trigger).

foreachBatch (not a stateful operator) is the right shape: the dimension is
table-sized state with a natural home on storage, and MERGE wants the
engine's join machinery, not a state store. The merge itself is IDEMPOTENT
per change row — re-applying a change whose attributes already match the
current version produces no new version — so batch replay after a failed
commit converges (the same exactly-once posture as dedup_stream, with
row-level convergence on top of checkpointed file-source replay).

Scale note: the demo rewrites the whole (small) dimension per trigger; a
production MERGE rewrites only the files holding changed keys. The merge
PLAN — one current-slice × batch full-outer join, history passed through —
is identical either way; only the writer granularity differs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

#: dimension schema: key + versioned attributes + validity bookkeeping
DIM_COLS = ("c_custkey", "segment", "acctbal_cents", "version", "valid_from", "valid_to", "is_current")


def checked_rename(fs, src, dst) -> None:
    """Hadoop ``FileSystem.rename`` signals failure by returning FALSE, not
    raising (e.g. dst already exists on HDFS, src vanished, cross-volume).
    An unchecked false in the atomic-publish swap could publish a stale
    dimension while the streaming checkpoint still commits the batch —
    exactly the silent-loss class the protocol exists to eliminate. Raise
    so the micro-batch fails and checkpoint replay retries."""
    if not fs.rename(src, dst):
        raise IOError(f"FileSystem.rename returned false: {src} -> {dst}")
_CHANGE_SCHEMA = "c_custkey bigint, segment string, acctbal_cents bigint, eff_date date"


def scd2_merge(dim: DataFrame, changes: DataFrame) -> DataFrame:
    """One SCD2 MERGE step: returns the post-merge dimension.

    `dim` rows: DIM_COLS. `changes` rows: (c_custkey, segment,
    acctbal_cents, eff_date). Closed history passes through untouched;
    the current slice full-outer-joins the batch; a change equal to the
    current attributes is a no-op (idempotent re-apply)."""
    cur = dim.filter(F.col("is_current"))
    hist = dim.filter(~F.col("is_current"))
    j = cur.alias("d").join(changes.alias("b"), on="c_custkey", how="full_outer")
    changed = (
        F.col("d.segment").isNotNull()
        & F.col("b.segment").isNotNull()
        & (
            (F.col("b.segment") != F.col("d.segment"))
            | (F.col("b.acctbal_cents") != F.col("d.acctbal_cents"))
        )
    )
    survivors = j.filter(F.col("d.segment").isNotNull()).select(
        "c_custkey",
        F.col("d.segment").alias("segment"),
        F.col("d.acctbal_cents").alias("acctbal_cents"),
        F.col("d.version").alias("version"),
        F.col("d.valid_from").alias("valid_from"),
        F.when(changed, F.col("b.eff_date")).otherwise(F.col("d.valid_to")).alias("valid_to"),
        F.when(changed, F.lit(False)).otherwise(F.col("d.is_current")).alias("is_current"),
    )
    openers = j.filter(
        changed | (F.col("d.segment").isNull() & F.col("b.segment").isNotNull())
    ).select(
        "c_custkey",
        F.col("b.segment").alias("segment"),
        F.col("b.acctbal_cents").alias("acctbal_cents"),
        F.coalesce(F.col("d.version") + 1, F.lit(1)).alias("version"),
        F.col("b.eff_date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return hist.select(*DIM_COLS).unionByName(survivors).unionByName(openers)


def stream_scd2_apply(
    spark: SparkSession,
    changes_dir: str,
    dim_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """readStream(changes parquet) → foreachBatch SCD2 MERGE into the
    dimension at `dim_dir` (created empty-initialized if absent)."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        # Crash-safe publish protocol. mode('overwrite') straight onto
        # dim_dir is NOT atomic: a crash after Spark deletes the dir but
        # before the new files commit leaves dim_dir absent, so the replay
        # would empty-initialize and silently discard all SCD2 history; a
        # crash mid-write leaves a dir with only _temporary, failing every
        # replay. Instead: write to <dim>__tmp, swap via two renames with a
        # <dim>__bak fallback — at every crash point either dim_dir or the
        # backup holds a complete pre/post-batch dimension, and scd2_merge
        # is idempotent (re-applying a batch over its own result changes
        # nothing), so checkpoint replay always recovers.
        jvm = sess._jvm
        conf = sess._jsc.hadoopConfiguration()
        dim_path = jvm.org.apache.hadoop.fs.Path(dim_dir)
        tmp_path = jvm.org.apache.hadoop.fs.Path(dim_dir + "__tmp")
        bak_path = jvm.org.apache.hadoop.fs.Path(dim_dir + "__bak")
        fs = dim_path.getFileSystem(conf)

        def _rename(src, dst):
            checked_rename(fs, src, dst)

        if fs.exists(tmp_path):  # leftover from a crash mid-write: discard
            fs.delete(tmp_path, True)
        if fs.exists(dim_path):
            dim = sess.read.parquet(dim_dir)
        elif fs.exists(bak_path):  # crashed between the two renames: restore
            _rename(bak_path, dim_path)
            dim = sess.read.parquet(dim_dir)
        else:
            # Empty-initialize ONLY when the dimension genuinely doesn't
            # exist yet (first trigger). Any other read failure —
            # corruption, a transient FS/permission error, a concurrent
            # writer — must fail the micro-batch so checkpoint replay
            # retries it; a bare try/except here would silently discard
            # all accumulated history.
            dim = sess.createDataFrame(
                [],
                "c_custkey bigint, segment string, acctbal_cents bigint, "
                "version int, valid_from date, valid_to date, is_current boolean",
            )
        merged = scd2_merge(dim, batch_df).localCheckpoint()
        merged.write.mode("overwrite").parquet(dim_dir + "__tmp")
        if fs.exists(bak_path):
            fs.delete(bak_path, True)
        if fs.exists(dim_path):
            _rename(dim_path, bak_path)
        _rename(tmp_path, dim_path)
        fs.delete(bak_path, True)

    reader = spark.readStream.schema(_CHANGE_SCHEMA).parquet(changes_dir)
    writer = reader.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

"""WebDataset-style tar-shard I/O (X60): the container format large
multimodal training pipelines actually ship.

A WebDataset corpus is a directory of tar shards; each SAMPLE is a group
of adjacent members sharing a basename key — ``000123.jpg`` +
``000123.txt`` + ``000123.json`` is one sample with three fields. The
format wins at 100 TB because a shard is one sequential read (object
stores and spinning disks both love it) and the unit of parallelism is
the shard, not the file.

Spark-first mapping (all stdlib — ``tarfile`` — plus the binaryFile
source):

  * ``read_tar_shards``  — binaryFile scan of ``*.tar`` (one shard = one
    input row = one task) exploded member-wise by an Arrow-batched
    ``mapInPandas``: (shard, key, ext, content, n_bytes) rows. The
    driver never touches payload bytes; a shard's decode cost rides the
    executor that read it.
  * ``group_samples``    — members → one row per sample with an
    ext→content map (``map_from_entries``), the shape a training
    pipeline's decode stage consumes; one exchange keyed (shard, key).
  * ``write_tar_shards`` — (key, ext, content) rows → ``n_shards`` tar
    files via ``applyInPandas`` on a hash-of-key shard assignment;
    members are written in sorted (key, ext) order with fixed mtime=0,
    so shard bytes are DETERMINISTIC given the row set — re-running a
    write produces byte-identical shards (the property that makes shard
    publishing idempotent under retries). Shard payloads are ASSEMBLED
    on executors but PERSISTED by the driver through the Hadoop
    FileSystem API (the same path ``manifest.py`` commits through), so
    shards land on the shared filesystem / object store — never
    scattered across executor-local disks on a multi-node cluster.
    Driver memory is bounded to ONE shard at a time
    (``toLocalIterator``); publish throughput is PUT-bound, which is
    WebDataset's own single-writer-per-shard posture.

Size note: one shard is materialized in executor memory both ways
(binaryFile row / tar buffer) — exactly WebDataset's own contract, which
is why shards are sized 100 MB–1 GB, far under an executor's budget.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEMBER_SCHEMA = "shard string, key string, ext string, content binary, n_bytes long"


def read_tar_shards(spark: SparkSession, path_glob: str) -> DataFrame:
    """Explode every tar shard matching `path_glob` into member rows.
    The WebDataset key is the member basename up to the FIRST dot, the
    ext everything after it (so ``x.seg.png`` keys as ``x``/``seg.png``);
    non-file members (dirs, links) are skipped."""
    shards = spark.read.format("binaryFile").load(path_glob)

    def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import os
        import tarfile

        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                with tarfile.open(fileobj=io.BytesIO(bytes(rec.content))) as tf:
                    for m in tf.getmembers():
                        if not m.isfile():
                            continue
                        base = os.path.basename(m.name)
                        key, _, ext = base.partition(".")
                        data = tf.extractfile(m).read()
                        rows.append(
                            {
                                "shard": os.path.basename(rec.path),
                                "key": key,
                                "ext": ext,
                                "content": bytearray(data),
                                "n_bytes": len(data),
                            }
                        )
            yield pd.DataFrame(
                rows, columns=["shard", "key", "ext", "content", "n_bytes"]
            )

    return shards.select("path", "content").mapInPandas(explode, MEMBER_SCHEMA)


def group_samples(members: DataFrame) -> DataFrame:
    """Member rows → one row per SAMPLE: (shard, key, fields map<ext,
    binary>, n_fields). One exchange keyed (shard, key) — samples never
    straddle shards in WebDataset, so the key is already co-located with
    its shard's scan task before the exchange."""
    return (
        members.groupBy("shard", "key")
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("ext", "content")))
            ).alias("fields"),
            F.count(F.lit(1)).alias("n_fields"),
        )
    )


def write_tar_shards(
    df: DataFrame, out_dir: str, n_shards: int = 8
) -> DataFrame:
    """(key, ext, content) rows → `n_shards` deterministic tar shards
    under `out_dir`; returns the shard manifest (shard, n_members,
    n_bytes). Assignment is hash-of-key so a sample's members land in
    ONE shard whatever partition they arrive from; members are written
    sorted with zeroed mtimes, so shard bytes are a pure function of the
    row set (idempotent republish).

    Shard tar payloads are assembled in the executors' ``applyInPandas``
    tasks and streamed back one shard at a time (``toLocalIterator``);
    the driver persists each through the Hadoop FileSystem API so the
    write works on ANY Spark deployment (local, HDFS, object store) —
    an executor-side ``open()`` would scatter shards across worker-local
    disks on a real cluster while the manifest reported success."""
    from .manifest import _jpath, _jvm_fs

    spark = df.sparkSession
    assigned = df.withColumn(
        "_shard_id", F.pmod(F.xxhash64(F.col("key")), F.lit(n_shards)).cast("int")
    )

    def build_shard(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        import io
        import tarfile

        sid = int(key[0])
        rows = sorted(
            (str(r.key), str(r.ext), bytes(r.content))
            for r in pdf.itertuples(index=False)
        )
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tf:
            for k, ext, data in rows:
                info = tarfile.TarInfo(name=f"{k}.{ext}")
                info.size = len(data)
                info.mtime = 0
                tf.addfile(info, io.BytesIO(data))
        payload = buf.getvalue()
        return pd.DataFrame(
            {
                "shard": [f"shard-{sid:05d}.tar"],
                "n_members": [len(rows)],
                "n_bytes": [len(payload)],
                "payload": [bytearray(payload)],
            }
        )

    built = assigned.groupBy("_shard_id").applyInPandas(
        build_shard, "shard string, n_members long, n_bytes long, payload binary"
    )

    jvm, fs = _jvm_fs(spark, out_dir)
    fs.mkdirs(_jpath(jvm, out_dir))
    manifest_rows = []
    for row in built.toLocalIterator():  # ONE shard in driver memory at a time
        out = fs.create(_jpath(jvm, f"{out_dir}/{row.shard}"), True)
        try:
            out.write(bytes(row.payload))
        finally:
            out.close()
        manifest_rows.append((row.shard, row.n_members, row.n_bytes))
    return spark.createDataFrame(
        manifest_rows, "shard string, n_members long, n_bytes long"
    )

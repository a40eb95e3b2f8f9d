"""manifest_feed Structured Streaming source (X50, sources/feed_source.py).

Pins the properties that make it a real streaming source: stream ==
snapshot on bootstrap, exactly-once delta delivery across RESTARTS
(Spark's offset log + version offsets), compaction transparency under
ignoreReplaces, and a loud failure without it.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pdf_parse_vector_db_spark.sources import manifest as M
from pdf_parse_vector_db_spark.sources.feed_source import ManifestFeedDataSource


def _df(spark, lo, hi, level=3):
    return spark.range(lo, hi).select("id", F.lit(level).alias("court_level"))


def _drain(spark, table, ckpt):
    """Run one availableNow pass of the feed; return the batches' id lists."""
    got: list[list[int]] = []
    q = (
        spark.readStream.format("manifest_feed")
        .option("table", table)
        .load()
        .writeStream.foreachBatch(
            lambda b, i: got.append(sorted(r.id for r in b.collect()))
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return got


@pytest.fixture(autouse=True)
def _register(spark):
    spark.dataSource.register(ManifestFeedDataSource)


def test_bootstrap_equals_snapshot_then_deltas_survive_restart(spark, tmp_path):
    t = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    M.commit_append(spark, t, _df(spark, 0, 10), partition_by=("court_level",))
    M.commit_append(spark, t, _df(spark, 10, 15, level=4), partition_by=("court_level",))

    got = _drain(spark, t, ckpt)
    assert sorted(x for b in got for x in b) == list(range(15))  # == snapshot
    # the hive partition column came through the arrow scan
    sdf = spark.readStream.format("manifest_feed").option("table", t).load()
    assert set(sdf.columns) == {"id", "court_level"}

    # restart the stream on the SAME checkpoint after two more commits:
    # only the delta arrives, once
    M.commit_append(spark, t, _df(spark, 15, 18), partition_by=("court_level",))
    M.commit_append(spark, t, _df(spark, 18, 20), partition_by=("court_level",))
    got2 = _drain(spark, t, ckpt)
    assert sorted(x for b in got2 for x in b) == list(range(15, 20))
    # nothing new -> an empty pass, never a replay
    got3 = _drain(spark, t, ckpt)
    assert sorted(x for b in got3 for x in b) == []


def test_compaction_is_invisible_under_ignore_replaces(spark, tmp_path):
    t = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    M.commit_append(spark, t, _df(spark, 0, 10))
    assert sorted(x for b in _drain(spark, t, ckpt) for x in b) == list(range(10))

    # compact (replace) + append while the stream is down
    commits = M._read_manifest(spark, t, 1)["commits"]
    M.commit_replace(spark, t, M.snapshot(spark, t)[1], drop_commits=commits)
    M.commit_append(spark, t, _df(spark, 10, 12))
    got = _drain(spark, t, ckpt)
    # the rewrite's rows are NOT re-delivered; the append is
    assert sorted(x for b in got for x in b) == [10, 11]


def test_replace_fails_loudly_without_ignore_replaces(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.commit_append(spark, t, _df(spark, 0, 10))
    commits = M._read_manifest(spark, t, 1)["commits"]
    M.commit_replace(spark, t, M.snapshot(spark, t)[1], drop_commits=commits)
    q = (
        spark.readStream.format("manifest_feed")
        .option("table", t)
        .option("ignoreReplaces", "false")
        .load()
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="replace-commit"):
        q.awaitTermination(180)


def test_empty_table_schema_inference_refuses(spark, tmp_path):
    with pytest.raises(Exception, match="at least one commit"):
        (
            spark.readStream.format("manifest_feed")
            .option("table", str(tmp_path / "never"))
            .load()
        )

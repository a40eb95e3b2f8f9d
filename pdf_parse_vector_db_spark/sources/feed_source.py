"""Structured Streaming source over the manifest change feed (X50).

``spark.readStream.format("manifest_feed").option("table", path)`` turns
the manifest-committed table (sources/manifest.py) into a first-class
streaming source via Spark 4's Python DataSource API — the engine-native
analog of reading a Delta table as a stream:

  * OFFSETS are manifest versions (the same int cursor
    ``manifest.table_changes`` uses), so Spark's offset log gives
    exactly-once delivery across restarts for free;
  * ``partitions(start, end)`` diffs the manifests in the window on the
    driver (tiny JSON reads) and emits one InputPartition PER ADDED
    COMMIT DIR — the actual column data is read on EXECUTORS with
    pyarrow (hive-partitioned dataset scan, yielded as Arrow
    RecordBatches, zero row-at-a-time Python);
  * replace-commits (compaction/erasure rewrites) are NOT new rows:
    skipped under ``ignoreReplaces`` (default true, Delta's
    ignoreChanges), else the batch fails loudly.

Scale notes: the driver never touches data bytes — it reads two JSON
manifests per trigger; each commit dir scans in parallel across
executors. Partition granularity is one commit dir (micro-batch commits
are file-sized by construction); splitting per parquet file inside a
commit is a listing-only change in ``partitions``. This module reads
``file:`` tables with the standard library + pyarrow — object stores
plug in through ``pyarrow.fs.FileSystem.from_uri`` with no protocol
change (the manifest layer never renames).
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

_MANIFESTS = "_manifests"


def _local(path: str) -> str:
    return path[5:] if path.startswith("file:") else path


def _head_version(table: str) -> int:
    best = 0
    for p in glob.glob(os.path.join(_local(table), _MANIFESTS, "v*.json")):
        best = max(best, int(os.path.basename(p)[1:-5]))
    return best


def _read_manifest(table: str, version: int) -> dict:
    with open(os.path.join(_local(table), _MANIFESTS, f"v{version}.json"), "rb") as f:
        return json.loads(f.read().decode("utf-8"))


class _CommitSlice(InputPartition):
    def __init__(self, commit_path: str):
        self.commit_path = commit_path


class ManifestFeedStreamReader(DataSourceStreamReader):
    def __init__(self, schema, options):
        self.table = options["table"]
        self.start_version = int(options.get("startingversion", 0))
        self.ignore_replaces = (
            str(options.get("ignorereplaces", "true")).lower() == "true"
        )
        self.schema = schema

    def initialOffset(self) -> dict:
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        return {"version": _head_version(self.table)}

    def partitions(self, start: dict, end: dict):
        prev = (
            _read_manifest(self.table, start["version"])["commits"]
            if start["version"]
            else []
        )
        added: list[str] = []
        for v in range(start["version"] + 1, end["version"] + 1):
            cur = _read_manifest(self.table, v)["commits"]
            dropped = [c for c in prev if c not in cur]
            if dropped and not self.ignore_replaces:
                raise IOError(
                    f"v{v} is a replace-commit (drops {dropped}); set "
                    "ignoreReplaces=true to stream past rewrites"
                )
            if not dropped:
                added.extend(c for c in cur if c not in prev)
            prev = cur
        return [
            _CommitSlice(os.path.join(_local(self.table), c)) for c in added
        ] or [_CommitSlice("")]  # Spark requires >=1 partition per batch

    def read(self, partition: _CommitSlice):
        if not partition.commit_path:
            return iter(())
        import pyarrow.dataset as pads

        dataset = pads.dataset(partition.commit_path, partitioning="hive")
        scanner = dataset.scanner(columns=[f.name for f in self.schema.fields])
        return scanner.to_batches()

    def commit(self, end: dict) -> None:
        pass  # offsets live in Spark's checkpoint; nothing to release


class ManifestFeedDataSource(DataSource):
    """``format("manifest_feed")`` — register once per session:
    ``spark.dataSource.register(ManifestFeedDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "manifest_feed"

    def schema(self):
        # infer from the head snapshot's first commit via pyarrow (hive
        # partition columns included), converted through the same arrow->
        # Spark mapping the Pandas interop uses
        import pyarrow.dataset as pads

        from pyspark.sql.pandas.types import from_arrow_schema

        table = self.options["table"]
        head = _head_version(table)
        if head == 0:
            raise ValueError(
                f"manifest_feed needs at least one commit to infer a schema "
                f"(empty table: {table}); or pass an explicit .schema(...)"
            )
        commits = _read_manifest(table, head)["commits"]
        ds = pads.dataset(os.path.join(_local(table), commits[0]), partitioning="hive")
        return from_arrow_schema(ds.schema)

    def streamReader(self, schema):
        return ManifestFeedStreamReader(schema, self.options)

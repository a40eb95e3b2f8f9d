"""JSON-lines / CSV source adapters (SURVEY §2.1 source breadth).

The reference ingests only PDF uploads; an analytics engine that replaces it
needs the interchange formats a data platform actually receives. Both
readers take an EXPLICIT schema — schema inference is a full extra pass over
the data (fatal at 100 TB) and type-guesses differently per engine, so the
registry schema is the contract and `mode=FAILFAST` surfaces corrupt rows
instead of silently nulling them. Timestamps round-trip through ISO-8601
strings; `columnNameOfCorruptRecord` is left unused deliberately (a corrupt
row in a training pipeline is a bug upstream, not data).

Write side exists for the round-trip tests and mirrors the shard writer's
layout discipline (operators/shards.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: Fixture-table schemas as DDL strings (FIXTURES.md §A). Timestamps are
#: declared TIMESTAMP and parsed from ISO-8601 with explicit format.
DDL = {
    "events": (
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING"
    ),
    "orders": (
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING"
    ),
    "documents": (
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    ),
}

_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def read_jsonl(spark: SparkSession, path: str, table: str) -> DataFrame:
    """JSON-lines scan with the registry schema pinned; FAILFAST so a
    malformed line fails the job rather than becoming a null row."""
    return (
        spark.read.schema(DDL[table])
        .option("mode", "FAILFAST")
        .option("timestampFormat", _TS_FMT)
        .json(path)
    )


def read_csv(spark: SparkSession, path: str, table: str) -> DataFrame:
    """CSV scan: header on, registry schema pinned, FAILFAST."""
    return (
        spark.read.schema(DDL[table])
        .option("header", "true")
        .option("mode", "FAILFAST")
        .option("timestampFormat", _TS_FMT)
        .csv(path)
    )


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("timestampFormat", _TS_FMT).json(path)


def write_csv(df: DataFrame, path: str) -> None:
    (
        df.write.mode("overwrite")
        .option("header", "true")
        .option("timestampFormat", _TS_FMT)
        .csv(path)
    )


def read_orc(spark: SparkSession, path: str, table: str) -> DataFrame:
    """ORC scan with the registry schema pinned — the columnar interchange
    format warehouse exports arrive in. Self-describing like parquet (no
    inference pass), and Spark's native reader supports the same predicate
    pushdown / column pruning, so plans keep their scan contracts."""
    return spark.read.schema(DDL[table]).orc(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)

"""Query registry shared by __spark_entry__, bench.py, and tests.

Each engine capability from SURVEY §2 registers a named QuerySpec: a Spark
callable `(spark, sf_dir) -> DataFrame` plus (when SQL-expressible) the
equivalent ANSI SQL the DuckDB oracle runs on the same parquet views. Column
names are aliased identically on both sides — the driver's comparator sorts
columns by name before hashing.

Float discipline: any surfaced floating-point column is rounded (typically
2-6 dp) IN BOTH the Spark plan and the oracle SQL, computed in float64 on
both sides, so cross-engine last-bit summation differences never reach the
value hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver runs rows-only check
    doc: str = ""


def collect(*modules) -> dict[str, QuerySpec]:
    out: dict[str, QuerySpec] = {}
    for m in modules:
        for spec in m.QUERIES:
            if spec.name in out:
                raise ValueError(f"duplicate query name: {spec.name}")
            out[spec.name] = spec
    return out

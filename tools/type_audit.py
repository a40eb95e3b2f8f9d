"""Oracle result-TYPE audit — guards the r01 failure class.

The driver's value hash serializes DuckDB results as typed Python values, so
a column that DuckDB types HUGEINT (bare integer sum) or DECIMAL (decimal
literal arithmetic) hashes differently from Spark's BIGINT/DOUBLE even when
every value is numerically equal — exactly what broke token_stats and
corpus_prep in round 1. The local comparator normalizes values and cannot
see this; this tool checks the TYPES directly:

    python tools/type_audit.py [sf_dir]

Flags any oracle column whose DuckDB type is HUGEINT, UHUGEINT, or
DECIMAL(...), and any Spark/DuckDB base-type family disagreement
(int-vs-float). Exit code 1 if anything is flagged.
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from tools.compare_oracle import duckdb_connection

_BAD = ("HUGEINT", "UHUGEINT", "DECIMAL")

_INT = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}
_FLOAT = {"FLOAT", "DOUBLE", "REAL"}


def duck_family(t: str) -> str:
    t = t.upper()
    if t in _INT:
        return "int"
    if t in _FLOAT:
        return "float"
    if t == "VARCHAR":
        return "string"
    if t in ("TIMESTAMP", "DATETIME", "TIMESTAMP_NS", "TIMESTAMP WITH TIME ZONE"):
        return "timestamp"
    if t == "BOOLEAN":
        return "bool"
    if t.endswith("[]"):
        return "array"
    return t.lower()


def spark_family(t: str) -> str:
    t = t.lower()
    if t in ("tinyint", "smallint", "int", "bigint", "byte", "short", "long", "integer"):
        return "int"
    if t in ("float", "double"):
        return "float"
    if t == "string":
        return "string"
    if t.startswith("timestamp"):
        return "timestamp"
    if t == "boolean":
        return "bool"
    if t.startswith("array"):
        return "array"
    return t


def audit(spark, con, sf_dir: str) -> list[str]:
    import __spark_entry__ as entrymod

    flagged = []
    for name, spec in entrymod._SPECS.items():
        if spec.oracle is None:
            continue
        rel = con.sql(spec.oracle)
        duck_types = dict(zip(rel.columns, [str(t) for t in rel.types]))
        sdf = spec.fn(spark, sf_dir)
        spark_types = dict(sdf.dtypes)
        for col, dt in duck_types.items():
            if any(b in dt.upper() for b in _BAD):
                flagged.append(f"{name}.{col}: DuckDB {dt}")
                continue
            st = spark_types.get(col)
            if st is None:
                flagged.append(f"{name}.{col}: missing on Spark side (spark cols: {sorted(spark_types)})")
                continue
            if duck_family(dt) != spark_family(st) and {duck_family(dt), spark_family(st)} != {"int"}:
                df_, sf_ = duck_family(dt), spark_family(st)
                if df_ != sf_:
                    flagged.append(f"{name}.{col}: DuckDB {dt} vs Spark {st}")

    return flagged


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import __spark_entry__ as entrymod
    from pdf_parse_vector_db_spark.session import get_spark

    con = duckdb_connection(sf_dir)
    spark = get_spark("type-audit")
    spark.sparkContext.setLogLevel("ERROR")

    flagged = audit(spark, con, sf_dir)
    if flagged:
        print("FLAGGED:")
        for f in flagged:
            print(" ", f)
        sys.exit(1)
    print(f"type audit clean over {sum(1 for s in entrymod._SPECS.values() if s.oracle)} oracles")


if __name__ == "__main__":
    main()

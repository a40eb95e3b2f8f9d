"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column names,
and an order-insensitive value multiset. Used by tests/test_oracle.py and
runnable standalone:

    python tools/compare_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import duckdb


def duckdb_connection(sf_dir: str):
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    return con


def _norm(v):
    """Normalize a cell for order-insensitive comparison across engines."""
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # guard against -0.0 vs 0.0 and representation noise beyond rounding
        return round(v, 9) + 0.0
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if hasattr(v, "isoformat"):  # datetime/date from either engine
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def rows_to_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t),
    )


def compare_query(spark, con, spec, sf_dir: str):
    sdf = spec.fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sorted(sdf.columns)
    res = con.execute(spec.oracle)
    ocols = sorted(d[0] for d in res.description)
    orows = [tuple(r) for r in res.fetchall()]
    problems = []
    if scols != ocols:
        problems.append(f"columns: spark={scols} oracle={ocols}")
    if len(srows) != len(orows):
        problems.append(f"rowcount: spark={len(srows)} oracle={len(orows)}")
    if not problems:
        sm = rows_to_multiset(srows, sdf.columns)
        om = rows_to_multiset(orows, [d[0] for d in res.description])
        if sm != om:
            diff = [(a, b) for a, b in zip(sm, om) if a != b][:3]
            problems.append(f"values differ; first diffs: {diff}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as entrymod
    from pdf_parse_vector_db_spark.session import get_spark

    spark = get_spark("compare_oracle", master="local[8]", shuffle_partitions=8)
    con = duckdb_connection(sf_dir)
    specs = entrymod._SPECS
    failed = 0
    for name, spec in specs.items():
        if only and name not in only:
            continue
        if spec.oracle is None:
            n = spec.fn(spark, sf_dir).count()
            print(f"{name}: rows-only, {n} rows")
            continue
        problems = compare_query(spark, con, spec, sf_dir)
        if problems:
            failed += 1
            print(f"{name}: FAIL  {problems}")
        else:
            print(f"{name}: OK")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()

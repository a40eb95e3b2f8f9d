"""DuckDB baseline timer — the other side of the 2x criterion.

BASELINE.md: absent reference-published numbers, the effective performance
baseline is the DuckDB oracle runtime on the same queries at the same scale
factor. This tool produces that number in the same JSON shape as bench.py:

    python tools/bench_oracle.py [sf_dir]

DuckDB runs with its default threading (all cores), matching bench.py's
local[$SPARK_GRAFT_CPUS] footing. Queries without an oracle (rows-only)
are skipped — they have no DuckDB twin to time.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from tools.compare_oracle import duckdb_connection


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    import __spark_entry__ as entrymod

    con = duckdb_connection(sf_dir)
    oracles = entrymod.oracle_sql()

    # warmup: one pass primes the OS page cache for the parquet files
    for sql in oracles.values():
        con.execute(sql).fetchall()

    timings: dict[str, float] = {}
    for _ in range(2):
        for name, sql in oracles.items():
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            dt = round(time.perf_counter() - t0, 4)
            if name not in timings or dt < timings[name]:
                timings[name] = dt

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "oracle_total_query_wall_sec",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()

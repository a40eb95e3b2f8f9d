"""DuckDB baseline timer — the other side of the 2x criterion.

BASELINE.md: absent reference-published numbers, the effective performance
baseline is the DuckDB oracle runtime on the same queries at the same scale
factor. This tool produces that number in the same JSON shape as bench.py:

    python tools/bench_oracle.py [sf_dir]

DuckDB runs with its default threading (all cores), matching bench.py's
local[$SPARK_GRAFT_CPUS] footing. Queries without an oracle (rows-only)
are skipped — they have no DuckDB twin to time.

Failure isolation (learned at sf0.1): `sssp_bounded`'s recursive-CTE
oracle exhausts DuckDB's memory budget at this scale — and once one query
OOMs, the CONNECTION is poisoned (every later allocation fails), which
silently zeroed two whole runs. Three defenses:
  * a memory_limit (default 48 GB) so one query cannot take the whole box,
  * a watchdog that calls con.interrupt() after ORACLE_QUERY_CAP_SEC
    (default 300 s) — the round-2 report measured sssp's oracle >145 s/pass
    and still climbing, so the cap records "uncompetitive at this scale"
    instead of hanging the artifact,
  * a FRESH connection after any failure, so one bad query never taints
    the rest (the same lesson bench.py learned in round 2).
Capped/failed queries land in the JSON's "errors" map and are excluded
from the total; the comparison against bench.py then uses the common set.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from tools.compare_oracle import duckdb_connection

MEMORY_LIMIT = os.environ.get("ORACLE_MEMORY_LIMIT", "48GB")
QUERY_CAP_SEC = float(os.environ.get("ORACLE_QUERY_CAP_SEC", "300"))


def _connect(sf_dir: str):
    con = duckdb_connection(sf_dir)
    con.execute(f"SET memory_limit='{MEMORY_LIMIT}'")
    # DuckDB does not create the spill dir itself — a missing dir turns
    # every spilling query into "IO Error: Cannot open file".
    os.makedirs("/tmp/duckdb_spill", exist_ok=True)
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    return con


def _run_capped(con, sql: str) -> None:
    """Execute with a watchdog that interrupts after QUERY_CAP_SEC."""
    done = threading.Event()

    def watchdog() -> None:
        if not done.wait(QUERY_CAP_SEC):
            try:
                con.interrupt()
            except Exception:  # noqa: BLE001 — connection already gone
                pass

    t = threading.Thread(target=watchdog, daemon=True)
    t.start()
    try:
        con.execute(sql).fetchall()
    finally:
        done.set()
        t.join(timeout=5)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    import __spark_entry__ as entrymod

    con = _connect(sf_dir)
    oracles = entrymod.oracle_sql()
    errors: dict[str, str] = {}

    def attempt(name: str, sql: str, label: str) -> float | None:
        nonlocal con
        # Watchdog race: if the cap expires just as the PREVIOUS query
        # finishes (between fetchall() returning and done.set()), its
        # con.interrupt() lands on the shared connection and aborts THIS
        # query. Signature: an INTERRUPT error far under the cap. Retry
        # once on a fresh connection so a stale interrupt never records a
        # healthy query as failed; a genuine cap (elapsed >= cap) records.
        for retry in (False, True):
            t0 = time.perf_counter()
            try:
                _run_capped(con, sql)
            except Exception as exc:  # noqa: BLE001 — isolate, record, keep going
                elapsed = time.perf_counter() - t0
                msg = str(exc).splitlines()[0][:300]
                con = _connect(sf_dir)  # fresh connection: don't poison the rest
                stale_interrupt = (
                    "INTERRUPT" in msg.upper() and elapsed < QUERY_CAP_SEC * 0.9
                )
                if stale_interrupt and not retry:
                    print(
                        f"bench_oracle: stale interrupt on {name}; retrying",
                        file=sys.stderr,
                    )
                    continue
                errors[name] = msg
                print(f"bench_oracle: {label} FAILED {name}: {msg}", file=sys.stderr)
                return None
            return round(time.perf_counter() - t0, 4)
        return None

    # warmup: one pass primes the OS page cache for the parquet files
    for name, sql in oracles.items():
        attempt(name, sql, "warmup")

    timings: dict[str, float] = {}
    for _ in range(2):
        for name, sql in oracles.items():
            if name in errors:
                continue
            dt = attempt(name, sql, "timed")
            if dt is None:
                timings.pop(name, None)
                continue
            if name not in timings or dt < timings[name]:
                timings[name] = dt

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    payload = {
        "metric": "oracle_total_query_wall_sec",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }
    if errors:
        payload["errors"] = errors
    print(json.dumps(payload))
    sys.exit(1 if errors else 0)


if __name__ == "__main__":
    main()

"""Benchmark harness (driver contract, BASELINE.md).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan + execute + collect). A warmup pass
primes the JVM/codegen so numbers reflect steady-state execution, matching
how a long-lived cluster would behave.

Failure isolation (round-2 lesson): a single raising query must never zero
the whole benchmark artifact. Every query runs under its own try/except —
a failure is recorded in the JSON's "errors" map (query -> first error
line), excluded from the total, and the harness still prints the JSON line
before exiting nonzero so the timing data for the other queries survives.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from pdf_parse_vector_db_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    errors: dict[str, str] = {}

    # warmup: prime codegen + file listing with the cheapest correct pass
    for name, fn in qs.items():
        try:
            fn(spark, sf_dir).limit(1).collect()
        except Exception as exc:  # noqa: BLE001 — isolate, record, keep going
            errors[name] = str(exc).splitlines()[0][:300]
            print(f"bench: warmup FAILED for {name}: {errors[name]}", file=sys.stderr)

    # two timed passes, best-of per query: single-pass numbers on a busy
    # host swing ~40% on the shuffle-heavy queries; the minimum is the
    # steady-state figure a warm cluster would sustain
    timings: dict[str, float] = {}
    for _ in range(2):
        for name, fn in qs.items():
            if name in errors:
                continue
            t0 = time.perf_counter()
            try:
                fn(spark, sf_dir).collect()
            except Exception as exc:  # noqa: BLE001
                errors[name] = str(exc).splitlines()[0][:300]
                timings.pop(name, None)
                print(f"bench: FAILED {name}: {errors[name]}", file=sys.stderr)
                continue
            dt = round(time.perf_counter() - t0, 4)
            if name not in timings or dt < timings[name]:
                timings[name] = dt

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    payload = {
        "metric": "total_query_wall_sec",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }
    if errors:
        payload["errors"] = errors
    print(json.dumps(payload))
    sys.stdout.flush()
    sys.exit(1 if errors else 0)


if __name__ == "__main__":
    main()

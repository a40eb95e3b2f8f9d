"""Long-session driver-heap audit (round-6 verdict #5).

The sf1 scaling audit OOM'd an 8 GB driver ~30k stages into one session —
evidence that a long-lived SparkSession accumulates state linearly with
query count. This tool isolates the accumulator: it runs N light queries
(2 jobs / ~3 stages each) in ONE session under a SMALL driver heap and
samples the JVM's live heap (after System.gc()) every `step` queries, so
the growth line is visible directly.

Suspects and verdict (measured 2026-08-15 on this host, see PROGRESS.md):
  * AppStatusListener retention — the driver keeps the last 1000
    executions' SQL plan graphs + 1000 jobs/stages EVEN WITH THE UI
    DISABLED (spark.appStatusStore serves the REST API); plan-heavy
    queries make each retained execution large. Measured on 2000 light
    queries: the default-retention line climbs until ~query 1000 (the
    eviction threshold) and plateaus at ~128 MB; the bounded line
    plateaus by ~query 500 at ~100 MB. Both are O(retained), not
    O(total queries) — the leak class is the PLATEAU HEIGHT, which for
    the scaling audit's plan-heavy registry (plans orders of magnitude
    larger than this probe's) is what exhausted the 8 GB driver; the
    bounds keep it small and plan-size-insensitive.
  * localCheckpoint blocks — released once the Python-side DataFrame is
    GC'd (ContextCleaner), needs periodic gc.collect() in drivers that
    hold no references (tools/scaling_audit.py already does this).
  * Py4J object graveyard — cleared by the same gc.collect().

Usage:
    python tools/session_heap_audit.py [n_queries] [--unbounded]
Prints one JSON line: {"n": ..., "samples": [[i, used_mb], ...],
"slope_kb_per_query": ..., "bounded": bool}.
"""

from __future__ import annotations

import gc
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def heap_used_mb(spark) -> float:
    rt = spark._jvm.java.lang.Runtime.getRuntime()
    rt.gc()
    return float(rt.totalMemory() - rt.freeMemory()) / 1e6


def main() -> None:
    n = int(next((a for a in sys.argv[1:] if not a.startswith("--")), "2000"))
    bounded = "--unbounded" not in sys.argv[1:]

    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.appName("session_heap_audit")
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "1g")
    )
    if bounded:
        from pdf_parse_vector_db_spark.session import STATUS_RETENTION

        for k, v in STATUS_RETENTION.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    docs = spark.read.parquet(f"{sf}/documents.parquet")

    step = max(1, n // 20)
    samples: list[list[float]] = []
    for i in range(n):
        # a representative light query: scan + filter + agg (2 stages)
        docs.filter(docs.doc_id % (i % 97 + 2) == 0).groupBy("lang").count().collect()
        if i % step == 0 or i == n - 1:
            gc.collect()
            samples.append([i, round(heap_used_mb(spark), 1)])
    # least-squares slope over the second half (skip warmup ramp)
    tail = samples[len(samples) // 2 :]
    xs = [s[0] for s in tail]
    ys = [s[1] for s in tail]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    denom = sum((x - mx) ** 2 for x in xs) or 1.0
    slope_mb = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom
    print(
        json.dumps(
            {
                "n": n,
                "bounded": bounded,
                "samples": samples,
                "slope_kb_per_query": round(slope_mb * 1000, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

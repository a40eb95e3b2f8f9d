"""Sustained ingest→feed→index-sync soak (round-7 verdict #4).

The manifest_feed/CDC loop is contract-tested per-batch; this tool runs it
for HUNDREDS of micro-batches in one session under a capped driver heap to
pin the state that only misbehaves over time:

  * the exactly-once idempotency-key ledger must stay a sliding WINDOW
    (manifest.py _KEY_WINDOW), not grow with batch count;
  * the live commit list must stay bounded under periodic compaction, and
    retained manifest files bounded under periodic vacuum — otherwise the
    manifest read/CAS cost grows linearly with session age;
  * the feed cursor must advance monotonically through appends, replaces,
    and vacuums without ever re-delivering a row (index rows == source
    rows exactly, at every checkpoint);
  * the post-GC driver heap slope must stay flat (the round-6 status-store
    bounds hold under a write-heavy workload too).

Usage:
    SPARK_DRIVER_MEMORY=1g python tools/feed_soak.py [n_batches]
Prints one JSON line:
    {"n": ..., "rows": ..., "exact": bool, "max_ledger": ..,
     "max_live_commits": .., "max_manifests": ..,
     "heap_samples": [[i, mb], ...], "slope_kb_per_batch": ...}

GRAPH SERVING MODE (round-10 verdict ask #7 — the regression harness
that would have caught the round-9 unbounded-entry-set defect by
measurement):
    python tools/feed_soak.py [n_batches] --graph
alternates ingest batches with CDC graph syncs AND live
`search_knn_graph` calls, recording the per-search wall time and the
entry-ledger cardinality per sync. The contract is FLATNESS: with the
adoption-cleared ledger, per-search cost is O(beam + nlist + ledger),
independent of cumulative churn; round 9's is_new entry set would have
shown a linearly growing series here. Prints one JSON line:
    {"mode": "graph", "n": ..., "search_ms": [[i, ms], ...],
     "entry_ledger": [[i, count], ...], "search_slope_ms_per_batch": ...,
     "tail_over_head_ratio": ..., "flat": bool, "self_hit": bool}
"""

from __future__ import annotations

import gc
import json
import os
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    from pyspark.sql import functions as F

    from pdf_parse_vector_db_spark.operators import ivf_index
    from pdf_parse_vector_db_spark.session import get_spark
    from pdf_parse_vector_db_spark.sources import manifest as M

    spark = get_spark("feed_soak", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    rt = spark._jvm.java.lang.Runtime.getRuntime()

    def heap_mb() -> float:
        gc.collect()
        rt.gc()
        return float(rt.totalMemory() - rt.freeMemory()) / 1e6

    root = tempfile.mkdtemp(prefix="feed_soak_")
    src = f"{root}/source"
    idx = f"{root}/index"
    rows_per_batch = 10
    seeds = None
    cursor = 0
    max_ledger = max_live = max_manifests = 0
    heap_samples: list[tuple[int, float]] = []
    exact = True

    def mk_batch(i: int):
        lo = i * rows_per_batch
        return spark.range(lo, lo + rows_per_batch).select(
            F.col("id").alias("vec_id"),
            F.array(
                *[(F.col("id") * (j + 1) % 97).cast("float") for j in range(8)]
            ).alias("embedding"),
            (F.col("id") % 3).cast("int").alias("label"),
        )

    for i in range(n):
        M.commit_append(
            spark, src, mk_batch(i), idempotency_key=f"soak-b{i}"
        )
        if i % 5 == 4:
            if seeds is None:
                seeds = ivf_index.corpus_seeds(M.snapshot(spark, src)[1])
                # localCheckpoint drops the producer's size-gated broadcast
                # hint — re-attach (these seeds are ~√N rows, under the gate)
                seeds = F.broadcast(seeds.localCheckpoint())
            cursor = ivf_index.sync_ivf_index_from_feed(
                spark, src, idx, seeds, cursor
            )
        if i % 50 == 49:
            M.maybe_compact(spark, src, max_live_commits=20)
            M.maybe_compact(spark, idx, max_live_commits=20)
        if i % 100 == 99:
            M.vacuum(spark, src, keep_versions=30, min_age_s=0)
            M.vacuum(spark, idx, keep_versions=30, min_age_s=0)
        head = M.head_version(spark, src)
        man = M._read_manifest(spark, src, head)
        max_ledger = max(max_ledger, len(man.get("keys") or {}))
        max_live = max(max_live, len(man["commits"]))
        n_manifests = len(
            [
                f
                for f in os.listdir(f"{src}/{M._MANIFESTS}")
                if f.startswith("v") and f.endswith(".json")
            ]
        )
        max_manifests = max(max_manifests, n_manifests)
        if i % 25 == 24:
            heap_samples.append((i, round(heap_mb(), 1)))
        if i % 100 == 99:
            # exactly-once spot check mid-soak
            cursor = ivf_index.sync_ivf_index_from_feed(
                spark, src, idx, seeds, cursor
            )
            got = M.snapshot(spark, idx)[1].count()
            want = (i + 1) * rows_per_batch
            if got != want:
                exact = False
                print(f"soak: MISMATCH at batch {i}: {got} != {want}", file=sys.stderr)

    cursor = ivf_index.sync_ivf_index_from_feed(spark, src, idx, seeds, cursor)
    final_rows = M.snapshot(spark, idx)[1].count()
    exact = exact and final_rows == n * rows_per_batch

    tail = heap_samples[len(heap_samples) // 2 :]
    xs = [s[0] for s in tail]
    ys = [s[1] for s in tail]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    denom = sum((x - mx) ** 2 for x in xs) or 1.0
    slope_mb = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom

    print(
        json.dumps(
            {
                "n": n,
                "rows": final_rows,
                "exact": exact,
                "max_ledger": max_ledger,
                "max_live_commits": max_live,
                "max_manifests": max_manifests,
                "heap_samples": heap_samples,
                "slope_kb_per_batch": round(slope_mb * 1000, 1),
            }
        )
    )
    sys.exit(0 if exact else 1)


def _fit_slope(samples: list[tuple[int, float]]) -> float:
    tail = samples[len(samples) // 2 :]
    xs = [s[0] for s in tail]
    ys = [s[1] for s in tail]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    denom = sum((x - mx) ** 2 for x in xs) or 1.0
    return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom


def main_graph(n: int) -> None:
    import time

    from pyspark.sql import functions as F

    from pdf_parse_vector_db_spark.plans import knn_graph as kg
    from pdf_parse_vector_db_spark.session import get_spark
    from pdf_parse_vector_db_spark.sources import manifest as M

    spark = get_spark("graph_serve_soak", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="graph_soak_")
    src = f"{root}/source"
    gt = f"{root}/graph"
    rows_per_batch = 10
    dim = 8

    def mk_batch(i: int):
        lo = i * rows_per_batch
        return spark.range(lo, lo + rows_per_batch).select(
            F.col("id").alias("vec_id"),
            F.array(
                *[((F.col("id") * (j + 3) + j * j) % 97).cast("float") for j in range(dim)]
            ).alias("embedding"),
            (F.col("id") % 3).cast("int").alias("label"),
        )

    qvec = [float((7 * (j + 3) + j * j) % 97) for j in range(dim)]  # = vec 7
    cursor = 0
    search_ms: list[tuple[int, float]] = []
    ledger: list[tuple[int, int]] = []
    self_hit = True
    for i in range(n):
        M.commit_append(spark, src, mk_batch(i), idempotency_key=f"gsoak-b{i}")
        cursor = kg.sync_knn_graph_from_feed(spark, src, gt, cursor)
        if i % 10 == 9:
            # the X56 lesson applies to the serving loop too: one commit
            # leg per batch makes every snapshot scan grow linearly —
            # bound the legs so the latency series measures the SEARCH,
            # not commit-list accrual (compaction is CDC-transparent)
            M.maybe_compact(spark, src, max_live_commits=10)
            M.maybe_compact(spark, gt, max_live_commits=10)
        _, pend = M.snapshot(spark, kg.graph_entry_table(gt))
        ledger.append((i, 0 if pend is None else pend.count()))
        t0 = time.perf_counter()
        got = kg.search_knn_graph(spark, src, gt, qvec, k=5).collect()
        search_ms.append((i, round((time.perf_counter() - t0) * 1000, 1)))
        if i >= 1 and (not got or got[0].score != 0.0):
            self_hit = False
            print(f"graph soak: lost self-hit at batch {i}: {got}", file=sys.stderr)

    slope = _fit_slope(search_ms)
    # flatness: the last quarter's median search must stay within 1.5x of
    # the second quarter's (first quarter = JVM/codegen warmup)
    q = max(1, n // 4)
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    head = med([ms for _, ms in search_ms[q : 2 * q]])
    tail = med([ms for _, ms in search_ms[-q:]])
    ratio = round(tail / head, 3) if head else 0.0
    flat = ratio <= 1.5
    print(
        json.dumps(
            {
                "mode": "graph",
                "n": n,
                "rows": n * rows_per_batch,
                "search_ms": search_ms,
                "entry_ledger": ledger,
                "max_ledger": max(c for _, c in ledger),
                "search_slope_ms_per_batch": round(slope, 2),
                "tail_over_head_ratio": ratio,
                "flat": flat,
                "self_hit": self_hit,
            }
        )
    )
    sys.exit(0 if (flat and self_hit) else 1)


if __name__ == "__main__":
    if "--graph" in sys.argv[1:]:
        args = [a for a in sys.argv[1:] if a != "--graph"]
        main_graph(int(args[0]) if args else 120)
    else:
        main()

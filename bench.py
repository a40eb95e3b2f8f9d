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

Output-size contract (round-4 lesson): the driver keeps only the last
~2000 chars of stdout and parses the JSON from that tail. Rounds 1-3 all
recorded ``parsed: null`` because the one-line JSON with 70-248 per-query
timings was 3-7k chars. The final stdout line is therefore a COMPACT
payload — total/value/sf plus a length-capped headline subset of the
per-query timings — hard-limited to ``_LINE_BUDGET`` chars. The complete
per-query map is written to ``BENCH_FULL.json`` next to this script (and
is what tools/scaling_audit.py and the round notes consume).
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
    prev = None
    prev_path = os.path.join(ROOT, "BENCH_FULL.json")
    if os.path.exists(prev_path):
        try:
            with open(prev_path) as fh:
                prev = json.load(fh)
        except Exception:  # noqa: BLE001 — a corrupt artifact never kills the bench
            prev = None
    full, line = build_payloads(timings, errors, sf_val, prev=prev)
    with open(prev_path, "w") as fh:
        json.dump(full, fh, indent=1, sort_keys=True)
    print(line)
    sys.stdout.flush()
    sys.exit(1 if errors else 0)


#: final-stdout-line budget — the driver records only the last ~2000 chars.
LINE_BUDGET = 1800

#: reference core + heaviest tiers: always reported first in the compact line.
HEADLINE = [
    "search_similar", "knn_topk", "search_response_flat", "ingest_chunks",
    "classify_decision", "pricing_summary", "dup_components",
    "dedup_keepers", "minhash_portable_dups", "simhash_portable_dups",
    "ppjoin_near_dups", "semdedup", "ivf_knn", "pq_knn", "knn_join",
    "pack_training_sequences", "label_propagation", "kcore_peel",
    "pagerank_bipartite", "multimodal_frames", "events_hourly",
    "forecast_backtest", "revenue_changepoint", "winnowing_fingerprints",
    "decontaminate_overlap", "incremental_dedup",
]


def build_payloads(
    timings: dict[str, float], errors: dict[str, str], sf_val, prev: dict | None = None
) -> tuple[dict, str]:
    """(full BENCH_FULL.json payload, compact final stdout line).

    The compact line carries the totals plus as many per-query timings as
    fit: headline queries first, then the slowest of the rest, cut off at
    LINE_BUDGET chars so the driver's stdout tail always contains one
    complete parseable JSON object. Contract pinned by tests/test_bench.py.

    Drift guard (round-5 lesson): host load shifts EVERY query by a
    similar factor (r5's uniform +10%), which reads like a regression
    until someone re-derives the per-query deltas. When the previous
    BENCH_FULL.json (same sf) is supplied, the full payload records
    per-query relative deltas and their MEDIAN; the compact line carries
    just the median. A loaded host shows median_rel_drift ~= the uniform
    factor with small spread; a genuine plan regression shows a few large
    per-query deltas against a ~zero median."""
    full = {
        "metric": "total_query_wall_sec",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "n_queries": len(timings),
    }
    if errors:
        full["errors"] = errors
    drift = drift_vs_prev(timings, sf_val, prev)
    if drift is not None:
        full["drift_vs_prev"] = drift
    compact = {
        "metric": full["metric"],
        "value": full["value"],
        "unit": "sec",
        "sf": sf_val,
        "n_queries": len(timings),
        "queries": {},
    }
    if drift is not None:
        compact["median_rel_drift"] = drift["median_rel"]
    if errors:
        first = sorted(errors)[0]
        compact["errors"] = {first: errors[first][:120], "_count": len(errors)}
    order = [q for q in HEADLINE if q in timings]
    order += [q for q in sorted(timings, key=timings.get, reverse=True) if q not in order]
    for q in order:
        compact["queries"][q] = timings[q]
        if len(json.dumps(compact)) > LINE_BUDGET:
            del compact["queries"][q]
            break
    line = json.dumps(compact)
    assert len(line) <= LINE_BUDGET + 100, len(line)
    return full, line


def drift_vs_prev(
    timings: dict[str, float], sf_val, prev: dict | None
) -> dict | None:
    """Per-query relative drift vs a previous same-sf BENCH_FULL payload:
    {"median_rel", "n_common", "prev_value", "per_query": {q: rel}} where
    rel = (now - before) / before, rounded to 4 dp. None when there is no
    comparable previous run (missing, different sf, or no common query
    with a nonzero previous timing)."""
    if not prev or prev.get("sf") != sf_val:
        return None
    prev_q = prev.get("queries") or {}
    rels = {
        q: round((t - prev_q[q]) / prev_q[q], 4)
        for q, t in timings.items()
        if q in prev_q and prev_q[q] > 0
    }
    if not rels:
        return None
    ordered = sorted(rels.values())
    n = len(ordered)
    med = ordered[n // 2] if n % 2 else (ordered[n // 2 - 1] + ordered[n // 2]) / 2
    return {
        "median_rel": round(med, 4),
        "n_common": n,
        "prev_value": prev.get("value"),
        "per_query": rels,
    }


if __name__ == "__main__":
    main()

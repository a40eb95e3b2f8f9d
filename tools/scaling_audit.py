"""Empirical scaling audit — measure, don't guess, the 100x question.

Times every registered query at 2 or 3 scale directories (warmup +
best-of-N in one process) and reports per-query wall-time ratios against
the data growth. With three dirs (sf0.01, sf0.1, sf1 — the last generated
by tools/gen_sf.py along the driver's own scaling law) the report gains a
MEASURED 100x column instead of an extrapolated one.

Classification (largest-scale time t_big, bench-scale ratio r10 =
t_big/t_mid over 10x data, gate-scale ratio r100 = t_big/t_small over
100x):

  * floor         -> t_big < 1 s: scheduling-floor bound; per-byte work
                     negligible at every measured scale.
  * floor-bound   -> r10 <= 3 (or r100 <= 5 when the mid scale is itself
                     still floored): per-job constants dominate; vanishes
                     on a real cluster.
  * linear        -> r10 <= 12 (r100 <= 120): at-most-linear per-byte
                     work + noise; survives 100x with 100x resources.
  * quadratic-by-spec -> the query is an EXACT pairwise verification tier
                     whose cost is Θ(pairs-per-block²) by its published
                     definition (the scale-path twin is the banded/LSH/
                     IVF tier measured separately). Expected r10 up to
                     ~120 (10x rows => 100x pairs + noise); flagged only
                     if measured WORSE than quadratic.
  * SUPERLINEAR   -> anything else above the linear bound: a join,
                     window, or explode grows faster than the data —
                     the class that dies at 100 TB even with 1000
                     executors. Exits nonzero.

Writes SCALING.md (flags on top) and prints one JSON summary line.

    python tools/scaling_audit.py [small_dir mid_dir [big_dir]]
    SCALING_RUNS_BIG=1 ... # timed passes at the largest dir (default 2)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SUPERLINEAR_RATIO = 12.0
#: below this absolute cost at the BIG sf, a query is floor-bound and its
#: ratio is scheduling noise, not per-byte behavior
FLOOR_SEC = 1.0
#: mid-scale times under this are themselves floored — their r10 is noise,
#: so classification falls back to the 100x ratio
MID_FLOOR_SEC = 0.5

#: Exact pairwise verification tiers: cost is Θ(rows-per-block²) by the
#: query's published definition, so 10x rows within fixed blocking keys
#: (the driver's data law keeps n_chars ranges, labels, and the 31-word
#: vocabulary constant) is EXPECTED to cost up to ~100x. Each names its
#: linear-scale-path twin, which the audit holds to the linear bound.
QUADRATIC_BY_SPEC: dict[str, str] = {
    "ngram_jaccard_dups": "all-pairs exact Jaccard within n_chars blocks; scale twin: minhash_portable_dups",
    "dup_components": "exact-Jaccard pair build within n_chars blocks; scale twin: minhash banding + components",
    "dedup_keepers": "same pair build as dup_components",
    "soft_dedup_weights": "same pair build as dup_components",
    "ppjoin_near_dups": "prefix-filtered exact set join; token-saturated fixture vocab degrades pruning (df ~ N); scale twin: minhash_portable_dups",
    "knn_join": "label-blocked exact sim-join, fixed 10 labels => block size ~ N; scale twin: ivf_knn/lsh_portable_knn",
    "embedding_near_dups": "brute-force all-pairs cosine baseline; scale twin: embedding_near_dups_ivf",
    "containment_dups": "blocked exact containment verify; scale twin: minhash_portable_dups",
    "edit_distance_dups": "blocked exact edit-distance verify; scale twin: minhash_portable_dups",
    "snm_near_dups": "sorted-neighborhood exact verify within window; scale twin: minhash_portable_dups",
    "dedup_tier_evidence": "cross-tier audit panel built ON the exact-Jaccard pair table (same Θ(block²) pair build as dup_components)",
    "dup_components_star": "large-star/small-star over the same exact-Jaccard pair build as dup_components",
    "bitext_mining": "margin mining over the full src×tgt pair matrix by spec at fixture scale (docstring: the scale path swaps the candidate generator to IVF cells, margin scoring unchanged)",
    "simhash_portable_dups": "the ANSWER is quadratic on this corpus: signature entropy is bounded by the 31-word fixture vocabulary, so TRUE hamming<=3 pairs grow ~N² (measured 299 pairs at 5k docs -> 11,885 at 50k, 40x for 10x); no algorithm returns a quadratic answer in linear time. Open-vocabulary corpora spread band keys",
    "simhash_near_dups": "same corpus-shape quadratic answer as simhash_portable_dups (blake2b family)",
}


_STATE_PATH = os.environ.get(
    "SCALING_STATE", os.path.join(ROOT, ".scaling_state.json")
)

#: SCALING_ONLY=a,b,c restricts the audit to a query subset (used by the
#: dim-1536 stress run, which audits the vector family over the --dim
#: fixtures without re-timing the 200+ text/relational queries whose
#: plans don't touch embedding width). SCALING_OUT redirects the report
#: so a subset run can't clobber the full-registry SCALING.md.
_ONLY = {
    q.strip() for q in os.environ.get("SCALING_ONLY", "").split(",") if q.strip()
}
_OUT_PATH = os.environ.get("SCALING_OUT", os.path.join(ROOT, "SCALING.md"))


def _load_state() -> dict:
    try:
        with open(_STATE_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def time_queries(spark, sf_dir: str, runs: int) -> dict[str, float]:
    """Warmup + best-of-N per query. Timings persist to a state file after
    every query so a crashed run (e.g. driver-heap exhaustion 30k stages
    in) resumes instead of repaying ~an hour of measurement."""
    import gc

    import __spark_entry__ as entrymod

    state = _load_state()
    out: dict[str, float] = dict(state.get(sf_dir, {}))
    qs = entrymod.queries()
    for name, fn in qs.items():
        if _ONLY and name not in _ONLY:
            continue
        if name in out:
            continue
        fn(spark, sf_dir).limit(1).collect()  # warm plan + listing
        best = float("inf")
        for _ in range(max(1, runs)):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 4)
        print(f"scaling_audit: {sf_dir} {name} {best:.3f}s", file=sys.stderr)
        # release python-side refs so ContextCleaner can drop the query's
        # localCheckpoint blocks — the long-lived session otherwise
        # accumulates driver heap across hundreds of plans
        gc.collect()
        state = _load_state()
        state.setdefault(sf_dir, {})[name] = out[name]
        with open(_STATE_PATH, "w") as f:
            json.dump(state, f)
    return out


def classify(name: str, small: float, mid: float, big: float) -> tuple[str, float]:
    """Return (class, headline_ratio). headline = r10 when the mid scale
    is off the floor, else r100."""
    if any(math.isnan(x) for x in (small, mid, big)):
        return "missing", float("nan")
    r10 = big / mid if mid > 0 else float("inf")
    r100 = big / small if small > 0 else float("inf")
    use_r100 = mid < MID_FLOOR_SEC
    ratio = r100 if use_r100 else r10
    bound = (SUPERLINEAR_RATIO * 10.0) if use_r100 else SUPERLINEAR_RATIO
    floor_bound = 5.0 if use_r100 else 3.0
    if big < FLOOR_SEC:
        return "floor", ratio
    if name in QUADRATIC_BY_SPEC:
        # expected up to quadratic: r10 ~ 100, r100 ~ 10000 (+25% noise)
        quad_bound = 125.0 if not use_r100 else 12500.0
        return ("SUPERLINEAR" if ratio > quad_bound else "quadratic-by-spec"), ratio
    if ratio <= floor_bound:
        return "floor-bound", ratio
    if ratio <= bound:
        return "linear", ratio
    return "SUPERLINEAR", ratio


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    if len(dirs) == 2:
        dirs = [dirs[0], dirs[0], dirs[1]]  # 2-dir mode: small == mid
        two_mode = True
    else:
        two_mode = False
    small_dir, mid_dir, big_dir = dirs[0], dirs[1], dirs[2]
    runs_big = int(os.environ.get("SCALING_RUNS_BIG", "2"))

    from pdf_parse_vector_db_spark.session import get_spark

    spark = get_spark("scaling-audit")
    spark.sparkContext.setLogLevel("ERROR")
    small = time_queries(spark, small_dir, 2)
    mid = small if two_mode else time_queries(spark, mid_dir, 2)
    big = time_queries(spark, big_dir, runs_big)

    rows = []
    for name in sorted(small):
        s = small[name]
        m = mid.get(name, float("nan"))
        b = big.get(name, float("nan"))
        cls, ratio = classify(name, s, m, b)
        r10 = round(b / m, 2) if m and not math.isnan(b) and m > 0 else float("nan")
        r100 = round(b / s, 2) if s and not math.isnan(b) and s > 0 else float("nan")
        rows.append((name, s, m, b, r10, r100, round(ratio, 2), cls))
    rows.sort(
        key=lambda r: (
            -(r[7] == "SUPERLINEAR"),
            -(r[7] == "quadratic-by-spec"),
            -(-1.0 if math.isnan(r[6]) else r[6]),
        )
    )

    flagged = [r for r in rows if r[7] == "SUPERLINEAR"]
    quad = [r for r in rows if r[7] == "quadratic-by-spec"]
    with open(_OUT_PATH, "w") as f:
        f.write(
            "# SCALING — measured per-query wall-time ratios\n\n"
            f"Generated by tools/scaling_audit.py over {small_dir} / {mid_dir} /\n"
            f"{big_dir} (warmup + best-of-N per query in one process; N="
            f"2/2/{runs_big}).\nr10 = big/mid (10x data at bench scale), "
            "r100 = big/small (100x data vs the\ncorrectness-gate scale — "
            "sf1 holds ~6M lineitem rows / 50k docs, generated\nby "
            "tools/gen_sf.py along the driver's own measured scaling law).\n\n"
            "Classes: floor (<1 s at the biggest scale), floor-bound\n"
            "(per-job constants dominate), linear (<=12x for 10x, survives\n"
            "100x with 100x resources), quadratic-by-spec (exact pairwise\n"
            "verification tiers, Θ(block²) by their published definition —\n"
            "their banded/LSH/IVF scale twins are held to the linear bound;\n"
            "flagged only if measured worse than quadratic), SUPERLINEAR\n"
            "(flagged — that shape dies at 100 TB).\n\n"
            f"**Flagged superlinear: {len(flagged)}**"
            + (" — " + ", ".join(r[0] for r in flagged) if flagged else "")
            + f"\n\n**Quadratic-by-spec exact tiers measured: {len(quad)}**"
            + (" — " + ", ".join(r[0] for r in quad) if quad else "")
            + "\n\n| query | small s | mid s | big s | r10 | r100 | class |\n"
            "|---|---|---|---|---|---|---|\n"
        )
        for name, s, m, b, r10, r100, _ratio, cls in rows:
            f.write(f"| {name} | {s} | {m} | {b} | {r10} | {r100} | {cls} |\n")
        if quad:
            f.write(
                "\n## Quadratic-by-spec justifications\n\n"
                "| query | why quadratic / linear-scale twin |\n|---|---|\n"
            )
            for name, *_ in quad:
                f.write(f"| {name} | {QUADRATIC_BY_SPEC[name]} |\n")

    print(
        json.dumps(
            {
                "queries": len(rows),
                "superlinear": [r[0] for r in flagged],
                "quadratic_by_spec": [r[0] for r in quad],
                "max_ratio": rows[0][6] if rows else None,
                "total_small": round(sum(small.values()), 2),
                "total_mid": round(sum(mid.values()), 2),
                "total_big": round(sum(big.values()), 2),
            }
        )
    )
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()

"""Skewed-fixture wall audit — does the engine hold its ratios when the
corpus is Zipfian instead of uniform?

Generates (or reuses) a uniform and a skewed twin at the SAME scale with
tools/gen_sf.py, times the skew-sensitive query families on both (warmup +
best-of-2, one process), and APPENDS a "Skewed fixture" section to
SCALING.md — run it AFTER tools/scaling_audit.py, which rewrites that file.

A query is flagged when skewed/uniform > SKEW_FLAG_RATIO (default 8) AND
the skewed absolute time is off the scheduling floor. The bound is loose
on purpose: the skewed twin's mega-duplicate cluster legitimately emits
Θ((0.08n)²) additional TRUE near-dup pairs, so some growth is the correct
answer getting bigger, not the engine degrading.

    python tools/skew_audit.py [sf] [uniform_dir skewed_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SKEW_FLAG_RATIO = float(os.environ.get("SKEW_FLAG_RATIO", "8.0"))
FLOOR_SEC = 1.0

#: skew-sensitive families: dedup windows, LSH band joins, components,
#: salted aggregation, sessionization/windows over the hot user, ANN over
#: the hot label + duplicate vector cluster
QUERIES = [
    "minhash_portable_dups",
    "phash_near_dups",
    "dup_components",
    "dedup_keepers",
    "soft_dedup_weights",
    "ngram_jaccard_dups",
    "substring_dedup_plan",
    "token_budget_plan",
    "knn_join",
    "ivf_knn",
    "embedding_near_dups_ivf",
    "lsh_band_tuning",
    "events_hourly",
    "events_sessions",
    "top_orders_per_customer",
]


def main() -> None:
    args = sys.argv[1:]
    sf = float(args[0]) if args else 0.1
    if len(args) > 2:
        uni_dir, skw_dir = args[1], args[2]
    else:
        uni_dir = os.path.join(ROOT, f"testdata_sf{sf:g}uni")
        skw_dir = os.path.join(ROOT, f"testdata_sf{sf:g}skew")
    from tools.gen_sf import generate

    for d, skew in ((uni_dir, False), (skw_dir, True)):
        if not os.path.exists(os.path.join(d, "documents.parquet")):
            generate(sf, d, skew=skew)

    import __spark_entry__ as entrymod
    from pdf_parse_vector_db_spark.session import get_spark

    spark = get_spark("skew-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = [n for n in QUERIES if n in qs]

    def run(sf_dir: str) -> dict[str, float]:
        out = {}
        for name in names:
            qs[name](spark, sf_dir).limit(1).collect()
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).collect()
                best = min(best, time.perf_counter() - t0)
            out[name] = round(best, 4)
            print(f"skew_audit: {sf_dir} {name} {best:.3f}s", file=sys.stderr)
        return out

    uni = run(uni_dir)
    skw = run(skw_dir)

    rows = []
    for name in names:
        u, s = uni[name], skw[name]
        ratio = round(s / u, 2) if u > 0 else float("inf")
        flagged = s >= FLOOR_SEC and ratio > SKEW_FLAG_RATIO
        rows.append((name, u, s, ratio, "FLAGGED" if flagged else "ok"))
    rows.sort(key=lambda r: -r[3])
    flagged = [r for r in rows if r[4] == "FLAGGED"]

    section = (
        "\n## Skewed fixture (tools/skew_audit.py)\n\n"
        f"Uniform vs skewed twin at sf={sf:g} ({uni_dir} vs {skw_dir}):\n"
        "Zipf doc lengths, 8% mega-duplicate cluster on a hot source, 50%\n"
        "hot embedding label + 5% near-identical vectors, Zipf-hot event\n"
        "users. Flag bound skewed/uniform > "
        f"{SKEW_FLAG_RATIO:g} (off-floor only) — loose because the mega\n"
        "cluster legitimately multiplies TRUE pair output.\n\n"
        f"**Flagged: {len(flagged)}**"
        + (" — " + ", ".join(r[0] for r in flagged) if flagged else "")
        + "\n\n| query | uniform s | skewed s | ratio | status |\n|---|---|---|---|---|\n"
        + "".join(f"| {n} | {u} | {s} | {r} | {st} |\n" for n, u, s, r, st in rows)
    )
    with open(os.path.join(ROOT, "SCALING.md"), "a") as f:
        f.write(section)

    print(json.dumps({
        "sf": sf,
        "flagged": [r[0] for r in flagged],
        "max_ratio": rows[0][3] if rows else None,
        "total_uniform": round(sum(uni.values()), 2),
        "total_skewed": round(sum(skw.values()), 2),
    }))
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()

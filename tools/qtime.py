"""Ad-hoc per-query timer + plan capture for optimization work (round 10).

    python tools/qtime.py q1 q2 ...            # time named queries at sf0.1
    python tools/qtime.py --explain q1 ...     # also dump .explain("formatted")
    python tools/qtime.py --sf /root/testdata/sf0.01 q1

Methodology matches bench.py (warmup limit(1).collect(), then best-of-2
full .collect()) so numbers are comparable with BENCH_FULL.json rows.
Plans go to plans/r11/<query>_<tag>.txt when --explain/--tag are given.
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    explain = False
    tag = None
    names = []
    it = iter(args)
    for a in it:
        if a == "--sf":
            sf_dir = next(it)
        elif a == "--explain":
            explain = True
        elif a == "--tag":
            tag = next(it)
        else:
            names.append(a)

    import __spark_entry__ as entrymod
    from pdf_parse_vector_db_spark.session import get_spark

    spark = get_spark("qtime")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    os.makedirs(os.path.join(ROOT, "plans", "r11"), exist_ok=True)

    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"qtime:{name}")
        if explain and tag:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            out = os.path.join(ROOT, "plans", "r11", f"{name}_{tag}.txt")
            with open(out, "w") as fh:
                fh.write(plan)
            print(f"{name}: plan -> {out}")
        fn(spark, sf_dir).limit(1).collect()  # warmup
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            n = len(fn(spark, sf_dir).collect())
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        print(f"{name}: {best:.3f}s  ({n} rows)")
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()

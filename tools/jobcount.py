"""Per-query Spark JOB COUNT + wall time (round-11 optimization evidence).

    python tools/jobcount.py q1 q2 ...

For each named registry query: runs it once (fresh plan each time, same as
bench.py's timed pass) and reports the number of driver jobs it launched
(delta of the max job id in the app status store — ids are sequential) and
the wall seconds. The breadth-bound graph family is job-count bound at
sf0.1 (VERDICT r10), so this is the primary before/after metric there.
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _max_job_id(sc) -> int:
    jl = sc._jsc.sc().statusStore().jobsList(None)
    mx = -1
    for i in range(jl.size()):
        mx = max(mx, jl.apply(i).jobId())
    return mx


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = [a for a in args if not a.startswith("--")]

    import __spark_entry__ as entrymod
    from pdf_parse_vector_db_spark.session import get_spark

    spark = get_spark("jobcount")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    qs = entrymod.queries()

    for name in names:
        fn = qs[name]
        sc.setJobDescription(f"jobcount:{name}:warmup")
        fn(spark, sf_dir).limit(1).collect()  # warmup (bench methodology)
        sc.setJobDescription(f"jobcount:{name}")
        before = _max_job_id(sc)
        t0 = time.perf_counter()
        nrows = len(fn(spark, sf_dir).collect())
        dt = time.perf_counter() - t0
        after = _max_job_id(sc)
        print(f"{name}: jobs={after - before}  {dt:.3f}s  ({nrows} rows)")
        sc.setJobDescription(None)


if __name__ == "__main__":
    main()

"""Skewed-corpus hardening (round-5): the uniform fixtures never exercise
AQE skew handling, so this module generates the ADVERSARIAL twin
(tools/gen_sf.py --skew: Zipf doc lengths, one mega-duplicate cluster on a
hot source, hot embedding label + near-identical vector cluster, Zipf-hot
event users) and asserts the skew-sensitive operators hold their plans,
their answers, and a bounded wall-ratio under it.

Pins three operator families the round-4 verdict called out:
  * the dedup window (operators/knn.dedup_best_per_group) and its salted
    twin (operators/skew.salted_best_per_group) on a hot group key,
  * the LSH band join (operators/dedup.minhash_portable_pairs) on a
    pathological band bucket (every mega-cluster doc collides),
  * connected components over the mega cluster (one giant component).
"""

from __future__ import annotations

import os
import time

import pytest

from pyspark.sql import functions as F

from pdf_parse_vector_db_spark.operators.dedup import minhash_portable_pairs
from pdf_parse_vector_db_spark.operators.knn import dedup_best_per_group
from pdf_parse_vector_db_spark.operators.skew import salted_best_per_group

#: small enough for CI, big enough that the mega cluster (~8%) is a real
#: hot key: 1,000 docs / 160 embeddings / 20,000 events
_GEN_SF = 0.02


@pytest.fixture(scope="module")
def skew_dirs(tmp_path_factory):
    from tools.gen_sf import generate

    base = tmp_path_factory.mktemp("skewfix")
    uni, skw = str(base / "uniform"), str(base / "skewed")
    generate(_GEN_SF, uni, skew=False)
    generate(_GEN_SF, skw, skew=True)
    return uni, skw


def _docs(spark, d):
    return spark.read.parquet(f"{d}/documents.parquet")


def test_fixture_is_actually_skewed(spark, skew_dirs):
    _, skw = skew_dirs
    docs = _docs(spark, skw)
    top_src = docs.groupBy("source").count().orderBy(F.desc("count")).first()
    n = docs.count()
    assert top_src["source"] == "src0" and top_src["count"] > 0.08 * n
    ev = spark.read.parquet(f"{skew_dirs[1]}/events.parquet")
    top_user = ev.groupBy("user_id").count().orderBy(F.desc("count")).first()
    assert top_user["count"] > 0.10 * ev.count()  # Zipf hot user
    emb = spark.read.parquet(f"{skew_dirs[1]}/embeddings.parquet")
    hot_label = emb.groupBy("label").count().orderBy(F.desc("count")).first()
    assert hot_label["label"] == 0 and hot_label["count"] > 0.4 * emb.count()


def test_aqe_skew_handling_enabled(spark):
    """session.get_spark pins the AQE skew machinery the plans rely on."""
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def test_dedup_window_hot_key_plan_and_answer(spark, skew_dirs):
    """The per-group dedup window on the hot source key: plan stays a
    single hash-partitioned window (no cartesian, no global sort of the
    corpus), and the salted twin returns the identical winner set."""
    _, skw = skew_dirs
    hits = _docs(spark, skw).select(
        F.col("source").alias("file_id"),
        F.col("n_chars").cast("double").alias("score"),
        F.col("doc_id"),
    )
    plain = dedup_best_per_group(hits, group_col="file_id", tiebreak_cols=("doc_id",))
    plan = plain._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan
    salted = salted_best_per_group(
        hits, group_col="file_id", tiebreak_cols=("doc_id",), salts=8
    )
    p = sorted(tuple(r) for r in plain.collect())
    s = sorted(tuple(r) for r in salted.collect())
    assert p == s and len(p) == 20  # one winner per source


def test_lsh_band_join_mega_cluster(spark, skew_dirs):
    """The banded minhash self-join survives one pathological bucket: the
    mega cluster must come back as genuine near-dup pairs connecting ALL
    its members, the plan must stay a hash join on (band_idx, key), and
    the verify threshold keeps cross-cluster noise out."""
    from pdf_parse_vector_db_spark.operators.components import connected_components

    _, skw = skew_dirs
    docs = _docs(spark, skw)
    pairs = minhash_portable_pairs(docs, threshold=0.5)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    comp = connected_components(pairs)
    sizes = comp.groupBy("component_id").count().orderBy(F.desc("count"))
    top = sizes.first()
    n_mega = max(2, int(docs.count() * 0.08))
    # 2-word mutations of a 60-word template: every pair jaccard >~0.7,
    # so the giant component must capture (almost) the whole cluster
    assert top["count"] >= 0.9 * n_mega


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_PERF") != "1",
    reason="wall-clock ratio flakes under host load (round-6 ADVICE); "
    "set SPARK_GRAFT_PERF=1 to run — the deterministic candidate-volume "
    "invariant below covers the same regression class in the default gate",
)
def test_skewed_wall_ratio_bounded(spark, skew_dirs):
    """Coarse regression bound: the banded pipeline on the skewed twin
    must stay within a small factor of the uniform twin at equal corpus
    size (the mega cluster legitimately emits ~(0.08n)² extra TRUE pairs,
    so the bound is generous — this catches catastrophic plan regressions
    like a lost band-blocking key, not noise)."""
    uni, skw = skew_dirs

    def run(d: str) -> float:
        minhash_portable_pairs(_docs(spark, d), threshold=0.5).collect()  # warm
        t0 = time.perf_counter()
        minhash_portable_pairs(_docs(spark, d), threshold=0.5).collect()
        return time.perf_counter() - t0

    t_uni, t_skw = run(uni), run(skw)
    assert t_skw <= max(8.0 * t_uni, t_uni + 5.0), (t_uni, t_skw)


def test_skewed_candidate_volume_bounded(spark, skew_dirs):
    """Deterministic twin of the wall-ratio bound (default-gate safe): the
    number of band-colliding candidate PAIRS on the skewed twin must stay
    within the volume the mega-dup cluster legitimately implies. If the
    band-blocking key were lost (the regression the wall test watched
    for), the candidate count jumps to ~n²/2 regardless of host load."""
    from pdf_parse_vector_db_spark.operators.dedup import minhash_portable_banded

    uni, skw = skew_dirs

    def n_cands(d: str) -> tuple[int, int]:
        docs = _docs(spark, d)
        stacked = minhash_portable_banded(docs)
        cands = (
            stacked.alias("l")
            .join(stacked.alias("r"), on=["band_idx", "key"])
            .filter(F.col("l.__id") < F.col("r.__id"))
            .select(F.col("l.__id"), F.col("r.__id"))
            .distinct()
        )
        return cands.count(), docs.count()

    c_uni, n = n_cands(uni)
    c_skw, n2 = n_cands(skw)
    assert n == n2
    # mega cluster: ~8% of docs pairwise-colliding → ≤ (0.08n)²/2 extra,
    # plus slack for hot-label coincidental collisions
    mega = int(0.08 * n) + 2
    bound = c_uni + mega * (mega - 1) // 2 + 4 * n
    assert c_skw <= bound, (c_uni, c_skw, bound)
    assert c_skw < n * (n - 1) // 4, (c_skw, n)  # nowhere near all-pairs

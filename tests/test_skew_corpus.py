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


# ---------------------------------------------------------------------------
# Round-6: STREAMING twins under skew (verdict #6) — the stream==batch
# contracts previously held only on uniform micro-batches; these re-run
# them with one hot key carrying a large share of rows across batches.
# ---------------------------------------------------------------------------


def test_skewed_streaming_session_windows_equal_batch(spark, skew_dirs, tmp_path):
    """Sessionization partitions state by user_id — the Zipf-hot user
    (>10% of all events) concentrates one state partition. Streamed
    session counts over the skewed events must equal the batch answer."""
    from pdf_parse_vector_db_spark.sources.registry import load_table
    from pdf_parse_vector_db_spark.streaming import windows as W

    _, skw = skew_dirs
    events = load_table(spark, skw, "events")
    landing = str(tmp_path / "ev_landing")
    events.write.parquet(landing)
    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    stream_src = W.with_watermark(
        spark.readStream.schema(schema).parquet(landing), "1 hour"
    )
    q = (
        W.session_counts(stream_src, "30 minutes")
        .writeStream.format("memory")
        .queryName("skw_session")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = [tuple(r) for r in spark.table("skw_session").orderBy("user_id", "session_start").collect()]
    want = [tuple(r) for r in W.session_counts(events, "30 minutes").orderBy("user_id", "session_start").collect()]
    assert got == want and len(want) > 0


def test_skewed_streaming_dedup_equals_batch_twin(spark, skew_dirs, tmp_path):
    """Streaming incremental dedup with the mega-dup cluster SPLIT ACROSS
    micro-batches: batch 2's cluster members must be dropped against the
    history band table (the pathological all-collide bucket), and the
    final corpus must equal the batch-mode composition of the same
    primitives (exact_dedup(b1), then b2 minus history near-dups)."""
    from pdf_parse_vector_db_spark.operators.dedup import (
        exact_dedup,
        minhash_portable_banded,
    )
    from pdf_parse_vector_db_spark.streaming.dedup_stream import (
        _near_dup_ids,
        stream_dedup_ingest,
    )

    _, skw = skew_dirs
    docs = _docs(spark, skw).persist()
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    # the mega cluster (hot source src0) spans both batches
    mega_b2 = b2.filter(F.col("source") == "src0").count()
    assert mega_b2 > 5, "fixture must put mega-cluster docs in batch 2"

    landing = str(tmp_path / "landing")
    corpus = str(tmp_path / "corpus")
    bands = str(tmp_path / "bands")
    ckpt = str(tmp_path / "ckpt")
    b1.write.mode("append").parquet(landing)
    stream_dedup_ingest(spark, landing, corpus, bands, ckpt).awaitTermination(180)
    b2.write.mode("append").parquet(landing)
    stream_dedup_ingest(spark, landing, corpus, bands, ckpt).awaitTermination(180)
    got = {r.doc_id for r in spark.read.parquet(corpus).select("doc_id").collect()}

    # batch twin of the same two steps
    surv1 = exact_dedup(b1)
    hist_bands = minhash_portable_banded(surv1).withColumnRenamed("__id", "hist_id")
    dup2 = _near_dup_ids(b2, hist_bands, surv1, threshold=0.5)
    surv2 = b2.join(dup2, on="doc_id", how="left_anti")
    want = {r.doc_id for r in surv1.select("doc_id").collect()} | {
        r.doc_id for r in surv2.select("doc_id").collect()
    }
    assert got == want
    # the hot bucket actually dropped most of batch 2's cluster members
    kept_mega_b2 = len(
        {r.doc_id for r in surv2.filter(F.col("source") == "src0").select("doc_id").collect()}
    )
    assert kept_mega_b2 < mega_b2 * 0.5, (kept_mega_b2, mega_b2)
    docs.unpersist()


def test_skewed_streaming_heavy_hitters_hot_user(spark, skew_dirs, tmp_path):
    """MG-as-state over the skewed event stream: terms are user ids, so
    the Zipf-hot user hammers one counter in every event_type's state
    across both micro-batches. Contract: every term whose LIFETIME count
    exceeds n_key/k (computed in batch) appears in the streamed summary —
    the hot user must be among them for at least one key — and state
    stays bounded at k counters."""
    from pdf_parse_vector_db_spark.sources.registry import load_table
    from pdf_parse_vector_db_spark.streaming.stateful import (
        _MG_STREAM_K,
        streaming_heavy_hitters,
    )

    _, skw = skew_dirs
    landing = str(tmp_path / "hh_landing")
    events = load_table(spark, skw, "events")
    terms = events.select(
        "event_id",
        "event_type",
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("term"),
    ).persist()
    terms.filter(F.col("event_id") % 2 == 0).write.mode("append").parquet(landing)
    stream = spark.readStream.schema(
        "event_id bigint, event_type string, term string"
    ).parquet(landing)
    hh = streaming_heavy_hitters(stream)
    out_rows: dict[int, list] = {}

    def sink(df, bid):
        out_rows[bid] = df.collect()

    for _ in range(2):
        q = (
            hh.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "hh_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        terms.filter(F.col("event_id") % 2 == 1).write.mode("append").parquet(landing)
    final = [r for rows in list(out_rows.values())[-1:] for r in rows]
    assert final, "second batch must emit summaries"
    summary: dict[str, set] = {}
    counters: dict[str, int] = {}
    for r in final:
        summary.setdefault(r.event_type, set()).add(r.candidate)
        counters[r.event_type] = counters.get(r.event_type, 0) + 1
    assert all(c <= _MG_STREAM_K for c in counters.values()), counters
    # lifetime counts from batch: the MG guarantee must hold per key
    lifetime = (
        terms.groupBy("event_type", "term").count()
        .join(terms.groupBy("event_type").agg(F.count("*").alias("n")), "event_type")
        .collect()
    )
    must_have = [
        (r.event_type, r.term) for r in lifetime if r["count"] > r["n"] / _MG_STREAM_K
    ]
    assert must_have, "skewed fixture must produce over-threshold terms"
    assert any(t == "u0" for _, t in must_have), "hot user must cross n/k somewhere"
    for key, term in must_have:
        assert term in summary.get(key, set()), (key, term, summary.get(key))
    terms.unpersist()


def test_skewed_scd2_hot_key_every_batch(spark, tmp_path):
    """SCD2 stream with one HOT customer changing in EVERY micro-batch
    (the hot-user shape: one key's state rewritten each trigger while the
    cold keys change once): four streamed batches must land the same
    dimension as four sequential batch merges, with the hot key holding
    one closed row per batch plus the current one."""
    import datetime

    from pdf_parse_vector_db_spark.streaming.scd2_stream import (
        DIM_COLS,
        scd2_merge,
        stream_scd2_apply,
    )

    t0 = datetime.date(1994, 1, 1)
    dim_dir = str(tmp_path / "dim")
    changes_dir = str(tmp_path / "changes")
    ckpt = str(tmp_path / "ckpt")
    schema = "c_custkey bigint, segment string, acctbal_cents bigint, eff_date date"

    dim0 = spark.createDataFrame(
        [(k, "BUILDING", 100 * k, 1, t0, None, True) for k in range(1, 5)],
        "c_custkey bigint, segment string, acctbal_cents bigint, version int, "
        "valid_from date, valid_to date, is_current boolean",
    )
    dim0.write.parquet(dim_dir)

    batches = []
    for i in range(4):
        eff = t0 + datetime.timedelta(days=30 * (i + 1))
        rows = [(1, "SEG%d" % i, 1000 + i, eff)]  # hot key: changes EVERY batch
        if i < 3:
            rows.append((2 + i, "COLD%d" % i, 7 * (i + 1), eff))  # cold key once
        batches.append(rows)

    expected = dim0
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).write.parquet(f"{changes_dir}/{i}")
        stream_scd2_apply(spark, f"{changes_dir}/{i}", dim_dir, f"{ckpt}/{i}").awaitTermination(120)
        expected = scd2_merge(expected, spark.createDataFrame(rows, schema))

    got = sorted(tuple(r[c] for c in DIM_COLS) for r in spark.read.parquet(dim_dir).collect())
    want = sorted(tuple(r[c] for c in DIM_COLS) for r in expected.collect())
    assert got == want
    hot = [r for r in got if r[0] == 1]
    assert len(hot) == 5  # initial + 4 changes
    assert sum(1 for r in hot if r[6]) == 1  # exactly one current row

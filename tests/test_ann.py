"""IVF/LSH scale tier vs exact brute force: recall@k + determinism
(SURVEY §4.3.1b; the analog of Milvus IVF_FLAT nlist=128/nprobe)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pdf_parse_vector_db_spark.operators import ann
from pdf_parse_vector_db_spark.operators.knn import knn_exact

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def query_vec(emb):
    return emb.filter(F.col("vec_id") == 0).collect()[0].embedding


def test_ivf_full_probe_equals_exact(spark, emb, query_vec):
    """nprobe == nlist must recover the exact answer (no pruning)."""
    idx = ann.build_ivf(emb, nlist=8)
    exact = knn_exact(emb, query_vec, k=5)
    approx = idx.search(query_vec, k=5, nprobe=8)
    assert ann.recall_at_k(approx, exact, "vec_id") == 1.0


def test_ivf_partial_probe_recall(spark, emb, query_vec):
    idx = ann.build_ivf(emb, nlist=8)
    exact = knn_exact(emb, query_vec, k=5)
    approx = idx.search(query_vec, k=5, nprobe=4)
    # half the cells probed: hot neighbors cluster near the query, so
    # recall should stay high on real data
    assert ann.recall_at_k(approx, exact, "vec_id") >= 0.6


def test_ivf_assignment_is_deterministic(spark, emb):
    idx1 = ann.build_ivf(emb, nlist=8)
    idx2 = ann.build_ivf(emb, nlist=8)
    a = idx1.clustered.select("vec_id", "cluster_id").orderBy("vec_id").collect()
    b = idx2.clustered.select("vec_id", "cluster_id").orderBy("vec_id").collect()
    assert a == b


def test_ivf_cluster_sizes_cover_corpus(spark, emb):
    idx = ann.build_ivf(emb, nlist=8)
    sizes = idx.clustered.groupBy("cluster_id").count().collect()
    assert sum(r["count"] for r in sizes) == emb.count()
    assert all(0 <= r.cluster_id < 8 for r in sizes)


def test_lsh_approx_neighbors(spark, emb, query_vec):
    from pyspark.ml.functions import array_to_vector

    model, indexed = ann.lsh_model(emb, bucket_length=2.0, num_tables=4)
    key_df = emb.filter(F.col("vec_id") == 0).select(
        array_to_vector(F.col("embedding")).alias("__features")
    )
    key = key_df.collect()[0]["__features"]
    approx = model.approxNearestNeighbors(indexed, key, 5)
    exact = knn_exact(emb, query_vec, k=5)
    assert ann.recall_at_k(approx, exact, "vec_id") >= 0.6


def test_lsh_sim_join_recall(spark, emb):
    """The N×M approxSimilarityJoin must recover most true pairs within the
    distance threshold (recall >= 0.8 vs the exact distance join)."""
    from pdf_parse_vector_db_spark.functions.vector import l2_distance
    from pdf_parse_vector_db_spark.plans.similarity import lsh_sim_join

    approx = {
        (r.q_id, r.c_id) for r in lsh_sim_join(spark, SF).collect()
    }
    queries = emb.select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    ).filter(F.col("q_id") % 20 == 0)
    exact = {
        (r.q_id, r.c_id)
        for r in emb.crossJoin(F.broadcast(queries))
        .filter(F.col("q_id") != F.col("vec_id"))
        .withColumn("d", l2_distance(F.col("q_vec"), F.col("embedding")))
        .filter(F.col("d") <= 1.25)
        .select("q_id", F.col("vec_id").alias("c_id"))
        .collect()
    }
    assert exact, "threshold too tight: exact pair set is empty"
    assert approx <= exact, "approx emitted pairs beyond the distance threshold"
    assert len(approx & exact) / len(exact) >= 0.8


def test_pq_adc_rerank_recall(spark, emb, query_vec):
    """PQ compression tier: ADC + exact-rerank top-5 must recover most of
    the exact top-5 even on the PQ-adversarial uniform-random fixture, and
    the reranked scores must BE the exact distances (rerank stage uses
    full vectors)."""
    from pdf_parse_vector_db_spark.plans.similarity import _pq_index

    idx = _pq_index(spark, SF)
    approx = idx.adc_search(query_vec, k=5, fetch=100)
    exact = knn_exact(emb, query_vec, k=5)
    assert ann.recall_at_k(approx, exact, "vec_id") >= 0.6
    exact_scores = {r.vec_id: r.score for r in knn_exact(emb, query_vec, k=500).collect()}
    for r in approx.collect():
        assert abs(r.score - exact_scores[r.vec_id]) < 1e-9


def test_ivf_persist_roundtrip(spark, emb, query_vec, tmp_path):
    """write_ivf → read_ivf must reopen the index WITHOUT a re-fit and
    answer identically; the reopened search must partition-prune (the
    cells scan reads only probed cluster_id partitions)."""
    idx = ann.build_ivf(emb, nlist=8)
    path = str(tmp_path / "ivf")
    ann.write_ivf(idx, path)
    reopened = ann.read_ivf(spark, path)
    want = [r.vec_id for r in idx.search(query_vec, k=5, nprobe=4).collect()]
    got_df = reopened.search(query_vec, k=5, nprobe=4)
    got = [r.vec_id for r in got_df.collect()]
    assert got == want
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    assert scans, plan
    pf = scans[0].split("PartitionFilters: ", 1)
    assert len(pf) == 2 and "cluster_id" in pf[1].split("]", 1)[0], scans[0]


def test_pca_matches_numpy(spark, emb):
    """Distributed sufficient-statistics PCA must match a driver-side numpy
    eigendecomposition of the same covariance to 6 dp."""
    import numpy as np

    from pdf_parse_vector_db_spark.operators.pca import pca_explained_variance

    got = pca_explained_variance(emb, k=8)
    x = np.stack(
        [np.asarray(r.embedding, dtype=np.float64) for r in emb.collect()]
    )
    cov = np.cov(x, rowvar=False, bias=True)
    evals = np.linalg.eigvalsh(cov)[::-1]
    total = evals.sum()
    assert len(got) == 8
    for i, row in enumerate(got):
        assert abs(row["eigenvalue"] - evals[i]) < 1e-4, (i, row, evals[i])
        assert abs(row["explained"] - evals[i] / total) < 1e-6
    cums = [row["cumulative"] for row in got]
    assert cums == sorted(cums)


def test_portable_e2lsh_candidates_and_rerank(spark):
    """Portable E2LSH tier: the reranked hits must be a subset of a deeper
    exact top-k with IDENTICAL scores (rerank uses full vectors), and the
    candidate gate must actually prune (not degenerate to a full scan)."""
    from pyspark.sql import functions as F

    from pdf_parse_vector_db_spark.plans.similarity import lsh_portable_knn
    from pdf_parse_vector_db_spark.sources.registry import load_table

    hits = lsh_portable_knn(spark, SF).collect()
    assert 1 <= len(hits) <= 5
    emb = load_table(spark, SF, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).collect()[0].embedding
    exact = {r.vec_id: r.score for r in knn_exact(emb, qvec, k=500).collect()}
    for r in hits:
        assert abs(r.score - round(exact[r.vec_id], 4)) < 1e-9
    # self-hit: the query vector shares every bucket with itself
    assert hits[0].vec_id == 0 and hits[0].score == 0.0


def test_bq_and_mrl_two_stage_tiers(spark):
    """X61 sanity beyond the oracle hash: both coarse stages are
    loss-bounded candidate generators — the query vector itself (exact
    distance 0, Hamming 0, prefix distance 0) survives both cuts and
    ranks first; and the two-stage result's top-5 L2 distances are
    bounded below by the exact top-5 (a candidate cut can only lose
    neighbors, never invent closer ones)."""
    from pdf_parse_vector_db_spark.plans.similarity import bq_knn, mrl_knn
    from pyspark.sql import functions as F

    from pdf_parse_vector_db_spark.functions.vector import l2_distance

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    exact = [
        r.d
        for r in emb.crossJoin(F.broadcast(q))
        .select(F.round(l2_distance(F.col("embedding"), F.col("qvec")), 4).alias("d"))
        .orderBy("d")
        .limit(5)
        .collect()
    ]
    for fn in (bq_knn, mrl_knn):
        rows = fn(spark, sf).collect()
        assert len(rows) == 5
        assert rows[0].vec_id == 0 and rows[0].score == 0.0, fn.__name__
        got = [r.score for r in rows]
        assert all(g >= e for g, e in zip(got, exact)), (fn.__name__, got, exact)


def test_pack_sign_bits_matches_numpy(spark):
    """X61 storage: the codegen sign-bit packer agrees bit-for-bit with
    a numpy reference, including a dim NOT divisible by 64 (tail word
    padding) and the sign-bit word position (bit 63 via the two-half
    shiftleft fold)."""
    import numpy as np

    from pdf_parse_vector_db_spark.operators import vector_store

    rng = np.random.default_rng(5)
    dim = 70  # 2 words, 6 live bits in the tail word
    vecs = rng.normal(size=(20, dim))
    vecs[3, 63] = 7.5  # force a sign bit into word 0's bit 63
    vecs[4, 63] = -7.5
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    rows = df.select(
        "vec_id", vector_store.pack_sign_bits_expr("embedding", dim).alias("p")
    ).collect()
    assert all(len(r.p) == 2 for r in rows)
    for r in rows:
        v = vecs[r.vec_id]
        for j in range(dim):
            w, off = divmod(j, 64)
            got = ((r.p[w] & 0xFFFFFFFFFFFFFFFF) >> off) & 1
            assert got == int(v[j] > 0), (r.vec_id, j)
        # tail padding beyond dim is zero
        assert (r.p[1] & 0xFFFFFFFFFFFFFFFF) >> (dim - 64) == 0


def test_hamming_packed_equals_per_dim_sign_mismatch(spark):
    import numpy as np

    from pdf_parse_vector_db_spark.operators import vector_store

    rng = np.random.default_rng(11)
    dim = 70
    vecs = rng.normal(size=(10, dim))
    q = vecs[0]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v], [float(x) for x in q]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>, qvec array<double>",
    )
    got = {
        r.vec_id: r.h
        for r in df.select(
            "vec_id",
            vector_store.hamming_packed(
                vector_store.pack_sign_bits_expr("embedding", dim),
                vector_store.pack_sign_bits_expr("qvec", dim),
            ).alias("h"),
        ).collect()
    }
    for i, v in enumerate(vecs):
        assert got[i] == int(((v > 0) != (q > 0)).sum()), i


def test_bq_mrl_coarse_scans_prune_to_compressed_columns(spark):
    """The round-9 storage fix's whole point: the coarse stage's parquet
    scan projects ONLY (vec_id, label, packed|prefix) — column pruning
    means the full float embedding bytes are read exclusively by the
    candidate-row rerank scan, never by the corpus-wide coarse scan."""
    from pdf_parse_vector_db_spark.plans.similarity import bq_knn, mrl_knn

    for fn, col in ((bq_knn, "packed"), (mrl_knn, "prefix")):
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        scans = [l for l in plan.splitlines() if "ReadSchema" in l]
        coarse = [l for l in scans if col in l]
        assert coarse, (fn.__name__, scans)
        assert all("embedding" not in l for l in coarse), (fn.__name__, coarse)


def test_graph_knn_recall_vs_exact(spark):
    """X62 graph-ANN contract: the beam search's top-5 over the
    NN-Descent graph recalls ≥ 4 of the exact cosine top-5 (the query
    node itself, distance 0, must always be found — it is reachable from
    any entry seed in ≤ graph-diameter hops), and its distances are
    bounded below by the exact ones (a bounded beam can lose neighbors,
    never invent closer ones)."""
    from pdf_parse_vector_db_spark.functions.vector import cosine_similarity
    from pdf_parse_vector_db_spark.plans.knn_graph import graph_knn

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("qvec")
    )
    exact = (
        emb.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(
                (F.lit(1.0) - cosine_similarity(
                    F.col("embedding").cast("array<double>"), F.col("qvec")
                )) , 6,
            ).alias("d"),
        )
        .orderBy("d", "vec_id")
        .limit(5)
        .collect()
    )
    got = graph_knn(spark, sf).collect()
    assert len(got) == 5
    assert got[0].vec_id == 0 and got[0].score == 0.0
    overlap = {r.vec_id for r in got} & {r.vec_id for r in exact}
    assert len(overlap) >= 4, (sorted(r.vec_id for r in got), exact)
    for g, e in zip([r.score for r in got], [round(r.d, 4) for r in exact]):
        assert g >= e, (got, exact)


def test_sync_compressed_layout_from_feed(spark, tmp_path):
    """X61 CDC maintenance: the packed/prefix layout follows the source
    table exactly-once off the change feed — content equals a bulk
    re-pack of the full corpus after every batch, replayed windows are
    version-frozen no-ops, and packing needs no global state (append
    batches commute with the bulk build bit-for-bit)."""
    from pdf_parse_vector_db_spark.operators import vector_store as vs
    from pdf_parse_vector_db_spark.sources import manifest as M

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    dim = emb.select(F.size("embedding")).first()[0]
    src, lt = str(tmp_path / "src"), str(tmp_path / "layout")

    M.commit_append(spark, src, emb.filter(F.col("vec_id") < 300))
    c1 = vs.sync_compressed_layout_from_feed(spark, src, lt, 0, dim)
    v1 = M.head_version(spark, lt)
    # replay: no-op
    assert vs.sync_compressed_layout_from_feed(spark, src, lt, 0, dim) == c1
    assert M.head_version(spark, lt) == v1

    M.commit_append(spark, src, emb.filter(F.col("vec_id") >= 300))
    c2 = vs.sync_compressed_layout_from_feed(spark, src, lt, c1, dim)
    _, layout = M.snapshot(spark, lt)
    got = {
        r.vec_id: (tuple(r.packed), tuple(r.prefix)) for r in layout.collect()
    }
    want = {
        r.vec_id: (tuple(r.packed), tuple(r.prefix))
        for r in vs.compressed_columns(emb, dim).collect()
    }
    assert got == want  # streamed layout == bulk re-pack, bit for bit
    # quiescent empty window
    assert vs.sync_compressed_layout_from_feed(spark, src, lt, c2, dim) == c2
    assert M.head_version(spark, lt) == M.head_version(spark, lt)

    # search the SYNCED layout (the full production loop): a corpus
    # vector retrieves itself at distance 0, the two-stage result is
    # bounded below by exact, and matches bq_knn's answer for the same
    # query vector (bq_knn rebuilds from the fixture; both rank with
    # identical arithmetic)
    from pdf_parse_vector_db_spark.plans.similarity import bq_knn

    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first().embedding]
    got = vs.search_compressed_layout(spark, lt, qvec, k=5).collect()
    want = bq_knn(spark, SF).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_ivf_filtered_knn_respects_filter_and_bounds(spark):
    """Milvus-parity filtered ANN: every hit satisfies the predicate,
    and the probed result's distances are bounded below by the exact
    FILTERED top-5 (a probe cut can only lose qualifying neighbors,
    never admit non-qualifying or invent closer ones)."""
    from pdf_parse_vector_db_spark.functions.vector import l2_distance
    from pdf_parse_vector_db_spark.plans.similarity import ivf_filtered_knn

    rows = ivf_filtered_knn(spark, SF).collect()
    assert len(rows) == 5
    assert all(r.label == 1 for r in rows)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    exact = [
        r.d
        for r in emb.filter(F.col("label") == 1)
        .crossJoin(F.broadcast(q))
        .select(F.round(l2_distance(F.col("embedding"), F.col("qvec")), 4).alias("d"))
        .orderBy("d")
        .limit(5)
        .collect()
    ]
    got = [r.score for r in rows]
    assert all(g >= e for g, e in zip(got, exact)), (got, exact)


def test_bq_filtered_knn_predicate_bounds_and_pushdown(spark):
    """X66 filtered BQ: every hit satisfies the predicate, distances are
    bounded below by the exact FILTERED top-5 (measured 5/5 recall at
    sf0.001, pinned ≥4), and the predicate is PUSHED into the packed
    coarse scan — the (vec_id, label, packed) parquet scan carries the
    label filter in PushedFilters and never reads the embedding bytes."""
    from pdf_parse_vector_db_spark.functions.vector import l2_distance
    from pdf_parse_vector_db_spark.plans.similarity import bq_filtered_knn

    df = bq_filtered_knn(spark, SF)
    rows = df.collect()
    assert len(rows) == 5
    assert all(r.label == 1 for r in rows)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    exact = [
        (r.vec_id, r.d)
        for r in emb.filter(F.col("label") == 1)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(l2_distance(F.col("embedding"), F.col("qvec")), 4).alias("d"),
        )
        .orderBy("d", "vec_id")
        .limit(5)
        .collect()
    ]
    got = [r.score for r in rows]
    assert all(g >= e for g, e in zip(got, [d for _, d in exact])), (got, exact)
    assert len({r.vec_id for r in rows} & {v for v, _ in exact}) >= 4

    plan = df._jdf.queryExecution().executedPlan().toString()
    coarse = [
        ln
        for ln in plan.splitlines()
        if "ReadSchema" in ln and "packed" in ln and "FileScan" in ln
    ]
    assert coarse, plan
    # no packed scan (corpus coarse stage or the 1-row query lookup)
    # ever reads the float embedding bytes
    for ln in coarse:
        assert "embedding" not in ln, ln
    # and the CORPUS coarse scan carries the predicate as PushedFilters
    # (the query's own vec_id=0 lookup legitimately filters on vec_id)
    pushed = [
        ln
        for ln in coarse
        if "EqualTo(label,1)" in ln.split("PushedFilters: ", 1)[-1].split("]", 1)[0]
    ]
    assert pushed, coarse


def test_graph_filtered_knn_predicate_and_recall(spark):
    """X66 filtered graph-ANN (ACORN shape): every hit satisfies the
    predicate, cosine distances are bounded below by the exact FILTERED
    top-5, and recall ≥ 4/5 (measured 5/5 at sf0.001 — the 2-hop
    expansion through non-matching stepping stones keeps the filtered
    frontier connected on the uniform fixture)."""
    from pdf_parse_vector_db_spark.functions.vector import cosine_similarity
    from pdf_parse_vector_db_spark.plans.knn_graph import graph_filtered_knn

    rows = graph_filtered_knn(spark, SF).collect()
    assert len(rows) == 5
    assert all(r.label == 1 for r in rows)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("qvec")
    )
    exact = [
        (r.vec_id, round(r.d, 4))
        for r in emb.filter(F.col("label") == 1)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(
                F.lit(1.0)
                - cosine_similarity(
                    F.col("embedding").cast("array<double>"), F.col("qvec")
                ),
                6,
            ).alias("d"),
        )
        .orderBy("d", "vec_id")
        .limit(5)
        .collect()
    ]
    got = [r.score for r in rows]
    assert all(g >= e for g, e in zip(got, [d for _, d in exact])), (got, exact)
    assert len({r.vec_id for r in rows} & {v for v, _ in exact}) >= 4


def test_mrl_filtered_knn_predicate_bounds_and_pruning(spark):
    """X66 filtered MRL: predicate respected, distances bounded below by
    the exact FILTERED top-5, and the prefix coarse scan carries the
    pushed label filter while never reading the embedding bytes."""
    from pdf_parse_vector_db_spark.functions.vector import l2_distance
    from pdf_parse_vector_db_spark.plans.similarity import mrl_filtered_knn

    df = mrl_filtered_knn(spark, SF)
    rows = df.collect()
    assert len(rows) == 5
    assert all(r.label == 1 for r in rows)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    exact = [
        r.d
        for r in emb.filter(F.col("label") == 1)
        .crossJoin(F.broadcast(q))
        .select(F.round(l2_distance(F.col("embedding"), F.col("qvec")), 4).alias("d"))
        .orderBy("d")
        .limit(5)
        .collect()
    ]
    assert all(g >= e for g, e in zip([r.score for r in rows], exact))
    plan = df._jdf.queryExecution().executedPlan().toString()
    coarse = [
        ln
        for ln in plan.splitlines()
        if "ReadSchema" in ln and "prefix" in ln and "FileScan" in ln
    ]
    assert coarse, plan
    for ln in coarse:
        assert "embedding" not in ln, ln
    assert any(
        "EqualTo(label,1)" in ln.split("PushedFilters: ", 1)[-1].split("]", 1)[0]
        for ln in coarse
    ), coarse


def test_sq8_pack_matches_numpy(spark):
    """X71 storage: the codegen SQ8 packer agrees byte-for-byte with a
    numpy reference quantizer — per-dim affine byte codes (HALF_UP
    rounding), 8 codes OR-folded per BIGINT word — including a dim NOT
    divisible by 8 (tail padding), a degenerate constant dimension
    (max == min -> code 0), and a code >= 128 landing in a word's top
    byte (bit 63 via shiftleft, no ANSI overflow)."""
    import numpy as np

    from pdf_parse_vector_db_spark.operators import vector_store

    rng = np.random.default_rng(7)
    dim = 13  # 2 words, 3 pad bytes in the tail word
    vecs = rng.normal(size=(30, dim))
    vecs[:, 4] = 2.25  # degenerate dim: max == min
    vecs[5, 7] = vecs[:, 7].max() + 9.0  # force code 255 into word 0's top byte
    df = spark.createDataFrame(
        [(i, 0, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, label int, embedding array<double>",
    )
    params = vector_store.sq8_train_params(df)
    rows = (
        df.crossJoin(F.broadcast(params))
        .select("vec_id", vector_store.sq8_pack_expr("embedding", dim).alias("w"))
        .collect()
    )
    mn, mx = vecs.min(axis=0), vecs.max(axis=0)
    span = mx - mn
    codes = np.zeros_like(vecs, dtype=np.int64)
    live = span > 0
    # HALF_UP for non-negative x == floor(x + 0.5)
    codes[:, live] = np.floor(
        (vecs[:, live] - mn[live]) / span[live] * 255.0 + 0.5
    ).astype(np.int64)
    assert codes.min() >= 0 and codes.max() == 255
    for r in rows:
        v = codes[r.vec_id]
        for j in range(dim):
            w, off = divmod(j, 8)
            got = ((r.w[w] & 0xFFFFFFFFFFFFFFFF) >> (off * 8)) & 0xFF
            assert got == v[j], (r.vec_id, j, got, v[j])
        # tail bytes past dim are zero
        assert (r.w[1] & 0xFFFFFFFFFFFFFFFF) >> ((dim - 8) * 8) == 0


def test_sq8_dequant_error_bound(spark):
    """Quantization loss contract: every dequantized coordinate is
    within half a quantization step (scale/2 = span/510) of the true
    value — the bound that makes the SQ8 coarse rank a usable candidate
    generator."""
    import numpy as np

    from pdf_parse_vector_db_spark.operators import vector_store

    rng = np.random.default_rng(13)
    dim = 16
    vecs = rng.normal(size=(40, dim))
    df = spark.createDataFrame(
        [(i, 0, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, label int, embedding array<double>",
    )
    params = vector_store.sq8_train_params(df)
    rows = (
        df.crossJoin(F.broadcast(params))
        .select(
            "vec_id",
            "mins",
            "maxs",
            vector_store.sq8_pack_expr("embedding", dim).alias("w"),
        )
        .select("vec_id", vector_store.sq8_dequant_expr("w", dim).alias("dq"))
        .collect()
    )
    span = vecs.max(axis=0) - vecs.min(axis=0)
    half_step = span / 510.0 + 1e-12
    for r in rows:
        err = np.abs(np.array(r.dq) - vecs[r.vec_id])
        assert (err <= half_step).all(), (r.vec_id, err.max())


def test_sq8_two_stage_lower_bound_and_pruning(spark):
    """X71 sanity beyond the oracle hash: the query row survives the
    ADC coarse cut and reranks first at distance 0; the two-stage top-5
    distances are bounded below by the exact top-5; and the coarse
    stage's parquet scan projects ONLY (vec_id, sq8) — the float
    embedding bytes are read exclusively by the candidate rerank."""
    from pdf_parse_vector_db_spark.functions.vector import l2_distance
    from pdf_parse_vector_db_spark.plans.similarity import sq8_knn

    df = sq8_knn(spark, SF)
    rows = df.collect()
    assert len(rows) == 5
    assert rows[0].vec_id == 0 and rows[0].score == 0.0
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    exact = [
        (r.vec_id, r.d)
        for r in emb.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(l2_distance(F.col("embedding"), F.col("qvec")), 4).alias("d"),
        )
        .orderBy("d", "vec_id")
        .limit(5)
        .collect()
    ]
    got = [r.score for r in rows]
    assert all(g >= e for g, e in zip(got, [d for _, d in exact])), (got, exact)
    assert len({r.vec_id for r in rows} & {v for v, _ in exact}) >= 4

    plan = df._jdf.queryExecution().executedPlan().toString()
    coarse = [
        ln
        for ln in plan.splitlines()
        if "FileScan" in ln and "sq8:" in ln.split("ReadSchema: ", 1)[-1]
    ]
    assert coarse, plan
    for ln in coarse:
        assert "embedding" not in ln.split("ReadSchema: ", 1)[-1], ln


def test_sq8_filtered_knn_predicate_bounds_and_pushdown(spark):
    """X71 filtered SQ8: every hit satisfies the predicate, distances
    bounded below by the exact FILTERED top-5, and the predicate is
    PUSHED into the packed byte-code coarse scan (PushedFilters on the
    (vec_id, label, sq8) projection; embedding bytes untouched)."""
    from pdf_parse_vector_db_spark.functions.vector import l2_distance
    from pdf_parse_vector_db_spark.plans.similarity import sq8_filtered_knn

    df = sq8_filtered_knn(spark, SF)
    rows = df.collect()
    assert len(rows) == 5
    assert all(r.label == 1 for r in rows)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    exact = [
        (r.vec_id, r.d)
        for r in emb.filter(F.col("label") == 1)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(l2_distance(F.col("embedding"), F.col("qvec")), 4).alias("d"),
        )
        .orderBy("d", "vec_id")
        .limit(5)
        .collect()
    ]
    got = [r.score for r in rows]
    assert all(g >= e for g, e in zip(got, [d for _, d in exact])), (got, exact)
    assert len({r.vec_id for r in rows} & {v for v, _ in exact}) >= 4

    plan = df._jdf.queryExecution().executedPlan().toString()
    coarse = [
        ln
        for ln in plan.splitlines()
        if "FileScan" in ln and "sq8:" in ln.split("ReadSchema: ", 1)[-1]
    ]
    assert coarse, plan
    for ln in coarse:
        assert "embedding" not in ln.split("ReadSchema: ", 1)[-1], ln
    assert any(
        "EqualTo(label,1)" in ln.split("PushedFilters: ", 1)[-1].split("]", 1)[0]
        for ln in coarse
    ), coarse


def test_ivf_sq8_composed_lower_bound(spark):
    """X71b: the composed IVF_SQ8 result is still a loss-bounded
    candidate cut — the query row (its own cell is always probed,
    ADC distance minimal) reranks first at 0, and the top-5 distances
    are bounded below by the exact top-5 (two stacked prunings can lose
    neighbors, never invent closer ones); overlap with exact inherits
    the IVF stage's partial-probe recall floor on this adversarial
    uniform fixture (test_ivf_partial_probe_recall pins >= 0.6, i.e.
    3/5 — measured exactly 3/5 here, the SQ8 stage costing nothing)."""
    from pdf_parse_vector_db_spark.functions.vector import l2_distance
    from pdf_parse_vector_db_spark.plans.similarity import ivf_sq8_knn

    rows = ivf_sq8_knn(spark, SF).collect()
    assert len(rows) == 5
    assert rows[0].vec_id == 0 and rows[0].score == 0.0
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    exact = [
        (r.vec_id, r.d)
        for r in emb.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(l2_distance(F.col("embedding"), F.col("qvec")), 4).alias("d"),
        )
        .orderBy("d", "vec_id")
        .limit(5)
        .collect()
    ]
    got = [r.score for r in rows]
    assert all(g >= e for g, e in zip(got, [d for _, d in exact])), (got, exact)
    assert len({r.vec_id for r in rows} & {v for v, _ in exact}) >= 3

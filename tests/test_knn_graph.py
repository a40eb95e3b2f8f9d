"""X51 NN-Descent k-NN graph + X52 DBSCAN density clustering contracts.

The oracle certifies cross-engine equality; these tests pin the claims an
oracle can't: the NN-Descent local join genuinely converges toward the
exact graph when the data has neighborhood structure (the paper's premise
— a planted-cluster fixture, since the driver fixtures' embeddings are
uniformly random), graph shape invariants, DBSCAN's accounting identity,
and plan hygiene (no CartesianProduct anywhere in either pipeline).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

import pdf_parse_vector_db_spark.plans.knn_graph as kg

SF = "/root/testdata/sf0.001"

_N_CLUSTERS = 20
_PER_CLUSTER = 10


@pytest.fixture(scope="module")
def planted(tmp_path_factory):
    """20 tight clusters of 10 points each (σ=0.05 around random unit-ish
    centers in 64-d) — data where the neighbor-of-neighbor premise holds
    and the true top-K is in-cluster."""
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(_N_CLUSTERS, 64))
    vecs = [
        (c + 0.05 * rng.normal(size=64)).astype(np.float32)
        for c in centers
        for _ in range(_PER_CLUSTER)
    ]
    d = str(tmp_path_factory.mktemp("planted"))
    n = len(vecs)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in vecs], pa.list_(pa.float32())
                ),
                "label": pa.array([i // _PER_CLUSTER for i in range(n)], pa.int32()),
            }
        ),
        os.path.join(d, "embeddings.parquet"),
    )
    return d, np.array(vecs, dtype=np.float64)


def _exact_topk(vecs: np.ndarray, k: int) -> set[tuple[int, int]]:
    m = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = m @ m.T
    np.fill_diagonal(sims, -9.0)
    n = len(vecs)
    d = np.round(1.0 - sims, 6)
    out = set()
    for i in range(n):
        order = np.lexsort((np.arange(n), d[i]))
        out.update((i, int(j)) for j in order[:k])
    return out


def test_nn_descent_recall_on_planted(spark, planted):
    """Convergence: 3 local-join rounds from a pseudo-random init recover
    ≥95% of the exact top-K graph when neighborhoods exist (measured
    0.994; K=3/2 rounds scored 0.14, which is why _K=8/_ROUNDS=3)."""
    d, vecs = planted
    got = kg.nn_descent_graph(spark, d).collect()
    got_edges = {(r.vec_id, r.nbr_id) for r in got}
    exact = _exact_topk(vecs, kg._K)
    recall = len(got_edges & exact) / len(exact)
    assert recall >= 0.95, recall


def test_nn_descent_improves_over_init(spark):
    """On the uniformly-random driver fixture the local join still has to
    beat the random init decisively: most final edges are discoveries and
    the mean distance drops well under the random-pair mean (≈1.0)."""
    got = kg.nn_descent_graph(spark, SF).collect()
    frac_new = sum(r.is_new for r in got) / len(got)
    mean_dist = sum(r.dist for r in got) / len(got)
    assert frac_new > 0.5, frac_new
    assert mean_dist < 0.9, mean_dist


def test_nn_descent_graph_shape(spark):
    """Exactly K ranked rows per node (dense fixture ids ⇒ the init
    semi-join drops nothing), ranks 1..K, no self-edges, and is_new=0
    rows are exactly the surviving init-stride edges."""
    rows = kg.nn_descent_graph(spark, SF).collect()
    n = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert len(rows) == n * kg._K
    per = {}
    for r in rows:
        assert r.vec_id != r.nbr_id
        per.setdefault(r.vec_id, []).append(r.rnk)
    assert all(sorted(v) == list(range(1, kg._K + 1)) for v in per.values())
    survivors = {(r.vec_id, r.nbr_id) for r in rows if r.is_new == 0}
    init = {
        (s, (s + p) % n)
        for s in range(n)
        for p in kg._STRIDES
        if (s + p) % n != s
    }
    assert survivors <= init


def test_dbscan_recovers_planted_clusters(spark, planted):
    """On the planted fixture every cluster is recovered whole: 20
    clusters of exactly 10 members, all core (tight balls ⇒ everyone has
    ≥ minPts-1 eps-neighbors), zero border, zero noise."""
    d, _ = planted
    rows = {r.cluster_id: r for r in kg.dbscan_clusters(spark, d).collect()}
    noise = rows.pop(-1)
    assert noise.n_total == 0
    assert len(rows) == _N_CLUSTERS
    assert all(r.n_core == _PER_CLUSTER and r.n_border == 0 for r in rows.values())
    # cluster ids are the min member id of each planted block
    assert set(rows) == {i * _PER_CLUSTER for i in range(_N_CLUSTERS)}


def test_dbscan_accounting_identity(spark):
    """Core + border + noise partition the corpus: Σ n_total over all
    rows (incl. the -1 noise row) equals N, and per-cluster
    n_core + n_border == n_total."""
    rows = kg.dbscan_clusters(spark, SF).collect()
    n = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert sum(r.n_total for r in rows) == n
    clusters = [r for r in rows if r.cluster_id != -1]
    assert all(r.n_core + r.n_border == r.n_total for r in clusters)
    assert all(r.n_core >= 1 for r in clusters)
    noise = [r for r in rows if r.cluster_id == -1]
    assert len(noise) == 1 and noise[0].n_core == 0 and noise[0].n_border == 0


def test_plan_hygiene_no_cartesian(spark):
    """Both pipelines: stride init is a broadcast, candidate joins are
    hash joins on integer ids, eps-pairs ride the bucketed kernel — a
    CartesianProduct anywhere means a join key was lost."""
    for fn in (
        kg.nn_descent_graph,
        kg.dbscan_clusters,
        kg.dbscan_clusters_halo,
        kg._nn_descent_incremental_query,
    ):
        df = fn(spark, SF)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        body = plan.split("== Initial Plan ==")[0]
        assert "CartesianProduct" not in body, (fn.__name__, body)


def test_dbscan_halo_eps_graph_recall(spark):
    """X54 contract: the multi-probe halo candidate generator strictly
    dominates same-cell (superset) and materially closes the gap to the
    brute-force eps-graph on the uniformly-random driver fixture
    (measured: same-cell 0.245, halo 0.556 — cross-cell eps-pairs are
    MOST of what same-cell misses on unstructured data)."""
    from pdf_parse_vector_db_spark.operators import dedup

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    exact = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_near_dup_pairs(emb, threshold=kg._EPS_COS)
        .select("id_a", "id_b")
        .collect()
    }
    same = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_near_dup_pairs(
            emb.join(kg._ivf_assign(emb), on="vec_id"),
            threshold=kg._EPS_COS,
            bucket_col="cluster_id",
        )
        .select("id_a", "id_b")
        .collect()
    }
    halo = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_near_dup_pairs(
            emb.join(kg._ivf_probe_assign(emb, kg._HALO_NPROBE), on="vec_id"),
            threshold=kg._EPS_COS,
            bucket_col="cluster_id",
        )
        .select("id_a", "id_b")
        .distinct()
        .collect()
    }
    assert same <= halo  # widening the probe set never loses a candidate
    r_same = len(same & exact) / len(exact)
    r_halo = len(halo & exact) / len(exact)
    assert r_halo >= r_same + 0.2, (r_same, r_halo)
    assert r_halo >= 0.5, r_halo


def test_dbscan_halo_matches_exact_dbscan_on_planted(spark, planted):
    """The halo tier is MORE faithful to exact DBSCAN than same-cell: on
    the planted fixture the brute-force eps-graph genuinely links blocks
    14 and 19 (their centers' cosine ≥ eps — verified numerically below),
    so exact DBSCAN yields 19 clusters. Same-cell X52 misses that
    cross-cell edge (its own test pins 20 clusters); the halo finds it
    and reproduces the exact clustering: 18 pure blocks + one merged
    14∪19, all core, no noise."""
    d, vecs = planted
    m = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = np.round(m @ m.T, 6)
    np.fill_diagonal(sims, -9.0)
    ia, ib = np.nonzero(sims >= kg._EPS_COS)
    cross = {
        tuple(sorted((int(i) // _PER_CLUSTER, int(j) // _PER_CLUSTER)))
        for i, j in zip(ia, ib)
        if i // _PER_CLUSTER != j // _PER_CLUSTER
    }
    assert cross == {(14, 19)}  # the fixture's one true cross-block link
    rows = {r.cluster_id: r for r in kg.dbscan_clusters_halo(spark, d).collect()}
    noise = rows.pop(-1)
    assert noise.n_total == 0
    assert len(rows) == _N_CLUSTERS - 1  # exact DBSCAN's cluster count
    merged = rows.pop(14 * _PER_CLUSTER)  # min member id of 14∪19
    assert merged.n_core == 2 * _PER_CLUSTER and merged.n_border == 0
    assert all(r.n_core == _PER_CLUSTER and r.n_border == 0 for r in rows.values())
    assert set(rows) == {
        i * _PER_CLUSTER for i in range(_N_CLUSTERS) if i not in (14, 19)
    }


def _graph_edges(rows):
    return {(r.vec_id, r.nbr_id) for r in rows}


def test_nn_descent_update_matches_full_rebuild(spark, planted):
    """X57 contract: build the graph over the first 18 planted blocks,
    then incrementally insert the last 2 blocks' 20 points. The updated
    graph must (a) keep the exact output shape over the UNION corpus,
    (b) agree with a from-scratch rebuild on ≥90% of edges, and (c) give
    the NEW nodes their true in-cluster top-K (exact recall on the
    inserted neighborhoods — the part a production ingest cares about)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    d, vecs = planted
    n = len(vecs)
    cut = 18 * _PER_CLUSTER
    old_dir = str(d) + "_old"
    os.makedirs(old_dir, exist_ok=True)
    full_tbl = pq.read_table(os.path.join(d, "embeddings.parquet"))
    pq.write_table(full_tbl.slice(0, cut), os.path.join(old_dir, "embeddings.parquet"))

    old_graph = kg.nn_descent_graph(spark, old_dir)
    emb_all = spark.read.parquet(f"{d}/embeddings.parquet")
    new_ids = emb_all.filter(F.col("vec_id") >= cut).select("vec_id")
    updated = kg.nn_descent_update(spark, emb_all, old_graph, new_ids).collect()

    # (a) shape: K ranked rows for every union node, no self-edges
    assert len(updated) == n * kg._K
    per = {}
    for r in updated:
        assert r.vec_id != r.nbr_id
        per.setdefault(r.vec_id, []).append(r.rnk)
    assert all(sorted(v) == list(range(1, kg._K + 1)) for v in per.values())

    # (b) global agreement with the full rebuild
    rebuilt = _graph_edges(kg.nn_descent_graph(spark, d).collect())
    got = _graph_edges(updated)
    agree = len(got & rebuilt) / len(rebuilt)
    assert agree >= 0.90, agree

    # (c) the inserted nodes' neighborhoods are EXACT
    exact = _exact_topk(vecs, kg._K)
    new_got = {(a, b) for a, b in got if a >= cut}
    new_exact = {(a, b) for a, b in exact if a >= cut}
    recall_new = len(new_got & new_exact) / len(new_exact)
    assert recall_new >= 0.95, recall_new

    # is_new marks exactly the edges absent from the input graph
    old_edges = _graph_edges(old_graph.collect())
    for r in updated:
        assert r.is_new == (0 if (r.vec_id, r.nbr_id) in old_edges else 1)


def test_nn_descent_update_untouched_nodes_pass_through(spark):
    """Locality: updating with an EMPTY batch is an identity — no node
    re-ranks, every row (distances included) passes through unchanged."""
    graph = kg.nn_descent_graph(spark, SF)
    emb_all = spark.read.parquet(f"{SF}/embeddings.parquet")
    empty = emb_all.filter(F.lit(False)).select("vec_id")
    updated = kg.nn_descent_update(spark, emb_all, graph, empty)
    base = {(r.vec_id, r.rnk, r.nbr_id, r.dist) for r in graph.collect()}
    got = {(r.vec_id, r.rnk, r.nbr_id, r.dist) for r in updated.collect()}
    assert got == base


@pytest.mark.slow
def test_sync_knn_graph_from_feed_exactly_once_and_agreement(spark, planted, tmp_path):
    """X63 contract (the CDC → k-NN-graph composition): syncing the
    manifested graph table off the source change feed is (a) exactly
    once under window replay — a crash after the graph commit but before
    the cursor persists replays as a version-preserving no-op, keyed by
    the SOURCE VERSION WINDOW; (b) convergent — after N ingest batches
    the stored graph agrees with a from-scratch rebuild on ≥90% of
    edges and keeps the exact per-node shape; (c) quiescent — an empty
    feed window commits nothing."""
    from pdf_parse_vector_db_spark.sources import manifest as M

    d, vecs = planted
    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    cut = 18 * _PER_CLUSTER
    src = str(tmp_path / "src")
    gt = str(tmp_path / "graph")

    M.commit_append(spark, src, emb.filter(F.col("vec_id") < cut))
    cursor = kg.sync_knn_graph_from_feed(spark, src, gt, 0)  # bootstrap build
    v_boot = M.head_version(spark, gt)
    assert v_boot == 1

    M.commit_append(
        spark,
        src,
        emb.filter(
            (F.col("vec_id") >= cut) & (F.col("vec_id") < 19 * _PER_CLUSTER)
        ),
    )
    c1 = kg.sync_knn_graph_from_feed(spark, src, gt, cursor)
    v1 = M.head_version(spark, gt)
    assert c1 > cursor and v1 > v_boot

    # (a) replay the SAME window: same cursor back, graph version frozen
    assert kg.sync_knn_graph_from_feed(spark, src, gt, cursor) == c1
    assert M.head_version(spark, gt) == v1

    M.commit_append(spark, src, emb.filter(F.col("vec_id") >= 19 * _PER_CLUSTER))
    c2 = kg.sync_knn_graph_from_feed(spark, src, gt, c1)

    # (b) stored graph shape + agreement with the full rebuild
    _, g = M.snapshot(spark, gt)
    rows = g.collect()
    n = len(vecs)
    assert len(rows) == n * kg._K
    per: dict[int, set] = {}
    for r in rows:
        assert r.vec_id != r.nbr_id
        per.setdefault(r.vec_id, set()).add(r.rnk)
    assert all(v == set(range(1, kg._K + 1)) for v in per.values())
    rebuilt = _graph_edges(kg.nn_descent_graph(spark, str(d)).collect())
    agree = len(_graph_edges(rows) & rebuilt) / len(rebuilt)
    assert agree >= 0.90, agree

    # (c) empty window: cursor echoes, nothing commits
    v2 = M.head_version(spark, gt)
    assert kg.sync_knn_graph_from_feed(spark, src, gt, c2) == c2
    assert M.head_version(spark, gt) == v2

    # (d) search the STORED graph (X62 over the X63 artifact): the
    # production loop end to end — a corpus vector retrieves itself at
    # distance 0, its in-cluster neighbors fill the rest of the top-k
    # (the planted blocks are tight, so all true neighbors share its
    # block), and the search is deterministic
    probe_id = 19 * _PER_CLUSTER + 3  # a node inserted by the LAST sync
    qvec = [float(x) for x in vecs[probe_id]]
    got = kg.search_knn_graph(spark, src, gt, qvec, k=5).collect()
    assert len(got) == 5
    assert got[0].vec_id == probe_id and got[0].score == 0.0
    block = range(19 * _PER_CLUSTER, 20 * _PER_CLUSTER)
    assert all(r.vec_id in block for r in got), got
    again = kg.search_knn_graph(spark, src, gt, qvec, k=5).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in again]


@pytest.mark.slow
def test_entry_ledger_bounded_under_connectable_churn(spark, planted, tmp_path):
    """Round-10 contract (closes the round-9 weak #1): across N≥10 ingest
    syncs of CONNECTABLE data (duplicates of existing corpus points — the
    IVF cell seeds hand them to their originals' neighborhoods, which
    adopt them in the same sync), the entry-points ledger stays EMPTY and
    the search entry set stays at exactly the IVF seed count, while the
    stored graph's cumulative `is_new` node set — round 9's entry set —
    grows with every batch. Entry scoring is O(ledger + nlist), not
    O(cumulative churn)."""
    from pdf_parse_vector_db_spark.sources import manifest as M

    d, vecs = planted
    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    n = len(vecs)
    src = str(tmp_path / "src")
    gt = str(tmp_path / "graph")

    M.commit_append(spark, src, emb)
    cursor = kg.sync_knn_graph_from_feed(spark, src, gt, 0)  # bootstrap

    seeds_n = kg._ivf_seeds(emb).count()
    is_new_nodes_prev = 0
    for i in range(10):
        batch = spark.createDataFrame(
            [
                (
                    n + i * 5 + j,
                    [float(x) for x in vecs[(i * 37 + j * 11) % n]],
                    0,
                )
                for j in range(5)
            ],
            "vec_id long, embedding array<float>, label int",
        )
        M.commit_append(spark, src, batch)
        cursor = kg.sync_knn_graph_from_feed(spark, src, gt, cursor)

        _, pend = M.snapshot(spark, kg.graph_entry_table(gt))
        ledger_n = 0 if pend is None else pend.count()
        assert ledger_n == 0, (i, ledger_n)

        _, g = M.snapshot(spark, gt)
        cand_n = kg.graph_entry_candidates(spark, M.snapshot(spark, src)[1], gt).count()
        # the search entry set never grows past seeds + ledger
        assert cand_n <= kg._ivf_seeds(M.snapshot(spark, src)[1]).count(), (i, cand_n)
        is_new_nodes = (
            g.filter(F.col("is_new") == 1).select("vec_id").distinct().count()
        )
        # round 9's entry set (every is_new node, never cleared) keeps
        # growing — the unbounded behavior the ledger replaces
        assert is_new_nodes >= is_new_nodes_prev
        is_new_nodes_prev = is_new_nodes
    assert is_new_nodes_prev >= 50  # ≥ the 50 inserted duplicates

    # a duplicate of a corpus point still retrieves itself through the
    # seeds-only entry set (adopted → reachable by expansion)
    probe = n + 9 * 5 + 3  # last batch, j=3
    qvec = [float(x) for x in vecs[(9 * 37 + 3 * 11) % n]]
    got = kg.search_knn_graph(spark, src, gt, qvec, k=5).collect()
    assert got[0].score == 0.0
    assert {r.vec_id for r in got} & {probe, (9 * 37 + 3 * 11) % n}


@pytest.mark.slow
def test_entry_ledger_isolated_cohorts_and_adoption_clear(spark, planted, tmp_path):
    """The ledger holds EXACTLY the still-isolated cohorts: after the
    18-block bootstrap + block-18 + block-19 syncs, its rows are the 20
    inserted node ids (no old node adopts a far-away block) — and a
    pending row IS cleared through the public sync path once an outside
    node's refreshed top-K adopts it (here: a pre-seeded pending row for
    a block-0 member, adopted when a duplicate batch makes its
    neighborhood re-rank)."""
    from pdf_parse_vector_db_spark.sources import manifest as M

    d, vecs = planted
    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    cut = 18 * _PER_CLUSTER
    src = str(tmp_path / "src")
    gt = str(tmp_path / "graph")

    M.commit_append(spark, src, emb.filter(F.col("vec_id") < cut))
    cursor = kg.sync_knn_graph_from_feed(spark, src, gt, 0)
    M.commit_append(
        spark,
        src,
        emb.filter((F.col("vec_id") >= cut) & (F.col("vec_id") < 19 * _PER_CLUSTER)),
    )
    cursor = kg.sync_knn_graph_from_feed(spark, src, gt, cursor)
    M.commit_append(spark, src, emb.filter(F.col("vec_id") >= 19 * _PER_CLUSTER))
    cursor = kg.sync_knn_graph_from_feed(spark, src, gt, cursor)

    _, pend = M.snapshot(spark, kg.graph_entry_table(gt))
    got = {r.vec_id for r in pend.collect()}
    assert got == set(range(cut, 20 * _PER_CLUSTER)), got

    # adoption-clear through the public path: pre-seed a pending row for
    # block-0 member 3 (as if it had been inserted isolated long ago and
    # the corpus since grew around it), then ingest duplicates of its
    # block — outside neighbors re-rank, their lists contain node 3,
    # the ledger row clears; the isolated blocks 18/19 stay pending.
    et = kg.graph_entry_table(gt)
    ehead = M.head_version(spark, et)
    drop = M._read_manifest(spark, et, ehead)["commits"]
    _, cur = M.snapshot(spark, et)
    M.commit_replace(
        spark,
        et,
        cur.unionByName(
            spark.createDataFrame([(3, 0)], "vec_id long, since_v long")
        ),
        drop_commits=drop,
    )
    n = len(vecs)
    dup = spark.createDataFrame(
        [(n + j, [float(x) for x in vecs[j]], 0) for j in range(8)],
        "vec_id long, embedding array<float>, label int",
    )
    M.commit_append(spark, src, dup)
    cursor = kg.sync_knn_graph_from_feed(spark, src, gt, cursor)
    _, pend2 = M.snapshot(spark, kg.graph_entry_table(gt))
    got2 = {r.vec_id for r in pend2.collect()}
    assert 3 not in got2, got2
    assert set(range(cut, 20 * _PER_CLUSTER)) <= got2, got2
    assert got2 <= set(range(cut, 20 * _PER_CLUSTER)) | {n + j for j in range(8)}


@pytest.mark.slow
def test_entry_ledger_crash_between_commits_replays_exactly_once(
    spark, planted, tmp_path, monkeypatch
):
    """The ledger commit rides BEFORE the graph merge so a crash between
    the two is replayable: first attempt commits the entries table then
    dies at the merge; the replay (same cursor) recomputes the identical
    diff against the still-unmerged graph, no-ops the ledger replace on
    its idempotency key, and completes the merge — ending in exactly the
    state an uncrashed sync produces (entries AND graph), with no
    double-application on a further replay."""
    from pdf_parse_vector_db_spark.sources import manifest as M

    d, vecs = planted
    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    cut = 18 * _PER_CLUSTER
    src = str(tmp_path / "src")
    gt = str(tmp_path / "graph")
    M.commit_append(spark, src, emb.filter(F.col("vec_id") < cut))
    cursor = kg.sync_knn_graph_from_feed(spark, src, gt, 0)
    M.commit_append(spark, src, emb.filter(F.col("vec_id") >= cut))

    real_merge = M.commit_merge
    calls = {"n": 0}

    def dying_merge(*a, **kw):
        calls["n"] += 1
        raise RuntimeError("simulated crash after entries commit, before merge")

    monkeypatch.setattr(M, "commit_merge", dying_merge)
    with pytest.raises(RuntimeError, match="simulated crash"):
        kg.sync_knn_graph_from_feed(spark, src, gt, cursor)
    assert calls["n"] == 1
    e_v = M.head_version(spark, kg.graph_entry_table(gt))
    assert e_v >= 1  # entries committed before the crash
    g_v = M.head_version(spark, gt)

    monkeypatch.setattr(M, "commit_merge", real_merge)
    c2 = kg.sync_knn_graph_from_feed(spark, src, gt, cursor)
    assert M.head_version(spark, gt) > g_v  # merge completed on replay
    # ledger replace no-oped on its key: version unchanged by the replay
    assert M.head_version(spark, kg.graph_entry_table(gt)) == e_v
    # a further full replay of the same window is a no-op on BOTH tables
    g_v2 = M.head_version(spark, gt)
    assert kg.sync_knn_graph_from_feed(spark, src, gt, cursor) == c2
    assert M.head_version(spark, gt) == g_v2
    assert M.head_version(spark, kg.graph_entry_table(gt)) == e_v
    # and the pending set is the inserted blocks, as in the uncrashed path
    _, pend = M.snapshot(spark, kg.graph_entry_table(gt))
    assert {r.vec_id for r in pend.collect()} == set(
        range(cut, 20 * _PER_CLUSTER)
    )

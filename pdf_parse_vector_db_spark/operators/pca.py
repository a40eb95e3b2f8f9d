"""Distributed PCA over an embedding column (X2/X3 preprocessing tier).

The standard two-phase shape for covariance-based methods at scale:

  phase 1 (cluster): per-partition sufficient statistics — (n, Σx, ΣxxT)
           via one Arrow-batched pass (X^T X is a single GEMM per batch).
           Each partition ships 1 + dim + dim² floats to the driver:
           ~33 KB at dim=64, independent of row count — the whole corpus
           never moves.
  phase 2 (driver): combine partials in deterministic partition order,
           form the covariance, eigendecompose (dim × dim — trivially
           driver-sized), report explained-variance ratios.

This is exactly how MLlib's PCA/RowMatrix computes principal components;
implemented directly so the statistics stay plain arrays (no VectorUDT)
and the partial-aggregation shape is visible and testable. Rows-only
query contract (eigendecomposition isn't SQL-expressible); numpy
equivalence is asserted in tests/test_ann.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame


def covariance_partials(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-partition (n, sum, flattened outer-product sum). One narrow row
    per partition — the map-side combine that makes driver-side PCA honest
    at any corpus size."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = None
        ss = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            g = x.T @ x
            ss = g if ss is None else ss + g
        if n == 0:
            return
        yield pd.DataFrame(
            {
                "n": [n],
                "s": [[float(v) for v in s]],
                "ss": [[float(v) for v in ss.ravel()]],
            }
        )

    return emb.select(vec_col).mapInPandas(
        stats, "n bigint, s array<double>, ss array<double>"
    )


def combined_partial(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Reduce the per-partition partials to ONE row in a single executor
    task — treeAggregate's final level as a visible, testable relation.
    Partials are summed in deterministic (n, s[0]) order so the float
    folds are run-to-run identical (the same order the driver-side merge
    historically used)."""

    def combine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = [pdf for pdf in batches if len(pdf)]
        if not parts:
            return
        allp = pd.concat(parts, ignore_index=True)
        order = sorted(
            range(len(allp)), key=lambda i: (allp["n"][i], allp["s"][i][0])
        )
        d = len(allp["s"].iloc[0])
        s = np.zeros(d)
        ss = np.zeros(d * d)
        n = 0
        for i in order:
            n += int(allp["n"][i])
            s += np.asarray(allp["s"][i])
            ss += np.asarray(allp["ss"][i])
        yield pd.DataFrame(
            {"n": [n], "s": [[float(x) for x in s]], "ss": [[float(x) for x in ss]]}
        )

    return (
        covariance_partials(emb, vec_col)
        .repartition(1)
        .mapInPandas(combine, "n bigint, s array<double>, ss array<double>")
    )


def pca_explained_variance(
    emb: DataFrame, vec_col: str = "embedding", k: int = 8
) -> list[dict]:
    """Top-k principal components' explained-variance ratios.

    Returns driver-side dicts (component, eigenvalue, explained, cumulative)
    — the artifact a dimension-reduction decision is made from. Partials
    are combined in sorted order for run-to-run determinism.

    Two-level merge (round-6 dim-1536 fix): a partial is 1 + dim + dim²
    floats — ~19 MB at the reference's dim 1536 — so collecting one per
    partition scales the driver transfer with the partition count. The
    partials are instead pre-combined in ONE executor task
    (combined_partial below), and the driver receives exactly one partial
    regardless of how many partitions scanned the corpus."""
    rows = combined_partial(emb, vec_col).collect()
    if not rows:
        return []
    n = sum(r["n"] for r in rows)
    dim = len(rows[0]["s"])
    s = np.zeros(dim)
    ss = np.zeros((dim, dim))
    for r in rows:
        s += np.asarray(r["s"])
        ss += np.asarray(r["ss"]).reshape(dim, dim)
    mean = s / n  # ansi: numpy; n = partition row count >= 1
    cov = ss / n - np.outer(mean, mean)  # ansi: numpy; n >= 1
    evals = np.linalg.eigvalsh(cov)[::-1]
    total = float(evals.sum())
    out = []
    cum = 0.0
    for i in range(min(k, dim)):
        ev = float(evals[i])
        ratio = ev / total if total > 0 else 0.0  # ansi: Python ternary guard
        cum += ratio
        out.append(
            {
                "component": i + 1,
                "eigenvalue": round(ev, 6),
                "explained": round(ratio, 6),
                "cumulative": round(cum, 6),
            }
        )
    return out

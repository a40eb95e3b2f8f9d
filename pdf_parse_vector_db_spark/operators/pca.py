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


def pca_explained_variance(
    emb: DataFrame, vec_col: str = "embedding", k: int = 8
) -> list[dict]:
    """Top-k principal components' explained-variance ratios.

    Returns driver-side dicts (component, eigenvalue, explained, cumulative)
    — the artifact a dimension-reduction decision is made from. Partials
    are combined in sorted order for run-to-run determinism."""
    rows = covariance_partials(emb, vec_col).collect()
    if not rows:
        return []
    rows = sorted(rows, key=lambda r: (r["n"], r["s"][0] if r["s"] else 0.0))
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

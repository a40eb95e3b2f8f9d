"""Embedding boundary (SURVEY §2.8 U1/U3).

The reference embeds one chunk per OpenAI API call with a singleton batch
(get_embedding, extract_and_embed.py:80-82) — pure overhead we refuse to
replicate. Here the embedding step is an Arrow-batched ``pandas_udf``: many
chunks per Python invocation, and (for a real provider) many chunks per API
call. Failures yield NULL rather than aborting, matching the reference's
per-chunk error absorption (extract_and_embed.py:100-115, U3); downstream
filters on embedding IS NOT NULL reproduce the row-drop semantics.

Two implementations behind one interface:

  * ``hashing_embedder`` — the DEFAULT and the test/oracle stand-in: a
    deterministic feature-hashing text embedder (token → sha-derived index
    and sign → accumulate → L2-normalize). Fully offline, reproducible on
    any executor, no dependencies; this is what makes the whole ingest +
    search pipeline machine-checkable (SURVEY §5.2).
  * ``openai_embedder`` — the production analog of the reference's
    ada-002 call, gated behind an import-try (the openai package is not in
    this container; the Spark-side plumbing — batching, null-on-failure,
    schema — is identical and IS tested via the hashing implementation).

At 100 TB the embedding stage dominates the ingest job; it is a pure map
(no shuffle), so throughput scales linearly with executors, bounded by
Arrow batch size (spark.sql.execution.arrow.maxRecordsPerBatch) and, for
the real provider, the API rate limit — tune batch size against provider
max-batch, and isolate provider retries inside the UDF.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

from pdf_parse_vector_db_spark.schemas import EMBEDDING_DIM


def embed_text_py(text: str, dim: int = EMBEDDING_DIM) -> list[float] | None:
    """Deterministic feature-hashing embedding of one text. None/empty → None
    (the reference drops chunks with empty embeddings, :102,112-113)."""
    if text is None:
        return None
    tokens = text.split()
    if not tokens:
        return None
    vec = np.zeros(dim, dtype=np.float64)
    for tok in tokens:
        h = hashlib.sha256(tok.encode("utf-8")).digest()
        idx = int.from_bytes(h[:4], "big") % dim
        sign = 1.0 if h[4] & 1 else -1.0
        vec[idx] += sign
    norm = math.sqrt(float(vec @ vec))
    if norm == 0.0:
        # degenerate but non-empty input: deterministic unit vector
        vec[0] = 1.0
        norm = 1.0
    return [float(x) for x in np.float32(vec / norm)]  # ansi: numpy; norm forced to 1 when 0


def hashing_embedder(dim: int = EMBEDDING_DIM):
    """pandas_udf: string column → array<float> embedding column."""

    @F.pandas_udf(ArrayType(FloatType()))
    def embed(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: embed_text_py(t, dim))

    return embed


def openai_embedder(model: str = "text-embedding-ada-002", batch_size: int = 256):
    """Production embedder calling the public OpenAI embeddings API in
    batches (vs the reference's 1-call-per-chunk). Requires the ``openai``
    package and OPENAI_API_KEY; unavailable in this container — the UDF
    raises on first use, never at import."""

    @F.pandas_udf(ArrayType(FloatType()))
    def embed(texts: pd.Series) -> pd.Series:
        try:
            from openai import OpenAI  # noqa: PLC0415
        except ImportError as e:  # pragma: no cover - env without openai
            raise NotImplementedError(
                "openai package not installed; use hashing_embedder for offline runs"
            ) from e
        client = OpenAI()
        out: list[list[float] | None] = []
        vals = texts.tolist()
        for i in range(0, len(vals), batch_size):
            batch = vals[i : i + batch_size]
            keep = [t for t in batch if t]
            try:
                resp = client.embeddings.create(input=keep, model=model)
                it = iter([d.embedding for d in resp.data])
                out.extend(next(it) if t else None for t in batch)
            except Exception:  # per-batch absorption, U3 semantics
                out.extend(None for _ in batch)
        return pd.Series(out)

    return embed


def embedding_is_valid(col: Column) -> Column:
    """P6 validity filter: non-null, non-empty (extract_and_embed.py:102)."""
    return col.isNotNull() & (F.size(col) > 0)

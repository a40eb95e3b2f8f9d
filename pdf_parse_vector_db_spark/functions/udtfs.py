"""Python UDTF surface (Spark 4 user-defined table functions).

The engine's set-returning operators run on the fast paths — generator
expressions for n-grams (plans/textanalysis.py), applyInPandas for the
chunker (operators/chunker.py). This module exposes the same semantics
through Spark 4's Python UDTF API for callers that want SQL-side lateral
joins (``SELECT ... FROM docs, LATERAL word_ngrams(text, 2)``): a UDTF is
the Spark-idiomatic packaging of a one-row-to-many-rows Python function,
registered once per session and usable from pure SQL.

Kept OUT of the benchmark query registry on purpose: row-at-a-time Python
is the slow path (SURVEY §2.8), and every hot-path query has a codegen or
Arrow twin. tests/test_udtf.py pins that the UDTF's output is row-identical
to the codegen n-gram derivation, so the convenience surface can never
drift from the engine's semantics.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, term string")
class WordNGrams:
    """Emit (position, space-joined n-gram) for each word n-gram of text."""

    def eval(self, text: str, n: int):  # noqa: D102 — UDTF contract method
        if text is None or n is None or n <= 0:
            return
        toks = text.split()
        for i in range(len(toks) - n + 1):
            yield i, " ".join(toks[i : i + n])


def register_udtfs(spark) -> None:
    """Register the UDTF surface on a session (idempotent)."""
    spark.udtf.register("word_ngrams", WordNGrams)

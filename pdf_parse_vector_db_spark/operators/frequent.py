"""Distributed exact heavy hitters via per-partition Misra-Gries summaries
(north-star X5 sketch tier, alongside HLL++ NDV and GK percentiles).

The naive exact answer — groupBy(term) over every token occurrence — works
but shuffles the full token stream. The classic bounded-memory alternative
(Misra-Gries 1982; merged summaries per Agarwal et al. 2012, "Mergeable
Summaries") runs in two scan-bound passes:

  1. Each partition streams its tokens through a k-counter Misra-Gries
     summary (k = ceil(1/phi)). By the averaging argument, any term with
     global frequency ≥ phi·N is locally above N_p/k in at least one
     partition, so the UNION of per-partition candidate sets has NO false
     negatives. Summary size is k counters per partition — O(1) memory no
     matter how large the partition.
  2. The candidate union (≤ k × partitions terms — tiny) broadcasts back
     for an exact recount; false positives die on the final threshold.

Net: the full token stream is never shuffled — only candidate terms (a
broadcast) and per-candidate partial counts cross the wire. At 100 TB this
is the difference between an exchange of ~10^12 token rows and one of a few
thousand candidate rows.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _misra_gries_partition(k: int):
    """mapInPandas body: stream the partition's `term` column through a
    k-counter MG summary, emit the surviving candidate terms."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for term in pdf["term"]:
                if term in counters:
                    counters[term] += 1
                elif len(counters) < k:
                    counters[term] = 1
                else:
                    # decrement-all step; drop zeroed counters
                    dead = []
                    for t in counters:
                        counters[t] -= 1
                        if counters[t] == 0:
                            dead.append(t)
                    for t in dead:
                        del counters[t]
        yield pd.DataFrame({"term": list(counters.keys())})

    return summarize


def frequent_terms(
    tokens: DataFrame, phi: float = 0.001, term_col: str = "term"
) -> DataFrame:
    """EXACT terms with frequency ≥ phi·N over `tokens`, without shuffling
    the token stream: MG candidates per partition → distinct → broadcast
    semi-join recount → threshold. Returns (term, cnt), cnt exact."""
    k = math.ceil(1.0 / phi)  # ansi: Python constant, phi > 0 validated
    tok = tokens.select(F.col(term_col).alias("term"))
    candidates = (
        tok.mapInPandas(_misra_gries_partition(k), schema="term string")
        .distinct()
    )
    total = tok.agg(F.count(F.lit(1)).alias("n"))
    return (
        tok.join(F.broadcast(candidates), on="term", how="left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") >= F.ceil(F.col("n") * phi))
        .select("term", "cnt")
    )

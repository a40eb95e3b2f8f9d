"""Sequence packing for LLM training batches (north-star X5 extension).

The inverse of the chunker (T1, operators/chunker.py — semantics from
chunk_text at extract_and_embed.py:62-77): where the chunker splits one
document into budgeted pieces, packing concatenates consecutive whole
documents into fixed token-budget training sequences — the step that turns
a deduped, quality-gated corpus into dense context windows for an LLM
training job (padding waste = budget - seq_tokens, surfaced per sequence).

Greedy first-fit over an ordered stream is inherently sequential per group
(each assignment depends on the running total), so like the chunker it runs
as an applyInPandas fold per group key — documents are independent across
groups, so at 100 TB the parallelism is the number of groups (lang, shard,
bucket...) and each group's fold is a single linear pass. The fold itself
is pure Python over one Arrow batch column, unit-testable offline.

Edge semantics (mirroring the chunker's, golden-tested):
  * a document larger than the budget gets a sequence of its own (never
    split — splitting is the chunker's job, upstream);
  * the budget check closes the current sequence BEFORE adding the
    oversized next doc, so sequences never exceed the budget unless they
    hold exactly one overweight doc;
  * sequence ids are 0-based and contiguous per group, in order_col order.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_greedy(tokens: list[int], budget: int) -> list[int]:
    """Pure greedy first-fit fold: sequence id per input position."""
    out: list[int] = []
    seq, total = 0, 0
    for t in tokens:
        if total > 0 and total + t > budget:
            seq += 1
            total = 0
        total += t
        out.append(seq)
    return out


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    group_col: str = "lang",
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Doc → training-sequence assignment: (group, doc_id, n_tokens, seq_id).

    Token counts are whitespace tokens (F3 semantics, the reference's own
    budget unit at extract_and_embed.py:68), computed JVM-side before the
    fold so the Python stage only sees (id, count) pairs — the text itself
    never crosses the Arrow boundary."""
    base = docs.select(
        F.col(group_col).alias("grp"),
        F.col(order_col).alias("doc_id"),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("n_tokens"),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        pdf["seq_id"] = pack_greedy(pdf["n_tokens"].tolist(), budget)
        return pdf

    return base.groupBy("grp").applyInPandas(
        _pack, schema="grp string, doc_id long, n_tokens int, seq_id int"
    )

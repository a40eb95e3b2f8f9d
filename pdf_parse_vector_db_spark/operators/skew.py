"""Skew-resistant aggregation (SURVEY §4.4 / 100 TB posture).

AQE's skew-join splitting handles skewed JOINS automatically
(spark.sql.adaptive.skewJoin.enabled, on in session.py), but a skewed
GROUP-BY-like WINDOW — e.g. the per-file dedup (A1) when one file_id owns a
large slice of the corpus — still funnels the hot key into one task. The
classic fix is salting: a two-stage reduction over (key, salt) then (key).

`salted_best_per_group` keeps dedup_best_per_group's exact contract (best =
lowest score, deterministic tiebreak) because min-by is associative: the
per-salt winner set provably contains the global winner. Stage 1 reduces
each hot key's rows by `salts`× map-side-ish (the salt spreads them over
`salts` reducers); stage 2 sees ≤ salts rows per key.

Use when a group key's cardinality profile is adversarial; for the
reference's 100-row post-top-k dedup the plain window is cheaper — this
operator exists for the ingest-side variants (dedup over the whole corpus,
X1/X2) where groups can be pathological.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def salted_best_per_group(
    df: DataFrame,
    group_col: str,
    score_col: str = "score",
    tiebreak_cols: Sequence[str] = (),
    salts: int = 16,
) -> DataFrame:
    """Exact best-(lowest-score)-row per group via two salted reductions.

    Row-identity salt (xxhash64 over the whole row's deterministic columns
    would do; the score+tiebreaks suffice and stay narrow) — NOT rand():
    retried tasks must salt identically or exactly-once breaks."""
    salt = F.pmod(
        F.xxhash64(F.col(score_col), *[F.col(c) for c in tiebreak_cols]),
        F.lit(salts),
    ).alias("__salt")
    order = [F.col(score_col).asc()] + [F.col(c).asc() for c in tiebreak_cols]

    w1 = Window.partitionBy(group_col, "__salt").orderBy(*order)
    stage1 = (
        df.withColumn("__salt", salt)
        .withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    w2 = Window.partitionBy(group_col).orderBy(*order)
    return (
        stage1.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__salt")
    )

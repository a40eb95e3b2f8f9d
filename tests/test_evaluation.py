"""Semantic contracts for plans/evaluation.py beyond oracle hash parity.

The oracle proves Spark == DuckDB; these tests prove both equal the
*definition*: AUC is recomputed per-row in pure Python (naive pairwise
Mann-Whitney), NDCG/MRR are recomputed from a brute-force ranking.
"""

from __future__ import annotations

import bisect
import math

from pdf_parse_vector_db_spark.plans import evaluation as ev
from pdf_parse_vector_db_spark.sources.registry import load_table
from tests.conftest import SF_ORACLE


def test_auc_matches_naive_pairwise(spark):
    """Rank-sum AUC == naive P(score_pos > score_neg) + 0.5·P(tie).

    The scored stream comes from the SAME helper the query uses, so this
    checks the rank-sum identity itself, independent of score choice.
    """
    rows = ev._centroid_scored(spark, SF_ORACLE).collect()
    pos = sorted(r.score for r in rows if r.pos)
    neg = sorted(r.score for r in rows if not r.pos)

    wins = 0.0
    for p in pos:
        lt = bisect.bisect_left(neg, p)
        eq = bisect.bisect_right(neg, p) - lt
        wins += lt + 0.5 * eq
    expected = wins / (len(pos) * len(neg))

    got = ev.classifier_auc(spark, SF_ORACLE).collect()[0]
    assert got.n_pos == len(pos) and got.n_neg == len(neg)
    assert abs(got.auc - expected) < 1e-6
    # the score must actually discriminate — embeddings cluster by label,
    # so distance-to-own-centroid beats chance by a wide margin
    assert got.auc > 0.65


def test_calibration_bins_cover_and_discriminate(spark):
    out = ev.score_calibration(spark, SF_ORACLE).collect()
    n_rows = load_table(spark, SF_ORACLE, "embeddings").count()
    assert sum(r.n for r in out) == n_rows
    assert all(0.0 <= r.pos_rate <= 1.0 for r in out)
    assert [r.bin for r in out] == sorted(r.bin for r in out)
    # reliability signal: positives sit in higher-score bins than negatives
    # (bin-weighted means are robust to sparse end bins)
    pos_mass = sum(r.n * r.pos_rate for r in out)
    neg_mass = sum(r.n * (1 - r.pos_rate) for r in out)
    pos_mean = sum(r.n * r.pos_rate * r.avg_score for r in out) / pos_mass
    neg_mean = sum(r.n * (1 - r.pos_rate) * r.avg_score for r in out) / neg_mass
    assert pos_mean > neg_mean


def test_retrieval_relevance_matches_bruteforce(spark):
    out = {r.query_id: r for r in ev.retrieval_relevance(spark, SF_ORACLE).collect()}
    assert set(out) == set(ev.QUERY_IDS)

    emb = {
        r.vec_id: (r.embedding, r.label)
        for r in load_table(spark, SF_ORACLE, "embeddings").collect()
    }

    def cos(a, b):
        dot = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) ** 2 for x in a))
        nb = math.sqrt(sum(float(x) ** 2 for x in b))
        return dot / (na * nb) if na > 0 and nb > 0 else 0.0

    for qid in ev.QUERY_IDS:
        qv, ql = emb[qid]
        scored = sorted(
            ((round(cos(v, qv), 6), vid, lab == ql) for vid, (v, lab) in emb.items() if vid != qid),
            key=lambda t: (-t[0], t[1]),
        )
        n_rel = sum(1 for _, _, rel in scored if rel)
        top = scored[: ev.NDCG_K]
        dcg = sum(rel / math.log2(i + 2) for i, (_, _, rel) in enumerate(top))
        idcg = sum(1.0 / math.log2(i + 2) for i in range(min(n_rel, ev.NDCG_K)))
        first = next((i + 1 for i, (_, _, rel) in enumerate(top) if rel), None)

        r = out[qid]
        assert r.n_rel == n_rel
        assert r.first_rel_rank == first
        assert abs(r.rr - (1.0 / first if first else 0.0)) < 1e-6
        assert abs(r.ndcg10 - dcg / idcg) < 1e-5
        assert 0.0 <= r.ndcg10 <= 1.0

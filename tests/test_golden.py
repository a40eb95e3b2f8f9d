"""README golden replay (SURVEY §5.2.3).

The reference repo's only correctness artifact is the sample
request/response in README.md:17-65: 5 results with ascending scores,
win statistics {win_count: 4, total_valid: 5, invalid: 0, win_percentage:
80.0}, and the input/target court_level = 2/3 contract (README.md:26-29).
This test synthesizes a corpus where that exact response is the provable
answer and replays the full read path — filtered over-fetch → per-file
dedup → top-5 → statistics → nested JSON assembly — end to end.
"""

from __future__ import annotations

import hashlib
import json
import math

from pyspark.sql import functions as F

from pdf_parse_vector_db_spark.operators import knn

#: (file_name, court_level, case_decision, [chunk vectors]) — file A carries a
#: decoy worse chunk to prove best-per-file dedup; file X sits at the wrong
#: court level to prove the filter; file F ranks 6th to prove top-5 cutoff.
_CORPUS = [
    ("case_a.pdf", 3, "appellant_won", [[0.1, 0.0], [0.5, 0.0]]),
    ("case_b.pdf", 3, "appellant_lost", [[0.0, 0.2]]),
    ("case_c.pdf", 3, "appellant_won", [[0.3, 0.0]]),
    ("case_d.pdf", 3, "appellant_won", [[0.0, 0.4]]),
    ("case_e.pdf", 3, "appellant_won", [[0.45, 0.0]]),
    ("case_f.pdf", 3, "appellant_lost", [[0.6, 0.0]]),
    ("case_x.pdf", 2, "appellant_lost", [[0.0, 0.0]]),
]

_QUERY_VEC = [0.0, 0.0]
_INPUT_LEVEL = 2  # README.md:27 — target is input + 1


def _sha(name: str) -> str:
    return hashlib.sha256(name.encode()).hexdigest()


def test_readme_golden_replay(spark):
    rows = [
        (name, _sha(name), level, dec, vec)
        for name, level, dec, vecs in _CORPUS
        for vec in vecs
    ]
    corpus = spark.createDataFrame(
        rows,
        "file_name string, file_id string, court_level int, "
        "case_decision string, embedding array<double>",
    )
    top = knn.search_pipeline(
        corpus,
        _QUERY_VEC,
        filter_cond=F.col("court_level") == _INPUT_LEVEL + 1,
        group_col="file_id",
        tiebreak_cols=("file_id",),
    )
    resp_df = knn.search_response(top, "query.pdf", _INPUT_LEVEL)
    resp = json.loads(resp_df.collect()[0].response)

    # response shape == README.md:17-65
    assert set(resp) == {
        "appellant_statistics", "query", "result_count", "results", "status",
    }
    assert resp["status"] == "success"
    assert resp["query"] == {
        "file_name": "query.pdf",
        "input_court_level": 2,
        "target_court_level": 3,
    }
    assert resp["result_count"] == 5

    # 5 hits, ascending scores, best-chunk-per-file, wrong level excluded
    names = [r["file_name"] for r in resp["results"]]
    assert names == ["case_a.pdf", "case_b.pdf", "case_c.pdf", "case_d.pdf", "case_e.pdf"]
    scores = [r["score"] for r in resp["results"]]
    assert scores == sorted(scores)
    assert math.isclose(scores[0], 0.1)  # file A's BEST chunk, not its 0.5 decoy
    for r in resp["results"]:
        assert r["file_id"] == _sha(r["file_name"])
        assert set(r) == {"case_decision", "file_id", "file_name", "score"}

    # statistics — the README's exact numbers (README.md:19-24)
    assert resp["appellant_statistics"] == {
        "invalid_decisions": 0,
        "total_valid_decisions": 5,
        "win_count": 4,
        "win_percentage": 80.0,
    }


def test_win_percentage_zero_guard(spark):
    """extract_and_search_v2.py:166-168 — all-invalid results must yield
    0.0, not a division error."""
    res = spark.createDataFrame(
        [("f1", "invalid"), ("f2", "invalid")], "file_id string, case_decision string"
    )
    row = knn.win_statistics(res).collect()[0]
    assert row.win_percentage == 0.0
    assert row.total_valid_decisions == 0
    assert row.invalid_decisions == 2

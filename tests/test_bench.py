"""Contract for bench.py's compact stdout line: the driver records only the
last ~2000 chars of stdout, so the FINAL line must always be one complete
JSON object under LINE_BUDGET — rounds 1-3 published parsed:null because the
full per-query map blew past the tail."""

from __future__ import annotations

import json

from bench import HEADLINE, LINE_BUDGET, build_payloads


def _mk_timings(n: int) -> dict[str, float]:
    t = {name: 0.1234 for name in HEADLINE}
    t.update({f"very_long_query_name_number_{i:04d}": i * 0.0123 for i in range(n)})
    return t


def test_compact_line_fits_budget_at_any_registry_size():
    for n in (0, 10, 300, 1000):
        timings = _mk_timings(n)
        full, line = build_payloads(timings, {}, 0.1)
        assert len(line) <= LINE_BUDGET + 100
        parsed = json.loads(line)
        assert parsed["metric"] == "total_query_wall_sec"
        assert parsed["n_queries"] == len(timings)
        assert abs(parsed["value"] - round(sum(timings.values()), 4)) < 1e-9
        assert full["queries"] == timings  # full payload never truncated


def test_compact_line_prefers_headline_queries():
    timings = _mk_timings(300)
    _, line = build_payloads(timings, {}, 0.1)
    parsed = json.loads(line)
    for q in HEADLINE:
        assert q in parsed["queries"], q


def test_compact_line_survives_many_errors():
    timings = _mk_timings(300)
    errors = {f"failing_query_{i:03d}": "x" * 300 for i in range(50)}
    _, line = build_payloads(timings, errors, 0.1)
    assert len(line) <= LINE_BUDGET + 100
    parsed = json.loads(line)
    assert parsed["errors"]["_count"] == 50


def test_drift_guard_fields():
    """Round-6 bench-noise guard: with a comparable previous BENCH_FULL
    payload, the full payload records per-query relative deltas + median
    and the compact line carries the median, so uniform host-load drift
    is separable from a plan regression without re-deriving deltas."""
    import json

    from bench import build_payloads, drift_vs_prev

    timings = {"a": 1.1, "b": 2.2, "c": 3.3}
    prev = {"sf": 0.1, "value": 6.0, "queries": {"a": 1.0, "b": 2.0, "c": 3.0}}
    full, line = build_payloads(timings, {}, 0.1, prev=prev)
    d = full["drift_vs_prev"]
    assert d["n_common"] == 3 and d["prev_value"] == 6.0
    assert abs(d["median_rel"] - 0.1) < 0.01
    assert set(d["per_query"]) == {"a", "b", "c"}
    assert json.loads(line)["median_rel_drift"] == d["median_rel"]
    # no comparable previous run -> fields absent, line unchanged shape
    full2, line2 = build_payloads(timings, {}, 0.1, prev={"sf": 0.01, "queries": {}})
    assert "drift_vs_prev" not in full2
    assert "median_rel_drift" not in json.loads(line2)
    assert drift_vs_prev(timings, 0.1, None) is None

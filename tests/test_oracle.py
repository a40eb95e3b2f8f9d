"""Every registered query vs its DuckDB oracle — local replica of the
driver's t2 gate, run at sf0.001 for speed (driver runs sf0.01)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_ORACLE
from tools.compare_oracle import compare_query

SPECS = list(entrymod._SPECS.values())


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_query_matches_oracle(spark, duck, spec):
    if spec.oracle is None:
        # rows-only contract: must run and be deterministic across two runs
        a = spec.fn(spark, SF_ORACLE).count()
        b = spec.fn(spark, SF_ORACLE).count()
        assert a == b
        return
    problems = compare_query(spark, duck, spec, SF_ORACLE)
    assert not problems, problems


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["vec_id", "file_grp", "case_decision", "score"]

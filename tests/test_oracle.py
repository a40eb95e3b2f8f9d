"""Every registered query vs its DuckDB oracle — local replica of the
driver's t2 gate, run at sf0.001 for speed (driver runs sf0.01)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_ORACLE
from tools.compare_oracle import compare_query

SPECS = list(entrymod._SPECS.values())

#: default-on smoke sample (~1/9th of the registry, deterministic slice):
#: the FULL 290-query sweep below is `slow` (≈10 min of the suite) because
#: the driver re-checks the same contract through its own DuckDB oracle
#: gate and `tools/compare_oracle.py` runs it standalone; the sample keeps
#: a fast cross-section of every module's queries in the default run.
SAMPLE = SPECS[::9]


def _check(spark, duck, spec):
    if spec.oracle is None:
        # rows-only contract: must run and be deterministic across two runs
        a = spec.fn(spark, SF_ORACLE).count()
        b = spec.fn(spark, SF_ORACLE).count()
        assert a == b
        return
    problems = compare_query(spark, duck, spec, SF_ORACLE)
    assert not problems, problems


@pytest.mark.slow
@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_query_matches_oracle(spark, duck, spec):
    _check(spark, duck, spec)


@pytest.mark.parametrize("spec", SAMPLE, ids=[s.name for s in SAMPLE])
def test_query_matches_oracle_sample(spark, duck, spec):
    _check(spark, duck, spec)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["vec_id", "file_grp", "case_decision", "score"]

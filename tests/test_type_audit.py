"""Oracle result-TYPE parity — guards the only r01 failure class (DuckDB
HUGEINT / DECIMAL columns hash differently from Spark's BIGINT/DOUBLE even
when values agree). Every oracle's DuckDB column types must sit in the same
base-type family as the Spark plan's schema."""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE
from tools.type_audit import audit


@pytest.mark.slow
def test_oracle_types_match_spark(spark, duck):
    flagged = audit(spark, duck, SF_ORACLE)
    assert not flagged, flagged

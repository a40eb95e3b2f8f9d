"""Bucketed co-located join: identically bucketed tables must join with no
Exchange in the plan — the write-once/join-many trade that makes repeated
fact-fact joins affordable at scale."""

from __future__ import annotations

import uuid

import pytest

from pdf_parse_vector_db_spark.sources.catalog import write_bucketed
from pdf_parse_vector_db_spark.sources.registry import load_table
from tests.conftest import SF_ORACLE


@pytest.fixture()
def bucketed_pair(spark):
    a, b = (f"t{uuid.uuid4().hex[:8]}" for _ in range(2))
    orders = load_table(spark, SF_ORACLE, "orders")
    li = load_table(spark, SF_ORACLE, "lineitem")
    write_bucketed(orders, a, "o_orderkey", num_buckets=8)
    write_bucketed(li.withColumnRenamed("l_orderkey", "o_orderkey"), b, "o_orderkey", num_buckets=8)
    yield a, b
    spark.sql(f"DROP TABLE IF EXISTS {a}")
    spark.sql(f"DROP TABLE IF EXISTS {b}")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    a, b = bucketed_pair
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table(a).join(spark.table(b), "o_orderkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        # and it computes the right thing
        expected = (
            load_table(spark, SF_ORACLE, "orders")
            .join(
                load_table(spark, SF_ORACLE, "lineitem").withColumnRenamed(
                    "l_orderkey", "o_orderkey"
                ),
                "o_orderkey",
            )
            .count()
        )
        assert j.count() == expected
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

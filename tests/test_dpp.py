"""Dynamic partition pruning contract (SURVEY §4.4 scale posture).

At 100 TB the fact table is partition-laid-out on disk; a join against a
filtered dimension must prune fact PARTITIONS at runtime (Spark's DPP
subquery), not scan everything and filter post-hoc. This writes a
partition-structured copy of orders and pins that the physical plan carries
a dynamicpruning partition filter on the fact scan — and that the pruned
plan returns exactly the unpruned answer.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_parse_vector_db_spark.sources.registry import load_table
from tests.conftest import SF_ORACLE


def test_dynamic_partition_pruning(spark, tmp_path):
    orders = load_table(spark, SF_ORACLE, "orders")
    path = str(tmp_path / "orders_by_priority")
    orders.write.partitionBy("o_orderpriority").parquet(path)

    fact = spark.read.parquet(path)
    # dimension with a selective filter on the partition key — the DPP
    # trigger shape: only matching partitions of the fact may be read
    dim = (
        orders.select(F.col("o_orderpriority").alias("prio"))
        .distinct()
        .filter(F.col("prio").startswith("1"))
    )
    joined = (
        fact.join(dim, fact["o_orderpriority"] == dim["prio"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan

    expect = (
        orders.filter(F.col("o_orderpriority").startswith("1"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .collect()[0]
    )
    got = joined.collect()[0]
    assert got["n"] == expect["n"] and got["total"] == expect["total"]

"""transformWithStateInPandas tier (streaming/stateful.high_water_marks):
emit-on-increase semantics, state carried across incremental runs, final
high-water equals the batch max."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pdf_parse_vector_db_spark.sources.registry import load_table
from pdf_parse_vector_db_spark.streaming.stateful import (
    high_water_marks,
    tws_available,
)

def test_high_water_processor_logic_offline():
    """The processor's fold is pure Python over Arrow batches — unit-test the
    emit-on-increase semantics with a fake state handle (runs even where the
    TWS runtime is unavailable)."""
    import pandas as pd

    from pdf_parse_vector_db_spark.streaming.stateful import _HighWaterProcessor

    class FakeState:
        def __init__(self):
            self.v = None

        def exists(self):
            return self.v is not None

        def get(self):
            return self.v

        def update(self, t):
            self.v = t

    class FakeHandle:
        def getValueState(self, name, schema, ttlDurationMs=None):
            return FakeState()

    p = _HighWaterProcessor()
    p.init(FakeHandle())

    def feed(vals):
        return list(
            p.handleInputRows((7,), iter([pd.DataFrame({"value": vals})]), None)
        )

    out1 = feed([1.0, 5.0, 3.0])
    assert len(out1) == 1 and out1[0]["high_water"][0] == 5.0
    assert feed([4.0, 2.0]) == []  # no increase -> no emission
    out3 = feed([9.5])
    assert len(out3) == 1 and out3[0]["high_water"][0] == 9.5


pytestmark_streaming = pytest.mark.skipif(
    not tws_available(),
    reason="transformWithStateInPandas needs protobuf (not in container); "
    "the applyInPandasWithState twin is tested in test_streaming.py",
)

SF = "/root/testdata/sf0.001"

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def _run(spark, landing, ckpt, emitted):
    sdf = high_water_marks(spark.readStream.schema(EVENTS_SCHEMA).parquet(landing))

    def sink(batch_df, batch_id):
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            emitted
        )

    q = (
        sdf.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


@pytestmark_streaming
def test_high_water_marks_across_batches(spark, tmp_path):
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    emitted = str(tmp_path / "emitted")

    ev = load_table(spark, SF, "events")
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)

    first.write.mode("append").parquet(landing)
    _run(spark, landing, ckpt, emitted)
    second.write.mode("append").parquet(landing)
    _run(spark, landing, ckpt, emitted)

    out = spark.read.parquet(emitted)
    latest = {
        r.user_id: r.high_water
        for r in out.withColumn(
            "rn",
            F.row_number().over(
                __import__(
                    "pyspark.sql.window", fromlist=["Window"]
                ).Window.partitionBy("user_id").orderBy(F.desc("batch_id"))
            ),
        )
        .filter(F.col("rn") == 1)
        .collect()
    }
    expected = {
        r.user_id: r.m
        for r in ev.groupBy("user_id").agg(F.max("value").alias("m")).collect()
    }
    assert set(latest) == set(expected)
    for k, v in expected.items():
        assert abs(latest[k] - v) < 1e-9, (k, latest[k], v)

    # emit-on-increase: a user whose run-2 max did not beat run-1's max must
    # not re-emit in run 2, so total emissions <= 2 rows per user
    per_user_emits = out.groupBy("user_id").count().collect()
    assert all(r["count"] <= 2 for r in per_user_emits)

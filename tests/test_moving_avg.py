"""RANGE-frame semantics (plans/advanced.orders_moving_avg): calendar gaps
must SHRINK the 7-day window — the property a ROWS frame gets wrong."""

from __future__ import annotations

import datetime

from pyspark.sql import Window, functions as F


def test_range_frame_respects_calendar_gaps(spark):
    # days 1,2,3 then a jump to day 20: the day-20 average must see ONLY
    # day 20 (days 1-3 are outside its 7-day range), whereas a ROWS frame
    # of 6 preceding would wrongly include them.
    rows = [
        (datetime.date(2024, 1, 1), 10.0),
        (datetime.date(2024, 1, 2), 20.0),
        (datetime.date(2024, 1, 3), 30.0),
        (datetime.date(2024, 1, 20), 100.0),
    ]
    df = spark.createDataFrame(rows, "day date, day_revenue double").withColumn(
        "day_num", F.datediff("day", F.lit("1970-01-01"))
    )
    w = Window.orderBy("day_num").rangeBetween(-6, 0)
    got = {
        str(r.day): r.avg7
        for r in df.select(
            "day", F.round(F.avg("day_revenue").over(w), 4).alias("avg7")
        ).collect()
    }
    assert got["2024-01-01"] == 10.0
    assert got["2024-01-02"] == 15.0
    assert got["2024-01-03"] == 20.0
    assert got["2024-01-20"] == 100.0  # gap: window contains only itself

"""Event-time window plans (north-star X8; SURVEY §2.9 T4 extension).

The reference has no stream processing — each HTTP request is an isolated
batch (T2). These operators are the Structured Streaming extension: the SAME
plan function is applied to a batch DataFrame (driver correctness oracle,
plans/streaming_queries.py) or a streaming DataFrame (readStream +
watermark, tests/test_streaming.py) — which is precisely Spark's
unified-batch/stream contract.

Scale: windowed aggregation state is keyed on (window, key); with
watermarking, state for closed windows is evicted, so memory is bounded by
(watermark horizon / slide) × key cardinality, independent of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(events: DataFrame, duration: str = "1 hour") -> DataFrame:
    """Tumbling event-time windows: count + value sum per window."""
    return (
        events.groupBy(F.window("ts", duration).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


def sliding_counts(
    events: DataFrame, duration: str = "10 minutes", slide: str = "5 minutes"
) -> DataFrame:
    """Sliding windows (each event lands in duration/slide windows)."""
    return (
        events.groupBy(F.window("ts", duration, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


def session_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user: events merge while the gap to the previous
    event is < `gap` (session end = last event + gap, end-exclusive)."""
    return (
        events.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def with_watermark(events: DataFrame, horizon: str = "1 hour") -> DataFrame:
    """Late-data bound for the streaming twins: rows later than `horizon`
    behind the max seen event time are dropped and window state older than
    the watermark is evicted."""
    return events.withWatermark("ts", horizon)


def purchase_view_join(
    purchases: DataFrame, views: DataFrame, horizon: str = "1 hour"
) -> DataFrame:
    """Stream-stream INNER join: each purchase paired with the same user's
    view events from the preceding `horizon` (the attribution join of
    views_before_purchase, plans/advanced.py, as a continuous operator).

    Works on batch or streaming inputs unchanged. For streaming, both sides
    must carry watermarks (with_watermark): the event-time range condition
    `p_ts - horizon <= v_ts <= p_ts` is what lets Spark bound the join
    state — buffered views are evicted once the purchase-side watermark
    passes v_ts + horizon, so state is (horizon × view rate), independent
    of stream length. Output mode append (stream-stream joins emit a row
    exactly when both sides have arrived and can never retract it)."""
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    v = views.select(F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"))
    return p.join(
        v,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {horizon}")),
        "inner",
    ).select("purchase_id", F.col("p_user").alias("user_id"), "p_ts", "v_ts")


def enrich_with_dim(events: DataFrame, dim: DataFrame, on: str = "user_id") -> DataFrame:
    """Stream-static enrichment join: attach slowly-changing dimension
    attributes to an event stream (the lookup-join every behavioral
    pipeline runs before feature extraction).

    The static side is explicitly broadcast — the event stream never
    shuffles for the join. Works identically on a batch DataFrame (the
    oracle-checked twin, events_by_segment).

    DIMENSION FRESHNESS (measured, tests/test_streaming.py): a file-based
    static DataFrame PINS its file listing when the streaming query
    starts — overwriting the dim directory mid-stream does NOT refresh it
    (the join re-executes per micro-batch but over the stale listing, and
    FAILED_READ_FILE.FILE_NOT_EXIST kills the query once the old files
    are gone; spark.catalog.refreshByPath does not reach the running
    query's plan either). To pick up dim updates, rebuild the dim
    DataFrame per batch inside foreachBatch — `enrich_refreshing_sink`
    below packages that correct pattern — or serve the dim from a
    format whose snapshots are append-only."""
    return events.join(F.broadcast(dim), on=on, how="inner")


def enrich_refreshing_sink(spark, dim_path: str, on: str = "user_id"):
    """foreachBatch body factory: the CORRECT refreshable-dimension
    enrichment — `spark.read.parquet(dim_path)` is re-created inside
    every micro-batch, so each batch joins against the dim's CURRENT
    files (verified by the OLD→NEW test). Returns (sink_fn, results)
    where sink_fn(batch_df, batch_id) appends each batch's enriched
    DataFrame action result to `results` via the supplied callback
    pattern in tests; production bodies write to their sink instead."""

    def enrich(batch_df: DataFrame) -> DataFrame:
        dim = spark.read.parquet(dim_path)
        return enrich_with_dim(batch_df, dim, on=on)

    return enrich


def dedup_events(events: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Streaming exact dedup (the X1 operator under continuous ingest):
    first occurrence per key wins, duplicates within the watermark horizon
    are dropped. On a watermarked streaming DataFrame this uses
    dropDuplicatesWithinWatermark, so dedup state is evicted once a key's
    event time falls behind the watermark — bounded memory regardless of
    stream length (plain streaming dropDuplicates would keep every key
    forever). On a batch DataFrame the same call degrades to dropDuplicates,
    preserving the unified batch/stream contract the other twins follow."""
    keys = keys or ["event_id"]
    if events.isStreaming:
        return events.dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


def purchase_view_left_join(
    purchases: DataFrame, views: DataFrame, horizon: str = "1 hour"
) -> DataFrame:
    """Stream-stream LEFT OUTER join: like purchase_view_join, but a
    purchase with NO qualifying view still emits — with a null v_ts —
    once the view-side watermark guarantees no match can still arrive
    (v_ts ≤ p_ts, so the row finalizes when the watermark passes p_ts).
    That deferred null-padding is the defining outer-join mechanic of
    Structured Streaming: correctness depends on BOTH watermarks plus the
    event-time range condition bounding state, exactly as in the inner
    variant. On batch inputs it degenerates to a plain left join — the
    oracle-checked twin (purchase_view_left_pairs)."""
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    v = views.select(F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"))
    return p.join(
        v,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {horizon}")),
        "left_outer",
    ).select("purchase_id", F.col("p_user").alias("user_id"), "p_ts", "v_ts")

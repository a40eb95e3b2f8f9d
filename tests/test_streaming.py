"""Structured Streaming tier: the streaming twins must produce the batch
answers (X8 + continuous ingest, SURVEY §2.9 T4)."""

from __future__ import annotations

import shutil

import pytest

from pyspark.sql import functions as F

from pdf_parse_vector_db_spark.plans.ingest import build_chunks
from pdf_parse_vector_db_spark.sources.registry import load_table
from pdf_parse_vector_db_spark.streaming import windows as W
from pdf_parse_vector_db_spark.streaming.ingest_stream import stream_ingest_documents

SF = "/root/testdata/sf0.001"

EVENTS_SCHEMA = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"


@pytest.fixture()
def events_stream_dir(spark, tmp_path):
    """Events re-materialized with µs timestamps (readStream needs a schema,
    and the raw fixture's ns timestamps need the batch loader's rebuild)."""
    out = str(tmp_path / "events_landing")
    load_table(spark, SF, "events").write.parquet(out)
    return out


def _run_stream_to_memory(spark, sdf, name):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def _rows(df, *order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


def test_streaming_tumbling_equals_batch(spark, events_stream_dir):
    batch = W.tumbling_counts(load_table(spark, SF, "events"), "1 day")
    stream_src = W.with_watermark(
        spark.readStream.schema(EVENTS_SCHEMA).parquet(events_stream_dir), "1 hour"
    )
    streamed = _run_stream_to_memory(
        spark, W.tumbling_counts(stream_src, "1 day"), "t_tumbling"
    )
    assert _rows(streamed, "window_start") == _rows(batch, "window_start")


def test_streaming_session_equals_batch(spark, events_stream_dir):
    batch = W.session_counts(load_table(spark, SF, "events"), "30 minutes")
    stream_src = W.with_watermark(
        spark.readStream.schema(EVENTS_SCHEMA).parquet(events_stream_dir), "1 hour"
    )
    streamed = _run_stream_to_memory(
        spark, W.session_counts(stream_src, "30 minutes"), "t_session"
    )
    assert _rows(streamed, "user_id", "session_start") == _rows(
        batch, "user_id", "session_start"
    )


def test_streaming_enrichment_equals_batch(spark, events_stream_dir):
    """Stream-static broadcast join: the per-micro-batch dim lookup must
    produce the same enriched rollup as the batch twin (events_by_segment)."""
    dim = load_table(spark, SF, "customer").select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
    )
    batch = (
        W.enrich_with_dim(load_table(spark, SF, "events"), dim)
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    stream_src = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_stream_dir)
    streamed = _run_stream_to_memory(
        spark,
        W.enrich_with_dim(stream_src, dim).groupBy("segment").agg(
            F.count(F.lit(1)).alias("n")
        ),
        "t_enrich",
    )
    assert _rows(streamed, "segment") == _rows(batch, "segment")


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Duplicated landing files collapse to the batch-distinct row set, via
    dropDuplicatesWithinWatermark (bounded dedup state)."""
    landing = str(tmp_path / "dup_landing")
    ev = load_table(spark, SF, "events")
    ev.write.parquet(landing)  # copy 1
    ev.write.mode("append").parquet(landing)  # copy 2: every event_id twice
    stream_src = W.with_watermark(
        spark.readStream.schema(EVENTS_SCHEMA).parquet(landing), "1 hour"
    )
    q = (
        W.dedup_events(stream_src)
        .writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.table("t_dedup")
    assert streamed.count() == ev.count()
    assert _rows(streamed.select("event_id"), "event_id") == _rows(
        ev.select("event_id"), "event_id"
    )
    # batch path of the same operator: degrades to dropDuplicates
    doubled = ev.unionAll(ev)
    assert W.dedup_events(doubled).count() == ev.count()


def test_stream_ingest_matches_batch(spark, tmp_path):
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "chunks_out")
    ckpt = str(tmp_path / "ckpt")
    load_table(spark, SF, "documents").write.parquet(landing)

    q = stream_ingest_documents(
        spark, landing, out, ckpt, with_embeddings=False, available_now=True
    )
    q.awaitTermination(180)

    streamed = spark.read.parquet(out).select(
        "chunk_id", "doc_id", "chunk_idx", "text", "file_id", "court_level", "case_decision"
    )
    batch = build_chunks(spark, SF, with_embeddings=False).select(
        "chunk_id", "doc_id", "chunk_idx", "text", "file_id", "court_level", "case_decision"
    )
    assert _rows(streamed, "chunk_id") == _rows(batch, "chunk_id")


def test_stream_ingest_is_incremental(spark, tmp_path):
    """Second availableNow run with no new files appends nothing
    (checkpointed file-source replay = exactly-once)."""
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "chunks_out")
    ckpt = str(tmp_path / "ckpt")
    load_table(spark, SF, "documents").limit(50).write.parquet(landing)

    q = stream_ingest_documents(spark, landing, out, ckpt, with_embeddings=False)
    q.awaitTermination(120)
    n1 = spark.read.parquet(out).count()

    q2 = stream_ingest_documents(spark, landing, out, ckpt, with_embeddings=False)
    q2.awaitTermination(120)
    n2 = spark.read.parquet(out).count()
    assert n1 == n2 > 0


def test_stateful_running_totals_across_batches(spark, tmp_path):
    """T4 [ext]: applyInPandasWithState keeps per-user state across
    micro-batches — totals after two incremental runs equal the batch
    groupBy over all data, and state provably carried (not recomputed)."""
    from pdf_parse_vector_db_spark.streaming.stateful import running_user_totals

    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    ev = load_table(spark, SF, "events")
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)
    first.write.mode("append").parquet(landing)

    emitted = str(tmp_path / "emitted")

    def run(name):
        sdf = running_user_totals(
            spark.readStream.schema(EVENTS_SCHEMA).parquet(landing)
        )

        def sink(batch_df, batch_id):
            batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(emitted)

        q = (
            sdf.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # update mode emits one row per key per batch: latest emission wins
        out = spark.read.parquet(emitted)
        latest = {}
        for r in out.orderBy("batch_id").collect():
            latest[r.user_id] = (r.n_events, r.total_value)
        return latest

    got1 = run("stateful_run1")
    exp1 = {
        r.user_id: (r.n, r.total)
        for r in first.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert {k: v[0] for k, v in got1.items()} == {k: v[0] for k, v in exp1.items()}

    second.write.mode("append").parquet(landing)
    got2 = run("stateful_run2")
    exp2 = {
        r.user_id: (r.n, r.total)
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert {k: v[0] for k, v in got2.items()} == {k: v[0] for k, v in exp2.items()}
    for k in got2:
        assert abs(got2[k][1] - exp2[k][1]) < 1e-6


def test_stream_stream_join_equals_batch(spark, events_stream_dir):
    """Stream-stream inner join (purchase×view attribution) must emit
    exactly the batch join's pairs; the time-range condition + watermarks
    bound the join state."""
    ev = load_table(spark, SF, "events")
    batch = W.purchase_view_join(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "view"),
    )
    src = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_stream_dir)
    p = W.with_watermark(src.filter(F.col("event_type") == "purchase"), "1 hour")
    v = W.with_watermark(src.filter(F.col("event_type") == "view"), "2 hours")
    q = (
        W.purchase_view_join(p, v)
        .writeStream.format("memory")
        .queryName("t_ssjoin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.table("t_ssjoin")
    assert _rows(streamed, "purchase_id", "v_ts") == _rows(batch, "purchase_id", "v_ts")


def test_stream_dedup_drops_cross_batch_near_dups(spark, tmp_path):
    """Streaming incremental dedup: batch 2's exact re-sends of batch 1
    docs must be dropped by the history-band probe; its genuinely new docs
    (reversed word order: no shared 3-shingles) must survive and join the
    band table for later batches."""
    from pyspark.sql import functions as F

    from pdf_parse_vector_db_spark.streaming.dedup_stream import stream_dedup_ingest

    landing = str(tmp_path / "landing")
    corpus = str(tmp_path / "corpus")
    bands = str(tmp_path / "bands")
    ckpt = str(tmp_path / "ckpt")

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("doc_id") < 30)
        .persist()
    )
    # batch 1: the base corpus slice (each batch appends files to the landing dir)
    docs.write.mode("append").parquet(landing)
    q = stream_dedup_ingest(spark, landing, corpus, bands, ckpt)
    q.awaitTermination(120)

    n1 = spark.read.parquet(corpus).count()
    assert n1 > 0

    # batch 2: 5 exact re-sends (new ids) + 5 reversed-word genuinely-new docs
    resend = docs.filter(F.col("doc_id") < 5).withColumn(
        "doc_id", F.col("doc_id") + 100
    )
    fresh = (
        docs.filter((F.col("doc_id") >= 5) & (F.col("doc_id") < 10))
        .withColumn("doc_id", F.col("doc_id") + 200)
        .withColumn(
            "text", F.concat_ws(" ", F.reverse(F.split(F.trim(F.col("text")), r"\s+")))
        )
    )
    resend.unionByName(fresh).write.mode("append").parquet(landing)
    q = stream_dedup_ingest(spark, landing, corpus, bands, ckpt)
    q.awaitTermination(120)

    out = spark.read.parquet(corpus)
    ids = {r.doc_id for r in out.select("doc_id").collect()}
    assert not any(100 <= i < 105 for i in ids), "exact re-sends must be dropped"
    assert {205, 206, 207, 208, 209} <= ids, "reversed docs must survive"
    # survivors' bands joined the index: re-sending a reversed doc again drops it
    fresh.withColumn("doc_id", F.col("doc_id") + 300).write.mode("append").parquet(
        landing
    )
    q = stream_dedup_ingest(spark, landing, corpus, bands, ckpt)
    q.awaitTermination(120)
    ids3 = {r.doc_id for r in spark.read.parquet(corpus).select("doc_id").collect()}
    assert not any(500 <= i < 512 for i in ids3), "batch-2 survivors now dedup batch 3"
    docs.unpersist()


def test_streaming_heavy_hitters_state_carries_across_batches(spark, tmp_path):
    """MG-as-state: after two micro-batches, each event_type's summary must
    contain every term whose LIFETIME count exceeds n/k for that key —
    the mergeable-summary guarantee carried across time — and per-key
    state stays ≤ k counters however long the stream runs."""
    import os

    from pyspark.sql import functions as F

    from pdf_parse_vector_db_spark.streaming.stateful import (
        _MG_STREAM_K,
        streaming_heavy_hitters,
    )

    landing = str(tmp_path / "landing")
    out_rows: dict[int, list] = {}

    events = load_table(spark, SF, "events")
    terms = events.select(
        "event_id",
        "event_type",
        F.concat(F.lit("v"), (F.col("value") % 7).cast("int").cast("string")).alias("term"),
    ).persist()
    terms.filter(F.col("event_id") % 2 == 0).write.mode("append").parquet(landing)

    stream = spark.readStream.schema("event_id bigint, event_type string, term string").parquet(
        landing
    )
    hh = streaming_heavy_hitters(stream)

    def sink(df, bid):
        out_rows[bid] = df.collect()

    q = (
        hh.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    terms.filter(F.col("event_id") % 2 == 1).write.mode("append").parquet(landing)
    q = (
        hh.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    final = [r for rows in list(out_rows.values())[-1:] for r in rows]
    assert final, "second batch must emit summaries"
    by_key: dict[str, set] = {}
    for r in final:
        by_key.setdefault(r.event_type, set()).add(r.candidate)
        assert r.n_seen > 0
    # lifetime truth from the full batch data
    truth = (
        terms.groupBy("event_type", "term").count().collect()
    )
    totals = {r.event_type: 0 for r in truth}
    for r in truth:
        totals[r.event_type] += r["count"]
    for r in truth:
        if r["count"] > totals[r.event_type] / _MG_STREAM_K and r.event_type in by_key:
            assert r.term in by_key[r.event_type], (r.event_type, r.term)
    for key, cands in by_key.items():
        assert len(cands) <= _MG_STREAM_K
    terms.unpersist()


def test_sessionize_with_timeout_emits_closed_sessions(spark, tmp_path):
    """T4 [ext]: EventTimeTimeout sessionization — a session row is emitted
    exactly once, either when a successor event arrives past the gap
    (same-key path) or when the watermark passes last+gap (timeout path,
    inexpressible with a plain groupBy). Open sessions never emit."""
    import datetime as dt

    from pdf_parse_vector_db_spark.streaming.stateful import sessionize_with_timeout

    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    emitted = str(tmp_path / "emitted")
    base = dt.datetime(2024, 3, 1, 0, 0, 0)

    def write(rows):
        spark.createDataFrame(rows, EVENTS_SCHEMA).write.mode("append").parquet(landing)

    def run():
        src = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .parquet(landing)
            .withWatermark("ts", "1 hour")
        )
        sdf = sessionize_with_timeout(src, gap_minutes=30)

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(emitted)

        q = (
            sdf.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    m = dt.timedelta
    # run 1: user 1 two events inside one session; user 2 one event
    write(
        [
            (1, base, 1, "view", 1.0, "{}"),
            (2, base + m(minutes=10), 1, "view", 2.0, "{}"),
            (3, base + m(minutes=5), 2, "view", 5.0, "{}"),
        ]
    )
    run()
    # run 2: user 1 far-future event closes their first session on arrival
    write([(4, base + m(hours=6), 1, "view", 3.0, "{}")])
    run()
    # run 3: unrelated user advances the watermark past user 2's timeout
    write([(5, base + m(hours=8), 3, "view", 9.0, "{}")])
    run()

    rows = {
        (r.user_id, r.session_start, r.session_last, r.n_events, r.sum_value)
        for r in spark.read.parquet(emitted).collect()
    }
    # user 1's first session closes on arrival of the 06:00 successor; the
    # 06:00 session and user 2's single-event session close via timeout once
    # the final watermark (07:00) passes last+gap; user 3's session (timeout
    # 08:30) stays open and must NOT emit
    assert rows == {
        (1, base, base + m(minutes=10), 2, 3.0),
        (1, base + m(hours=6), base + m(hours=6), 1, 3.0),
        (2, base + m(minutes=5), base + m(minutes=5), 1, 5.0),
    }, rows


def test_debounce_stream_matches_batch_islands(spark, tmp_path):
    """Streaming debounce across TWO micro-batches == the batch
    gaps-and-islands head set: per-key state (last event ts) carries a
    burst straddling the batch boundary, so the stream must NOT re-emit a
    head for the continuation."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from pdf_parse_vector_db_spark.plans.streaming_queries import _DEBOUNCE_GAP_S
    from pdf_parse_vector_db_spark.streaming.stateful import debounce_stream

    ev = load_table(spark, SF, "events")
    # two landing files split on the time median — per-key order preserved
    landing = str(tmp_path / "debounce_landing")
    mid = ev.approxQuantile("event_id", [0.5], 0)[0]
    ev.filter(F.col("event_id") <= mid).write.parquet(landing)
    ev.filter(F.col("event_id") > mid).write.mode("append").parquet(landing)

    q = (
        debounce_stream(
            spark.readStream.schema(EVENTS_SCHEMA).parquet(landing),
            gap_seconds=_DEBOUNCE_GAP_S,
        )
        .writeStream.format("memory")
        .queryName("t_debounce")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {r.event_id for r in spark.table("t_debounce").collect()}

    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    us = F.expr("unix_micros(ts)")
    heads = {
        r.event_id
        for r in ev.withColumn(
            "is_first",
            (us - F.lag(us).over(w) > _DEBOUNCE_GAP_S * 1_000_000)
            | F.lag("ts").over(w).isNull(),
        )
        .filter("is_first")
        .collect()
    }
    assert streamed == heads


def test_left_outer_stream_join_matches_batch(spark, tmp_path):
    """LEFT OUTER stream-stream join across multiple micro-batches equals
    the batch left join — INCLUDING null-padded rows, which streaming only
    emits once the watermark proves no match can arrive. A far-future
    sentinel view (user with no purchases) in the last file pushes the
    final watermark past every real purchase so all outer rows flush."""
    from pyspark.sql import functions as F

    from pdf_parse_vector_db_spark.streaming.windows import (
        purchase_view_left_join,
        with_watermark,
    )

    ev = load_table(spark, SF, "events")
    landing = str(tmp_path / "left_landing")
    mid = ev.approxQuantile("event_id", [0.5], 0)[0]
    ev.filter(F.col("event_id") <= mid).write.parquet(landing)
    ev.filter(F.col("event_id") > mid).write.mode("append").parquet(landing)
    # The global watermark is the MIN across both input watermarks, so a
    # sentinel must advance BOTH the view side and the purchase side; and
    # outer rows flush one batch AFTER the watermark that releases them,
    # so a second, later sentinel file provides that extra batch.
    def _sentinels(days, base_id):
        one = ev.agg(F.max("ts").alias("mx"))
        mk = lambda et, off: one.select(
            F.lit(base_id + off).alias("event_id"),
            (F.col("mx") + F.expr(f"INTERVAL {days} DAYS")).alias("ts"),
            F.lit(10**9).alias("user_id"),
            F.lit(et).alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit("{}").alias("props"),
        )
        return mk("view", 0).unionAll(mk("purchase", 1))

    _sentinels(30, 10**9).write.mode("append").parquet(landing)
    _sentinels(60, 10**9 + 10).write.mode("append").parquet(landing)

    src = spark.readStream.schema(EVENTS_SCHEMA).option("maxFilesPerTrigger", 1).parquet(landing)
    q = (
        purchase_view_left_join(
            with_watermark(src.filter(F.col("event_type") == "purchase"), "10 minutes"),
            with_watermark(src.filter(F.col("event_type") == "view"), "10 minutes"),
        )
        .writeStream.format("memory")
        .queryName("t_left_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = spark.table("t_left_join").filter(F.col("user_id") < 10**9)

    from pdf_parse_vector_db_spark.plans.streaming_queries import purchase_view_left_pairs

    batch = purchase_view_left_pairs(spark, SF)
    key = lambda r: (r.purchase_id, r.v_ts)
    s_rows = sorted(map(key, streamed.collect()))
    b_rows = sorted(map(key, batch.collect()))
    assert s_rows == b_rows
    # and the outer mechanic actually fired: some purchases are null-padded
    assert any(v is None for _, v in b_rows)


def test_dim_refresh_requires_per_batch_rebuild(spark, tmp_path):
    """Measured dimension-freshness contract (see enrich_with_dim
    docstring): an in-plan static dim pins its file listing, but
    rebuilding the dim inside foreachBatch (enrich_refreshing_sink)
    picks up an overwrite between micro-batches — batch 0 sees OLD,
    batch 1 sees NEW."""
    from pyspark.sql import functions as F

    from pdf_parse_vector_db_spark.streaming.windows import enrich_refreshing_sink

    landing = str(tmp_path / "ev")
    dimdir = str(tmp_path / "dim")
    ev = load_table(spark, SF, "events")
    mid = ev.approxQuantile("event_id", [0.5], 0)[0]
    ev.filter(F.col("event_id") <= mid).write.parquet(landing)
    ev.filter(F.col("event_id") > mid).write.mode("append").parquet(landing)
    cust = load_table(spark, SF, "customer")
    cust.select(F.col("c_custkey").alias("user_id"), F.lit("OLD").alias("segment")).write.parquet(dimdir)

    enrich = enrich_refreshing_sink(spark, dimdir)
    seen = []

    def sink(bdf, bid):
        out = enrich(bdf)
        seen.append((bid, sorted(r.segment for r in out.select("segment").distinct().collect())))
        if bid == 0:
            cust.select(
                F.col("c_custkey").alias("user_id"), F.lit("NEW").alias("segment")
            ).write.mode("overwrite").parquet(dimdir)

    src = spark.readStream.schema(EVENTS_SCHEMA).option("maxFilesPerTrigger", 1).parquet(landing)
    q = src.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert seen == [(0, ["OLD"]), (1, ["NEW"])]


def test_stream_scd2_apply_equals_batch_merge(spark, tmp_path):
    """CDC-apply twin: two incremental micro-batch runs over disjoint key
    sets must land the same dimension as one batch merge of their union,
    and re-applying a change is a version-level no-op (idempotent MERGE)."""
    import datetime

    from pdf_parse_vector_db_spark.streaming.scd2_stream import (
        DIM_COLS,
        scd2_merge,
        stream_scd2_apply,
    )

    t0 = datetime.date(1994, 1, 1)
    t1 = datetime.date(1995, 6, 1)
    dim_dir = str(tmp_path / "dim")
    changes_dir = str(tmp_path / "changes")
    ckpt = str(tmp_path / "ckpt")

    dim0 = spark.createDataFrame(
        [(k, seg, 100 * k, 1, t0, None, True) for k, seg in
         [(1, "BUILDING"), (2, "MACHINERY"), (3, "FURNITURE"), (4, "AUTOMOBILE")]],
        "c_custkey bigint, segment string, acctbal_cents bigint, version int, "
        "valid_from date, valid_to date, is_current boolean",
    )
    dim0.write.parquet(dim_dir)

    batch_a = [(1, "HOUSEHOLD", 100, t1), (5, "BUILDING", 0, t1)]     # change + insert
    batch_b = [(2, "MACHINERY", 999, t1), (3, "FURNITURE", 300, t1)]  # change + no-op

    schema = "c_custkey bigint, segment string, acctbal_cents bigint, eff_date date"
    spark.createDataFrame(batch_a, schema).write.parquet(changes_dir + "/a")
    stream_scd2_apply(spark, changes_dir + "/a", dim_dir, ckpt + "/a").awaitTermination(120)
    spark.createDataFrame(batch_b, schema).write.parquet(changes_dir + "/b")
    stream_scd2_apply(spark, changes_dir + "/b", dim_dir, ckpt + "/b").awaitTermination(120)

    got = sorted(
        (tuple(r[c] for c in DIM_COLS))
        for r in spark.read.parquet(dim_dir).collect()
    )
    want_df = scd2_merge(dim0, spark.createDataFrame(batch_a + batch_b, schema))
    want = sorted(tuple(r[c] for c in DIM_COLS) for r in want_df.collect())
    assert got == want
    # the streamed history: key 1 and 2 versioned, 3 untouched no-op, 5 inserted
    by_key = {}
    for row in got:
        by_key.setdefault(row[0], []).append(row)
    assert len(by_key[1]) == 2 and len(by_key[2]) == 2
    assert len(by_key[3]) == 1 and by_key[3][0][6] is True  # no-op stayed v1 current
    assert len(by_key[5]) == 1 and by_key[5][0][3] == 1

    # idempotent re-apply: merging batch_a again changes nothing
    re_applied = scd2_merge(want_df, spark.createDataFrame(batch_a, schema))
    again = sorted(tuple(r[c] for c in DIM_COLS) for r in re_applied.collect())
    assert again == want


def test_streaming_hll_distinct_matches_batch_and_exact(spark, tmp_path):
    """Mergeable-HLL state: the estimate after TWO micro-batches must equal
    the single-micro-batch (batch-call) estimate over all rows — register
    merging is insensitive to batching — and land within the m=64 sketch's
    error envelope of the exact distinct count."""
    from pyspark.sql import functions as F

    from pdf_parse_vector_db_spark.streaming.stateful import streaming_distinct_users

    landing = str(tmp_path / "hll_landing")
    events = load_table(spark, SF, "events").select("event_id", "event_type", "user_id")
    events.filter(F.col("event_id") % 2 == 0).write.mode("append").parquet(landing)

    stream = spark.readStream.schema("event_id bigint, event_type string, user_id bigint").parquet(
        landing
    )
    out_rows: dict[int, list] = {}

    def sink(df, bid):
        out_rows[bid] = df.collect()

    q = (
        streaming_distinct_users(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "hll_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    events.filter(F.col("event_id") % 2 == 1).write.mode("append").parquet(landing)
    q2 = (
        streaming_distinct_users(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "hll_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)

    final = {r.event_type: r for r in out_rows[max(out_rows)]}
    # one-micro-batch stream over everything = the "batch" sketch
    landing_all = str(tmp_path / "hll_landing_all")
    events.write.mode("append").parquet(landing_all)
    one_rows: dict[int, list] = {}
    q3 = (
        streaming_distinct_users(
            spark.readStream.schema(
                "event_id bigint, event_type string, user_id bigint"
            ).parquet(landing_all)
        )
        .writeStream.foreachBatch(lambda df, bid: one_rows.__setitem__(bid, df.collect()))
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "hll_ckpt_all"))
        .trigger(availableNow=True)
        .start()
    )
    q3.awaitTermination(120)
    batch = {r.event_type: r for r in one_rows[max(one_rows)]}
    exact = {
        r.event_type: r.ndv
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("ndv"))
        .collect()
    }
    assert set(final) == set(batch) == set(exact)
    for et, row in final.items():
        assert row.ndv_est == batch[et].ndv_est, et  # batching-insensitive
        assert abs(row.ndv_est - exact[et]) / exact[et] < 0.45, (et, row.ndv_est, exact[et])


def test_stream_scd2_crash_recovery_paths(spark, tmp_path):
    """Round-5 atomic-publish protocol: every crash point of the
    tmp-write + backup-rename swap must leave a recoverable dimension.
    Simulates (a) crash between the two renames — dim_dir ABSENT, backup
    present: the replay must restore the backup, never empty-initialize
    and discard history; (b) crash mid-write — a leftover tmp dir must be
    discarded, not read."""
    import datetime
    import shutil

    from pdf_parse_vector_db_spark.streaming.scd2_stream import (
        DIM_COLS,
        scd2_merge,
        stream_scd2_apply,
    )

    t0 = datetime.date(1994, 1, 1)
    t1 = datetime.date(1995, 6, 1)
    dim_dir = str(tmp_path / "dim")
    schema = "c_custkey bigint, segment string, acctbal_cents bigint, eff_date date"

    dim0 = spark.createDataFrame(
        [(1, "BUILDING", 100, 1, t0, None, True), (2, "MACHINERY", 200, 1, t0, None, True)],
        "c_custkey bigint, segment string, acctbal_cents bigint, version int, "
        "valid_from date, valid_to date, is_current boolean",
    )
    dim0.write.parquet(dim_dir)

    # (a) crash between rename(dim->bak) and rename(tmp->dim): dim absent
    shutil.move(dim_dir, dim_dir + "__bak")
    # (b) plus a half-written tmp dir that must be ignored
    (tmp_path / "dim__tmp").mkdir()
    (tmp_path / "dim__tmp" / "_temporary").mkdir()

    batch = [(1, "HOUSEHOLD", 150, t1)]
    spark.createDataFrame(batch, schema).write.parquet(str(tmp_path / "ch"))
    stream_scd2_apply(
        spark, str(tmp_path / "ch"), dim_dir, str(tmp_path / "ckpt")
    ).awaitTermination(120)

    got = sorted(tuple(r[c] for c in DIM_COLS) for r in spark.read.parquet(dim_dir).collect())
    want_df = scd2_merge(dim0, spark.createDataFrame(batch, schema))
    want = sorted(tuple(r[c] for c in DIM_COLS) for r in want_df.collect())
    # history survived: key 1 versioned (2 rows), key 2 untouched
    assert got == want
    assert len([r for r in got if r[0] == 1]) == 2
    # publish is clean: no leftover tmp or backup dirs
    assert not (tmp_path / "dim__tmp").exists()
    assert not (tmp_path / "dim__bak").exists()


def test_scd2_checked_rename_raises_on_false():
    """Round-6 ADVICE: Hadoop FileSystem.rename signals failure by
    returning FALSE, not raising (HDFS: dst exists, src vanished) — the
    publish swap must turn that into an exception so the micro-batch
    fails and checkpoint replay retries, instead of silently publishing a
    stale dimension. (The local FS throws instead of returning false, so
    the false path is exercised through a stub with the same interface.)"""
    from pdf_parse_vector_db_spark.streaming.scd2_stream import checked_rename

    class _FS:
        def __init__(self, ok):
            self.ok = ok
            self.calls = []

        def rename(self, src, dst):
            self.calls.append((src, dst))
            return self.ok

    with pytest.raises(IOError, match="rename returned false"):
        checked_rename(_FS(False), "dim", "bak")
    good = _FS(True)
    checked_rename(good, "tmp", "dim")  # true → passes through silently
    assert good.calls == [("tmp", "dim")]

"""Streaming surface: the batch tumbling aggregate run as a Structured
Streaming query (watermark + window), and payload-schema drift through
the parse path."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from spark_cdc_replication_spark.fixtures import load_table
from spark_cdc_replication_spark.operators.cdc_parse import parse_envelope
from spark_cdc_replication_spark.operators.windows import (
    hopping_counts,
    tumbling_counts,
)


def test_tumbling_agg_streams_with_watermark(spark, sf_dir, tmp_path):
    src = str(tmp_path / "stream-src")
    load_table(spark, sf_dir, "events").select("ts", "event_type").write.parquet(src)

    stream = spark.readStream.schema("ts timestamp, event_type string").parquet(src)
    windowed = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "6 hours").start.alias("bucket"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        windowed.writeStream.format("memory")
        .queryName("tumbling_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.bucket, r.event_type): r.n
        for r in spark.table("tumbling_stream").collect()
    }
    batch = tumbling_counts(
        load_table(spark, sf_dir, "events"), "ts", "6 hours", ["event_type"]
    )
    expect = {(r.bucket, r.event_type): r.n for r in batch.collect()}
    assert got == expect


def test_hopping_agg_streams_equal_batch(spark, sf_dir, tmp_path):
    """The overlapping-window aggregate (F.window width+slide) is the
    same operator batch and streaming; the oracle-checked batch query
    (events_hopping_6h_2h) therefore certifies the streaming run."""
    src = str(tmp_path / "hop-src")
    load_table(spark, sf_dir, "events").select("ts", "event_type").write.parquet(src)

    stream = spark.readStream.schema("ts timestamp, event_type string").parquet(src)
    windowed = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "6 hours", "2 hours").start.alias("bucket"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        windowed.writeStream.format("memory")
        .queryName("hopping_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.bucket, r.event_type): r.n
        for r in spark.table("hopping_stream").collect()
    }
    batch = hopping_counts(
        load_table(spark, sf_dir, "events"), "ts", "6 hours", "2 hours", ["event_type"]
    )
    expect = {(r.bucket, r.event_type): r.n for r in batch.collect()}
    assert got == expect


def test_session_window_streams_equal_batch(spark, sf_dir, tmp_path):
    """F.session_window is the stateful streaming session operator;
    the batch query (events_session_window, oracle-checked) must be
    reproduced exactly by the streaming run over the same data — the
    batch oracle therefore certifies the streaming semantics too."""
    src = str(tmp_path / "sess-src")
    load_table(spark, sf_dir, "events").select("ts", "user_id").write.parquet(src)

    def sessions(df):
        return df.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        ).agg(F.count(F.lit(1)).alias("n_events"))

    stream = spark.readStream.schema("ts timestamp, user_id long").parquet(src)
    q = (
        sessions(stream.withWatermark("ts", "1 hour"))
        .writeStream.format("memory")
        .queryName("session_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.user_id, r.w.start, r.w.end): r.n_events
        for r in spark.table("session_stream").collect()
    }
    expect = {
        (r.user_id, r.w.start, r.w.end): r.n_events
        for r in sessions(spark.read.parquet(src)).collect()
    }
    assert got == expect and len(got) > 0


def test_stream_stream_interval_join_equals_batch_range_join(spark, sf_dir, tmp_path):
    """Stream-stream inner join with an event-time interval condition
    (watermarks on both sides bound the join state) must reproduce the
    batch bucketized range join exactly — certifying the streaming
    execution of the same interval-containment semantics."""
    from spark_cdc_replication_spark.workloads.events_analytics import (
        q_range_join_signup_views,
    )

    src = str(tmp_path / "ssj-src")
    load_table(spark, sf_dir, "events").select(
        "ts", "event_id", "user_id", "event_type"
    ).write.parquet(src)

    schema = "ts timestamp, event_id long, user_id long, event_type string"
    signups = (
        spark.readStream.schema(schema)
        .parquet(src)
        .filter(F.col("event_type") == "signup")
        .select(
            F.col("user_id").alias("s_user"),
            F.col("event_id").alias("signup_event_id"),
            F.col("ts").alias("s_ts"),
        )
        .withWatermark("s_ts", "1 hour")
    )
    views = (
        spark.readStream.schema(schema)
        .parquet(src)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_event_id"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "2 hours")
    )
    joined = views.join(
        signups,
        F.expr(
            "v_user = s_user AND v_ts >= s_ts "
            "AND v_ts <= s_ts + INTERVAL 1 HOUR"
        ),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.s_user, r.signup_event_id, r.view_event_id, r.v_ts)
        for r in spark.table("ssj_stream").collect()
    }
    expect = {
        (r.user_id, r.signup_event_id, r.view_event_id, r.ts)
        for r in q_range_join_signup_views(spark, sf_dir).collect()
    }
    assert got == expect and len(got) > 0


def test_parse_envelope_tolerates_schema_drift(spark):
    """v2 schema (extra column) over v1 payloads -> nulls; unknown
    payload keys under v1 schema -> ignored.  This is the explicit-
    schema replacement for the reference's per-run re-inference
    (daily_data_handler.py:61)."""
    rows = [
        ("2024-01-01 00:00:00", '{"id": "1", "a": "x"}'),            # v1 payload
        ("2024-01-01 00:00:01", '{"id": "2", "a": "y", "b": "new"}'),  # v2 payload
    ]
    env = spark.createDataFrame(rows, "timestamp string, value string").select(
        F.col("timestamp").cast("timestamp"), "value"
    )
    v1 = StructType([StructField("id", StringType()), StructField("a", StringType())])
    v2 = StructType(
        [
            StructField("id", StringType()),
            StructField("a", StringType()),
            StructField("b", StringType()),
        ]
    )
    with_v1 = {r.id: r for r in parse_envelope(env, v1).collect()}
    assert set(with_v1) == {"1", "2"} and "b" not in parse_envelope(env, v1).columns

    with_v2 = {r.id: r for r in parse_envelope(env, v2).collect()}
    assert with_v2["1"].b is None and with_v2["2"].b == "new"


def test_streaming_dedup_within_watermark(spark, sf_dir, tmp_path):
    """At-least-once upstream (duplicated envelope) -> exactly-once rows
    via dropDuplicatesWithinWatermark on (event_id) — the streaming
    counterpart of increment_append's batch dedup (A4)."""
    src = str(tmp_path / "dup-src")
    ev = load_table(spark, sf_dir, "events").select("ts", "event_id")
    ev.unionByName(ev).write.parquet(src)  # every event twice

    stream = spark.readStream.schema("ts timestamp, event_id long").parquet(src)
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    q = (
        deduped.writeStream.format("parquet")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "dd-ckpt"))
        .option("path", str(tmp_path / "dd-out"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "dd-out"))
    assert out.count() == ev.count()  # duplicates collapsed
    assert out.select("event_id").distinct().count() == ev.count()


def test_parse_envelope_malformed_payload_yields_nulls_not_failure(spark):
    rows = [("2024-01-01 00:00:00", "not json at all")]
    env = spark.createDataFrame(rows, "timestamp string, value string").select(
        F.col("timestamp").cast("timestamp"), "value"
    )
    schema = StructType([StructField("id", StringType()), StructField("n", LongType())])
    [row] = parse_envelope(env, schema).collect()
    assert row.id is None and row.n is None  # PERMISSIVE parse, no crash


def test_watermark_drops_late_rows_across_restarts(spark, tmp_path):
    """Watermark semantics pinned end-to-end: a row arriving in a later
    trigger with event time older than the advanced watermark must NOT
    revise an already-finalized window (append mode emits each window
    once, late data is dropped — the bounded-state contract)."""
    import datetime as dt

    src = str(tmp_path / "late-src")
    outd = str(tmp_path / "late-out")

    def run():
        stream = spark.readStream.schema("ts timestamp, k string").parquet(src)
        # group by the window STRUCT (extracting .start in the groupBy
        # severs watermark propagation); project start after the agg
        agg = (
            stream.withWatermark("ts", "30 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("bucket"), "n")
        )
        q = (
            agg.writeStream.format("parquet")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "late-ckpt"))
            .option("path", outd)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def ts(h, m):
        return dt.datetime(2024, 1, 1, h, m)

    # batch 1: three rows in [10:00, 11:00) plus a 12:00 row that
    # advances the watermark to 11:30 -> the 10:00 window finalizes
    spark.createDataFrame(
        [(ts(10, 0), "a"), (ts(10, 5), "a"), (ts(10, 50), "a"), (ts(12, 0), "a")],
        "ts timestamp, k string",
    ).write.mode("append").parquet(src)
    run()
    first = {r.bucket: r.n for r in spark.read.parquet(outd).collect()}
    assert first[ts(10, 0)] == 3  # finalized with exactly the on-time rows

    # batch 2: a LATE row for the finalized window (10:20 < watermark
    # 11:30) plus a 14:00 row pushing the watermark to 13:30 — past the
    # 12:00 window's END (13:00), so that window finalizes this batch
    spark.createDataFrame(
        [(ts(10, 20), "late"), (ts(14, 0), "a")],
        "ts timestamp, k string",
    ).write.mode("append").parquet(src)
    run()
    final = {}
    for r in spark.read.parquet(outd).collect():
        final[r.bucket] = final.get(r.bucket, 0) + r.n
    assert final[ts(10, 0)] == 3   # late row dropped, window NOT revised
    assert final[ts(12, 0)] == 1   # on-time window finalized by batch 2

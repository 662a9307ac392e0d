"""applyInPandasWithState: per-key running CDC state across
micro-batches AND across checkpoint restarts."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from spark_cdc_replication_spark.fixtures import CDC_PAYLOAD_SCHEMA, cdc_envelope
from spark_cdc_replication_spark.operators.cdc_parse import parse_envelope
from spark_cdc_replication_spark.streaming.stateful import running_cdc_state

_SPLIT = "2024-01-16"


def _run_stream(spark, src_dir, ckpt, out_dir):
    stream = spark.readStream.schema("timestamp timestamp, value string").parquet(
        src_dir
    )
    changes = parse_envelope(stream, CDC_PAYLOAD_SCHEMA)
    q = (
        running_cdc_state(changes)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .option("path", out_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _latest_state(spark, out_dir):
    """One row per key: the highest-count emission (state only grows)."""
    df = spark.read.parquet(out_dir)
    latest = df.groupBy("id").agg(F.max("n_events").alias("n_events"))
    return {r.id: r for r in latest.collect()}


def test_state_survives_restart(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    env = cdc_envelope(spark, sf_dir)
    env.filter(F.col("timestamp") < _SPLIT).write.parquet(src)

    _run_stream(spark, src, ckpt, out)
    first = _latest_state(spark, out)
    assert first and all(r.n_events > 0 for r in first.values())

    # second batch arrives; restart from the same checkpoint
    env.filter(F.col("timestamp") >= _SPLIT).write.mode("append").parquet(src)
    _run_stream(spark, src, ckpt, out)
    second = _latest_state(spark, out)

    # final state per key == batch-computed totals over the FULL log
    golden = duckdb.sql(
        f"""
        SELECT user_id::VARCHAR AS id, count(*) AS n
        FROM '{sf_dir}/events.parquet' GROUP BY 1
        """
    ).fetchall()
    totals = {g[0]: g[1] for g in golden}
    for key, row in second.items():
        n_before = first[key].n_events if key in first else 0
        assert row.n_events == totals[key], key
        assert row.n_events >= n_before
    # counts continued from checkpointed state, not recomputed from zero
    assert any(k in first for k in second)

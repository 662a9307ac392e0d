"""observe()-based metrics: computed by the SAME action that consumes
the frame — no second scan — and correct through a real merge."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_cdc_replication_spark.fixtures import CDC_PAYLOAD_SCHEMA, cdc_envelope
from spark_cdc_replication_spark.operators.cdc_parse import parse_envelope
from spark_cdc_replication_spark.operators.merge import merge_snapshot
from spark_cdc_replication_spark.plans.metrics import observed


def test_observed_merge_metrics_single_action(spark, sf_dir, tmp_path):
    changes = parse_envelope(cdc_envelope(spark, sf_dir), CDC_PAYLOAD_SCHEMA)
    snapshot = changes.filter("timestamp < '2024-01-15'").drop("__op", "__deleted")
    merged = merge_snapshot(snapshot, changes, ["id"], ["timestamp", "event_id"])

    out, obs = observed(
        merged,
        rows=F.count(F.lit(1)),
        max_ts=F.max("timestamp"),
    )
    target = str(tmp_path / "merged-out")
    out.write.parquet(target)  # the ONE action

    back = spark.read.parquet(target)
    assert obs.get["rows"] == back.count()
    assert obs.get["max_ts"] == back.agg(F.max("timestamp")).collect()[0][0]

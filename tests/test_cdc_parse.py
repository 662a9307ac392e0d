from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from spark_cdc_replication_spark.operators.cdc_parse import (
    decode_envelope,
    parse_envelope,
    route_ops,
)

SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("A/B", StringType()),
        StructField("timestamp", StringType()),  # collides with ingest ts
        StructField("__op", StringType()),
        StructField("__deleted", StringType()),
    ]
)


def envelope(spark):
    rows = [
        ("2024-01-01 00:00:00", '{"id":"1","A/B":"x","timestamp":"evt1","__op":"c","__deleted":"false"}'),
        ("2024-01-01 00:00:01", '{"id":"1","A/B":"y","timestamp":"evt2","__op":"u","__deleted":"false"}'),
        ("2024-01-01 00:00:02", '{"id":"2","A/B":null,"timestamp":"evt3","__op":"d","__deleted":"true"}'),
    ]
    return spark.createDataFrame(rows, "timestamp string, value string")


def test_parse_flattens_sanitizes_and_keeps_ingest_ts(spark):
    out = parse_envelope(decode_envelope(envelope(spark)), SCHEMA)
    assert out.columns == ["timestamp", "id", "a_b", "source_timestamp", "__op", "__deleted"]
    assert out.schema["timestamp"].dataType.simpleString() == "timestamp"
    vals = {(r.id, r.a_b, r.source_timestamp) for r in out.collect()}
    assert ("1", "y", "evt2") in vals


def test_route_ops_split(spark):
    parsed = parse_envelope(decode_envelope(envelope(spark)), SCHEMA)
    routed = route_ops(parsed, ["id"])
    assert routed.inserts.count() == 1
    assert routed.updates.count() == 1
    assert routed.delete_keys.columns == ["id"]
    assert [r.id for r in routed.delete_keys.collect()] == ["2"]
    # meta columns removed from the payload splits
    assert "__op" not in routed.inserts.columns


def test_malformed_json_yields_nulls_not_failure(spark):
    bad = spark.createDataFrame(
        [("2024-01-01 00:00:00", "not json at all")], "timestamp string, value string"
    )
    out = parse_envelope(decode_envelope(bad), SCHEMA)
    row = out.collect()[0]
    assert row.id is None and row["__op"] is None

from __future__ import annotations

from spark_cdc_replication_spark.functions.names import (
    sanitize_name,
    sanitized_payload_names,
)


def test_slash_to_underscore():
    assert sanitize_name("a/b") == "a_b"


def test_lowercase():
    assert sanitize_name("MixedCase") == "mixedcase"


def test_timestamp_collision_renamed_deterministically():
    m = sanitized_payload_names(["timestamp", "x"])
    assert m["timestamp"] == "source_timestamp"
    assert m["x"] == "x"


def test_double_collision_uses_second_candidate():
    m = sanitized_payload_names(["timestamp", "source_timestamp"])
    assert m["source_timestamp"] == "source_timestamp"
    assert m["timestamp"] == "timestamp_in_source"

"""Kafka source option plumbing — contract-tested without a broker.

The sandbox has no Kafka, so the live path can't execute; what CAN be
pinned is that ``kafka_stream`` passes exactly the reference's options
(``/root/reference/pipelines/raw_data_handler.py:36-44``: bootstrap
servers, subscribe, startingOffsets=earliest, failOnDataLoss=false,
plus SASL extras) and decodes the frame to the typed envelope."""

from __future__ import annotations

from pyspark.sql.streaming import readwriter

from spark_cdc_replication_spark.streaming.ingest import kafka_stream


def test_kafka_stream_option_plumbing(spark, monkeypatch):
    captured: dict[str, str] = {}
    formats: list[str] = []
    orig_option = readwriter.DataStreamReader.option
    orig_format = readwriter.DataStreamReader.format

    def option(self, key, value):
        captured[key] = value
        return orig_option(self, key, value)

    def fmt(self, source):
        formats.append(source)
        return orig_format(self, source)

    def fake_load(self, path=None, **kw):
        # a kafka frame's (timestamp, value) columns, value binary
        return spark.createDataFrame(
            [], "timestamp timestamp, value binary"
        )

    monkeypatch.setattr(readwriter.DataStreamReader, "option", option)
    monkeypatch.setattr(readwriter.DataStreamReader, "format", fmt)
    monkeypatch.setattr(readwriter.DataStreamReader, "load", fake_load)

    df = kafka_stream(
        spark,
        brokers="broker1:9092,broker2:9092",
        topic="cdc.events",
        extra_options={"kafka.security.protocol": "SASL_SSL"},
    )
    assert formats == ["kafka"]
    assert captured["kafka.bootstrap.servers"] == "broker1:9092,broker2:9092"
    assert captured["subscribe"] == "cdc.events"
    assert captured["startingOffsets"] == "earliest"
    assert captured["failOnDataLoss"] == "false"
    assert captured["kafka.security.protocol"] == "SASL_SSL"
    # decoded to the typed envelope the rest of the pipeline consumes
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == [
        ("timestamp", "timestamp"),
        ("value", "string"),
    ]

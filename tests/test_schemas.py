"""Schema registry, sampled inference, and drift union."""

from __future__ import annotations

from pyspark.sql.types import LongType, StringType, StructField, StructType

from spark_cdc_replication_spark.schemas import (
    SchemaRegistry,
    infer_payload_schema,
    schema_union,
)

V1 = StructType([StructField("id", StringType()), StructField("a", StringType())])


def test_registry_roundtrip(tmp_path):
    reg = SchemaRegistry(tmp_path)
    assert not reg.exists("t")
    reg.save("t", V1)
    assert reg.exists("t")
    assert reg.load("t") == V1


def test_infer_payload_schema_is_sampled(spark):
    rows = [(f'{{"id": "{i}", "n": {i}}}',) for i in range(50)]
    df = spark.createDataFrame(rows, "value string")
    schema = infer_payload_schema(spark, df, sample=10)
    assert {f.name for f in schema.fields} == {"id", "n"}
    assert dict((f.name, f.dataType) for f in schema.fields)["n"] == LongType()


def test_infer_empty_frame_yields_empty_schema(spark):
    df = spark.createDataFrame([], "value string")
    assert infer_payload_schema(spark, df) == StructType([])


def test_schema_union_widens_without_reordering(spark):
    v2 = StructType(
        [
            StructField("id", StringType()),
            StructField("b", LongType()),
        ]
    )
    merged = schema_union(V1, v2)
    assert [f.name for f in merged.fields] == ["id", "a", "b"]

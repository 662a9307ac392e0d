"""Deterministic CDC fixtures derived from the driver's tables.

The driver provides TPC-H-ish parquet plus an ``events`` stream table
(``/root/testdata/sf*/events.parquet``).  Per FIXTURES.md §2 we derive
a Debezium-flattened CDC envelope from ``events`` so that the Spark
pipeline AND the DuckDB oracle compute from the same source of truth:

* key        = ``user_id``     (payload ``id``)
* ingest ts  = ``ts``          (envelope ``timestamp``)
* ``__op``   = event_type map: signup->c, view->r, click/purchase->u,
               error->d
* payload    = id, event_id, value, k (from ``props`` JSON), __op,
               __deleted

The envelope mirrors the reference's Kafka record shape ``(timestamp,
value-json)`` (``/root/reference/pipelines/raw_data_handler.py:51``)
and envelope schema (``json_schemas/TEST_schema.json:1``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_cdc_replication_spark.session import ensure_runtime_conf
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: event_type -> Debezium __op  (keep in sync with OP_CASE_SQL below).
OP_MAP = {"signup": "c", "view": "r", "click": "u", "purchase": "u", "error": "d"}

#: The same mapping as ANSI SQL, used by every DuckDB oracle query.
OP_CASE_SQL = (
    "CASE event_type WHEN 'signup' THEN 'c' WHEN 'view' THEN 'r' "
    "WHEN 'error' THEN 'd' ELSE 'u' END"
)

#: Explicit payload schema (SchemaRegistry-style primary path; the
#: reference would re-infer this per run, daily_data_handler.py:61).
CDC_PAYLOAD_SCHEMA = StructType(
    [
        StructField("id", StringType()),  # Debezium keys arrive as strings
        StructField("event_id", LongType()),
        StructField("value", DoubleType()),
        StructField("k", StringType()),
        StructField("__op", StringType()),
        StructField("__deleted", StringType()),
    ]
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a fixture table, normalizing nano-precision timestamps.

    ``events.parquet`` carries TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong`` Spark surfaces it as a
    nanos-since-epoch long.  Truncate ns -> us exactly like DuckDB does
    when it reads the same file (integer floor division).
    """
    ensure_runtime_conf(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for field in df.schema.fields:
        meta = field.metadata or {}
        if meta.get("__is_nanos", False) or (
            name == "events" and field.name == "ts" and field.dataType.simpleString() == "bigint"
        ):
            df = df.withColumn(
                field.name, F.timestamp_micros(F.expr(f"`{field.name}` div 1000"))
            )
    return df


def op_expr(event_type_col: str = "event_type") -> F.Column:
    col = F.col(event_type_col)
    expr = F.lit(None).cast("string")
    expr = (
        F.when(col == "signup", F.lit("c"))
        .when(col == "view", F.lit("r"))
        .when(col == "error", F.lit("d"))
        .otherwise(F.lit("u"))
    )
    return expr


def cdc_envelope(spark: SparkSession, sf_dir: str, where: str | None = None) -> DataFrame:
    """``events`` -> Kafka-shaped ``(timestamp, value)`` envelope rows."""
    ev = load_table(spark, sf_dir, "events")
    if where:
        ev = ev.filter(where)
    op = op_expr()
    payload = F.to_json(
        F.struct(
            F.col("user_id").cast("string").alias("id"),
            F.col("event_id"),
            F.col("value"),
            F.get_json_object("props", "$.k").alias("k"),
            op.alias("__op"),
            F.when(op == "d", F.lit("true")).otherwise(F.lit("false")).alias("__deleted"),
        )
    )
    return ev.select(F.col("ts").alias("timestamp"), payload.alias("value"))

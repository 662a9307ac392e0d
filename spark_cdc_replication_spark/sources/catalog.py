"""Managed-table lifecycle.

Replaces the reference's py4j catalog calls and its
limit(1)+TRUNCATE bootstrap / tmp-table lineage-break dance:

* ``tableExists`` via py4j ``spark._jsparkSession.catalog()...``
  (``/root/reference/pipelines/daily_data_handler.py:76``) -> the
  public ``spark.catalog.tableExists``.
* bootstrap-by-sample (write 1 row, TRUNCATE, to register schema —
  ``daily_data_handler.py:157-162``) -> ``CREATE TABLE`` DDL from the
  DataFrame schema.
* self-overwrite via ``_tmp`` table + refresh + read-back + overwrite +
  TRUNCATE (``daily_data_handler.py:141-155``) -> a staging table with
  an atomic-rename promote.  The reference's sequence has a data-loss
  window (crash after the target overwrite starts); staging-then-swap
  keeps the old table readable until the new one is fully written.
  (On Delta/Iceberg deployments, replace with ``MERGE INTO`` — not
  available in this container.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def table_exists(spark: SparkSession, table: str) -> bool:
    return spark.catalog.tableExists(table)


def create_table_like(spark: SparkSession, table: str, df: DataFrame) -> None:
    """Register an empty managed table with the frame's schema."""
    empty = spark.createDataFrame([], df.schema)
    empty.write.saveAsTable(table)


def overwrite_table(spark: SparkSession, df: DataFrame, table: str) -> None:
    """Overwrite ``table`` with ``df`` even when ``df`` reads from it.

    Spark refuses to overwrite an input of the running plan, so the
    result is materialized to ``<table>__staging`` first (the lineage
    break the reference achieves with its ``_tmp`` schema), then
    promoted via drop + rename.  The old table stays readable for the
    whole duration of the big write; the remaining exposure is the
    instant between the final DROP and RENAME (two catalog calls, not
    atomic in the Hive catalog) — a crash exactly there leaves the data
    complete but only under the ``__staging`` name, recoverable with a
    manual RENAME.  That window is metadata-only and sub-second,
    vs the reference's variant where the target is TRUNCATEd before the
    data write even starts (``daily_data_handler.py:141-155``).  On a
    catalog with ``CREATE OR REPLACE TABLE ... AS SELECT`` (Delta,
    Iceberg), use that for a fully atomic swap.
    """
    staging = f"{table}__staging"
    spark.sql(f"DROP TABLE IF EXISTS {staging}")
    df.write.mode("overwrite").saveAsTable(staging)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"ALTER TABLE {staging} RENAME TO {table}")


def append_table(df: DataFrame, table: str, partition_by: tuple[str, ...] = ()) -> None:
    writer = df.write.mode("append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.saveAsTable(table)

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship CDC snapshot-merge on sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 plus the [EXT] LLM-data operators, each paired (where
SQL-expressible) with its DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from spark_cdc_replication_spark.workloads import collect_registry

_QUERIES, _ORACLE = collect_registry()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full CDC snapshot merge (last-writer-wins fold
    with delete semantics) over the envelope stream synthesized from
    /root/testdata/sf0.001/events.parquet."""
    return _QUERIES["cdc_snapshot_merge"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLE)

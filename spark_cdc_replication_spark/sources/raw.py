"""Raw layer: landing + partition-pruned read-back.

Reference stage 1 (``/root/reference/pipelines/raw_data_handler.py``):
Kafka -> ``(timestamp, value)`` -> ORC files partitioned by
``op_year/op_month/op_day`` derived from the ingest timestamp
(``raw_data_handler.py:68-87``), read back one day at a time by
*string-building the partition directory path*
(``daily_data_handler.py:51-58``).

Our re-expression:

* the landing projection is :func:`with_partition_cols` — pure columns;
* the scan is :func:`read_raw_day` — read the ROOT and filter on the
  partition columns, so Catalyst's ``PruneFileSourcePartitions`` does
  the pruning (no path math, and a missing day is an empty DataFrame,
  not an ``AnalysisException`` used as control flow —
  ``daily_data_handler.py:39-41``);
* Kafka itself is swappable for a file/rate source in tests — anything
  producing ``(timestamp, value)``.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PARTITION_COLS = ("op_year", "op_month", "op_day")


def with_partition_cols(df: DataFrame, ts_col: str = "timestamp") -> DataFrame:
    """Derive hive partition columns from the ingest timestamp
    (reference P4, ``raw_data_handler.py:68-75``)."""
    return (
        df.withColumn("op_year", F.year(ts_col))
        .withColumn("op_month", F.month(ts_col))
        .withColumn("op_day", F.dayofmonth(ts_col))
    )


def land_batch(df: DataFrame, data_dir: str, fmt: str = "parquet") -> None:
    """Append one batch to the partitioned raw layer (reference K1,
    ``raw_data_handler.py:77-87``)."""
    (
        with_partition_cols(df)
        .write.partitionBy(*PARTITION_COLS)
        .mode("append")
        .format(fmt)
        .save(data_dir)
    )


def read_raw_day(
    spark: SparkSession, data_dir: str, day: dt.date, fmt: str = "parquet"
) -> DataFrame:
    """Read exactly one ingest-day partition via partition-column
    filters (Catalyst prunes to the single directory — check
    ``.explain`` shows ``PartitionFilters``).  Returns an empty frame
    (correct schema) for a missing day instead of raising."""
    df = spark.read.format(fmt).load(data_dir)
    return df.filter(
        (F.col("op_year") == day.year)
        & (F.col("op_month") == day.month)
        & (F.col("op_day") == day.day)
    )


def read_raw_all(spark: SparkSession, data_dir: str, fmt: str = "parquet") -> DataFrame:
    """Bootstrap scan of every partition (reference S3,
    ``history_data_handler.py:77-81`` — which globs ``{dir}/*``; we
    just read the root)."""
    return spark.read.format(fmt).load(data_dir)

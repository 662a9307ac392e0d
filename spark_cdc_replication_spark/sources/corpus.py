"""Corpus ingestion sources and training-shard sink.

The reference ingests exactly one shape — Kafka ``(timestamp, value)``
envelopes (``/root/reference/pipelines/raw_data_handler.py:30-47``).
A training-data pipeline additionally ingests raw document corpora and
exports packed shards; these are the Spark-native equivalents:

* :func:`read_jsonl_corpus` — newline-delimited JSON with an EXPLICIT
  schema (same policy as the CDC envelope path: no per-run inference —
  ``schemas.py``).  Malformed lines surface in ``_corrupt_record``
  instead of failing the job (PERMISSIVE), so one bad line in a 100 TB
  crawl doesn't kill the run.
* :func:`read_text_corpus` — one document per file (``wholetext``) for
  pre-chunked corpora; file path kept as the document key.
* :func:`write_training_shards` — size-capped shard export via
  ``maxRecordsPerFile`` (the writer splits oversized partitions on its
  own, no ``coalesce(1)``-style parallelism loss; the reference's
  single-file increment writer is the documented anti-pattern X2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

#: Explicit schema of the ``documents`` corpus shape (TESTDATA.md).
DOCUMENTS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: str | StructType = DOCUMENTS_SCHEMA,
    keep_corrupt: bool = True,
) -> DataFrame:
    """Read a JSONL corpus with an explicit schema.

    ``keep_corrupt=True``: PERMISSIVE — malformed lines produce a row
    whose fields are null and whose ``_corrupt_record`` holds the raw
    line, so ingestion quality is queryable instead of fatal.  (Spark
    restriction: a query referencing ONLY ``_corrupt_record`` must
    cache the frame first — QUERY_ONLY_CORRUPT_RECORD_COLUMN.)

    ``keep_corrupt=False``: DROPMALFORMED — bad lines are dropped at
    parse time inside the scan, which is the scalable form (no
    post-hoc filter on the corrupt column, no cache)."""
    if not keep_corrupt:
        return (
            spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)
        )
    full = (
        schema + ", _corrupt_record string"
        if isinstance(schema, str)
        else schema.add("_corrupt_record", "string")
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def read_text_corpus(spark: SparkSession, path: str) -> DataFrame:
    """One document per file: (path, text) via wholetext — for
    pre-split corpora where the file IS the document."""
    return (
        spark.read.text(path, wholetext=True)
        .select(
            F.input_file_name().alias("doc_path"),
            F.col("value").alias("text"),
        )
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    rows_per_shard: int,
    partition_cols: tuple[str, ...] = (),
    fmt: str = "parquet",
) -> None:
    """Export size-capped training shards.

    ``maxRecordsPerFile`` caps every output file at ``rows_per_shard``
    rows while keeping the writer fully parallel — each task splits its
    own partition into as many files as needed.  Optional hive
    partitioning (e.g. by split/source) composes with the cap."""
    writer = (
        df.write.option("maxRecordsPerFile", rows_per_shard)
        .mode("overwrite")
        .format(fmt)
    )
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.save(path)

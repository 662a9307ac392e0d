"""Incremental streaming corpus dedup: CDC-merge machinery applied to
the LLM-data surface.

New documents stream in; each micro-batch is (1) deduped within itself
by normalized-text fingerprint (min doc_id wins — same rule as batch
``exact_dedup``), then (2) anti-joined against the PERSISTED
fingerprint index, and the survivors append to both the corpus and the
index.  This is structurally the reference's daily CDC merge
(anti-join new keys against the snapshot,
``/root/reference/pipelines/daily_data_handler.py:84-101``) with
"primary key" = content fingerprint — how a 100 TB crawl dedups
continuously instead of re-scanning the corpus per drop.

Scale shape: the per-batch anti-join shuffles 32-byte md5 keys, never
document bodies; the index side carries only ``fp``, and AQE
broadcasts a small batch's fingerprints against it.  The corpus itself
is append-only — no rewrite, no full-corpus dropDuplicates (the
anti-pattern the batch merge layer also avoids, SCALE.md).

``foreachBatch`` is used deliberately (vs the native sink used for
raw landing): the batch body is NOT a stateless append — it reads the
index written by previous epochs.  Restart safety comes from the
fingerprint-anti-join itself: a replayed batch finds its fingerprints
already indexed and appends nothing (the dedup predicate doubles as
the idempotence guard).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions.text import fingerprint


def _dedup_batch_against_index(
    batch: DataFrame, corpus_dir: str, index_dir: str, id_col: str, text_col: str
) -> None:
    spark = batch.sparkSession
    fp = batch.withColumn("fp", fingerprint(text_col))
    # within-batch winner: min id per fingerprint (exact_dedup's rule)
    w_min = fp.groupBy("fp").agg(F.min(id_col).alias(id_col))
    fresh = fp.join(w_min, ["fp", id_col], "left_semi")
    if os.path.isdir(index_dir) and any(
        f.endswith(".parquet") for f in os.listdir(index_dir)
    ):
        index = spark.read.parquet(index_dir).select("fp")
        fresh = fresh.join(index, "fp", "left_anti")
    # persist survivors: corpus rows + their fingerprints
    fresh.drop("fp").write.mode("append").parquet(corpus_dir)
    fresh.select("fp").write.mode("append").parquet(index_dir)


def corpus_dedup_stream(
    documents: DataFrame,
    corpus_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously ingest documents, appending only content-new ones.

    ``documents`` is any streaming frame with (id, text, ...) columns;
    survivors land under ``corpus_dir``, their fingerprints under
    ``index_dir``."""
    writer = (
        documents.writeStream.foreachBatch(
            lambda batch, _epoch: _dedup_batch_against_index(
                batch, corpus_dir, index_dir, id_col, text_col
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

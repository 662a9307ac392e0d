"""Streaming token-index maintenance: the streamed, bucket-partitioned
inverted index must equal the batch-built one — as data AND as the
input to bm25_topk_from_index (VERDICT r5 'next' #5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_cdc_replication_spark.fixtures import load_table
from spark_cdc_replication_spark.functions.text import normalized
from spark_cdc_replication_spark.operators.search import (
    bm25_topk,
    bm25_topk_from_index,
    index_stats,
    token_index,
)
from spark_cdc_replication_spark.streaming.token_index_stream import (
    token_index_stream,
)


def _queries(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("doc_id") < 3)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.split(normalized("text"), " ")).alias("term"),
        )
        .filter(F.length("term") >= 3)
        .groupBy("query_id")
        .agg(F.slice(F.collect_list("term"), 1, 4).alias("__t"))
        .select("query_id", F.explode("__t").alias("term"))
    )


def test_streamed_index_equals_batch_index(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = str(tmp_path / "docs-src")
    idx = str(tmp_path / "token-index")

    docs.filter(F.col("doc_id") % 2 == 0).write.mode("append").parquet(src)
    schema = "doc_id bigint, text string"

    def run():
        q = token_index_stream(
            spark.readStream.schema(schema).parquet(src),
            index_dir=idx,
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
        q.awaitTermination(120)

    run()
    docs.filter(F.col("doc_id") % 2 == 1).write.mode("append").parquet(src)
    run()

    streamed = spark.read.parquet(idx)
    batch = token_index(docs)
    key = lambda r: (r["doc_id"], r["term"], r["tf"], r["dl"], r["bucket"])  # noqa: E731
    assert {key(r) for r in streamed.collect()} == {key(r) for r in batch.collect()}

    # identical retrieval when handed to the scorer — including with
    # precomputed stats + literal bucket pruning (the persisted-index
    # fast path)
    queries = _queries(spark, sf_dir)
    via_docs = bm25_topk(docs, queries, k=5)
    via_stream = bm25_topk_from_index(
        streamed, queries, k=5, stats=index_stats(streamed), prune_buckets=True
    )
    assert {tuple(r) for r in via_docs.collect()} == {
        tuple(r) for r in via_stream.collect()
    }


def test_bucket_pruning_restricts_partitions(spark, sf_dir, tmp_path):
    """prune_buckets must put a literal bucket IN (...) filter on a
    partitioned parquet index — visible as PartitionFilters in the
    scan — so query cost tracks query-term count, not corpus size."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    idx = str(tmp_path / "token-index")
    token_index(docs).write.partitionBy("bucket").parquet(idx)
    index = spark.read.parquet(idx)
    queries = _queries(spark, sf_dir)
    out = bm25_topk_from_index(
        index, queries, k=5, stats=index_stats(index), prune_buckets=True
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # the pruning filter actually names the bucket column
    assert "bucket" in plan.split("PartitionFilters")[1][:200]


def test_index_rows_are_per_row_transform_no_exchange(spark, sf_dir):
    """The index build must contain NO shuffle (that is what makes it
    streaming-safe with the native sink): assert no Exchange below the
    token_index plan."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    plan = token_index(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

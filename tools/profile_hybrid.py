"""One-off profiling harness for similarity_hybrid_rrf legs (r17)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_cdc_replication_spark.session import get_spark
from spark_cdc_replication_spark.fixtures import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(label, fn, runs=3):
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{best:7.3f}s  {label}", flush=True)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark("profile-hybrid")
    spark.range(1000).selectExpr("sum(id)").collect()
    from spark_cdc_replication_spark.workloads.llmdata import (
        _BM25_QUERIES,
        _token_index_store,
        warm_indexes,
    )
    from spark_cdc_replication_spark.operators.search import (
        bm25_topk_from_index,
        rrf_fuse,
    )
    from spark_cdc_replication_spark.operators.similarity import brute_force_topk

    warm_indexes(spark, SF_DIR)

    emb = load_table(spark, SF_DIR, "embeddings")
    print("emb rows:", emb.count(), "dim:", len(emb.first()["embedding"]))
    terms = spark.createDataFrame(_BM25_QUERIES, "query_id int, term string")
    path, stats = _token_index_store(spark, SF_DIR)

    kw = bm25_topk_from_index(
        spark.read.parquet(path), terms, k=20, stats=stats, prune_buckets=True
    )
    timed("kw leg (bm25 from index)", lambda: noop(kw))

    qvecs = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    vec = brute_force_topk(emb, qvecs, k=20).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "rank"
    )
    timed("vec leg (brute force)", lambda: noop(vec))

    fused = rrf_fuse([kw, vec], id_col="doc_id", k=10)
    timed("fused (full query)", lambda: noop(fused))


if __name__ == "__main__":
    main()

"""One-off profiling harness for dedup_containment (r17 opt round)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_cdc_replication_spark.session import get_spark
from spark_cdc_replication_spark.fixtures import load_table
from spark_cdc_replication_spark.operators.dedup import _shingle_sets

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn, runs=3):
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{best:7.3f}s  {label}", flush=True)
    return best


def main():
    spark = get_spark("profile-containment")
    spark.range(1000).selectExpr("sum(id)").collect()

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    quotes = docs.filter(F.col("doc_id") % 10 == 3).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.substring("text", 1, 200).alias("text"),
    )
    corpus = docs.unionByName(quotes)
    n, min_containment, max_doc_freq = 3, 0.6, 20

    sh = _shingle_sets(corpus, "text", "doc_id", n)
    timed("shingle sets", lambda: noop(sh))

    grams = sh.select(F.col("doc_id"), F.explode("__sh").alias("__g"))
    timed("grams exploded", lambda: noop(grams))

    postings = grams.groupBy("__g").agg(F.collect_set("doc_id").alias("__ids"))
    postings = postings.filter(F.size("__ids") <= max_doc_freq)
    timed("postings (collect_set + cap)", lambda: noop(postings))

    sizes = (
        postings.select(F.explode("__ids").alias("id_a"))
        .groupBy("id_a")
        .agg(F.count(F.lit(1)).alias("__n_a"))
    )
    timed("sizes", lambda: noop(sizes))

    inter = (
        postings.select(F.explode("__ids").alias("id_a"), "__ids")
        .select("id_a", F.explode("__ids").alias("id_b"))
        .filter(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__shared"))
    )
    timed("inter (pair explode + count)", lambda: noop(inter))

    from spark_cdc_replication_spark.operators.dedup import containment_pairs
    full = containment_pairs(corpus, n=3, min_containment=0.6, max_doc_freq=20)
    timed("full containment_pairs", lambda: noop(full))


if __name__ == "__main__":
    main()

"""One-off profiling harness for text_excise_repeated (r17 opt round).

Times each internal stage of excise_repeated_spans with the noop sink
(guide §1.4) in one bench-identical session, and dumps the full query's
formatted plan to plans/r17/.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_cdc_replication_spark.session import get_spark
from spark_cdc_replication_spark.fixtures import load_table
from spark_cdc_replication_spark.operators.textanalysis import (
    _excise_grams,
    _excise_rewrite,
    excise_repeated_spans,
    repeated_grams,
    excise_gram_spans,
)

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
    spark = get_spark("profile-excise")
    spark.range(1000).selectExpr("sum(id)").collect()

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    n, min_docs = 12, 2

    # stage 0: raw scan+tokenize+window-hash (one pass)
    positions = _excise_grams(docs, F.col("doc_id"), n, "text").select(
        F.col("doc_id"), F.posexplode("__grams").alias("__pos", "__s")
    )
    spark.sparkContext.setJobDescription("positions only")
    timed("positions (tokenize+hash+posexplode)", lambda: noop(positions))

    # stage 1: repeated-gram relation (distinct + two-phase count)
    grams = repeated_grams(docs, n, min_docs)
    spark.sparkContext.setJobDescription("repeated_grams")
    timed("repeated_grams (stage1)", lambda: noop(grams))

    # stage 2: probe join + per-doc fold (includes its own positions pass)
    matched = (
        positions.join(grams.select(F.col("gram").alias("__s")), on="__s", how="inner")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("__pos")).alias("__starts"))
    )
    spark.sparkContext.setJobDescription("matched")
    timed("matched (stage1+probe+fold)", lambda: noop(matched))

    # full operator
    full = excise_repeated_spans(docs, n=n, min_docs=min_docs)
    spark.sparkContext.setJobDescription("full")
    timed("full excise_repeated_spans", lambda: noop(full))

    # full query shape (with md5 projection)
    out = full.select(
        "doc_id",
        "n_spans_excised",
        "n_words_removed",
        F.md5(F.col("text").cast("binary")).alias("text_fp"),
    )
    timed("full query (md5 projection)", lambda: noop(out))

    os.makedirs("plans/r17", exist_ok=True)
    with open("plans/r17/text_excise_repeated_before.txt", "w") as fh:
        fh.write(out._jdf.queryExecution().explainString("formatted"))
    print("plan written")


if __name__ == "__main__":
    main()

"""Intra-session interleaved A/B of ngram-verify shapes (r17 opt):
original corpus-wide shingle-set joins vs filter-then-tokenize
(unhinted) vs filter-then-tokenize with candidate-side broadcast
hints, measured on the dedup_corpus_weighted and split_cluster_safe
query shapes.  Interleaved min-of-N in ONE session controls host
drift, which inter-session bench comparisons measured at +/-20%.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_cdc_replication_spark.session import get_spark
from spark_cdc_replication_spark.fixtures import load_table
from spark_cdc_replication_spark.operators.dedup import (
    _shingle_set_expr,
    _shingle_sets,
    dup_clusters,
    minhash_lsh_candidates,
    minhash_signatures,
    shingle_jaccard,
)
from spark_cdc_replication_spark.functions.text import normalized, words

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def verify_original(df, pairs, n, min_jaccard):
    sh = _shingle_sets(df, "text", "doc_id", n)
    joined = (
        pairs.join(sh.withColumnsRenamed({"doc_id": "id_a", "__sh": "sh_a"}), on="id_a")
        .join(sh.withColumnsRenamed({"doc_id": "id_b", "__sh": "sh_b"}), on="id_b")
    )
    jac = shingle_jaccard("sh_a", "sh_b").alias("jaccard")
    return joined.select("id_a", "id_b", jac).filter(F.col("jaccard") >= min_jaccard)


def verify_ftt(df, pairs, n, min_jaccard, hints):
    docs = df.select("doc_id", "text")
    a = docs.select(F.col("doc_id").alias("id_a"), F.col("text").alias("__ta"))
    b = docs.select(F.col("doc_id").alias("id_b"), F.col("text").alias("__tb"))
    if hints:
        j1 = a.join(F.broadcast(pairs), on="id_a")
        joined = b.join(F.broadcast(j1), on="id_b")
    else:
        joined = pairs.join(a, on="id_a").join(b, on="id_b")
    toks = joined.select(
        "id_a", "id_b",
        words(normalized("__ta")).alias("__wa"),
        words(normalized("__tb")).alias("__wb"),
    )
    sh = toks.select(
        "id_a", "id_b",
        _shingle_set_expr("__wa", n).alias("sh_a"),
        _shingle_set_expr("__wb", n).alias("sh_b"),
    )
    jac = shingle_jaccard("sh_a", "sh_b").alias("jaccard")
    return sh.select("id_a", "id_b", jac).filter(F.col("jaccard") >= min_jaccard)


def weighted_query(spark, verify):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    near1 = docs.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 1_000_000_000_000).alias("doc_id"),
        F.upper(F.regexp_replace("text", " ", "  ")).alias("text"),
    )
    near2 = docs.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 2_000_000_000_000).alias("doc_id"),
        F.concat(F.regexp_replace("text", " ", "\t"), F.lit("  ")).alias("text"),
    )
    corpus = docs.unionByName(near1).unionByName(near2)
    sigs = minhash_signatures(corpus, num_hashes=16, shingle_n=3)
    cands = minhash_lsh_candidates(sigs, num_bands=8, min_est_jaccard=0.99)
    verified = verify(corpus, cands.select("id_a", "id_b"), 3, 0.999)
    clusters = dup_clusters(verified.select("id_a", "id_b"))
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_duplicates")
    )
    drop = F.broadcast(
        clusters.filter(F.col("cluster_id") != F.col("doc_id"))
        .select(F.col("doc_id").alias("doc_id"))
    )
    canon = F.broadcast(
        sizes.select(F.col("cluster_id").alias("__canon_id"), "n_duplicates")
    )
    out = (
        corpus.join(drop, on="doc_id", how="left_anti")
        .join(canon, F.col("doc_id") == F.col("__canon_id"), "left")
        .drop("__canon_id")
        .withColumn("n_duplicates", F.coalesce(F.col("n_duplicates"), F.lit(1).cast("long")))
    )
    return out.select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("text_fp"), "n_duplicates"
    )


VARIANTS = {
    "orig": lambda s: weighted_query(s, verify_original),
    "ftt": lambda s: weighted_query(s, lambda *a: verify_ftt(*a, hints=False)),
    "ftt+hint": lambda s: weighted_query(s, lambda *a: verify_ftt(*a, hints=True)),
}


def main():
    spark = get_spark("ab-verify")
    spark.range(1000).selectExpr("sum(id)").collect()
    # warm each variant once (codegen compile) outside the timed runs
    for fn in VARIANTS.values():
        fn(spark).write.format("noop").mode("overwrite").save()
    best = {k: float("inf") for k in VARIANTS}
    ROUNDS = 5
    for r in range(ROUNDS):
        for k, fn in VARIANTS.items():
            t0 = time.perf_counter()
            fn(spark).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best[k] = min(best[k], dt)
            print(f"round {r} {k:9s} {dt:6.3f}s", flush=True)
    print({k: round(v, 3) for k, v in best.items()})


if __name__ == "__main__":
    main()

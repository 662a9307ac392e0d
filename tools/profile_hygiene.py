"""One-off profiling harness for prepare_corpus (r17 opt round):
times each internal stage with the noop sink in one session.
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
    _shingle_sets,
    cross_corpus_candidates,
    minhash_lsh_candidates,
    minhash_signatures,
    shingle_jaccard,
)
from spark_cdc_replication_spark.operators.textanalysis import filter_corpus

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
    spark = get_spark("profile-hygiene")
    spark.range(1000).selectExpr("sum(id)").collect()

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    base = docs.filter(F.col("doc_id") % 50 != 0)

    def perturb(d, off):
        return d.select(
            (F.col("doc_id") + off).alias("doc_id"),
            F.upper(F.regexp_replace("text", " ", "  ")).alias("text"),
        )

    train = base.unionByName(
        perturb(base.filter(F.col("doc_id") % 20 == 0), 10_000_000)
    ).unionByName(perturb(bench, 30_000_000))

    kw = dict(
        min_quality=0.5, langs=("en",), min_words=20,
        min_distinct_word_frac=0.3, max_top_bigram_frac=0.2,
    )

    kept_raw = filter_corpus(train, **kw)
    spark.sparkContext.setJobDescription("filter_corpus")
    timed("filter_corpus (no ckpt)", lambda: noop(kept_raw))

    kept = filter_corpus(train, **kw).localCheckpoint(eager=False)
    sigs = minhash_signatures(kept, "text", "doc_id", 16, 3)
    spark.sparkContext.setJobDescription("sigs")
    timed("sigs (ckpt+minhash16)", lambda: noop(sigs))

    sh = _shingle_sets(kept, "text", "doc_id", 3)
    spark.sparkContext.setJobDescription("shingle sets")
    timed("shingle sets (from ckpt)", lambda: noop(sh))

    cands = minhash_lsh_candidates(sigs, id_col="doc_id", num_bands=8, min_est_jaccard=0.99)
    spark.sparkContext.setJobDescription("cands")
    timed("lsh candidates", lambda: noop(cands))

    dd = (
        cands.select("id_a", "id_b")
        .join(sh.withColumnsRenamed({"doc_id": "id_a", "__sh": "sh_a"}), on="id_a")
        .join(sh.withColumnsRenamed({"doc_id": "id_b", "__sh": "sh_b"}), on="id_b")
    )
    removal = (
        dd.select(F.col("id_b").alias("doc_id"), shingle_jaccard("sh_a", "sh_b").alias("__j"))
        .filter(F.col("__j") >= 0.999)
        .select("doc_id")
    )
    spark.sparkContext.setJobDescription("dedup removal")
    timed("dedup removal ids", lambda: noop(removal))

    # bench leg
    bsigs = minhash_signatures(bench, "text", "doc_id", 16, 3)
    bcands = cross_corpus_candidates(sigs, bsigs, id_col="doc_id", num_bands=8, min_est_jaccard=0.99)
    spark.sparkContext.setJobDescription("bench candidates")
    timed("bench candidates", lambda: noop(bcands))

    from spark_cdc_replication_spark.operators.hygiene import prepare_corpus
    full = prepare_corpus(
        train, bench, min_quality=0.5, langs=("en",), min_words=20,
        min_distinct_word_frac=0.3, max_top_bigram_frac=0.2,
        num_hashes=16, shingle_n=3, num_bands=8,
        min_est_jaccard=0.99, min_jaccard=0.999,
    ).select("doc_id", F.md5(F.col("text").cast("binary")).alias("text_fp"))
    spark.sparkContext.setJobDescription("full prepare_corpus")
    timed("full prepare_corpus", lambda: noop(full))


if __name__ == "__main__":
    main()

"""Streaming IVF index maintenance: the streamed, cell-partitioned
inverted file must be equivalent to the batch-built one — both as data
and as the probe input to the serving operator — in ALL precisions
(float, the int8-compressed IVF-SQ8 analogue, and the IVF-PQ code
layout)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_cdc_replication_spark.fixtures import load_table
from spark_cdc_replication_spark.operators.similarity import (
    ivf_assign,
    ivf_assign_int8,
    ivf_centroids,
    ivf_topk,
    ivfpq_assign,
    ivfpq_topk,
    pq_codebooks,
)
from spark_cdc_replication_spark.streaming.index_stream import ivf_index_stream


@pytest.mark.parametrize("precision", ["float", "int8", "pq"])
def test_streamed_index_equals_batch_index(spark, sf_dir, tmp_path, precision):
    emb = load_table(spark, sf_dir, "embeddings")
    cents = ivf_centroids(emb, num_centroids=8)
    books = (
        pq_codebooks(emb, num_subspaces=16, codes_per_subspace=16)
        if precision == "pq"
        else None
    )
    src = str(tmp_path / "emb-src")
    idx = str(tmp_path / "ivf-index")

    # two arrivals
    emb.filter(F.col("vec_id") % 2 == 0).write.mode("append").parquet(src)
    schema = "vec_id bigint, embedding array<float>, label int"

    def run():
        q = ivf_index_stream(
            spark.readStream.schema(schema).parquet(src),
            cents,
            index_dir=idx,
            checkpoint_dir=str(tmp_path / "ckpt"),
            precision=precision,
            codebooks=books,
        )
        q.awaitTermination(120)

    run()
    emb.filter(F.col("vec_id") % 2 == 1).write.mode("append").parquet(src)
    run()

    streamed = spark.read.parquet(idx)
    if precision == "pq":
        batch = ivfpq_assign(emb, cents, books)
        payload = "__code"
    else:
        build = ivf_assign if precision == "float" else ivf_assign_int8
        batch = build(emb, cents)
        payload = "__cv"
    # identical (id, cell) assignment AND identical stored payloads
    # (for int8/pq that pins the quantized codes byte-for-byte)
    assert {
        (r["neighbor_id"], r["cell"], tuple(r[payload])) for r in streamed.collect()
    } == {(r["neighbor_id"], r["cell"], tuple(r[payload])) for r in batch.collect()}

    # identical probe results when handed to the serving operator
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    if precision == "pq":
        via_stream = ivfpq_topk(
            emb, queries, cents, books, k=5, nprobe=3,
            assigned=streamed.select("neighbor_id", "cell", "__code"),
        )
        via_batch = ivfpq_topk(
            emb, queries, cents, books, k=5, nprobe=3, assigned=batch
        )
    else:
        via_stream = ivf_topk(
            emb, queries, cents, k=5, nprobe=3,
            assigned=streamed.select("neighbor_id", "__cv", "cell"),
        )
        via_batch = ivf_topk(emb, queries, cents, k=5, nprobe=3, assigned=batch)
    assert {tuple(r) for r in via_stream.collect()} == {
        tuple(r) for r in via_batch.collect()
    }


def test_index_stream_rejects_unknown_precision(spark, tmp_path):
    with pytest.raises(ValueError, match="precision"):
        ivf_index_stream(
            spark.readStream.format("rate").load(),
            [[0.0]],
            index_dir=str(tmp_path / "i"),
            checkpoint_dir=str(tmp_path / "c"),
            precision="fp4",
        )

"""SemDeDup (operators/dedup.py::semantic_dedup): the cluster-blocked
survivor contract, checked against a transparent all-pairs numpy model
that replicates the cell assignment, the 6-decimal-rounded cosine
pairing, and the lower-id-survivor rule."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_cdc_replication_spark.operators.dedup import semantic_dedup

DIM = 6


def _vectors(seed: int, n: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, DIM)).astype(np.float32)
    if n > 17:
        # plant exact duplicates and a near-duplicate
        vecs[5] = vecs[1]
        vecs[11] = vecs[2]
        vecs[17] = vecs[3] + rng.normal(scale=1e-3, size=DIM).astype(np.float32)
    return [[float(x) for x in v] for v in vecs]


def _df(spark, vecs):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )


def _model_survivors(vecs, centroids, tau):
    """All-pairs within-cell model: argmax-cosine assignment (lowest
    cell on ties), round(cos, 6) >= tau, drop the higher id."""
    mat = np.asarray(vecs, dtype=np.float64)
    cent = np.asarray(centroids, dtype=np.float64)
    mn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)
    cn = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-300)
    cells = np.argmax(mn @ cn.T, axis=1)
    removed = set()
    n = len(vecs)
    for a in range(n):
        for b in range(a + 1, n):
            if cells[a] != cells[b]:
                continue
            cos = round(float(mn[a] @ mn[b]), 6)
            if cos >= tau:
                removed.add(b)
    return set(range(n)) - removed


@pytest.mark.parametrize("seed,tau", [(0, 0.95), (1, 0.8), (2, 0.5)])
def test_matches_allpairs_model_with_fixed_centroids(spark, seed, tau):
    vecs = _vectors(seed, 24)
    centroids = _vectors(seed + 100, 4)
    got = {
        r.vec_id
        for r in semantic_dedup(_df(spark, vecs), centroids=centroids, min_cosine=tau)
        .select("vec_id")
        .collect()
    }
    assert got == _model_survivors(vecs, centroids, tau)


def test_exact_duplicates_always_removed(spark):
    """Equal vectors get identical cell assignments, so exact dups can
    never escape across a cluster boundary — the one hard guarantee
    the approximation keeps."""
    vecs = _vectors(7, 30)
    out = semantic_dedup(_df(spark, vecs), num_centroids=5, min_cosine=0.999999)
    got = {r.vec_id for r in out.select("vec_id").collect()}
    assert 5 not in got and 11 not in got  # planted copies of 1 and 2
    assert 1 in got and 2 in got


def test_one_cell_equals_global_allpairs(spark):
    """num_centroids=1 degenerates to exact global dedup — the
    recall-certification twin (same pattern as similarity_lsh_all)."""
    vecs = _vectors(3, 20)
    one_cell = semantic_dedup(_df(spark, vecs), num_centroids=1, min_cosine=0.6)
    got = {r.vec_id for r in one_cell.select("vec_id").collect()}
    # model with a single centroid: every pair compared
    assert got == _model_survivors(vecs, [[1.0] * DIM], 0.6)


def test_arrow_impl_equals_native(spark):
    """The Arrow matmul pairing must return the same survivor set as
    the native sequential-sum path at the shared 6-decimal rounding
    (ulp-level summation differences die in the rounding)."""
    from spark_cdc_replication_spark.operators.dedup import embedding_cosine_dups

    vecs = _vectors(9, 40)
    df = _df(spark, vecs).withColumn("blk", F.col("vec_id") % 3)
    for tau in (0.5, 0.9):
        nat = {
            (r.id_a, r.id_b, r.cosine)
            for r in embedding_cosine_dups(df, ["blk"], min_cosine=tau).collect()
        }
        arw = {
            (r.id_a, r.id_b, r.cosine)
            for r in embedding_cosine_dups(
                df, ["blk"], min_cosine=tau, impl="arrow"
            ).collect()
        }
        assert nat == arw


def test_arrow_impl_preserves_string_ids(spark):
    """Regression: the arrow path must keep the INPUT id type — an
    unconditional long cast NULLed string ids and silently returned
    the corpus un-deduplicated."""
    from spark_cdc_replication_spark.operators.dedup import embedding_cosine_dups

    vecs = _vectors(12, 8)
    df = spark.createDataFrame(
        [(f"doc-{i:02d}", v, i % 2) for i, v in enumerate(vecs)],
        "vec_id string, embedding array<float>, blk int",
    )
    for impl in ("native", "arrow"):
        got = {
            (r.id_a, r.id_b)
            for r in embedding_cosine_dups(
                df, ["blk"], min_cosine=0.2, impl=impl
            ).collect()
        }
        assert got and all(a < b and a.startswith("doc-") for a, b in got), impl
    nat = embedding_cosine_dups(df, ["blk"], min_cosine=0.2).collect()
    arw = embedding_cosine_dups(df, ["blk"], min_cosine=0.2, impl="arrow").collect()
    assert {(r.id_a, r.id_b, r.cosine) for r in nat} == {
        (r.id_a, r.id_b, r.cosine) for r in arw
    }


def test_survivors_keep_all_columns_and_broadcast_plan(spark):
    vecs = _vectors(4, 16)
    df = _df(spark, vecs)
    out = semantic_dedup(df, num_centroids=2, min_cosine=0.9)
    assert out.columns == df.columns
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan

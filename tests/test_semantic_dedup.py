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


def test_arrow_impl_never_pairs_duplicate_ids_with_themselves(spark):
    """Regression: with a duplicated id (two rows, same vec_id,
    identical vectors) the stable argsort + triu pairing emitted an
    (id, id) pair at cosine 1.0, which the native path's STRICT
    id_a < id_b filter drops — so semantic_dedup would have removed
    every copy of that id instead of keeping one.  Both impls must
    agree and neither may emit a self-pair."""
    from spark_cdc_replication_spark.operators.dedup import embedding_cosine_dups

    vecs = _vectors(21, 6)
    rows = [(i, v, 0) for i, v in enumerate(vecs)]
    rows.append((3, vecs[3], 0))  # duplicated id, identical vector
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, blk int")
    for tau in (0.2, 0.999999):
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
        assert all(a != b for a, b, _ in arw), "self-pair leaked"
        assert nat == arw


def test_auto_centroid_sizing_arithmetic():
    """k = max(16, ceil(n / target)): Σ|cell|² ≈ n·target stays linear
    in n instead of the effectively-quadratic n²/16 of the old fixed
    default (VERDICT r5 'next' #2)."""
    from spark_cdc_replication_spark.operators.dedup import _auto_num_centroids

    assert _auto_num_centroids(0) == 16
    assert _auto_num_centroids(500) == 16          # bench scale: unchanged
    assert _auto_num_centroids(160_000) == 16      # bound starts binding here
    assert _auto_num_centroids(160_001) == 17
    assert _auto_num_centroids(10**9) == 100_000   # web scale ~ SemDeDup's 11k+
    assert _auto_num_centroids(1000, target_cell_size=100) == 16
    assert _auto_num_centroids(10_000, target_cell_size=100) == 100
    import pytest

    with pytest.raises(ValueError):
        _auto_num_centroids(10, target_cell_size=0)


def test_auto_sizing_bounds_cells_on_growing_corpus(spark):
    """Default path on a 10x corpus: derived k grows with n, so the
    max cell stays near target_cell_size instead of n/16."""
    import numpy as np

    from spark_cdc_replication_spark.operators.dedup import semantic_dedup
    from spark_cdc_replication_spark.operators.similarity import (
        _cell_assign_udf,
        ivf_centroids,
    )

    rng = np.random.default_rng(42)
    n, target = 2000, 50
    vecs = rng.normal(size=(n, DIM)).astype(np.float64)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    # the derived k the default path will use
    from spark_cdc_replication_spark.operators.dedup import _auto_num_centroids

    k = _auto_num_centroids(n, target)
    assert k == 40
    cent = ivf_centroids(df, k, lloyd_iters=2)
    cells = (
        df.withColumn("__cell", _cell_assign_udf(cent)("embedding"))
        .groupBy("__cell")
        .count()
        .collect()
    )
    # k-means cells aren't perfectly balanced, but must be far below
    # the fixed-k regime (n/16 = 125) on an isotropic corpus.
    assert max(r["count"] for r in cells) < 8 * target
    # and the operator itself runs end-to-end on the default path
    out = semantic_dedup(df, target_cell_size=target, min_cosine=0.999)
    assert out.count() <= n


def test_survivors_keep_all_columns_and_broadcast_plan(spark):
    vecs = _vectors(4, 16)
    df = _df(spark, vecs)
    out = semantic_dedup(df, num_centroids=2, min_cosine=0.9)
    assert out.columns == df.columns
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_subsplit_caps_oversized_cells(spark):
    """max_cell_size salts cells above the cap into vector-hash
    sub-cells (operators/dedup.py::_subsplit_oversized_cells): the
    pairwise verify is bounded, exact duplicates still always land in
    one sub-cell (vector hash, not id hash), and survivors form a
    SUPERSET of the uncapped survivors (the cap can only drop
    near-dup pairs, never invent removals)."""
    vecs = _vectors(21, 60)
    df = _df(spark, vecs).withColumn("blk", F.lit(0))  # one giant cell

    uncapped = {
        r.vec_id
        for r in semantic_dedup(
            df, cluster_col="blk", min_cosine=0.5
        ).select("vec_id").collect()
    }
    capped = {
        r.vec_id
        for r in semantic_dedup(
            df, cluster_col="blk", min_cosine=0.5, max_cell_size=10
        ).select("vec_id").collect()
    }
    assert capped >= uncapped
    # exact duplicates (vecs[5]==vecs[1], vecs[11]==vecs[2]) share a
    # vector hash, so the higher id is removed even under sub-splitting
    assert 5 not in capped and 11 not in capped
    assert 1 in capped and 2 in capped
    # deterministic: same inputs, same survivors
    again = {
        r.vec_id
        for r in semantic_dedup(
            df, cluster_col="blk", min_cosine=0.5, max_cell_size=10
        ).select("vec_id").collect()
    }
    assert again == capped


def test_subsplit_is_inert_below_the_cap(spark):
    """Cells at or below max_cell_size must be verified exactly —
    identical output with and without the cap in play (this is what
    keeps the sf0.01 driver oracle exact: its largest label cell is
    59 rows, below the workload's cap of 128)."""
    vecs = _vectors(22, 30)
    df = _df(spark, vecs).withColumn("blk", (F.col("vec_id") % 3).cast("int"))
    loose = semantic_dedup(df, cluster_col="blk", min_cosine=0.4, max_cell_size=1000)
    exact_at_cap = semantic_dedup(df, cluster_col="blk", min_cosine=0.4, max_cell_size=10)
    got_loose = {r.vec_id for r in loose.select("vec_id").collect()}
    # 30 rows over 3 blocks -> 10 per cell == cap: no split fires,
    # results identical to the uncapped run
    got_at_cap = {r.vec_id for r in exact_at_cap.select("vec_id").collect()}
    assert got_at_cap == got_loose
    # one notch BELOW the cell size the split DOES fire — survivors may
    # only be a superset (boundary pairs lost, removals never invented)
    below = semantic_dedup(df, cluster_col="blk", min_cosine=0.4, max_cell_size=9)
    assert {r.vec_id for r in below.select("vec_id").collect()} >= got_loose


# --------------------------------------------------------------------------
# decontaminate_semantic: embedding-space decontamination vs a
# benchmark (staged rows-only in r13; these are its pre-debut floors,
# the pii_kanonymity staging pattern)
# --------------------------------------------------------------------------


def _decon(spark, train_vecs, bench_vecs, **kw):
    from spark_cdc_replication_spark.operators.dedup import decontaminate_semantic

    train = _df(spark, train_vecs)
    bench = spark.createDataFrame(
        [(i + 10_000, v) for i, v in enumerate(bench_vecs)],
        "vec_id long, embedding array<float>",
    )
    return decontaminate_semantic(train, bench, **kw)


def test_decontaminate_semantic_removes_planted_leaks_directionally(spark):
    """Exact and scaled copies of bench vectors must go (cosine 1.0 —
    scale invariance), orthogonal-ish vectors must stay."""
    rng = np.random.default_rng(7)
    bench = [[float(x) for x in v] for v in rng.normal(size=(3, DIM))]
    clean = [[float(x) for x in v] for v in rng.normal(size=(10, DIM))]
    leaks = [bench[0], [2.5 * x for x in bench[1]]]  # exact + scaled copy
    train_vecs = clean + leaks  # ids 0..9 clean, 10-11 leaks
    got = {
        r.vec_id
        for r in _decon(spark, train_vecs, bench, min_cosine=0.99).collect()
    }
    assert 10 not in got and 11 not in got
    # random 6-dim gaussians essentially never hit cosine 0.99
    assert got == set(range(10))


def test_decontaminate_semantic_arrow_equals_native(spark):
    rng = np.random.default_rng(11)
    bench = [[float(x) for x in v] for v in rng.normal(size=(5, DIM))]
    train_vecs = [[float(x) for x in v] for v in rng.normal(size=(40, DIM))]
    train_vecs[7] = bench[2]
    train_vecs[23] = [1.1 * x for x in bench[4]]
    for tau in (0.5, 0.9, 0.99):
        native = {
            r.vec_id
            for r in _decon(
                spark, train_vecs, bench, min_cosine=tau, impl="native"
            ).collect()
        }
        arrow = {
            r.vec_id
            for r in _decon(
                spark, train_vecs, bench, min_cosine=tau, impl="arrow"
            ).collect()
        }
        assert arrow == native, tau


def test_decontaminate_semantic_partition_invariance_and_columns(spark):
    from spark_cdc_replication_spark.operators.dedup import decontaminate_semantic

    rng = np.random.default_rng(13)
    bench_vecs = [[float(x) for x in v] for v in rng.normal(size=(4, DIM))]
    train = spark.createDataFrame(
        [(i, [float(x) for x in v], f"s{i % 3}") for i, v in
         enumerate(rng.normal(size=(30, DIM)))]
        + [(100, bench_vecs[0], "leak")],
        "vec_id long, embedding array<float>, source string",
    )
    bench = spark.createDataFrame(
        [(i, v) for i, v in enumerate(bench_vecs)],
        "vec_id long, embedding array<float>",
    )
    for impl in ("native", "arrow"):
        base = decontaminate_semantic(train, bench, min_cosine=0.99, impl=impl)
        # survivors keep every train column untouched
        assert base.columns == ["vec_id", "embedding", "source"]
        got = {(r.vec_id, r.source) for r in base.collect()}
        assert (100, "leak") not in got and len(got) == 30
        again = {
            (r.vec_id, r.source)
            for r in decontaminate_semantic(
                train.repartition(7), bench.repartition(3),
                min_cosine=0.99, impl=impl,
            ).collect()
        }
        assert again == got, impl


def test_decontaminate_semantic_empty_bench_and_null_vec(spark):
    from spark_cdc_replication_spark.operators.dedup import decontaminate_semantic

    train = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, None), (2, [])],
        "vec_id long, embedding array<float>",
    )
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    for impl in ("native", "arrow"):
        got = {
            r.vec_id
            for r in decontaminate_semantic(train, empty, impl=impl).collect()
        }
        assert got == {0, 1, 2}, impl  # empty bench: identity
        # NULL/empty train vectors survive (cosine undefined, never >= tau)
        bench = spark.createDataFrame(
            [(9, [0.0, 1.0])], "vec_id long, embedding array<float>"
        )
        got2 = {
            r.vec_id
            for r in decontaminate_semantic(train, bench, impl=impl).collect()
        }
        assert {1, 2} <= got2, impl


def test_decontaminate_semantic_cross_engine_parity_on_planted_corpus(spark):
    """Replay the EXACT prepared oracle SQL over a planted embeddings
    table and compare row-for-row (the staging proof every prepared
    oracle gets before its capacity-gated debut)."""
    import duckdb
    import pandas as pd

    from spark_cdc_replication_spark.workloads.llmdata import (
        ORACLE_DECONTAMINATE_SEMANTIC,
        q_decontaminate_semantic,
    )

    rng = np.random.default_rng(17)
    vecs = rng.normal(size=(120, DIM)).astype(np.float32)
    emb = pd.DataFrame(
        {
            "vec_id": range(120),
            "embedding": [[float(x) for x in v] for v in vecs],
            "label": [i % 4 for i in range(120)],
        }
    )
    con = duckdb.connect()
    con.register("embeddings", emb)
    res = con.execute(ORACLE_DECONTAMINATE_SEMANTIC)
    cols = [d[0] for d in res.description]
    want = set(map(tuple, res.fetchall()))

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            emb, "vec_id long, embedding array<float>, label int"
        ).coalesce(1).write.mode("overwrite").parquet(f"{td}/embeddings.parquet")
        got = {
            tuple(r[c] for c in cols)
            for r in q_decontaminate_semantic(spark, td).collect()
        }
    assert got == want
    # the planted exact copies (every 50th id, offset) must be gone
    assert not any(v >= 30_000_000 for v, _ in got)


def test_decontaminate_semantic_ragged_vectors_survive_both_impls(spark):
    """ADVICE r13: a train vector whose dimension differs from the
    bench's has UNDEFINED cosine — the native path's zip_with NULL-pads
    and the NULL comparison keeps the row; the arrow path must match
    (pre-filtering it to survivor) instead of raising an opaque
    np.vstack shape error."""
    rng = np.random.default_rng(13)
    bench = [[float(x) for x in v] for v in rng.normal(size=(3, DIM))]
    clean = [[float(x) for x in v] for v in rng.normal(size=(6, DIM))]
    train_vecs = clean + [bench[1]]        # id 6 = planted leak
    ragged_short = [1.0] * (DIM - 3)       # id 7: too short
    ragged_long = [1.0] * (DIM + 5)        # id 8: too long
    train_vecs += [ragged_short, ragged_long]
    for impl in ("native", "arrow"):
        got = {
            r.vec_id
            for r in _decon(
                spark, train_vecs, bench, min_cosine=0.9, impl=impl
            ).collect()
        }
        assert got == {0, 1, 2, 3, 4, 5, 7, 8}, impl  # leak gone, ragged kept


def test_bench_matrix_rejects_ragged_bench_vectors(spark):
    """ADVICE r14 companion to the train-side hardening above: a
    benchmark frame with mixed embedding dimensions must fail with a
    named error at bench_matrix time (stream setup), not numpy's
    opaque 'inhomogeneous shape' ValueError."""
    import pytest

    from spark_cdc_replication_spark.operators.dedup import bench_matrix

    bench = spark.createDataFrame(
        [(0, [1.0] * DIM), (1, [1.0] * (DIM - 2))],
        "vec_id int, embedding array<double>",
    )
    with pytest.raises(ValueError, match="mixed embedding dimensions"):
        bench_matrix(bench, "embedding")
    # uniform bench still builds, L2-normalized
    ok = bench_matrix(bench.filter("vec_id = 0"), "embedding")
    assert ok.shape == (1, DIM)
    assert abs(float(np.linalg.norm(ok[0])) - 1.0) < 1e-12

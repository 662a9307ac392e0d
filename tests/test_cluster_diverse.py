"""Floors for the D4-style semantic-density-flattening sampler
(``cluster_diverse_sample``) and its water-filling allocator — the
rows-only-by-contract registry entry ``sample_diverse``'s correctness
model (the pack_greedy precedent: no SQL twin, pytest floors)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_cdc_replication_spark.fixtures import load_table
from spark_cdc_replication_spark.operators.sampling import (
    cluster_diverse_sample,
    waterfill_quotas,
)


def test_waterfill_quotas_matches_the_model():
    # budget covers everything -> quotas == sizes
    assert waterfill_quotas({0: 3, 1: 5}, 100) == {0: 3, 1: 5}
    # equal split when every cluster is large enough
    assert waterfill_quotas({0: 50, 1: 50, 2: 50}, 30) == {0: 10, 1: 10, 2: 10}
    # a small cluster contributes everything; its residue refills the rest
    assert waterfill_quotas({0: 2, 1: 50, 2: 50}, 30) == {0: 2, 1: 14, 2: 14}
    # cascading exhaustion: two rounds of refill
    assert waterfill_quotas({0: 1, 1: 12, 2: 50}, 30) == {0: 1, 1: 12, 2: 17}
    # residue smaller than the cluster count -> +1 in ascending order
    assert waterfill_quotas({3: 50, 7: 50, 9: 50}, 2) == {3: 1, 7: 1, 9: 0}
    # exactness invariant on an uneven mix
    sizes = {0: 7, 1: 0, 2: 19, 3: 3, 4: 11}
    q = waterfill_quotas(sizes, 25)
    assert sum(q.values()) == 25
    assert all(q[c] <= sizes[c] for c in sizes)
    assert q[1] == 0
    # zero-capacity-only input and zero budget are both empty spends
    assert sum(waterfill_quotas({0: 0, 1: 0}, 10).values()) == 0
    assert sum(waterfill_quotas({0: 5}, 0).values()) == 0
    with pytest.raises(ValueError, match="budget"):
        waterfill_quotas({0: 5}, -1)


def _blob_corpus(spark):
    """Three well-separated blobs with the DENSE one 40 docs and the
    sparse two 6 each; ids 0/1/2 land one per blob so the deterministic
    lowest-id seeding starts a centroid in each."""
    rows = []
    rows.append((0, [10.0, 0.0], 0))
    rows.append((1, [0.0, 10.0], 0))
    rows.append((2, [-10.0, -10.0], 0))
    for i in range(39):  # dense blob around (10, 0)
        rows.append((10 + i, [10.0 + (i % 5) * 0.1, (i % 3) * 0.1, ], i))
    for i in range(5):  # sparse blob around (0, 10)
        rows.append((100 + i, [(i % 2) * 0.1, 10.0 + i * 0.1], 50 + i))
    for i in range(5):  # sparse blob around (-10, -10)
        rows.append((200 + i, [-10.0 - i * 0.1, -10.0 + (i % 2) * 0.1], 60 + i))
    return spark.createDataFrame(
        [(v, [float(x) for x in e], s) for v, e, s in rows],
        "vec_id long, embedding array<float>, score int",
    )


def test_flattening_budget_and_score_selection(spark):
    corpus = _blob_corpus(spark)
    out = cluster_diverse_sample(
        corpus, budget=18, num_clusters=3, score_col="score"
    )
    rows = out.collect()
    assert len(rows) == 18
    # density flattened: 6 per cell (sparse cells keep ALL their docs,
    # the dense cell is cut to the fair share) vs the corpus's 40/6/6
    per_cell = {}
    for r in rows:
        per_cell[r.cell] = per_cell.get(r.cell, 0) + 1
    assert sorted(per_cell.values()) == [6, 6, 6]
    # within the dense cell the quota went to the TOP scores: blob
    # members are id 0 (score 0) and ids 10..48 (scores 0..38), so
    # top-6 by score desc = ids 48,47,46,45,44,43
    dense_ids = {r.vec_id for r in rows if 10 <= r.vec_id < 100}
    assert dense_ids == {43, 44, 45, 46, 47, 48}


def test_partition_invariance_and_centroid_reuse(spark):
    from spark_cdc_replication_spark.operators.similarity import ivf_centroids

    corpus = _blob_corpus(spark)
    a = {r.vec_id for r in cluster_diverse_sample(
        corpus, budget=18, num_clusters=3, score_col="score").collect()}
    b = {r.vec_id for r in cluster_diverse_sample(
        corpus.repartition(7), budget=18, num_clusters=3, score_col="score"
    ).collect()}
    assert a == b
    cents = ivf_centroids(corpus, 3, "embedding", "vec_id", lloyd_iters=2)
    c = {r.vec_id for r in cluster_diverse_sample(
        corpus, budget=18, num_clusters=3, score_col="score", centroids=cents
    ).collect()}
    assert a == c


def test_ascending_mode_and_scoreless_reservoir(spark):
    corpus = _blob_corpus(spark)
    asc = cluster_diverse_sample(
        corpus, budget=18, num_clusters=3, score_col="score", descending=False
    ).collect()
    dense_asc = sorted(
        r.vec_id for r in asc if 10 <= r.vec_id < 100 or r.vec_id == 0
    )
    # lowest scores win: seed id 0 (score 0) and ids 10..? — score asc,
    # id tie-break: (0,score 0),(10,0)? id 10 has score 0 too -> both
    # score 0, ids 0 and 10 first; then scores 1..3 -> ids 11,12,13
    assert dense_asc == [0, 10, 11, 12, 13, 14]
    # score-less mode: deterministic and budget-exact
    r1 = {r.vec_id for r in cluster_diverse_sample(
        corpus, budget=18, num_clusters=3).collect()}
    r2 = {r.vec_id for r in cluster_diverse_sample(
        corpus.repartition(5), budget=18, num_clusters=3).collect()}
    assert r1 == r2 and len(r1) == 18


def test_assignment_udf_runs_once_in_the_plan(spark):
    """The quota lookup is a literal map, not a join: a joined quota
    pushed isnotnull(cell) below the output projection and DUPLICATED
    the Arrow assignment UDF — two matmuls per row.  Since r17 the
    assigned frame is additionally checkpointed by the cluster-size
    collect, so the FINAL pass reads its blocks and the executed plan
    carries ZERO ArrowEvalPython nodes (the one assignment evaluation
    happened in the size job); the duplication this test guards
    against would reappear as any ArrowEvalPython in the final plan."""
    corpus = _blob_corpus(spark)
    out = cluster_diverse_sample(corpus, budget=18, num_clusters=3)
    physical = out._jdf.queryExecution().executedPlan().toString()
    assert physical.count("ArrowEvalPython") == 0
    assert "ExistingRDD" in physical  # the checkpointed assignment


def test_budget_edges(spark):
    corpus = _blob_corpus(spark)
    # budget >= corpus returns every row, cell attached
    out = cluster_diverse_sample(corpus, budget=10_000, num_clusters=3)
    assert out.count() == corpus.count()
    assert "cell" in out.columns
    with pytest.raises(ValueError, match="budget"):
        cluster_diverse_sample(corpus, budget=0, num_clusters=3)


def test_real_table_budget(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    n = emb.count()
    out = cluster_diverse_sample(
        emb, budget=max(1, n // 4), num_clusters=8, score_col="label"
    )
    assert out.count() == max(1, n // 4)
    # flattening: the sample's max cell share does not exceed the
    # corpus's max cell share (downsampling is toward uniform)
    cell_of = cluster_diverse_sample(
        emb, budget=n + 1_000, num_clusters=8
    )  # budget > n -> full corpus with cells attached
    corpus_max = (
        cell_of.groupBy("cell").count().agg(F.max("count")).collect()[0][0]
    )
    sample_max = (
        out.groupBy("cell").count().agg(F.max("count")).collect()[0][0]
    )
    assert sample_max / (n // 4) <= corpus_max / n + 1e-9

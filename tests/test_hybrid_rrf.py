"""IVF-backed hybrid retrieval (workloads/llmdata.py::
q_similarity_hybrid_rrf_ivf): the production-shaped variant — BM25
from the persisted bucket-pruned token index, IVF-probed vector leg —
must track the exact hybrid (brute-force vector leg + inline index)
closely enough to serve as its scale path."""

from __future__ import annotations

from spark_cdc_replication_spark.workloads.llmdata import (
    q_similarity_hybrid_rrf,
    q_similarity_hybrid_rrf_ivf,
    q_similarity_hybrid_rrf_ivf_all,
)


def test_ivf_hybrid_recall_vs_exact_hybrid(spark, sf_dir):
    exact = q_similarity_hybrid_rrf(spark, sf_dir)
    approx = q_similarity_hybrid_rrf_ivf(spark, sf_dir)
    e = {(r.query_id, r.doc_id) for r in exact.collect()}
    a_rows = approx.collect()
    a = {(r.query_id, r.doc_id) for r in a_rows}
    recall = len(e & a) / len(e)
    assert recall >= 0.8, f"IVF hybrid recall@10 below floor: {recall}"
    # contract shape: fused top-10 per query, ranks 1..10, int ids
    assert all(1 <= r.rank <= 10 for r in a_rows)
    assert {r.query_id for r in a_rows} == {0, 1, 2}
    # the keyword leg is exact (pruning is lossless), so the fused
    # ranking must be deterministic across runs
    again = {(r.query_id, r.doc_id, r.rank) for r in q_similarity_hybrid_rrf_ivf(spark, sf_dir).collect()}
    assert again == {(r.query_id, r.doc_id, r.rank) for r in a_rows}


def test_full_probe_hybrid_equals_exact_hybrid(spark, sf_dir):
    """The staged hash-green bound (r12 debut): nprobe = num_centroids
    makes the IVF leg lossless and bucket pruning already is, so the
    fully index-served hybrid must equal the exact hybrid ROW FOR ROW
    — ids, ranks, and fused scores — not just at a recall floor."""
    exact = {
        (r.query_id, r.doc_id, r.rank, r.rrf_score)
        for r in q_similarity_hybrid_rrf(spark, sf_dir).collect()
    }
    full = {
        (r.query_id, r.doc_id, r.rank, r.rrf_score)
        for r in q_similarity_hybrid_rrf_ivf_all(spark, sf_dir).collect()
    }
    assert full == exact

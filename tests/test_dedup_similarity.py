"""[EXT] operator self-consistency tests: LSH candidates vs exact
Jaccard, simhash on perturbed near-dups, ANN recall vs brute force."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_cdc_replication_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_candidates,
)
from spark_cdc_replication_spark.operators.similarity import (
    brute_force_topk,
    deterministic_planes,
    ivf_centroids,
    ivf_topk,
    lsh_topk,
)


def corpus_with_near_dups(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    # near-dup: whitespace + case perturbation (same shingles after norm)
    near = docs.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        F.upper(F.regexp_replace("text", " ", "  ")).alias("text"),
    )
    return docs.unionByName(near)


def test_exact_dedup_collapses_normalized_dups(spark, sf_dir):
    corpus = corpus_with_near_dups(spark, sf_dir)
    out = exact_dedup(corpus)
    collapsed = out.filter(F.col("n_dups") > 1)
    # every perturbed doc normalizes back to its source text
    assert collapsed.count() == 25
    assert out.count() == 500


def test_minhash_finds_planted_near_dups(spark, sf_dir):
    corpus = corpus_with_near_dups(spark, sf_dir)
    sigs = minhash_signatures(corpus, num_hashes=32, shingle_n=3)
    cands = minhash_lsh_candidates(sigs, num_bands=8, min_est_jaccard=0.8)
    found = {
        (r.id_a, r.id_b) for r in cands.collect()
    }
    planted = {(i, i + 10_000) for i in range(0, 500, 20)}
    assert planted <= found


def test_minhash_16_hash_family_keeps_planted_recall(spark, sf_dir):
    # Pins the exact configuration q_dedup_minhash_lsh runs with
    # (16 hashes x 8 bands): the smaller family must still surface
    # every planted near-dup.
    corpus = corpus_with_near_dups(spark, sf_dir)
    sigs = minhash_signatures(corpus, num_hashes=16, shingle_n=3)
    cands = minhash_lsh_candidates(sigs, num_bands=8, min_est_jaccard=0.8)
    found = {(r.id_a, r.id_b) for r in cands.collect()}
    planted = {(i, i + 10_000) for i in range(0, 500, 20)}
    assert planted <= found


def test_minhash_estimates_track_exact_jaccard(spark, sf_dir):
    corpus = corpus_with_near_dups(spark, sf_dir)
    sigs = minhash_signatures(corpus, num_hashes=32, shingle_n=3)
    cands = minhash_lsh_candidates(sigs, num_bands=8, min_est_jaccard=0.5)
    exact = ngram_jaccard_pairs(corpus, cands.select("id_a", "id_b"), n=3)
    joined = cands.join(exact, on=["id_a", "id_b"]).collect()
    assert joined, "no candidates to compare"
    for r in joined:
        assert abs(r.est_jaccard - r.jaccard) < 0.35


def test_simhash_identical_and_near_docs(spark, sf_dir):
    corpus = corpus_with_near_dups(spark, sf_dir)
    h = simhash(corpus)
    cands = simhash_candidates(h, max_hamming=3, num_bands=4)
    found = {(r.id_a, r.id_b) for r in cands.collect()}
    planted = {(i, i + 10_000) for i in range(0, 500, 20)}
    # normalization makes planted dups simhash-identical (hamming 0)
    assert planted <= found


def test_lsh_topk_recall_vs_brute_force(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(emb, queries, k=10)
    planes = deterministic_planes(num_tables=8, num_planes=6, dim=64)
    approx = lsh_topk(emb, queries, planes, k=10)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.3, f"LSH recall collapsed: {recall}"
    # every approx hit must be a real corpus vector, ranked 1..10
    assert all(1 <= r.rank <= 10 for r in approx.collect())


def test_ivf_topk_recall_vs_brute_force(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(emb, queries, k=10)
    # default = Lloyd-trained centroids (2 iterations from the
    # deterministic lowest-id seed)
    cents = ivf_centroids(emb, num_centroids=16)
    approx = ivf_topk(emb, queries, cents, k=10, nprobe=4)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a_rows = approx.collect()
    a = {(r.query_id, r.neighbor_id) for r in a_rows}
    recall = len(e & a) / len(e)
    assert recall >= 0.8, f"IVF recall@10 below floor: {recall}"
    assert all(1 <= r.rank <= 10 for r in a_rows)
    # nprobe = num_centroids must recover brute force exactly (the
    # probe set covers every cell, so no candidate is ever excluded)
    full = ivf_topk(emb, queries, cents, k=10, nprobe=16)
    f = {(r.query_id, r.neighbor_id) for r in full.collect()}
    assert f == e


def test_ivf_int8_recall_vs_brute_force(spark, sf_dir):
    from spark_cdc_replication_spark.operators.similarity import ivf_assign_int8

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(emb, queries, k=10)
    cents = ivf_centroids(emb, num_centroids=16)
    assigned8 = ivf_assign_int8(emb, cents)
    # the stored codes really are int8 (the 4x-compression claim)
    assert dict(assigned8.dtypes)["__cv"] == "array<tinyint>"
    approx = ivf_topk(emb, queries, cents, k=10, nprobe=4, assigned=assigned8)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a_rows = approx.collect()
    a = {(r.query_id, r.neighbor_id) for r in a_rows}
    recall = len(e & a) / len(e)
    assert recall >= 0.75, f"int8 IVF recall@10 below floor: {recall}"
    assert all(1 <= r.rank <= 10 for r in a_rows)
    # int8 rounding must barely move ranks: probing every cell with the
    # quantized codes still recovers almost all of brute force
    full8 = ivf_topk(emb, queries, cents, k=10, nprobe=16, assigned=assigned8)
    f8 = {(r.query_id, r.neighbor_id) for r in full8.collect()}
    assert len(e & f8) / len(e) >= 0.9, "int8 rounding degraded full-probe recall"


def test_select_representatives_keeps_best_with_deterministic_ties(spark):
    from spark_cdc_replication_spark.operators.dedup import select_representatives

    members = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        "doc_id long, cluster_id long",
    )
    scores = spark.createDataFrame(
        # cluster 1: member 2 strictly best; cluster 10: exact tie ->
        # lowest id wins; extra non-member score rows must be ignored
        [(1, 0.2), (2, 0.9), (3, 0.5), (10, 0.7), (11, 0.7), (99, 1.0)],
        "doc_id long, quality double",
    )
    out = {
        (r.doc_id, r.cluster_id): r.kept
        for r in select_representatives(members, scores).collect()
    }
    assert out == {
        (1, 1): False,
        (2, 1): True,
        (3, 1): False,
        (10, 10): True,
        (11, 10): False,
    }


def test_pq_refined_recall_vs_brute_force(spark, sf_dir):
    from spark_cdc_replication_spark.operators.similarity import (
        pq_codebooks,
        pq_encode,
        pq_topk_refined,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(emb, queries, k=10)
    books = pq_codebooks(emb, num_subspaces=16, codes_per_subspace=16)
    # the stored code really is 16 small ints per vector — the 32x
    # compression claim vs a 64-dim float32 vector
    codes = pq_encode(emb, books)
    assert dict(codes.dtypes)["__code"] == "array<int>"
    first = codes.select(F.size("__code")).first()[0]
    assert first == 16
    approx = pq_topk_refined(emb, queries, books, k=10, overfetch=10, codes=codes)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a_rows = approx.collect()
    a = {(r.query_id, r.neighbor_id) for r in a_rows}
    recall = len(e & a) / len(e)
    assert recall >= 0.85, f"PQ refined recall@10 below floor: {recall}"
    assert all(1 <= r.rank <= 10 for r in a_rows)


def test_pq_exact_codebooks_reproduce_brute_force(spark, sf_dir):
    """Degenerate certification config (the similarity_pq_all bound):
    codebooks holding every distinct normalized subvector reconstruct
    exactly, so ADC must equal brute force at rank level."""
    from spark_cdc_replication_spark.operators.similarity import (
        pq_codebooks_exact,
        pq_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(emb, queries, k=10)
    books = pq_codebooks_exact(emb)
    adc = pq_topk(emb, queries, books, k=10)
    e = sorted((r.query_id, r.neighbor_id, r.rank) for r in exact.collect())
    a = sorted((r.query_id, r.neighbor_id, r.rank) for r in adc.collect())
    assert e == a


def test_ivfpq_recall_and_degenerate_exactness(spark, sf_dir):
    """IVF-PQ + refine: recall@10 floor in the real config, and the
    similarity_*_all-style bound as a pytest — probing every cell with
    exactly-reconstructing codebooks and overfetch past the corpus
    size leaves nothing approximate, so the composed probe + ADC +
    refine plumbing must equal brute force."""
    from spark_cdc_replication_spark.operators.similarity import (
        ivfpq_assign,
        ivfpq_topk,
        pq_codebooks,
        pq_codebooks_exact,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(emb, queries, k=10)
    e_pairs = {(r.query_id, r.neighbor_id) for r in exact.collect()}

    cents = ivf_centroids(emb, num_centroids=16)
    books = pq_codebooks(emb, num_subspaces=16, codes_per_subspace=16)
    assigned = ivfpq_assign(emb, cents, books)
    approx = ivfpq_topk(
        emb, queries, cents, books, k=10, nprobe=4, overfetch=10, assigned=assigned
    )
    a_rows = approx.collect()
    a = {(r.query_id, r.neighbor_id) for r in a_rows}
    recall = len(e_pairs & a) / len(e_pairs)
    assert recall >= 0.8, f"IVF-PQ recall@10 below floor: {recall}"
    assert all(1 <= r.rank <= 10 for r in a_rows)

    books_x = pq_codebooks_exact(emb)
    full = ivfpq_topk(
        emb,
        queries,
        cents,
        books_x,
        k=10,
        nprobe=16,
        overfetch=-(-n // 10),
    )
    e = sorted((r.query_id, r.neighbor_id, r.rank) for r in exact.collect())
    f = sorted((r.query_id, r.neighbor_id, r.rank) for r in full.collect())
    assert e == f


def test_dup_clusters_chain_and_star(spark):
    from spark_cdc_replication_spark.operators.dedup import dup_clusters

    # chain 1-2-3-...-9 (diameter 8: needs real iteration, not one hop),
    # star 100-(101..105), and an isolated pair 200-201
    edges = (
        [(i, i + 1) for i in range(1, 9)]
        + [(100, x) for x in range(101, 106)]
        + [(200, 201)]
    )
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {(r.doc_id, r.cluster_id) for r in dup_clusters(pairs).collect()}
    want = (
        {(i, 1) for i in range(1, 10)}
        | {(x, 100) for x in [100, 101, 102, 103, 104, 105]}
        | {(200, 200), (201, 200)}
    )
    assert got == want


def test_dup_clusters_string_ids_native_min_label(spark):
    """ADVICE r12 follow-through: non-numeric ids must propagate in
    their native orderable type (lexicographic component-min), never
    through a forced long cast — which NULLs them under try_cast or
    fails outright under ANSI.  Both CC variants share the contract,
    and numeric ids must still normalize to LONG (the 8-byte-shuffle
    scale posture)."""
    from spark_cdc_replication_spark.operators.dedup import (
        dup_clusters,
        dup_clusters_logstar,
    )

    # chain alpha-beta-gamma plus the zero-padded trap pair
    pairs = spark.createDataFrame(
        [("beta", "alpha"), ("beta", "gamma"), ("007", "zz")],
        "id_a string, id_b string",
    )
    want = {
        ("alpha", "alpha"),
        ("beta", "alpha"),
        ("gamma", "alpha"),
        ("007", "007"),  # "007" < "zz" lexicographically
        ("zz", "007"),
    }
    for cc in (dup_clusters, dup_clusters_logstar):
        got = {(r.doc_id, r.cluster_id) for r in cc(pairs).collect()}
        assert got == want, cc.__name__
        assert dict(cc(pairs).dtypes) == {
            "doc_id": "string",
            "cluster_id": "string",
        }, cc.__name__
    # numeric ids keep the long normalization (int input -> long out)
    num = spark.createDataFrame([(5, 1)], "id_a int, id_b int")
    assert dict(dup_clusters(num).dtypes) == {
        "doc_id": "bigint",
        "cluster_id": "bigint",
    }


def test_dup_clusters_mixed_edge_types_raise(spark):
    """ADVICE r13: a mixed numeric/string edge frame is caller error —
    letting it through would silently string-coerce the numeric side
    in the unionByName and make min-label lexicographic for those ids.
    Both CC variants must refuse loudly instead."""
    import pytest

    from spark_cdc_replication_spark.operators.dedup import (
        dup_clusters,
        dup_clusters_logstar,
    )

    pairs = spark.createDataFrame(
        [(1, "alpha")], "id_a long, id_b string"
    )
    for cc in (dup_clusters, dup_clusters_logstar):
        with pytest.raises(TypeError, match="both be numeric or both non-numeric"):
            cc(pairs)


def test_dup_clusters_reversed_edge_direction(spark):
    from spark_cdc_replication_spark.operators.dedup import dup_clusters

    # min id on the b side: symmetry must still label with the min
    pairs = spark.createDataFrame([(5, 1), (5, 3)], "id_a long, id_b long")
    got = {(r.doc_id, r.cluster_id) for r in dup_clusters(pairs).collect()}
    assert got == {(1, 1), (3, 1), (5, 1)}


def test_dup_clusters_nonconvergence_is_loud(spark):
    import warnings

    import pytest

    from spark_cdc_replication_spark.operators.dedup import dup_clusters

    # chain 1-...-9 needs ~8 label hops; max_iters=3 cannot finish
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 9)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dup_clusters(pairs, max_iters=3).collect()
    # warn mode: partial labels come back, but never silently
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = dup_clusters(pairs, max_iters=3, on_nonconverged="warn").collect()
    assert any("did not converge" in str(w.message) for w in caught)
    assert len(out) == 9


def test_dup_clusters_convergence_costs_no_extra_jobs(spark):
    """The changed-labels probe rides the per-round checkpoint job via
    observe(): ONE action per iteration.  AQE splits each
    materialization into ~5 query-stage jobs, so assert the MARGINAL
    job count per extra round stays at that single-action level — the
    old compare-join + limit(1).count() formulation added a second
    action (~3-4 more jobs) per round and lands well above the bound."""
    import warnings

    from spark_cdc_replication_spark.operators.dedup import dup_clusters

    sc = spark.sparkContext
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)], "id_a long, id_b long"
    )

    def jobs_for(iters: int, tag: str) -> int:
        sc.setJobGroup(tag, tag)
        try:
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                dup_clusters(pairs, max_iters=iters, on_nonconverged="warn").collect()
        finally:
            sc.setJobGroup(None, None)
        return len(sc.statusTracker().getJobIdsForGroup(tag))

    a = jobs_for(2, "cc-jobs-a")
    b = jobs_for(5, "cc-jobs-b")
    per_round = (b - a) / 3
    assert per_round <= 6, (
        f"{per_round:.1f} marginal jobs/round — convergence probe is "
        "spawning an extra action per iteration"
    )


def test_dup_clusters_property_random_graphs(spark):
    """Model-check connected components against a python union-find on
    seeded random graphs (varied density incl. forests and one blob)."""
    import random

    from spark_cdc_replication_spark.operators.dedup import dup_clusters

    def union_find_components(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {n: find(n) for n in parent}

    for seed, n_nodes, n_edges in [(1, 30, 10), (2, 40, 40), (3, 25, 60)]:
        rng = random.Random(seed)
        edges = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        want = union_find_components(edges)
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {r.doc_id: r.cluster_id for r in dup_clusters(pairs).collect()}
        assert got == want, f"seed={seed}"


def test_logstar_long_chain_converges_in_log_rounds(spark):
    """The forcing fixture for the Kiveris large-star/small-star
    variant: a diameter-80 path (plus a star and an isolated pair)
    labels correctly within ceil(log2(80))+4 = 11 rounds, where
    min-label propagation needs ~80 — the VERDICT r5 'next' #6
    done-criterion."""
    from spark_cdc_replication_spark.operators.dedup import dup_clusters_logstar

    edges = (
        [(i, i + 1) for i in range(80)]
        + [(1000, x) for x in range(1001, 1006)]
        + [(2000, 2001)]
    )
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        (r.doc_id, r.cluster_id)
        for r in dup_clusters_logstar(pairs, max_rounds=11).collect()
    }
    want = (
        {(i, 0) for i in range(81)}
        | {(x, 1000) for x in range(1000, 1006)}
        | {(2000, 2000), (2001, 2000)}
    )
    assert got == want


def test_logstar_equals_minlabel_on_random_graphs(spark):
    import random

    from spark_cdc_replication_spark.operators.dedup import (
        dup_clusters,
        dup_clusters_logstar,
    )

    for seed, n_nodes, n_edges in [(11, 30, 12), (12, 40, 45), (13, 25, 60)]:
        rng = random.Random(seed)
        edges = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        ml = {(r.doc_id, r.cluster_id) for r in dup_clusters(pairs).collect()}
        ls = {
            (r.doc_id, r.cluster_id)
            for r in dup_clusters_logstar(pairs).collect()
        }
        assert ml == ls, f"seed={seed}"


def test_logstar_nonconvergence_is_loud(spark):
    import warnings

    import pytest

    from spark_cdc_replication_spark.operators.dedup import dup_clusters_logstar

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(16)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dup_clusters_logstar(pairs, max_rounds=1).collect()
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = dup_clusters_logstar(pairs, max_rounds=1, on_nonconverged="warn").collect()
    assert any("did not converge" in str(w.message) for w in caught)
    assert out


def test_hard_negatives_excludes_same_label_and_nulls(spark):
    """operators/similarity.py::hard_negatives: only DIFFERENT-label
    corpus rows may rank, NULL labels never mine (inequality is
    NULL-hostile by contract), ranking is exact-cosine with id
    tie-break, and the corpus side is never shuffled (queries
    broadcast)."""
    from spark_cdc_replication_spark.operators.similarity import hard_negatives

    rows = [
        (0, [1.0, 0.0], "a"),
        (1, [0.99, 0.14], "a"),    # most similar to 0 but same label
        (2, [0.9, 0.44], "b"),     # nearest valid negative
        (3, [0.0, 1.0], "b"),      # far negative
        (4, [0.95, 0.31], None),   # NULL label: excluded
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    anchors = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "label", "embedding"
    )
    got = hard_negatives(emb, anchors, k=2).collect()
    assert [(r.neighbor_id, r.rank) for r in got] == [(2, 1), (3, 2)]
    assert all(r.query_id == 0 for r in got)
    # scale shape: broadcast queries, no corpus exchange before scoring
    plan = (
        hard_negatives(emb, anchors, k=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_hard_negatives_ivf_recall_vs_exact(spark, sf_dir):
    """The index-serving miner (hard_negatives_ivf: IVF probe +
    overfetch + label post-filter) must track the exact miner closely
    enough to be its scale path — recall@10 >= 0.8 on the fixture
    (measured 0.86), full k rows per anchor despite the post-filter."""
    from spark_cdc_replication_spark.workloads.llmdata import (
        q_similarity_hard_negatives,
        q_similarity_hard_negatives_ivf,
    )

    exact = {
        (r.query_id, r.neighbor_id)
        for r in q_similarity_hard_negatives(spark, sf_dir).collect()
    }
    rows = q_similarity_hard_negatives_ivf(spark, sf_dir).collect()
    approx = {(r.query_id, r.neighbor_id) for r in rows}
    assert len(exact & approx) / len(exact) >= 0.8
    # overfetch must survive the label filter: every anchor still
    # returns a full top-10 with contiguous ranks
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, 11)) for v in per_q.values())


def test_hard_negatives_ivf_degenerate_config_is_exact(spark, sf_dir):
    """The hash-green bound behind ``similarity_hard_negatives_ivf_all``
    (VERDICT r7 next #6): probing every cell AND overfetching past the
    corpus size makes the candidate stage lossless, so the IVF miner
    must equal the exact miner row-for-row INCLUDING ranks — any loss
    in the probe, label join, NULL-label filter, or (unrounded)
    re-rank shows up here; only cell selectivity is left to the
    recall test above."""
    from spark_cdc_replication_spark.workloads.llmdata import (
        q_similarity_hard_negatives,
        q_similarity_hard_negatives_ivf_all,
    )

    exact = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in q_similarity_hard_negatives(spark, sf_dir).collect()
    }
    got = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in q_similarity_hard_negatives_ivf_all(spark, sf_dir).collect()
    }
    assert got == exact


def test_shingle_windows_matches_naive_formulation(spark):
    """operators/dedup.py::_shingle_windows — the arrays_zip-of-slices
    window build (constant tokenize references per row; the r8 fix for
    the O(len²) inlining that made one shingle pass 18 s on the sf0.1
    corpus) must be element-identical to the naive per-gram
    element_at formulation, including short docs (< n words) and
    empty/whitespace text."""
    from spark_cdc_replication_spark.functions.text import normalized, words
    from spark_cdc_replication_spark.operators.dedup import _shingle_sets

    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "two words"),
        (3, "exactly three words"),
        (4, ""),
        (5, "   "),
        (6, "repeat repeat repeat repeat"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, h)
        for r in _shingle_sets(df, "text", "doc_id", 3).collect()
        for h in r["__sh"]
    }
    n = 3
    toks = df.select("doc_id", words(normalized("text")).alias("__w"))
    k = F.greatest(F.size("__w") - F.lit(n - 1), F.lit(0))
    naive = F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.xxhash64(*[F.element_at("__w", i + j) for j in range(n)]),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    want = {
        (r.doc_id, h)
        for r in toks.select(
            "doc_id", F.array_distinct(naive).alias("s")
        ).collect()
        for h in r.s
    }
    assert got == want and got  # non-empty and identical
    # the per-OCCURRENCE builder (_hashed_shingles, minhash's input)
    # shares _shingle_windows: multiset equality, duplicates kept
    from spark_cdc_replication_spark.operators.dedup import _hashed_shingles

    occ = _hashed_shingles(df, "text", "doc_id", 3)
    occ_naive = toks.select(
        "doc_id", F.explode(naive).alias("__h0")
    )
    assert (
        occ.exceptAll(occ_naive).count() == 0
        and occ_naive.exceptAll(occ).count() == 0
    )


def test_containment_pairs_directional_and_capped(spark):
    """operators/dedup.py::containment_pairs — a short excerpt inside
    a long document reports high containment excerpt->source (the
    modality Jaccard misses) but NOT source->excerpt; the
    max_doc_freq cap drops pairs whose only evidence is a stop-gram
    shared corpus-wide."""
    from spark_cdc_replication_spark.operators.dedup import containment_pairs

    body = " ".join(f"w{i}" for i in range(60))
    quote = " ".join(f"w{i}" for i in range(20))  # strict prefix
    stop = "lorem ipsum dolor sit"
    rows = [
        (1, body),
        (2, quote),
        # docs 3..9 share ONLY the stop phrase with each other
        *[(i, f"{stop} unique{i} tail{i} end{i}") for i in range(3, 10)],
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = containment_pairs(df, n=3, min_containment=0.8, max_doc_freq=None)
    got = {(r.id_a, r.id_b): r.containment for r in out.collect()}
    assert got[(2, 1)] == 1.0  # every quote gram is in the body
    assert (1, 2) not in got  # 60-word body is NOT contained in the quote
    # jaccard for the same pair is low: 18 shared / 58 union ~ 0.31
    # (the asymmetric modality is the point)
    # stop-phrase-only pairs appear uncapped (2 shared grams / tiny docs
    # can cross thresholds) but the df cap removes the shared evidence:
    capped = containment_pairs(df, n=3, min_containment=0.3, max_doc_freq=5)
    cpairs = {(r.id_a, r.id_b) for r in capped.collect()}
    assert not [p for p in cpairs if p[0] >= 3 and p[1] >= 3], (
        "stop-gram (df=7 > cap) must not pair the tail docs"
    )
    assert (2, 1) in cpairs  # rare-gram evidence survives the cap


def test_pii_prevalence_counts(spark):
    """operators/privacy.py::pii_prevalence — corpus-level audit rows:
    docs_with_hits counts documents (not hits), total_hits sums all
    matches, zero-hit patterns report 0/0."""
    from spark_cdc_replication_spark.operators.privacy import pii_prevalence

    rows = [
        (1, "mail a@b.com and c@d.org here"),  # 2 emails
        (2, "mail e@f.io"),  # 1 email
        (3, "server 10.0.0.1 up"),  # 1 ip
        (4, "nothing sensitive"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.pii_type: (r.docs_with_hits, r.total_hits) for r in pii_prevalence(df).collect()}
    assert got == {"email": (2, 3), "ipv4": (1, 1), "phone": (0, 0)}


def test_cross_source_overlap_counts_planted_copies_exactly(spark):
    from spark_cdc_replication_spark.operators.dedup import cross_source_overlap

    base = "alpha beta gamma delta " * 8  # 192 chars, >= 64 after norm
    other = "omega psi chi phi upsilon " * 8
    docs = spark.createDataFrame(
        [
            (1, "web", base),
            (2, "books", base),              # cross-source copy of 1
            (3, "web", base),                # same-source copy of 1: NOT counted
            (4, "books", other),
            (5, "wiki", other),              # cross-source copy of 4
            (6, "wiki", "tiny"),             # under shingle_len: ignored
        ],
        "doc_id long, source string, text string",
    )
    out = {
        (r.source_a, r.source_b): r.n_pairs
        for r in cross_source_overlap(docs).collect()
    }
    # pairs: (1,2) web-books, (3,2) web-books, (4,5) books-wiki — and
    # 1/3 vs 2 count as TWO distinct doc pairs under one source pair
    assert out == {("books", "web"): 2, ("books", "wiki"): 1}


def test_cross_source_overlap_hot_shingle_cap(spark):
    from spark_cdc_replication_spark.operators.dedup import cross_source_overlap

    hot = "kappa lambda mu nu xi omicron " * 6
    docs = spark.createDataFrame(
        [(i, f"s{i}", hot) for i in range(5)],
        "doc_id long, source string, text string",
    )
    # every shingle lives in 5 docs: cap 4 drops them all
    assert cross_source_overlap(docs, max_doc_freq=4).collect() == []
    # cap >= 5 restores all C(5,2) cross-source pairs
    full = cross_source_overlap(docs, max_doc_freq=5).collect()
    assert sum(r.n_pairs for r in full) == 10


def test_cross_source_cross_engine_parity_on_fixture(spark, sf_dir):
    """Replay the EXACT prepared r11 oracle SQL at the test sf and
    compare row-for-row against the registered query."""
    import duckdb

    from spark_cdc_replication_spark.workloads.llmdata import (
        ORACLE_DEDUP_CROSS_SOURCE,
        q_dedup_cross_source,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    res = con.execute(ORACLE_DEDUP_CROSS_SOURCE)
    cols = [d[0] for d in res.description]
    want = set(map(tuple, res.fetchall()))
    got = {
        tuple(r[c] for c in cols)
        for r in q_dedup_cross_source(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0


def test_dedup_corpus_weighted_preserves_mass(spark):
    """Survivors carry their cluster's size; sum(n_duplicates) equals
    the input row count exactly (mass moves onto canonicals, never
    created or destroyed), and untouched docs keep weight 1."""
    from spark_cdc_replication_spark.operators.dedup import dedup_corpus_weighted

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base.upper()),                     # normalizes to 1's text
            (3, base.replace(" ", "  ")),          # ditto -> 3-member group
            (4, "an entirely different document with its own words here"),
            (5, "yet another unique piece of text that matches nothing"),
        ],
        "doc_id long, text string",
    )
    out = dedup_corpus_weighted(
        docs, num_hashes=16, num_bands=8, min_est_jaccard=0.99, min_jaccard=0.999
    )
    got = {r.doc_id: r.n_duplicates for r in out.collect()}
    assert got == {1: 3, 4: 1, 5: 1}
    assert sum(got.values()) == 5  # the mass invariant
    again = {
        r.doc_id: r.n_duplicates
        for r in dedup_corpus_weighted(
            docs.repartition(4),
            num_hashes=16,
            num_bands=8,
            min_est_jaccard=0.99,
            min_jaccard=0.999,
        ).collect()
    }
    assert again == got


def test_dedup_corpus_weighted_cross_engine_parity(spark):
    """Replay the EXACT prepared oracle SQL over a planted corpus and
    compare row-for-row (the staging proof every prepared oracle
    gets)."""
    import duckdb
    import pandas as pd

    from spark_cdc_replication_spark.workloads.llmdata import (
        ORACLE_DEDUP_CORPUS_WEIGHTED,
        q_dedup_corpus_weighted,
    )

    docs = pd.DataFrame(
        [
            (i, f"planted document number {i} with several distinct words here")
            for i in range(0, 60)
        ],
        columns=["doc_id", "text"],
    )
    con = duckdb.connect()
    con.register("documents", docs)
    res = con.execute(ORACLE_DEDUP_CORPUS_WEIGHTED)
    cols = [d[0] for d in res.description]
    want = set(map(tuple, res.fetchall()))

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(docs).coalesce(1).write.mode("overwrite").parquet(
            f"{td}/documents.parquet"
        )
        got = {
            tuple(r[c] for c in cols)
            for r in q_dedup_corpus_weighted(spark, td).collect()
        }
    assert got == want


def test_dedup_corpus_keep_best_picks_cluster_max_quality(spark):
    """Quality-aware survivor rule: the transitive 3-member group must
    keep its HIGHEST-quality member (not the lowest id), untouched
    docs survive untouched, and the whole cluster yields exactly one
    survivor even though doc 1 and doc 3 never paired directly in
    text space (connected through 2)."""
    from spark_cdc_replication_spark.operators.dedup import dedup_corpus_keep_best

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, base, 0.20),
            (2, base.upper(), 0.90),               # best copy of the group
            (3, base.replace(" ", "  "), 0.50),
            (4, "an entirely different document with its own words here", 0.01),
            (5, "yet another unique piece of text that matches nothing", 0.99),
        ],
        "doc_id long, text string, quality double",
    )
    kw = dict(num_hashes=16, num_bands=8, min_est_jaccard=0.99, min_jaccard=0.999)
    got = {
        r.doc_id
        for r in dedup_corpus_keep_best(docs, "quality", **kw).collect()
    }
    assert got == {2, 4, 5}
    # ascending mode: keep the LOWEST score instead
    low = {
        r.doc_id
        for r in dedup_corpus_keep_best(
            docs, "quality", descending=False, **kw
        ).collect()
    }
    assert low == {1, 4, 5}
    # determinism under repartitioning
    again = {
        r.doc_id
        for r in dedup_corpus_keep_best(
            docs.repartition(4), "quality", **kw
        ).collect()
    }
    assert again == got
    # survivors keep every input column
    out = dedup_corpus_keep_best(docs, "quality", **kw)
    assert out.columns == ["doc_id", "text", "quality"]


def test_dedup_corpus_keep_best_constant_score_equals_lowest_id_rule(spark):
    """With a non-discriminating score the tie-break (lowest id) makes
    keep-best degenerate EXACTLY to dedup_corpus in the transitive
    (equality-threshold) regime — pinned so the two rules can never
    drift apart on the shared pipeline.  (Non-transitive pair graphs
    differ BY DESIGN: see the star-topology test below.)"""
    from spark_cdc_replication_spark.operators.dedup import (
        dedup_corpus,
        dedup_corpus_keep_best,
    )

    base = "one shared sentence that repeats across the planted group"
    docs = spark.createDataFrame(
        [(i, base if i % 3 == 0 else f"unique text number {i} with filler words")
         for i in range(12)],
        "doc_id long, text string",
    ).withColumn("quality", F.lit(0.5))
    kw = dict(num_hashes=16, num_bands=8, min_est_jaccard=0.99, min_jaccard=0.999)
    best = {
        r.doc_id
        for r in dedup_corpus_keep_best(docs, "quality", **kw).collect()
    }
    plain = {r.doc_id for r in dedup_corpus(docs, **kw).collect()}
    assert best == plain
    # NULL scores rank last: a cluster whose scores are ALL NULL also
    # degenerates to the lowest-id rule
    nulldocs = docs.withColumn("quality", F.lit(None).cast("double"))
    nullbest = {
        r.doc_id
        for r in dedup_corpus_keep_best(nulldocs, "quality", **kw).collect()
    }
    assert nullbest == plain


def test_dedup_corpus_keep_best_cluster_granularity_on_star(spark):
    """The deliberate semantic difference from dedup_corpus: in a
    non-transitive star (A~C, B~C verified, A~B below threshold) the
    pair rule keeps BOTH local minima A and B, while keep-best treats
    the connected component as one duplicate group and keeps exactly
    its best member — here the hub C."""
    from spark_cdc_replication_spark.operators.dedup import (
        dedup_corpus,
        dedup_corpus_keep_best,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta iota".split()
    c_text = " ".join(shared + ["kappa"])                 # w1..w10
    a_text = " ".join(shared[:9] + ["uniqueA", "moreA"])  # 9 shared with C
    b_text = " ".join(shared[1:] + ["kappa", "uniqueB", "moreB"])
    docs = spark.createDataFrame(
        [
            (1, a_text, 0.1),
            (2, b_text, 0.2),
            (3, c_text, 0.9),
            (4, "completely unrelated filler text with its own vocabulary", 0.5),
        ],
        "doc_id long, text string, quality double",
    )
    # word-level jaccard (shingle_n=1): J(A,C)=9/12, J(B,C)=10/12,
    # J(A,B)=8/14 — star at threshold 0.7
    kw = dict(
        num_hashes=32, shingle_n=1, num_bands=16,
        min_est_jaccard=0.5, min_jaccard=0.7,
    )
    plain = {r.doc_id for r in dedup_corpus(docs, **kw).collect()}
    assert plain == {1, 2, 4}  # both local minima survive the pair rule
    best = {
        r.doc_id for r in dedup_corpus_keep_best(docs, "quality", **kw).collect()
    }
    assert best == {3, 4}  # one survivor per component: the best copy


def test_dedup_corpus_keep_best_cluster_kwargs_passthrough(spark):
    """ADVICE r13: a duplicate chain deeper than dup_clusters' default
    20 rounds previously raised with no caller recourse.  The cluster
    step is now pluggable — cluster_fn=dup_clusters_logstar (O(log*)
    convergence for adversarial diameters) and **cluster_kwargs
    (max_iters / on_nonconverged='warn') must both reach it and preserve the
    survivor rule."""
    from spark_cdc_replication_spark.operators.dedup import (
        dedup_corpus_keep_best,
        dup_clusters_logstar,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, base, 0.20),
            (2, base.upper(), 0.90),
            (3, base.replace(" ", "  "), 0.50),
            (4, "an entirely different document with its own words here", 0.5),
        ],
        "doc_id long, text string, quality double",
    )
    kw = dict(num_hashes=16, num_bands=8, min_est_jaccard=0.99, min_jaccard=0.999)
    want = {2, 4}
    via_logstar = {
        r.doc_id
        for r in dedup_corpus_keep_best(
            docs, "quality", cluster_fn=dup_clusters_logstar, **kw
        ).collect()
    }
    assert via_logstar == want
    # kwargs reach the default dup_clusters: this pairwise-complete
    # group converges in one round, so max_iters=1 must succeed...
    via_kwargs = {
        r.doc_id
        for r in dedup_corpus_keep_best(
            docs, "quality", max_iters=1, on_nonconverged="warn", **kw
        ).collect()
    }
    assert via_kwargs == want
    # ...and an unknown cluster kwarg fails loudly, proving the
    # passthrough is live rather than silently swallowed
    import pytest

    with pytest.raises(TypeError):
        dedup_corpus_keep_best(docs, "quality", not_a_kwarg=1, **kw).collect()

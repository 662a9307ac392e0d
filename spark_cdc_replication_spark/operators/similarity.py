"""Approximate / exact nearest-neighbor search over embedding columns.

``[EXT]`` operator (SURVEY.md §7 M5; BASELINE.json north star).  Two
tiers:

* :func:`brute_force_topk` — exact cosine top-k: broadcast the (small)
  query set against the corpus, window-rank per query.  The corpus is
  scanned once, never shuffled (ranking shuffles only
  ``|queries| * |corpus|`` scored *rows of (ids, score)*, not vectors).
  This is the correctness baseline and is fine whenever
  ``|queries|`` is bounded.
* :func:`lsh_topk` — the scale path: random-hyperplane LSH buckets
  (SimHash for vectors); queries only meet corpus vectors sharing a
  bucket in >=1 of ``num_tables`` hash tables.  Recall < 1.0 by design;
  the driver records it as a rows-only check.

At 100 TB the brute-force variant is a single map-side pass per query
batch (no index build), the LSH variant trades one shuffle
(bucket join) for a ~100x candidate reduction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity, l2_norm


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors per query.

    Output: ``(query_id, neighbor_id, cosine, rank)`` — rank 1..k,
    deterministic tie-break on neighbor id.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    ).withColumn("__cn", l2_norm("__cv"))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    ).withColumn("__qn", l2_norm("__qv"))
    scored = c.crossJoin(F.broadcast(q))
    if exclude_self:
        scored = scored.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = scored.select(
        "query_id",
        "neighbor_id",
        cosine_similarity("__qv", "__cv", "__qn", "__cn").alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Hard-negative mining for contrastive training (the DPR /
    SimCSE data-prep step): per anchor query, the top-``k`` most
    cosine-similar corpus vectors whose ``label_col`` DIFFERS from the
    anchor's — the negatives the current embedding space confuses
    with the anchor, worth many random negatives per gradient step.

    Output: ``(query_id, neighbor_id, cosine, rank)``, rank 1..k,
    deterministic tie-break on neighbor id.  Exact by contract (the
    certification baseline, like :func:`brute_force_topk`, and the
    same plan shape: queries broadcast, corpus scanned once and never
    shuffled, only ``|queries| x |corpus|`` (id, score) rows enter the
    ranking window).  For unbounded anchor sets at 100 TB, mine from
    an IVF probe (:func:`ivf_topk`) and post-filter labels instead —
    the recall-bounded path, same trade as ``similarity_*`` topk.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("__cl"),
        F.col(vec_col).alias("__cv"),
    ).withColumn("__cn", l2_norm("__cv"))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(label_col).alias("__ql"),
        F.col(vec_col).alias("__qv"),
    ).withColumn("__qn", l2_norm("__qv"))
    # Label inequality is NULL-hostile on purpose: a NULL-labeled row
    # (unknown class) is never a provable negative, so it can't mine.
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("__cl") != F.col("__ql"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity("__qv", "__cv", "__qn", "__cn").alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def hard_negatives_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 3,
    overfetch: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    query_id_col: str = "query_id",
    assigned: DataFrame | None = None,
) -> DataFrame:
    """:func:`hard_negatives` on the index-serving scale path: probe
    the IVF inverted file for ``k * overfetch`` candidates per anchor
    (:func:`ivf_topk`), join candidate labels, drop same-label and
    NULL-label rows, re-rank to ``k``.

    Approximate twice over — IVF cell selectivity AND the overfetch
    may under-fill after the label filter — so this is a rows-only
    operator with a pytest recall floor vs the exact miner (the
    ``similarity_hybrid_rrf_ivf`` pattern).  At 100 TB the exact
    variant scans the corpus per anchor batch; this touches
    ``~|corpus| * nprobe / num_centroids`` candidates and the label
    join moves only ``|anchors| * k * overfetch`` id rows against the
    corpus's (id, label) projection.
    """
    cand = ivf_topk(
        corpus,
        queries.select(query_id_col, vec_col),
        centroids,
        k=k * overfetch,
        nprobe=nprobe,
        vec_col=vec_col,
        id_col=id_col,
        query_id_col=query_id_col,
        assigned=assigned,
        # full precision: the re-rank below must order exactly as the
        # exact miner would (6-dp rounding could flip a near-tie)
        round_cosine=False,
    )
    nl = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("__cl")
    )
    ql = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(label_col).alias("__ql")
    )
    kept = (
        cand.join(nl, "neighbor_id")
        .join(F.broadcast(ql), "query_id")
        .filter(F.col("__cl") != F.col("__ql"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        kept.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def _lsh_buckets_udf(planes_tables: list[list[list[float]]]):
    """Arrow-vectorized bucket codes for ALL hash tables in one pass.

    Returns an ``array<long>`` of ``num_tables`` codes per vector
    (bit i of table t's code = sign(dot(vec, plane[t][i]))), computed
    as one numpy matmul per Arrow batch: (batch x dim) @ (dim x T*P).

    This replaces the former in-plan-literal formulation (one
    ``dot(vec, F.array(*dim lits))`` per plane per table), which put
    T x P x dim literals into the Catalyst expression tree AND
    duplicated the whole corpus-side plan per table through a
    unionByName loop — the same literal-bloat pattern measured OOM-ing
    the driver during optimization for IVF centroids.  Here the planes
    live in the pickled UDF closure (executor-side, plan stays tiny)
    and the corpus is scanned/projected exactly once for all tables.
    """
    num_tables = len(planes_tables)
    num_planes = len(planes_tables[0])
    flat = np.asarray(
        [p for table in planes_tables for p in table], dtype=np.float64
    )  # (T*P, dim)
    weights = 1 << np.arange(num_planes, dtype=np.int64)

    @F.pandas_udf("array<long>")
    def buckets(emb: pd.Series) -> pd.Series:
        mat = np.vstack(emb.to_numpy())
        proj = mat @ flat.T  # (batch, T*P)
        bits = (proj > 0).reshape(len(mat), num_tables, num_planes)
        codes = (bits * weights).sum(axis=2)  # (batch, T)
        return pd.Series([row.tolist() for row in codes])

    return buckets


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    planes_tables: list[list[list[float]]],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: score only candidates sharing an LSH bucket
    with the query in at least one hash table.

    ``planes_tables`` = ``num_tables`` independent hyperplane sets.
    Output shape matches :func:`brute_force_topk` (rank may hold fewer
    than k rows when buckets are sparse — that's the approximation).

    Plan shape: one Arrow projection emits every table's bucket code,
    ``posexplode`` turns them into ``(table_id, bucket)`` rows, and a
    single broadcast join replaces ``num_tables`` separate joins — the
    corpus is scanned once regardless of how many hash tables are used.
    """
    bucket_udf = _lsh_buckets_udf(planes_tables)
    # Norms ride the bucket rows (computed once per vector, before the
    # per-table posexplode), so scoring is one dot product per
    # candidate — same contract as the IVF probe.
    cb = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        l2_norm(vec_col).alias("__cn"),
    ).select(
        "neighbor_id",
        "__cv",
        "__cn",
        F.posexplode(bucket_udf("__cv")).alias("table_id", "bucket"),
    )
    qb = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        l2_norm(vec_col).alias("__qn"),
    ).select(
        "query_id",
        "__qv",
        "__qn",
        F.posexplode(bucket_udf("__qv")).alias("table_id", "bucket"),
    )
    cands = (
        cb.join(F.broadcast(qb), on=["table_id", "bucket"])
        .select("query_id", "neighbor_id", "__qv", "__cv", "__qn", "__cn")
        .dropDuplicates(["query_id", "neighbor_id"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        cosine_similarity("__qv", "__cv", "__qn", "__cn").alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def ivf_centroids(
    corpus: DataFrame,
    num_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    lloyd_iters: int = 2,
) -> list[list[float]]:
    """Deterministic IVF training: seed with the ``num_centroids``
    lowest-id vectors, then refine with ``lloyd_iters`` Lloyd (KMeans)
    iterations run as DataFrame passes.

    Each iteration: (1) nearest-centroid assignment via the Arrow
    matmul UDF (one corpus scan, shuffle-free), (2) per-cell mean via
    ``posexplode`` + hash aggregate — map-side partial aggregation means
    only ``cells x dim x num_partitions`` partial rows ever shuffle, and
    the driver collects exactly ``cells x dim`` finals (1024 values for
    16x64), never vectors.  Empty cells keep their previous centroid.

    The seed is deterministic (lowest ids) so the trained centroids are
    reproducible for a given corpus; at 100 TB the same loop runs
    unchanged — index build cost is ``lloyd_iters + 1`` corpus scans.
    """
    rows = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .orderBy(id_col)
        .limit(num_centroids)
        .collect()
    )
    cent = [[float(x) for x in r[1]] for r in rows]
    for _ in range(lloyd_iters):
        assigned = corpus.select(F.col(vec_col).alias("__v")).withColumn(
            "cell", _cell_assign_udf(cent)("__v")
        )
        parts = (
            assigned.select("cell", F.posexplode("__v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new = [list(c) for c in cent]
        for r in parts:
            new[r["cell"]][r["pos"]] = float(r["s"]) / float(r["n"])
        cent = new
    return cent


def _cell_assign_udf(centroids: list[list[float]]):
    """Arrow-vectorized nearest-centroid assignment.

    One numpy matmul per Arrow batch ((batch x dim) @ (dim x cells))
    instead of ``cells`` interpreted higher-order-function cosines per
    row — measured ~10x faster on the corpus-assignment hot path, which
    dominates IVF index build.  Ties: ``argmax`` keeps the lowest cell
    id, matching the native ``max(struct(score, -cell))`` rule.
    """
    cent = np.asarray(centroids, dtype=np.float64)
    cent_n = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-300)

    @F.pandas_udf("int")
    def assign(emb: pd.Series) -> pd.Series:
        mat = np.vstack(emb.to_numpy())
        norms = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)
        sims = (mat / norms) @ cent_n.T
        return pd.Series(np.argmax(sims, axis=1).astype("int32"))

    return assign


def _probe_cells_udf(centroids: list[list[float]], nprobe: int):
    """Arrow-vectorized nprobe-nearest-cells (array<int> per query).

    Stable argsort keeps the lowest cell id on score ties — the same
    (desc score, asc cell) rule as a window-rank formulation, without
    the centroid-join + window stages (each extra stage costs a full
    plan-compile + job round-trip that dominated small-batch latency).
    """
    cent = np.asarray(centroids, dtype=np.float64)
    cent_n = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-300)

    @F.pandas_udf("array<int>")
    def probe(emb: pd.Series) -> pd.Series:
        mat = np.vstack(emb.to_numpy())
        norms = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)
        sims = (mat / norms) @ cent_n.T
        order = np.argsort(-sims, kind="stable", axis=1)[:, :nprobe]
        return pd.Series([row.astype("int32").tolist() for row in order])

    return probe


def ivf_assign(
    corpus: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The IVF inverted file: ``(neighbor_id, __cv, __cn, cell)`` —
    every corpus vector tagged with its nearest-centroid cell, its L2
    norm precomputed into the index (``__cn``): the probe then does ONE
    dot product per candidate instead of three (norms recomputed per
    pair were ~2/3 of the scoring work).  Build it once per corpus,
    ``persist()`` it, and hand it to :func:`ivf_topk` for each query
    batch; at scale this is the table you'd write to storage
    partitioned BY cell so a probe reads only its cells."""
    return (
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
        )
        .withColumn("cell", _cell_assign_udf(centroids)("__cv"))
        .withColumn("__cn", l2_norm("__cv"))
    )


def ivf_assign_int8(
    corpus: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Int8-compressed inverted file (the FAISS IVF-SQ8 analogue, and
    the reason :func:`..embeddings.quantize_int8` exists): same cell
    assignment as :func:`ivf_assign`, but the stored per-cell payload
    is the symmetric int8 code array — a 4x smaller resident index at
    100 TB, where the inverted file dominates memory/storage.

    Cosine ranking is invariant to each vector's (positive) scalar
    quantization scale, so :func:`ivf_topk` probes this index directly
    — codes score against float queries without dequantizing; only the
    bounded rounding error (|q| <= 127) perturbs ranks, which the
    recall@10 test pins >= 0.75 vs the float index.
    """
    assigned = ivf_assign(corpus, centroids, vec_col=vec_col, id_col=id_col)
    x = F.col("__cv")
    staged = assigned.select(
        "neighbor_id",
        "cell",
        x.alias("__cv"),
        # scale in its own projection — inlined into the per-element
        # lambda, array_max would re-run per element (O(dim^2) per row;
        # same fix as embeddings.quantize_int8)
        F.array_max(F.transform(x, lambda v: F.abs(v.cast("double")))).alias("__s"),
    )
    s = F.col("__s")
    q = F.transform(
        x,
        lambda v: F.when(s == 0, F.lit(0).cast("long"))
        .otherwise(F.floor(v.cast("double") * 127.0 / s + 0.5))
        .cast("tinyint"),
    )
    # code norm precomputed like the float index's __cn (same
    # one-dot-per-candidate probe contract)
    staged = staged.select("neighbor_id", q.alias("__cv"), "cell")
    return staged.withColumn("__cn", l2_norm("__cv"))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    assigned: DataFrame | None = None,
    round_cosine: bool = True,
) -> DataFrame:
    """IVF-style approximate top-k: corpus vectors live in the single
    nearest-centroid bucket; each query probes its ``nprobe`` nearest
    buckets and scores only those vectors.

    Cell assignment is a broadcast join against the (tiny) centroid
    table + one ``max(struct(score, …))`` argmax aggregate — NOT
    in-plan literal centroid arrays, which inflate the Catalyst
    expression tree quadratically (measured: driver OOM during
    optimization at 16x64 floats).  Candidate volume ~=
    ``|corpus| * nprobe / num_centroids`` per query — the FAISS
    IVF-Flat contract as DataFrame algebra.

    Pass ``assigned`` (from :func:`ivf_assign`, typically persisted) to
    reuse the corpus cell assignment across query batches — the real
    index-use pattern; otherwise the assignment rides the query.

    ``round_cosine=False`` keeps full-precision scores in the output —
    for callers that RE-RANK the candidates (:func:`hard_negatives_ivf`):
    re-ranking on 6-dp-rounded scores could order a near-tie by the
    id tie-break where the true ordering differs, breaking the exact
    degenerate-config bound.  Ranking inside this function always uses
    the unrounded score either way.
    """
    # Corpus -> one cell each.  This is the index-build hot path (every
    # corpus vector scores against every centroid): one Arrow-batched
    # numpy matmul, shuffle-free.
    c = (
        assigned
        if assigned is not None
        else ivf_assign(corpus, centroids, vec_col=vec_col, id_col=id_col)
    )

    # The persisted index carries precomputed corpus norms (__cn);
    # tolerate an index built before that column existed.
    if "__cn" not in c.columns:
        c = c.withColumn("__cn", l2_norm("__cv"))

    # Queries -> nprobe cells each: one narrow Arrow projection + explode.
    # Query norm computed ONCE per query row (before the cell explode
    # and candidate fan-out), so scoring is one dot product per
    # candidate — norms-per-pair were ~2/3 of the probe's scoring work.
    q = (
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qv")
        )
        .withColumn("__qn", l2_norm("__qv"))
        .withColumn("cell", F.explode(_probe_cells_udf(centroids, nprobe)("__qv")))
    )

    cands = c.join(F.broadcast(q), on="cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        cosine_similarity("__qv", "__cv", "__qn", "__cn").alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    out_cosine = (
        F.round("cosine", 6).alias("cosine") if round_cosine else F.col("cosine")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", out_cosine, "rank")
    )


# --------------------------------------------------------------------------
# Product quantization (the FAISS PQ / ADC analogue)
# --------------------------------------------------------------------------
#
# The third compression tier of the ANN family: IVF-Flat keeps float
# vectors (1x), IVF-SQ8 keeps int8 codes (4x smaller), PQ keeps
# ``num_subspaces`` sub-codebook ids per vector — 8 bytes of payload
# for a 64-dim corpus at the shipped 16x16 config (16 subspaces x
# 16-entry codebooks = 4 bits per id), a 32x
# smaller resident index than float32, which is what makes a 100 TB
# embedding corpus servable from executor memory at all.  Scoring is
# asymmetric distance computation (ADC): each query precomputes one
# ``num_subspaces x codes_per_subspace`` lookup table of sub-dot-
# products, and every candidate scores with ``num_subspaces`` table
# lookups instead of a ``dim``-wide dot product.


def _pq_normalize(mat: "np.ndarray") -> "np.ndarray":
    norms = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)
    return mat / norms


def _pq_encode_udf(codebooks: list[list[list[float]]]):
    """Arrow-vectorized PQ encoder: ``array<int>`` of one codebook id
    per subspace.  Vectors are L2-normalized first (cosine semantics:
    ADC over normalized subvectors sums to the cosine the float path
    computes), then each subvector takes its L2-nearest codebook entry
    via one ``(batch x dsub) @ (dsub x ksub)`` matmul per subspace —
    argmin on ``|c|^2 - 2 x.c`` (the ``|x|^2`` term is constant per
    row), ties to the lowest code id so encoding is deterministic."""
    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    dsub = books[0].shape[1]
    sq = [(-0.5) * (b * b).sum(axis=1) for b in books]  # ksub, per subspace

    @F.pandas_udf("array<int>")
    def encode(emb: pd.Series) -> pd.Series:
        mat = _pq_normalize(np.vstack(emb.to_numpy()).astype(np.float64))
        codes = np.empty((len(mat), len(books)), dtype=np.int32)
        for m, (book, msq) in enumerate(zip(books, sq)):
            sub = mat[:, m * dsub : (m + 1) * dsub]
            # argmax(x.c - |c|^2/2) == argmin |x - c|^2; stable argmax
            # keeps the lowest code id on ties
            codes[:, m] = np.argmax(sub @ book.T + msq, axis=1)
        return pd.Series([row.tolist() for row in codes])

    return encode


def pq_codebooks(
    corpus: DataFrame,
    num_subspaces: int = 8,
    codes_per_subspace: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    lloyd_iters: int = 2,
) -> list[list[list[float]]]:
    """Deterministic PQ training, the :func:`ivf_centroids` recipe per
    subspace: seed each subspace's codebook with the
    ``codes_per_subspace`` lowest-id vectors' normalized subvectors,
    then refine with ``lloyd_iters`` Lloyd iterations run as DataFrame
    passes — (1) encode via the Arrow matmul UDF (one corpus scan,
    shuffle-free), (2) per-(subspace, code, dim) mean via ``posexplode``
    + hash aggregate, so map-side partial aggregation shuffles only
    ``subspaces x codes x dim x num_partitions`` partial rows and the
    driver collects exactly ``subspaces x codes x dim`` finals (1024
    values at 8x16x8) — never vectors.  Empty codes keep their previous
    entry.  Index build cost at 100 TB: ``lloyd_iters + 1`` corpus
    scans, same as IVF."""
    dim_row = corpus.select(F.size(vec_col)).first()
    dim = int(dim_row[0])
    assert dim % num_subspaces == 0, (dim, num_subspaces)
    dsub = dim // num_subspaces

    seed_rows = (
        corpus.select(id_col, vec_col).orderBy(id_col).limit(codes_per_subspace).collect()
    )
    seeds = _pq_normalize(np.asarray([list(r[1]) for r in seed_rows], dtype=np.float64))
    books = [
        seeds[:, m * dsub : (m + 1) * dsub].tolist() for m in range(num_subspaces)
    ]

    # norm staged in its own projection — inlined into the per-element
    # lambda, the O(dim) aggregate would re-run per element (O(dim^2)
    # per row; same fix as ivf_assign_int8 / embeddings.quantize_int8)
    vn = F.transform(
        F.col("__v"), lambda x: x.cast("double") / F.col("__n")
    )
    for _ in range(lloyd_iters):
        enc = (
            corpus.select(F.col(vec_col).alias("__v"))
            .select(F.col("__v"), F.greatest(l2_norm("__v"), F.lit(1e-300)).alias("__n"))
            .select(F.col("__v"), vn.alias("__vn"))
            .withColumn("__code", _pq_encode_udf(books)("__v"))
        )
        parts = (
            enc.select("__code", F.posexplode("__vn").alias("pos", "x"))
            .select(
                F.floor(F.col("pos") / dsub).cast("int").alias("m"),
                F.element_at(
                    "__code", (F.floor(F.col("pos") / dsub) + 1).cast("int")
                ).alias("code"),
                F.col("pos"),
                F.col("x"),
            )
            .groupBy("m", "code", "pos")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new = [[list(c) for c in book] for book in books]
        for r in parts:
            new[r["m"]][r["code"]][r["pos"] - r["m"] * dsub] = float(r["s"]) / float(
                r["n"]
            )
        books = new
    return books


def pq_codebooks_exact(
    corpus: DataFrame,
    num_subspaces: int = 8,
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Degenerate CERTIFICATION codebooks: every distinct normalized
    subvector in the corpus becomes its own codebook entry, so encoding
    reconstructs each vector exactly and ADC equals the exact cosine —
    :func:`pq_topk` with these books must reproduce
    :func:`brute_force_topk` bit-for-bit at rank level (the
    ``similarity_*_all`` hash-green pattern).  This config collects the
    corpus's normalized subvectors to the driver — bounded by the
    certification fixture ONLY, never a production path (the real
    config collects ``codes_per_subspace`` seed rows and
    ``subspaces x codes x dim`` Lloyd partials)."""
    rows = corpus.select(vec_col).collect()
    mat = _pq_normalize(np.asarray([list(r[0]) for r in rows], dtype=np.float64))
    dim = mat.shape[1]
    assert dim % num_subspaces == 0, (dim, num_subspaces)
    dsub = dim // num_subspaces
    books = []
    for m in range(num_subspaces):
        sub = np.unique(mat[:, m * dsub : (m + 1) * dsub], axis=0)
        books.append(sub.tolist())
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The PQ index: ``(neighbor_id, __code array<int>)`` — the only
    per-vector state ADC needs (normalization is folded into encoding,
    so no stored norms).  Build once per corpus, ``persist()`` it, and
    hand it to :func:`pq_topk` per query batch; at scale this is the
    table you'd write to storage (8 bytes + id per vector at the
    default config)."""
    return corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _pq_encode_udf(codebooks)(F.col(vec_col)).alias("__code"),
    )


def _query_luts(
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str,
    query_id_col: str,
) -> tuple[list, list["np.ndarray"]]:
    """Collect the (bounded) query batch and precompute the ADC lookup
    tables: ``luts[m]`` is ``(Q, ksub_m)`` — the dot of every
    normalized query subvector with every codebook entry.  Shared by
    the flat and IVF-composed serve paths so the LUT contract can never
    diverge between them."""
    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    dsub = books[0].shape[1]
    qrows = queries.select(query_id_col, vec_col).collect()
    qids = [r[0] for r in qrows]
    qmat = _pq_normalize(np.asarray([list(r[1]) for r in qrows], dtype=np.float64))
    luts = [
        qmat[:, m * dsub : (m + 1) * dsub] @ book.T for m, book in enumerate(books)
    ]
    return qids, luts


def _exact_refine(
    corpus: DataFrame,
    queries: DataFrame,
    cand: DataFrame,
    k: int,
    vec_col: str,
    id_col: str,
    query_id_col: str,
) -> DataFrame:
    """Re-score a bounded ``(query_id, neighbor_id)`` candidate set
    with exact cosine and re-rank to ``k`` — the refine stage shared by
    every ADC serve path.  Both the candidate set and the query batch
    broadcast, so the full-vector corpus is scanned once and never
    shuffled."""
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    ).withColumn("__cn", l2_norm("__cv"))
    qv = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    ).withColumn("__qn", l2_norm("__qv"))
    scored = (
        cv.join(F.broadcast(cand), "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity("__qv", "__cv", "__qn", "__cn").alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    codes: DataFrame | None = None,
) -> DataFrame:
    """ADC top-k over the PQ index: one Arrow pass scores every code
    row against ALL queries at once (``num_subspaces`` lookups per
    candidate per query into the precomputed LUT tensor), ``posexplode``
    fans the per-query score arrays into ``(query, neighbor, score)``
    rows, and the usual window ranks them.  The corpus/code table is
    scanned once regardless of query count and never shuffled — only
    ``|queries| x |corpus|`` (ids, score) rows enter the ranking
    window, the :func:`brute_force_topk` contract.

    The query batch is collected to build the LUTs — bounded by the
    same contract that lets every other variant broadcast it (10-1000s
    of queries, never a second corpus).  Output shape matches
    :func:`brute_force_topk`; ``cosine`` is the ADC approximation
    (exact when the codebooks reconstruct exactly, e.g.
    :func:`pq_codebooks_exact`)."""
    qids, luts = _query_luts(queries, codebooks, vec_col, query_id_col)

    @F.pandas_udf("array<double>")
    def adc_scores(code: pd.Series) -> pd.Series:
        codes_mat = np.vstack(code.to_numpy())  # (B, M)
        acc = np.zeros((len(qids), len(codes_mat)), dtype=np.float64)
        for m, lut in enumerate(luts):
            acc += lut[:, codes_mat[:, m]]
        return pd.Series([col.tolist() for col in acc.T])

    c = (
        codes
        if codes is not None
        else pq_encode(corpus, codebooks, vec_col=vec_col, id_col=id_col)
    )
    qid_arr = F.array(*[F.lit(q) for q in qids])
    scored = (
        c.select(
            "neighbor_id",
            F.posexplode(adc_scores("__code")).alias("__qi", "cosine"),
        )
        .select(
            F.element_at(qid_arr, F.col("__qi") + 1).alias("query_id"),
            "neighbor_id",
            "cosine",
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def pq_topk_refined(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 10,
    overfetch: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    codes: DataFrame | None = None,
) -> DataFrame:
    """ADC + exact refine (the FAISS ``IndexRefineFlat`` pattern, the
    production serve shape): the PQ codes pick ``k * overfetch``
    candidates per query (:func:`pq_topk` — one code-table scan for all
    queries), then ONLY those candidates are re-scored with exact
    cosine and re-ranked to ``k``.  The candidate id set is bounded
    (``|queries| * k * overfetch`` rows) so it broadcasts against the
    full-vector table — the corpus is scanned once per stage and never
    shuffled.  Measured on the 64-dim fixture at 16x16 (64-bit codes,
    32x smaller than float32): ADC top-100 contains ~99% of the true
    top-10, so recall@10 after refine ~0.99 (pinned in tests/)."""
    cand = pq_topk(
        corpus,
        queries,
        codebooks,
        k=k * overfetch,
        vec_col=vec_col,
        id_col=id_col,
        query_id_col=query_id_col,
        codes=codes,
    ).select("query_id", "neighbor_id")
    return _exact_refine(corpus, queries, cand, k, vec_col, id_col, query_id_col)


def ivfpq_assign(
    corpus: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The combined IVF-PQ index: ``(neighbor_id, cell, __code)`` —
    one corpus scan runs both Arrow encoders in a single projection.
    At scale this is the table you'd write partitioned BY cell: a probe
    reads only its cells' partitions AND each row carries 8-16 bytes of
    code instead of the float vector — the FAISS IVFPQ layout, the only
    tier where BOTH the scan volume and the resident bytes shrink.

    ``persist()`` the result before probing (the registered query path
    does, and the streaming maintainer writes it to storage): besides
    index reuse, an UNpersisted build inlined into :func:`ivfpq_topk`
    makes Catalyst's python-UDF extraction re-evaluate the cell-assign
    UDF around the cell join (observed: stacked ArrowEvalPython nodes,
    one wasted corpus matmul) — a persisted/stored index serves with
    no UDF in the probe plan at all."""
    return corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _cell_assign_udf(centroids)(F.col(vec_col)).alias("cell"),
        _pq_encode_udf(codebooks)(F.col(vec_col)).alias("__code"),
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    nprobe: int = 3,
    overfetch: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    assigned: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ with exact refine — the production 100 TB serve shape:
    each query probes its ``nprobe`` nearest cells (only those vectors
    are candidates, ~``|corpus| * nprobe / num_centroids``), candidates
    score by ADC table lookups against the 8-16 byte codes (never the
    float vectors), the ADC top ``k * overfetch`` per query survive,
    and ONLY those re-score with exact cosine.  Approximate twice over
    (cell selectivity + codebook quantization, the latter mostly
    recovered by the refine) — rows-only with a pytest recall floor;
    the degenerate config (``nprobe`` = all cells, exact codebooks,
    overfetch past the corpus) is pinned equal to brute force in
    tests/test_dedup_similarity.py, the ``similarity_*_all`` bound as
    a pytest."""
    qids, luts = _query_luts(queries, codebooks, vec_col, query_id_col)
    qidx = {qid: i for i, qid in enumerate(qids)}

    @F.pandas_udf("double")
    def adc_pair_scores(code: pd.Series, qid: pd.Series) -> pd.Series:
        codes_mat = np.vstack(code.to_numpy())  # (B, M)
        qi = qid.map(qidx).to_numpy(dtype=np.int64)
        acc = np.zeros(len(codes_mat), dtype=np.float64)
        for m, lut in enumerate(luts):
            acc += lut[qi, codes_mat[:, m]]
        return pd.Series(acc)

    c = (
        assigned
        if assigned is not None
        else ivfpq_assign(corpus, centroids, codebooks, vec_col=vec_col, id_col=id_col)
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    ).withColumn("cell", F.explode(_probe_cells_udf(centroids, nprobe)("__qv")))
    cands = (
        c.join(F.broadcast(q.select("query_id", "cell")), on="cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            adc_pair_scores("__code", "query_id").alias("__adc"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("__adc"), F.asc("neighbor_id"))
    short = (
        cands.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k * overfetch)
        .select("query_id", "neighbor_id")
    )
    return _exact_refine(corpus, queries, short, k, vec_col, id_col, query_id_col)


def deterministic_planes(num_tables: int, num_planes: int, dim: int) -> list[list[list[float]]]:
    """Seeded pseudo-random hyperplanes (pure python, reproducible)."""
    import random

    rng = random.Random(42)
    return [
        [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(num_planes)]
        for _ in range(num_tables)
    ]


def knn_label(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """k-NN label propagation (weak labeling / label imputation for
    data curation): each query takes the MAJORITY label among its
    ``k`` nearest cosine neighbors in ``corpus``; vote ties break to
    the smallest label, so the answer is deterministic.

    Output: ``(query_id, label, votes)`` — one row per query.

    Composition, not a new kernel: neighbors come from
    :func:`brute_force_topk` (swap in :func:`ivf_topk` over a
    persisted inverted file for the at-scale path — the vote algebra
    is identical), labels attach via one hash join against the
    bounded neighbor set, and the vote is a tiny two-level aggregate.
    """
    nb = brute_force_topk(
        corpus, queries, k=k, vec_col=vec_col, id_col=id_col,
        query_id_col=query_id_col,
    )
    labeled = nb.join(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(label_col)),
        on="neighbor_id",
    )
    votes = labeled.groupBy("query_id", label_col).agg(
        F.count(F.lit(1)).alias("votes")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("votes"), F.asc(label_col)
    )
    return (
        votes.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .select("query_id", label_col, "votes")
    )

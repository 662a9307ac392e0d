"""Embedding-column operators for training-data pipelines ([EXT]; the
719-LoC reference has no embedding surface — this extends the corpus
toolbox the same way ``dedup``/``similarity`` do).

Pure native array expressions (``transform`` / ``array_max`` /
``aggregate``): per-row, embarrassingly parallel, zero Python and zero
shuffle at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``scale = max(|x|)``,
    ``q_i = floor(x_i * 127 / scale + 0.5)`` in [-127, 127] — the
    standard 4x memory-compression step before an ANN index (cosine
    top-k recall loss is ~0 at int8).

    ``floor(v + 0.5)`` rather than ``round(v)``: floor is
    IEEE-identical in every engine, immune to HALF_UP vs half-even
    divergence, which is what makes the quantized bytes themselves
    oracle-checkable (not just their count).

    Output: ``(id_col, n_dims, scale_micro, q_fp)`` where
    ``scale_micro = floor(scale * 1e6)`` (exact BIGINT) and ``q_fp``
    is the md5 of the comma-joined quantized ints — a value-exact
    fingerprint of the full int8 vector without shipping arrays
    through the comparator.  All-zero vectors quantize to all zeros.
    """
    x = F.col(vec_col)
    # Materialize scale in its own projection: inlined into the
    # per-element lambda it would re-run array_max for EVERY element
    # (O(dim^2) per row — measured 60% of query wall).  Catalyst's
    # CollapseProject keeps non-cheap aliases un-duplicated, so the
    # two selects stay one codegen stage with scale computed once.
    scale = F.col("__scale")
    staged = df.select(
        F.col(id_col),
        x.alias(vec_col),
        F.array_max(F.transform(x, lambda v: F.abs(v.cast("double")))).alias(
            "__scale"
        ),
    )
    q = F.transform(
        x,
        lambda v: F.when(scale == 0, F.lit(0).cast("long")).otherwise(
            F.floor(v.cast("double") * 127.0 / scale + 0.5)
        ),
    )
    return staged.select(
        F.col(id_col),
        F.size(x).alias("n_dims"),
        F.floor(scale * 1e6).cast("long").alias("scale_micro"),
        # NULL elements stringify as 'null' BEFORE the join: concat_ws
        # silently skips NULLs, so [1.0, NULL, 0.5] would fingerprint
        # identically to [1.0, 0.5] — distinct vectors colliding on the
        # "value-exact" fingerprint (code review r8).  The SQL twin
        # coalesces identically.
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    q, lambda v: F.coalesce(v.cast("string"), F.lit("null"))
                ),
            )
        ).alias("q_fp"),
    )


def project_random(
    df: DataFrame,
    planes: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Johnson–Lindenstrauss random-projection dimensionality
    reduction: ``out[j] = dot(vec, planes[j])`` for a fixed (seeded,
    reproducible — see ``similarity.deterministic_planes``) Gaussian
    plane matrix.  The standard cheap shrink before an ANN index or a
    clustering pass: pairwise distances are preserved within
    ``1 ± eps`` at ``out_dim = O(ln n / eps²)``.

    Pure per-row native expressions — the plane matrix is inlined as
    literals into ``out_dim`` sequential-sum dot products (the
    ``functions.vectors.dot`` shape: left-to-right summation, so each
    component is bit-deterministic and engine-reproducible).  Zero
    shuffle, zero Python.  Output is EXPLODED scalar rows
    ``(id_col, pos, proj_micro)`` with ``proj_micro =
    floor(out[j] * 1e6)`` exact BIGINTs (the micro-unit oracle trick).
    """
    from ..functions.vectors import dot

    if not planes:
        raise ValueError("planes must be non-empty (got [])")
    if len({len(p) for p in planes}) != 1:
        raise ValueError(
            f"planes must all have the same length, got {sorted({len(p) for p in planes})}"
        )
    # A plane length that mismatches the embedding dim cannot be
    # checked driver-side (no action is taken here); zip_with pads the
    # shorter array with NULLs and the dot goes NULL — visible, not
    # silent, in proj_micro.
    comps = [
        F.floor(
            dot(F.col(vec_col), F.array(*[F.lit(float(x)) for x in plane])) * 1e6
        ).cast("bigint")
        for plane in planes
    ]
    return df.select(
        F.col(id_col), F.posexplode(F.array(*comps)).alias("pos", "proj_micro")
    )


def _idot(a: "F.Column", b: "F.Column") -> "F.Column":
    """Exact integer dot product of two quantized BIGINT arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _icos(a: "F.Column", b: "F.Column") -> "F.Column":
    """Cosine over exact integer inputs: the only float ops are the
    final dot / (sqrt * sqrt) — identical IEEE ops on identical exact
    inputs in any engine; NULL when either norm is zero."""
    return _idot(a, b).cast("double") / (
        F.sqrt(F.nullif(_idot(a, a), F.lit(0)).cast("double"))
        * F.sqrt(F.nullif(_idot(b, b), F.lit(0)).cast("double"))
    )


def _quantized_nonzero(
    df: DataFrame, vec_col: str, label_col: str, id_col: str, m: float
) -> DataFrame:
    """(id, label, __qe) — labeled vectors micro-quantized to BIGINT
    arrays, NULL-label/NULL-vector/zero-norm rows excluded (the shared
    audit contract of :func:`label_separation` / :func:`label_outliers`)."""
    qv = df.filter(
        F.col(label_col).isNotNull() & F.col(vec_col).isNotNull()
    ).select(
        F.col(id_col),
        F.col(label_col).alias("label"),
        F.transform(
            F.col(vec_col),
            lambda e: F.floor(e.cast("double") * F.lit(m)).cast("long"),
        ).alias("__qe"),
    )
    return qv.filter(_idot(F.col("__qe"), F.col("__qe")) > 0)


def _centroid_arrays(qv: DataFrame) -> DataFrame:
    """(label, cv) — per-label integer centroid arrays
    (``floor(sum/n)`` per dimension) from the quantized members: one
    posexplode shuffle carrying (label, pos) longs with map-side
    partial sums (the Lloyd-step shape), output bounded by |labels|."""
    cent = (
        qv.select("label", F.posexplode("__qe").alias("pos", "q"))
        .groupBy("label", "pos")
        .agg(F.sum("q").alias("__qsum"), F.count(F.lit(1)).alias("__n"))
        .select(
            "label",
            "pos",
            F.floor(F.col("__qsum").cast("double") / F.col("__n")).cast("long").alias("cq"),
        )
    )
    return cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cq"))), lambda s: s["cq"]
        ).alias("cv"),
    )


def label_separation(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    id_col: str = "vec_id",
    micro: int = 1_000_000,
) -> DataFrame:
    """Embedding-space class-separation audit: per label, how tightly
    its vectors hug their own centroid (cohesion) versus how close the
    nearest OTHER centroid sits (the rival) — the go/no-go check on an
    embedding table before it is trusted for labeled retrieval,
    hard-negative mining, or semantic dedup blocking.

    Everything runs in exact integer micro-units so every output value
    is oracle-hash-checkable, not just row counts: elements quantize
    to ``floor(e * micro)`` BIGINTs, centroids to
    ``floor(sum/n)`` BIGINTs, and all dot products / norms are
    integer arithmetic — order-independent under any partitioning,
    immune to float-summation drift.  The only float ops are the final
    ``dot / (sqrt * sqrt)`` cosine (identical IEEE ops on identical
    exact inputs in any engine) which is immediately re-quantized to
    ``floor(cos * micro)``.  Magnitude budget: |e| < ~9000 fits —
    per-term products stay under 2^63 across 64 dims.

    Per label: ``n_vecs``, ``mean_cohesion_micro`` (mean over member
    vectors of the micro-quantized cosine to the own-label centroid),
    ``rival_label`` + ``rival_cos_micro`` (the other centroid with the
    highest centroid-to-centroid cosine; ties break to the smaller
    label — integer ordering, no float-tie hazard), and
    ``margin_micro`` (cohesion minus rival cosine: positive = members
    sit closer to home than the nearest rival class does).

    Contract: NULL-label and NULL-vector rows are excluded (no class
    to audit), as are zero-norm vectors (cosine undefined).  A label
    whose CENTROID is the zero vector yields NULL cohesion/rival
    cosine (visible, not silent).

    Scale: one posexplode shuffle carrying (label, pos) longs with
    map-side partial sums (the Lloyd-step shape); centroid arrays are
    a bounded |labels|-row frame that BROADCASTS back onto the
    members for the cohesion pass (the fact stream is never
    re-shuffled beyond the per-label aggregate); the rival matrix is a
    |labels|^2 nested-loop join of that same bounded frame — both
    sides broadcast-small by the data model.
    """
    m = float(micro)
    qv = _quantized_nonzero(df, vec_col, label_col, id_col, m)
    carr = _centroid_arrays(qv)
    idot, icos = _idot, _icos

    coh = (
        qv.join(F.broadcast(carr.select("label", "cv")), on="label")
        .select(
            "label",
            F.floor(icos(F.col("__qe"), F.col("cv")) * F.lit(m)).cast("long").alias("__cm"),
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.sum("__cm").cast("double") / F.count(F.lit(1)), 6).alias(
                "mean_cohesion_micro"
            ),
        )
    )

    a = carr.select(F.col("label").alias("label"), F.col("cv").alias("cv_a"))
    b = carr.select(F.col("label").alias("rival_label"), F.col("cv").alias("cv_b"))
    pairs = a.join(F.broadcast(b), F.col("label") != F.col("rival_label")).select(
        "label",
        "rival_label",
        F.floor(icos(F.col("cv_a"), F.col("cv_b")) * F.lit(m))
        .cast("long")
        .alias("rival_cos_micro"),
    )
    w = Window.partitionBy("label").orderBy(
        F.col("rival_cos_micro").desc_nulls_last(), F.col("rival_label").asc()
    )
    rival = (
        pairs.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk")
    )

    return coh.join(rival, on="label", how="left").select(
        "label",
        "n_vecs",
        "mean_cohesion_micro",
        "rival_label",
        "rival_cos_micro",
        F.round(
            F.col("mean_cohesion_micro") - F.col("rival_cos_micro").cast("double"), 6
        ).alias("margin_micro"),
    )


def label_outliers(
    df: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    label_col: str = "label",
    id_col: str = "vec_id",
    micro: int = 1_000_000,
) -> DataFrame:
    """Per-label embedding outlier review queue: the ``k`` member
    vectors of each label that sit FARTHEST from their own label's
    centroid (lowest cosine) — the mislabeled-/noisy-data pruning step
    run before a label column is trusted for curation
    (:func:`label_separation` answers "are the classes separable";
    this answers "which rows are poisoning them").

    Same exact-integer-micro-unit arithmetic and member contract as
    :func:`label_separation` (shared helpers — the two audits can
    never disagree about quantization or membership): elements and
    centroids are BIGINTs, the per-vector cosine re-quantizes to
    ``floor(cos * micro)``, so ranking never rides on float-summation
    drift.  A NULL cosine (label centroid is the zero vector) ranks
    FIRST — an undefined similarity is the most review-worthy row, not
    a silently dropped one; remaining ties break by ascending id.

    Output: ``(id_col, label, cos_micro, rank)``, ``rank <= k`` per
    label.

    Scale: the centroid build is the Lloyd-step shape (one posexplode
    shuffle of (label, pos) longs, |labels|-bounded output); the
    |labels|-row centroid frame broadcasts back onto the members, so
    the scoring pass is one scan with no fact shuffle; the ranking
    window shuffles only ``(label, id, cos)`` triples and each label's
    partition holds its member count — at skewed-label scale swap in
    the per-shard top-k merge (the similarity rankers' note), the
    algebra is unchanged.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    m = float(micro)
    qv = _quantized_nonzero(df, vec_col, label_col, id_col, m)
    carr = _centroid_arrays(qv)
    scored = qv.join(F.broadcast(carr), on="label").select(
        id_col,
        "label",
        F.floor(_icos(F.col("__qe"), F.col("cv")) * F.lit(m))
        .cast("long")
        .alias("cos_micro"),
    )
    w = Window.partitionBy("label").orderBy(
        F.col("cos_micro").asc_nulls_first(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "label", "cos_micro", "rank")
    )

"""Embedding-column operators for training-data pipelines ([EXT]; the
719-LoC reference has no embedding surface — this extends the corpus
toolbox the same way ``dedup``/``similarity`` do).

Pure native array expressions (``transform`` / ``array_max`` /
``aggregate``): per-row, embarrassingly parallel, zero Python and zero
shuffle at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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

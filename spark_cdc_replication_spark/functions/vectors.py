"""Native vector math over ``array<float/double>`` columns.

All expressions compute in double precision JVM-side (``zip_with`` +
``aggregate``) — no Python UDF, sequential left-to-right summation so
results are deterministic and match a straightforward SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _as_double(col: str | Column) -> Column:
    return F.transform(_c(col), lambda x: x.cast("double"))


def dot(a: str | Column, b: str | Column) -> Column:
    """Sequential-sum dot product in double precision."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: str | Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(
    a: str | Column,
    b: str | Column,
    norm_a: str | Column | None = None,
    norm_b: str | Column | None = None,
) -> Column:
    """cosine = dot(a,b) / (|a| * |b|); pass precomputed norms when the
    same vector participates in many pairs (top-k search, dedup)."""
    na = _c(norm_a) if norm_a is not None else l2_norm(a)
    nb = _c(norm_b) if norm_b is not None else l2_norm(b)
    return dot(a, b) / F.nullif(na * nb, F.lit(0.0))

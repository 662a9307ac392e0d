"""Keyed table diff — FULL OUTER join classification of two relations.

The reconciliation primitive a CDC engine owes its users: after a
migration, a backfill, or a suspected divergence, diff the rebuilt
snapshot against the source of truth and get per-key verdicts instead
of two row counts.  (The reference has no diff tool; its users eyeball
counts — ``daily_load.py`` just logs them.)

Plan shape: one shuffle per side on the key (the full-outer hash
join); compared columns ride the shuffle, everything else is pruned.
At 100 TB, diff on the KEY COLUMNS plus a fingerprint of the payload
(``F.md5(F.concat_ws(...))``) instead of every column — same plan, a
32-byte payload.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATUS_COL = "diff_status"


def table_diff(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Classify every key as added / removed / changed / unchanged.

    ``added``   — key only in ``right``; ``removed`` — only in ``left``;
    ``changed`` — in both with any compared column differing (null-safe
    comparison: null vs value counts as a change, null vs null does
    not); ``unchanged`` otherwise.  Output: keys, status, and
    ``<col>_left`` / ``<col>_right`` for every compared column.
    """
    # explicit presence markers: a row whose compared columns are all
    # null must still count as present on its side
    lhs = left.select(
        *keys,
        F.lit(True).alias("__in_left"),
        *[F.col(c).alias(f"{c}_left") for c in compare_cols],
    )
    rhs = right.select(
        *keys,
        F.lit(True).alias("__in_right"),
        *[F.col(c).alias(f"{c}_right") for c in compare_cols],
    )
    j = lhs.join(rhs, on=list(keys), how="full_outer")
    in_left = F.col("__in_left").isNotNull()
    in_right = F.col("__in_right").isNotNull()
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"{c}_left").eqNullSafe(F.col(f"{c}_right"))
    status = (
        F.when(~in_left, F.lit("added"))
        .when(~in_right, F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(
        *keys,
        status.alias(STATUS_COL),
        *[F.col(f"{c}_left") for c in compare_cols],
        *[F.col(f"{c}_right") for c in compare_cols],
    )

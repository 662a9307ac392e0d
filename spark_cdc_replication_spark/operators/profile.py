"""One-pass table profiling: per-column null count, distinct count,
min/max — the data-quality report run before trusting a feed.

All columns profile in a SINGLE aggregate over one scan (Catalyst
plans the multiple count-distincts via one Expand: rows multiply by
the number of profiled columns, but the table is still read once —
profile the columns you care about, not SELECT *).  At extreme scale
swap ``countDistinct`` for ``approx_count_distinct`` via
``exact=False``; the plan then loses the Expand entirely (HLL sketches
merge map-side).

The wide one-row aggregate is unpivoted executor-side with ``stack``
— no driver collect.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame, cols: Sequence[str], exact: bool = True
) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_value, max_value) per
    profiled column; min/max rendered as strings so heterogeneous
    column types share one output schema."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        nd = F.countDistinct(c) if exact else F.approx_count_distinct(c)
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            nd.alias(f"{c}__d"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nn, {c}__d, {c}__min, {c}__max" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) "
            "AS (column, __nn, n_distinct, min_value, max_value)"
        ),
        F.col("__n").alias("n_rows"),
    ).select(
        "column",
        "n_rows",
        (F.col("n_rows") - F.col("__nn")).alias("n_nulls"),
        "n_distinct",
        "min_value",
        "max_value",
    )

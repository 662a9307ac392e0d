"""Event-time windowing: sessionization and tumbling windows.

No reference counterpart (the reference's only window function is the
LWW row_number, SURVEY.md §2.6); these are the [EXT] stream-analytics
surface over the ``events`` fixture.  Both are pure DataFrame algebra:
the same ``tumbling_counts`` projection works unchanged on a
``readStream`` frame (add ``withWatermark`` for late data).

Scale: sessionize is one shuffle on the session key; the gap/cumsum
windows reuse the SAME partitioning (Catalyst plans a single sort +
two window frames, no second exchange).  Tumbling agg is a plain
hash-aggregate on (bucket, group) — map-side partials apply.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap: str = "30 minutes",
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Assign gap-based session ids per key.

    A new session starts when the time since the previous event of the
    same key exceeds ``gap``.  ``session_id`` is the running count of
    session starts per key (1-based), deterministic given a total
    per-key order (pass ``order_tiebreak`` for equal timestamps).
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in order_tiebreak]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    gap_expr = F.expr(f"INTERVAL {gap}")
    prev_ts = F.lag(ts_col).over(w)
    is_new = F.when(
        prev_ts.isNull() | (F.col(ts_col) > prev_ts + gap_expr), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn("session_id", F.sum(is_new).over(w))


def tumbling_counts(
    df: DataFrame,
    ts_col: str,
    width: str,
    group_cols: Sequence[str] = (),
    agg_col: str | None = None,
) -> DataFrame:
    """Tumbling-window aggregate: count + optional value sum per
    (window-start, group).  ``F.window`` buckets are epoch-aligned,
    matching DuckDB ``time_bucket``.  Exactly the ``slide == width``
    special case of :func:`hopping_counts` (one shared agg builder, so
    the cross-engine decimal-rounding discipline can never drift
    between the two)."""
    return hopping_counts(df, ts_col, width, width, group_cols, agg_col)


def hopping_counts(
    df: DataFrame,
    ts_col: str,
    width: str,
    slide: str,
    group_cols: Sequence[str] = (),
    agg_col: str | None = None,
) -> DataFrame:
    """Hopping (sliding) window aggregate: each event contributes to
    every epoch-aligned window of ``width`` whose start is a multiple
    of ``slide`` and covers it — ``F.window(ts, width, slide)`` is the
    operator Structured Streaming uses for overlapping windows, so the
    batch query transfers unchanged to a ``readStream`` frame.

    Scale: Catalyst expands each row to ``width/slide`` (window, row)
    pairs BEFORE the aggregate, and map-side partial aggregation
    collapses them within the scan task — the shuffle carries only
    (bucket, group) partials, i.e. the overlap factor inflates the
    map-side work but never the exchange.  Keep ``width/slide`` small
    (2-8×); for large overlap factors prefer aggregating tumbling
    ``slide``-sized buckets first and composing windows downstream.
    """
    aggs = [F.count(F.lit(1)).alias("n")]
    if agg_col:
        aggs.append(
            F.round(F.sum(F.col(agg_col).cast("decimal(27,8)")), 4)
            .cast("double")
            .alias("total")
        )
    return (
        df.groupBy(F.window(ts_col, width, slide).start.alias("bucket"), *group_cols)
        .agg(*aggs)
    )

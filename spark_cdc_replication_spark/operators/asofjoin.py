"""As-of join — "latest right row at or before each left row's timestamp".

The reference has no as-of join; its window-dedup W1
(``/root/reference/pipelines/daily_data_handler.py:106-109``) is the
k=1 special case ("state as of end-of-batch").  This operator is the
general form, needed for point-in-time feature lookups in training-data
pipelines (label event -> latest feature snapshot).

Implementation is the **merge/union algorithm**, not a range join:

1. tag right rows 0 and left rows 1, union them on (key, ts, tag);
2. one window per key ordered by (ts, tag) carries the right row —
   packed as ONE struct of (ts, payload...) so the match is atomic —
   forward with ``last(struct, ignorenulls=True)``;
3. keep only left rows — each now paired with the most recent right
   row at-or-before it (ties: right sorts first, so an equal-ts right
   row IS visible to the left row).

Scale: exactly ONE shuffle on the join key (the window), zero
row-explosion.  The naive ``l JOIN r ON key AND r.ts <= l.ts`` +
row_number plan materializes O(|L| * matches) intermediates; a
band-predicate range join still scans per-band.  This plan's cost is
O(|L|+|R|) rows through one sort — the same shape Structured
Streaming's stream-stream interval join uses for its state store.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TAG = "__asof_tag"
_CARRY = "__asof_carry"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    right_ts_col: str | None = None,
    suffix: str = "_right",
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row + the nearest ``right`` row
    with the same key — ``backward`` (default): newest right row with
    ``right.ts <= left.ts``; ``forward``: earliest right row with
    ``right.ts >= left.ts``.  Right columns are null when no such row
    exists, or (with ``tolerance``, e.g. ``"1 hour"``) when the nearest
    row is further than the tolerance away — pandas ``merge_asof``
    semantics, as one distributed window pass.

    ``right``'s non-key payload columns are suffixed on collision.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    right_ts_col = right_ts_col or ts_col
    on = list(on)

    payload = [c for c in right.columns if c not in on and c != right_ts_col]
    renamed = {
        c: (c + suffix if c in left.columns else c) for c in payload
    }
    # The whole right row rides in ONE struct: last(struct, ignorenulls)
    # carries it atomically, so a NULL inside one payload column can
    # never be backfilled from a *different* (older) right row, and the
    # tolerance check below provably refers to the same row as every
    # payload value (pandas merge_asof semantics).
    r = right.select(
        *on,
        F.col(right_ts_col).alias(ts_col),
        F.lit(0).alias(_TAG),
        F.struct(
            F.col(right_ts_col).alias(ts_col + suffix),
            *[F.col(c).alias(renamed[c]) for c in payload],
        ).alias(_CARRY),
    )
    l = left.withColumn(_TAG, F.lit(1))

    unioned = l.unionByName(r, allowMissingColumns=True)

    # backward: scan time ascending, carry the last right row seen.
    # forward: scan time DESCENDING, so "last right seen" is the
    # earliest at-or-after row.  Either way an equal-ts right row sorts
    # before the left row (tag 0 < 1) and is therefore visible to it.
    ts_order = F.col(ts_col).asc() if direction == "backward" else F.col(ts_col).desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, F.col(_TAG).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = unioned.withColumn(_CARRY, F.last(_CARRY, ignorenulls=True).over(w))
    out = unioned.filter(F.col(_TAG) == 1)
    if tolerance is not None:
        matched_ts = F.col(_CARRY)[ts_col + suffix]
        if direction == "backward":
            within = matched_ts >= F.col(ts_col) - F.expr(f"INTERVAL {tolerance}")
        else:
            within = matched_ts <= F.col(ts_col) + F.expr(f"INTERVAL {tolerance}")
        out = out.withColumn(_CARRY, F.when(within, F.col(_CARRY)))
    return out.select(
        *left.columns,
        *[F.col(_CARRY)[renamed[c]].alias(renamed[c]) for c in payload],
        F.col(_CARRY)[ts_col + suffix].alias(ts_col + suffix),
    )

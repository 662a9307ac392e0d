"""Bucketized range (interval) join — points matched to the intervals
containing them, without a cartesian/nested-loop plan.

No reference counterpart (``[EXT]``): the reference's only temporal
operator is the LWW window.  Spark itself plans ``p JOIN i ON p.ts
BETWEEN i.start AND i.end`` as BroadcastNestedLoopJoin (a scan of every
point against every interval per key) — the classic scale cliff.  This
operator makes the join an EQUI-join on a time bucket:

1. each interval explodes into the buckets it overlaps (``sequence``
   over truncated endpoints — bounded fan-out when interval length is
   bounded relative to the bucket width);
2. each point maps to exactly ONE bucket (so no output dedup is
   needed);
3. hash-join on (keys…, bucket), then the exact containment predicate
   filters within the bucket.

Cost: |I| * (avg_len/bucket + 1) exploded rows + one hash join — the
same binning trick Structured Streaming uses for stream-stream interval
joins, here for batch.  Pick ``bucket`` close to the typical interval
length: too small explodes intervals, too large inflates candidate
pairs per bucket.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "__rj_bucket"


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    on: Sequence[str] = (),
    bucket: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join every ``points`` row to every ``intervals`` row with the
    same ``on`` keys and ``start_col <= point_ts <= end_col``.

    ``bucket`` is a ``sequence()`` step interval literal (``"1 hour"``,
    ``"1 day"`` …) whose unit must align with ``date_trunc`` (hour/day).
    ``how="inner"`` only; points in no interval drop out.
    """
    if how != "inner":
        raise ValueError("range_join supports how='inner' only")
    qty, unit = bucket.split()
    unit = unit.rstrip("s")  # "1 hour" -> date_trunc unit
    if qty != "1":
        # point buckets come from date_trunc(unit), which only lands on
        # whole-unit boundaries — a multi-unit stride would skip them
        raise ValueError("bucket must be '1 <unit>' (e.g. '1 hour', '1 day')")
    step = F.expr(f"INTERVAL {bucket}")
    ibuck = intervals.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.date_trunc(unit, F.col(start_col)),
                F.date_trunc(unit, F.col(end_col)),
                step,
            )
        ),
    )
    pbuck = points.withColumn(_BUCKET, F.date_trunc(unit, F.col(point_ts)))
    return (
        pbuck.join(ibuck, on=[*on, _BUCKET])
        .filter(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) <= F.col(end_col))
        )
        .drop(_BUCKET)
    )

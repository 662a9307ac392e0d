"""Single-pass pipeline metrics via ``DataFrame.observe``.

The reference logs row counts by calling ``.count()`` before writing
(``/root/reference/pipelines/daily_data_handler.py`` logs counts) —
at 100 TB that is a SECOND full scan per metric.  ``observe`` attaches
aggregate metrics to the plan itself: they are computed by the same
tasks that execute the real action (the write), for free.

Usage::

    merged, obs = observed(
        merge_snapshot(snapshot, changes, pks, order),
        rows=F.count(F.lit(1)),
        keys=F.approx_count_distinct("id"),
    )
    merged.write.saveAsTable(...)   # the action
    log.info("merged %s rows", obs.get["rows"])
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observed(
    df: DataFrame, name: str | None = None, **metrics: Column
) -> tuple[DataFrame, Observation]:
    """Attach named aggregate metrics to ``df``'s next action.

    Returns ``(df, observation)``; read ``observation.get`` AFTER an
    action has run.  Metrics must be aggregates over the observed
    plan's output (counts, sums, min/max, approx sketches — anything
    that partial-aggregates; no distinct/percentile exact forms)."""
    if not metrics:
        metrics = {"n_rows": F.count(F.lit(1))}
    obs = Observation(name) if name else Observation()
    return df.observe(obs, *[c.alias(k) for k, c in metrics.items()]), obs

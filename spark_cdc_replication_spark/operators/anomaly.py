"""Metric anomaly detection ([EXT]): flag per-group outlier
observations by z-score — pipeline monitoring over the engine's own
outputs (daily event volumes, per-source ingest counts, rollup
deltas).

The whole test runs in EXACT INTEGER arithmetic.  For integer
observations x with per-group count n (NULLs excluded), sum S = Σx
and sum of squares Q = Σx², the sample z-score satisfies

    z² = (x·n − S)² · (n−1) / ( n · (n·Q − S²) )

so |z| > t iff

    (x·n − S)² · (n−1)  >  t² · n · (n·Q − S²)

— both sides are products of BIGINTs (no mean, no stddev, no float
division), so the decision is bit-identical in every engine and safely
oracle-hashable, where a ``stddev_samp``-based formulation depends on
float summation order.  (An earlier draft omitted the ``n`` on the
right-hand side, silently testing |z| > t/√n — caught by code review,
now pinned by a regression test with a value in exactly that band.)
Groups with n < 2 or zero variance flag nothing (zero variance forces
x = mean, making both sides 0).

Scale shape: one groupBy for (n, S, Q) — map-side partials — joined
back to the observations (AQE-governed; the per-group stats relation
is group-cardinality-bounded).  Magnitude bound: |x·n − S| ≤ n·max|x|,
so the left side stays inside int64 while n·max(x)·t ≲ 3·10⁹ — counts
of daily events per type fit for any realistic cardinality; scale the
values (e.g. thousands) past that.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zscore_outliers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    threshold: int = 3,
) -> DataFrame:
    """Rows whose integer ``value_col`` is more than ``threshold``
    sample standard deviations from its group mean — decided by the
    exact integer inequality above.  Returns the flagged input rows
    (every column preserved)."""
    stats = df.groupBy(*group_cols).agg(
        # count(col), not count(*): a NULL observation must not enter
        # n while being skipped by the sums (it can't flag either way —
        # its deviation is NULL — but it would poison the variance).
        F.count(F.col(value_col)).alias("__n"),
        F.sum(F.col(value_col).cast("long")).alias("__s"),
        F.sum((F.col(value_col).cast("long")) * F.col(value_col).cast("long")).alias(
            "__q"
        ),
    )
    joined = df.join(stats, on=list(group_cols))
    x = F.col(value_col).cast("long")
    dev = x * F.col("__n") - F.col("__s")
    lhs = dev * dev * (F.col("__n") - 1)
    rhs = (
        F.lit(int(threshold) * int(threshold))
        * F.col("__n")
        * (F.col("__n") * F.col("__q") - F.col("__s") * F.col("__s"))
    )
    return joined.filter((F.col("__n") >= 2) & (lhs > rhs)).drop(
        "__n", "__s", "__q"
    )

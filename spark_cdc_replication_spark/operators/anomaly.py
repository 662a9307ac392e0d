"""Metric anomaly detection ([EXT]): flag per-group outlier
observations by z-score — pipeline monitoring over the engine's own
outputs (daily event volumes, per-source ingest counts, rollup
deltas).

The whole test runs in EXACT arithmetic.  For integer observations x
with per-group count n (NULLs excluded), sum S = Σx and sum of
squares Q = Σx², the sample z-score satisfies

    z² = (x·n − S)² · (n−1) / ( n · (n·Q − S²) )

so |z| > t, for a rational threshold t = p/q, iff

    q² · (x·n − S)² · (n−1)  >  p² · n · (n·Q − S²)

— both sides are products of exact integers (no mean, no stddev, no
float division), so the decision is bit-identical in every engine and
safely oracle-hashable, where a ``stddev_samp``-based formulation
depends on float summation order.  (An earlier draft omitted the ``n``
on the right-hand side, silently testing |z| > t/√n — caught by code
review, now pinned by a regression test with a value in exactly that
band.)  Groups with n < 2 or zero variance flag nothing (zero variance
forces x = mean, making both sides 0).

Overflow envelope: S, Q, and every product are evaluated in
``decimal(38,0)`` — Spark's maximum exact precision — never in
wrapping int64, because the int64 envelope is far too small for the
squared terms: dev² · (n−1) reaches (n·max|x|)²·(n−1), which wraps
int64 silently in non-ANSI mode for inputs as mundane as a year of
hourly counts in the millions (n·max|x| = 10⁹ overflows at n ≥ 10).
In decimal(38,0) the binding constraint is the right-hand side
p²·n·(n·Q − S²) ≤ p²·n³·max(x)² < 10³⁸ — e.g. t = 3, n = 10⁶ admits
max|x| up to ~3·10⁹, nine orders of magnitude beyond the old bound.
A product that still exceeds 38 digits raises under ANSI mode and
becomes NULL otherwise; NULL comparisons flag nothing, so the
operator fails closed rather than flipping decisions.

Scale shape: one groupBy for (n, S, Q) — map-side partials — joined
back to the observations (AQE-governed; the per-group stats relation
is group-cardinality-bounded).
"""

from __future__ import annotations

from fractions import Fraction
from typing import Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: decimal(38,0) — Spark's widest exact integer type; all inequality
#: products are evaluated here, never in wrapping int64.
_DEC = "decimal(38,0)"


def _threshold_ratio(threshold: Union[int, float, Fraction]) -> tuple[int, int]:
    """Exact (p, q) with threshold = p/q, q > 0.

    Floats convert exactly (2.5 → 5/2); a float whose exact binary
    expansion needs a huge denominator (0.1 → .../2⁵⁵) would silently
    blow the decimal envelope when squared, so it is rejected — pass a
    ``Fraction`` to state the intended rational explicitly.
    """
    frac = Fraction(threshold)
    if frac <= 0:
        raise ValueError(f"threshold must be positive, got {threshold!r}")
    if frac.denominator > 10**6:
        raise ValueError(
            f"threshold {threshold!r} is not exactly representable as a "
            "small rational (denominator {frac.denominator}); pass e.g. "
            "Fraction(1, 10) instead of 0.1"
        )
    return frac.numerator, frac.denominator


def zscore_outliers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    threshold: Union[int, float, Fraction] = 3,
) -> DataFrame:
    """Rows whose integer ``value_col`` is more than ``threshold``
    sample standard deviations from its group mean — decided by the
    exact inequality above.  ``threshold`` may be any positive rational
    (int, exactly-representable float like 2.5, or ``Fraction``);
    non-representable floats raise instead of being truncated.
    Returns the flagged input rows (every column preserved)."""
    p, q = _threshold_ratio(threshold)
    stats = df.groupBy(*group_cols).agg(
        # count(col), not count(*): a NULL observation must not enter
        # n while being skipped by the sums (it can't flag either way —
        # its deviation is NULL — but it would poison the variance).
        F.count(F.col(value_col)).alias("__n"),
        # S and Q summed in decimal(38,0) — Σx² wraps (or, under ANSI,
        # raises from) int64 for |x| ≥ ~10⁹ at modest n.
        F.sum(F.col(value_col).cast(_DEC)).alias("__s"),
        F.sum(F.col(value_col).cast(_DEC) * F.col(value_col).cast(_DEC)).alias("__q"),
    )
    joined = df.join(stats, on=list(group_cols))
    x = F.col(value_col).cast(_DEC)
    n = F.col("__n").cast(_DEC)
    s = F.col("__s").cast(_DEC)
    qq = F.col("__q").cast(_DEC)
    dev = x * n - s
    lhs = F.lit(q * q).cast(_DEC) * dev * dev * (n - F.lit(1).cast(_DEC))
    rhs = F.lit(p * p).cast(_DEC) * n * (n * qq - s * s)
    return joined.filter((F.col("__n") >= 2) & (lhs > rhs)).drop(
        "__n", "__s", "__q"
    )

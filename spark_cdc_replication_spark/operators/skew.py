"""Skew and co-location tools: salted joins and bucketed tables.

The reference handles physical layout manually (pinned shuffle widths,
forced broadcasts — SURVEY.md §4); at 100 TB the two structural tools
that matter beyond AQE are:

* **Salted join** — when one join key carries a disproportionate share
  of rows (a hot customer, a null-heavy foreign key), AQE's skew-join
  split only helps sort-merge stages it can see; salting rewrites the
  join itself so the hot key spreads over ``n_salts`` reducers.
* **Bucketed tables** — pre-shuffling both sides of a recurring join
  into the same bucket layout makes every future join on that key
  exchange-free (the scan IS the shuffle, paid once at write time).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    n_salts: int = 16,
    deterministic: bool = False,
) -> DataFrame:
    """Equi-join where ``skewed``'s hot keys are spread over
    ``n_salts`` sub-partitions.

    Each skewed row gets a salt from a per-partition row counter
    (``monotonically_increasing_id() % n_salts``), NOT a row-content
    hash: the archetypal hot key (a null-FK default row, a sentinel
    value) repeats BYTE-IDENTICALLY, and content-hash salting would
    send every copy to the same salt — one reducer, exactly the
    hotspot salting exists to break.  The counter spreads identical
    rows uniformly.  ``deterministic=True`` switches to the full-row
    hash variant, whose salt assignment is stable across runs and
    input re-orderings (useful for plan-diffing tests) but MUST NOT be
    used when hot rows can be identical.

    ``other`` is replicated ``n_salts`` times (explode of a literal
    range — cheap when ``other`` is the smaller side, which is the
    case worth salting).  Join keys become ``on + [salt]``, so one hot
    key lands on ``n_salts`` reducers instead of one.

    Semantics preserved for ``inner`` and ``left`` joins (every skewed
    row appears exactly once per matching other-row, as in the plain
    join) — the salt only routes rows, it never filters them.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner|left, got {how!r}")
    on = list(on)
    if deterministic:
        salt = F.pmod(F.hash(*[F.col(c) for c in skewed.columns]), F.lit(n_salts))
    else:
        salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    left = skewed.withColumn(_SALT, salt)
    right = other.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return left.join(right, on=on + [_SALT], how=how).drop(_SALT)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist ``df`` hash-bucketed (and sorted) by ``bucket_cols``.

    Joins/aggregations between tables bucketed identically on the join
    key read co-located buckets — zero Exchange in the plan (asserted
    in tests/test_plans.py).  This is the pay-once answer to the
    reference's per-run shuffle of the full snapshot.
    """
    writer = df.write.bucketBy(num_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.mode("overwrite").saveAsTable(table)

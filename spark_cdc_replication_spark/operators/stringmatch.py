"""Approximate string matching ([EXT] — no reference counterpart):
blocked fuzzy join for entity resolution (dirty dimension keys,
free-text product/vendor names, OCR'd identifiers).

``fuzzy_join`` is the edit-distance sibling of
``dedup.embedding_cosine_dups``: a user-supplied BLOCKING expression
keeps the join from being all-pairs, and the native ``levenshtein``
(JVM-side, with Spark's early-exit threshold form) verifies inside
each block.

Scale shape:

* the only shuffle is the equi-join on the block key; block
  cardinality governs parallelism and hot blocks are ordinary join
  skew (AQE skew-join splitting, or pre-salt with
  ``operators/skew.salted_join``);
* a length-difference prefilter prunes pairs before the O(len²)
  edit-distance kernel runs (|len(a) - len(b)| is a lower bound on
  Levenshtein), and the threshold form abandons a pair as soon as the
  running distance exceeds ``max_distance``;
* recall contract, stated honestly: a typo that CHANGES the blocking
  value (default: the first whitespace token) is missed — pick the
  block to be the stable part of the key (leading token, sorted token
  signature, phonetic code).  Within a block, matching is exact
  edit-distance: no candidate inside the block is ever missed.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def first_token(c: Column) -> Column:
    """Default blocking key: the first whitespace-delimited token."""
    return F.split(F.trim(c), " ").getItem(0)


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_distance: int = 2,
    block: Callable[[Column], Column] = first_token,
    dist_col: str = "distance",
) -> DataFrame:
    """All (left, right) row pairs whose strings are within
    ``max_distance`` Levenshtein edits AND share a blocking key.
    Output: every column of both inputs plus ``dist_col`` (column
    names must not collide — rename upstream, as with any join).
    """
    lb = left.withColumn("__blk", block(F.col(left_col)))
    rb = right.withColumn("__blk", block(F.col(right_col)))
    pairs = lb.join(rb, on="__blk").filter(
        F.abs(F.length(left_col) - F.length(right_col)) <= max_distance
    )
    d = F.levenshtein(F.col(left_col), F.col(right_col), max_distance)
    return (
        pairs.withColumn(dist_col, d)
        .filter(F.col(dist_col) >= 0)  # threshold form: -1 = exceeded
        .drop("__blk")
    )

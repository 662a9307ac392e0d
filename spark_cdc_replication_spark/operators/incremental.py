"""Incremental materialized-aggregate maintenance over CDC batches
([EXT] — the reference recomputes consumers from full snapshots; see
``/root/reference/pipelines/history_data_handler.py:111-141``, which
rebuilds the whole history table every merge and leaves any downstream
aggregate to be re-derived from scratch).

``maintain_rollup`` folds ONE parsed CDC batch into an additive rollup
(per-dimension row count + column sums over the *current snapshot
state*) without rescanning the snapshot's untouched keys:

    new_rollup = rollup  ⊎  agg(new state of touched keys)
                         ⊖  agg(old state of touched keys)

where ⊎/⊖ are signed additive merges.  This is classic incremental
view maintenance (counting algorithm; Gupta & Mumick, "Maintenance of
Materialized Views: Problems, Techniques, and Applications", IEEE Data
Eng. Bull. 1995) restricted to the distributive aggregates (COUNT,
SUM) that admit exact deltas.

Scale shape (SCALE.md "incremental rollup"):

* the snapshot is touched ONLY through one semi-join on the batch's
  key set — AQE broadcasts it when the batch is small, so the
  snapshot side is shuffle-free and O(history) work never happens;
* both delta aggregates are map-side-partial ``groupBy`` over
  batch-sized inputs;
* the rollup table itself is dimension-cardinality-bounded, so the
  final merge aggregate is tiny regardless of fact size;
* a delete that empties a dimension group removes the group (strictly
  positive live-row count filter), matching a from-scratch GROUP BY
  over the post-merge snapshot exactly.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .merge import apply_changes


def _sum_alias(c: str) -> str:
    return f"sum_{c}"


def additive_rollup(
    state: DataFrame,
    dims: Sequence[str],
    sum_cols: Sequence[str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Materialize the rollup of a snapshot: per-``dims`` live-row
    count plus ``SUM`` of each ``sum_cols`` column.  The output shape
    is the maintenance contract: ``maintain_rollup`` folds batches
    into exactly this frame."""
    return state.groupBy(*dims).agg(
        F.count(F.lit(1)).alias(count_col),
        *[F.sum(c).alias(_sum_alias(c)) for c in sum_cols],
    )


def rollup_delta(
    old_state: DataFrame,
    new_state: DataFrame,
    dims: Sequence[str],
    sum_cols: Sequence[str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Signed additive delta between two states of the SAME key set:
    +1 per new-state row, -1 per old-state row, sums likewise signed.
    NULL measure values contribute nothing in either direction (SQL
    SUM ignores NULLs), so a NULL->value update adds exactly the new
    value and a value->NULL update retracts exactly the old one."""

    def signed(state: DataFrame, sign: int) -> DataFrame:
        return state.groupBy(*dims).agg(
            F.sum(F.lit(sign)).alias(count_col),
            *[F.sum(F.col(c) * sign).alias(_sum_alias(c)) for c in sum_cols],
        )

    return signed(new_state, 1).unionByName(signed(old_state, -1))


def maintain_rollup(
    rollup: DataFrame,
    snapshot: DataFrame,
    changes: DataFrame,
    primary_keys: Sequence[str],
    order_by: Sequence[str],
    dims: Sequence[str],
    sum_cols: Sequence[str],
    count_col: str = "n_rows",
    policy: str = "lww",
    broadcast_keys: bool | None = None,
) -> DataFrame:
    """Fold one parsed CDC batch into an additive rollup.

    ``rollup`` must be the ``additive_rollup`` of ``snapshot`` (the
    pre-batch state); the result is the ``additive_rollup`` of the
    post-batch snapshot — without computing that snapshot.  Invariant
    (property-tested in ``tests/test_incremental_rollup.py``):

        maintain_rollup(additive_rollup(S), S, B)
            == additive_rollup(merge_snapshot(S, B))

    ``broadcast_keys`` mirrors ``merge_snapshot``: default lets AQE
    decide; pass ``True`` only for provably-bounded batch key sets
    (same driver-OOM argument as ``operators/merge.py``)."""
    touched = changes.select(*primary_keys).dropDuplicates(list(primary_keys))
    if broadcast_keys:
        touched = F.broadcast(touched)
    # Old contribution: ONLY the touched keys' current rows leave the
    # snapshot scan (semi-join; with a parquet snapshot this is also
    # the scan DPP/runtime-filters can prune).
    old_state = snapshot.join(touched, on=list(primary_keys), how="left_semi")
    # New contribution: the batch folds to the touched keys' new state
    # on its own — CDC envelopes carry full row images, so no second
    # snapshot read is needed.  A key whose latest op is a delete
    # simply has no new-state row (pure retraction).
    new_state = apply_changes(changes, primary_keys, order_by, policy=policy)

    delta = rollup_delta(old_state, new_state, dims, sum_cols, count_col)
    merged = rollup.unionByName(delta).groupBy(*dims).agg(
        F.sum(count_col).alias(count_col),
        *[F.sum(_sum_alias(c)).alias(_sum_alias(c)) for c in sum_cols],
    )
    # A group whose live-row count reaches zero has no rows in the
    # post-merge snapshot: drop it (its sums are zero up to float
    # residue, which must not resurrect the group).
    return merged.filter(F.col(count_col) > 0)

"""Snapshot merge algebra — the engine's core.

The reference's merge (``/root/reference/pipelines/daily_data_handler.py:75-109``,
``history_data_handler.py:111-141,159-167``) is, in SQL terms
(SURVEY.md §3.3):

    latest  = row_number() OVER (PARTITION BY pk ORDER BY ts DESC) = 1
    new     = (snapshot ANTI JOIN (deletes UNION update_keys) ON pk)
              UNION inserts UNION latest_updates, then full-row DISTINCT

We re-express it with three deliberate fixes (SURVEY.md §7 "what's
hard"):

1. **Deterministic tie-break** — the reference orders only by the ingest
   timestamp (``daily_data_handler.py:107``), nondeterministic on equal
   timestamps.  Callers pass extra ``order_by`` columns (e.g. an event
   id / Kafka offset).
2. **Uniform last-writer-wins across ALL ops** — in the reference, a key
   created and then updated in the same batch contributes BOTH rows
   (inserts are unioned un-windowed next to the windowed updates,
   ``daily_data_handler.py:97-102``), leaving duplicate keys.  Here the
   window runs over the whole batch including deletes, so exactly one
   change per key survives and a trailing delete wins.
3. **No unconditional broadcast** — the reference force-broadcasts the
   touched-key set (``daily_data_handler.py:90``) with auto-broadcast
   globally off (``history_load.py:40``).  At 100 TB an unbounded
   update-key broadcast is a driver OOM.  Default here: no hint, AQE
   picks broadcast at runtime when the batch side is actually small;
   ``broadcast_keys=True`` opts back in for provably-bounded key sets.

Scale notes: the only shuffles are (a) the window over ``pk`` on the
*batch* (small relative to the snapshot) and (b) the anti-join, which
AQE turns into a broadcast join whenever the deduped batch fits —
making the snapshot side shuffle-free.  Full-row ``dropDuplicates()``
over the merged snapshot (``daily_data_handler.py:101``) is dropped:
anti-join disjointness already guarantees key-uniqueness, so we don't
pay a whole-snapshot shuffle every merge.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..schemas import DELETE_OP, META_COLS, OP_COL


def _order_desc(order_by: Sequence[str]):
    return [F.col(c).desc_nulls_last() for c in order_by]


def latest_per_key(
    df: DataFrame, primary_keys: Sequence[str], order_by: Sequence[str]
) -> DataFrame:
    """W1: keep the newest row per key (last-writer-wins).

    ``row_number() OVER (PARTITION BY pk ORDER BY order_by DESC)``,
    keep rank 1 (``daily_data_handler.py:106-109``) — with the full
    ``order_by`` list as deterministic tie-break.
    """
    w = Window.partitionBy(*primary_keys).orderBy(*_order_desc(order_by))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def coalesce_updates(
    df: DataFrame, primary_keys: Sequence[str], order_by: Sequence[str]
) -> DataFrame:
    """A1 done right: column-wise latest-non-null per key.

    The reference's dead ``_coalesce_updates``
    (``daily_data_handler.py:111-114``) used ``groupBy + first(
    ignorenulls)`` whose result depends on partition arrival order.
    Here: ``last(col, ignorenulls=True)`` over an ordered full-frame
    window — deterministic, and the right semantics for partial-update
    CDC feeds where each update carries only changed columns.
    """
    w = (
        Window.partitionBy(*primary_keys)
        .orderBy(*[F.col(c).asc_nulls_first() for c in order_by])
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    value_cols = [c for c in df.columns if c not in primary_keys]
    coalesced = df.select(
        *primary_keys,
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
    )
    # After the full-frame window every row of a key is identical.
    return coalesced.dropDuplicates(list(primary_keys))


def apply_changes(
    changes: DataFrame,
    primary_keys: Sequence[str],
    order_by: Sequence[str],
    policy: str = "lww",
) -> DataFrame:
    """Fold a change batch into its end-state (merge into an empty
    snapshot): one row per key = the latest change, keys whose latest
    op is a delete disappear, meta columns dropped.
    """
    if policy == "coalesce":
        # Latest op decides liveness; columns coalesce independently.
        folded = coalesce_updates(changes, primary_keys, order_by)
    else:
        folded = latest_per_key(changes, primary_keys, order_by)
    if OP_COL in folded.columns:
        folded = folded.filter(F.col(OP_COL) != DELETE_OP)
    return folded.drop(*[c for c in META_COLS if c in folded.columns])


def merge_snapshot(
    snapshot: DataFrame,
    changes: DataFrame,
    primary_keys: Sequence[str],
    order_by: Sequence[str],
    policy: str = "lww",
    broadcast_keys: bool | None = None,
) -> DataFrame:
    """J1 + U1: merge a parsed change batch into an existing snapshot.

    ``survivors = snapshot ANTI JOIN touched_keys; new = survivors
    UNION BY NAME upserts`` (reference algebra at
    ``daily_data_handler.py:88-102``, ``history_data_handler.py:124-138``,
    broadcast hint at ``daily_data_handler.py:90``).

    ``unionByName`` replaces the reference's positional union +
    column-order select dance (P2/U1, ``daily_data_handler.py:99-100``).

    NULL primary keys: SQL join semantics — a null key matches nothing,
    so a null-keyed snapshot row always survives and a null-keyed
    change always appends (it can never overwrite).  Repeated null-key
    changes therefore ACCUMULATE; CDC upstreams must guarantee non-null
    keys (pinned by ``test_merge_null_pk_rows_accumulate_not_overwrite``).
    """
    upserts = apply_changes(changes, primary_keys, order_by, policy=policy)
    touched = changes.select(*primary_keys).dropDuplicates(list(primary_keys))
    if broadcast_keys:
        touched = F.broadcast(touched)
    survivors = snapshot.join(touched, on=list(primary_keys), how="left_anti")
    return survivors.unionByName(
        upserts.select(*snapshot.columns)
        if set(upserts.columns) == set(snapshot.columns)
        else upserts,
        allowMissingColumns=True,
    )


def increment_append(
    changes: DataFrame,
    primary_keys: Sequence[str] | None = None,
    order_by: Sequence[str] = (),
) -> DataFrame:
    """Increment mode: dedup the batch, no merge
    (``history_data_handler.py:143-157``).

    Default is full-row ``dropDuplicates`` like the reference (K5).
    Passing ``primary_keys`` scopes the dedup to ``pk + order_by`` —
    at 100 TB the full-row hash shuffles every payload byte, while the
    key-scoped form shuffles only keys (same result whenever a
    (key, ts) pair uniquely identifies a change, which CDC guarantees).
    NOT reproduced: the reference's ``coalesce(1)`` (X2), which
    serializes the entire write through one task.
    """
    if primary_keys:
        return changes.dropDuplicates(list(primary_keys) + list(order_by))
    return changes.dropDuplicates()


__all__ = [
    "latest_per_key",
    "coalesce_updates",
    "apply_changes",
    "merge_snapshot",
    "increment_append",
]

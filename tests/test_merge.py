"""Merge-algebra unit tests — the SURVEY.md §5.2 edge cases."""

from __future__ import annotations

import pytest

from spark_cdc_replication_spark.operators.merge import (
    apply_changes,
    coalesce_updates,
    latest_per_key,
    merge_snapshot,
)

COLS = "id string, timestamp int, event_id int, v string, __op string"


def rows_of(df):
    return {tuple(r) for r in df.collect()}


def changes(spark, data):
    return spark.createDataFrame(data, COLS)


PK = ["id"]
ORDER = ["timestamp", "event_id"]


def test_lww_keeps_newest(spark):
    df = changes(spark, [("a", 1, 1, "old", "c"), ("a", 2, 2, "new", "u")])
    out = apply_changes(df, PK, ORDER)
    assert rows_of(out) == {("a", 2, 2, "new")}


def test_delete_wins_when_latest(spark):
    df = changes(
        spark,
        [("a", 1, 1, "x", "c"), ("a", 2, 2, "y", "u"), ("a", 3, 3, None, "d")],
    )
    assert apply_changes(df, PK, ORDER).count() == 0


def test_update_after_delete_resurrects(spark):
    df = changes(spark, [("a", 1, 1, None, "d"), ("a", 2, 2, "back", "u")])
    assert rows_of(apply_changes(df, PK, ORDER)) == {("a", 2, 2, "back")}


def test_delete_of_never_seen_key_is_noop(spark):
    snapshot = changes(spark, [("a", 1, 1, "x", "c")])
    snapshot = apply_changes(snapshot, PK, ORDER)
    batch = changes(spark, [("ghost", 5, 5, None, "d")])
    out = merge_snapshot(snapshot, batch, PK, ORDER)
    assert rows_of(out) == {("a", 1, 1, "x")}


def test_insert_update_delete_same_batch(spark):
    df = changes(
        spark,
        [("a", 1, 1, "x", "c"), ("a", 2, 2, "y", "u"), ("a", 3, 3, None, "d"),
         ("b", 1, 4, "keep", "c")],
    )
    assert rows_of(apply_changes(df, PK, ORDER)) == {("b", 1, 4, "keep")}


def test_create_then_update_same_batch_single_row(spark):
    """The reference would emit BOTH rows here (un-windowed inserts,
    daily_data_handler.py:97-102); we assert the fixed semantics."""
    df = changes(spark, [("a", 1, 1, "x", "c"), ("a", 2, 2, "y", "u")])
    out = apply_changes(df, PK, ORDER)
    assert out.count() == 1
    assert rows_of(out) == {("a", 2, 2, "y")}


def test_tiebreak_on_equal_timestamp_is_deterministic(spark):
    df = changes(spark, [("a", 1, 1, "first", "u"), ("a", 1, 2, "second", "u")])
    for _ in range(3):
        assert rows_of(apply_changes(df, PK, ORDER)) == {("a", 1, 2, "second")}


def test_duplicate_identical_events(spark):
    df = changes(spark, [("a", 1, 1, "x", "c"), ("a", 1, 1, "x", "c")])
    assert apply_changes(df, PK, ORDER).count() == 1


def test_empty_batch_merge_is_identity(spark):
    snapshot = apply_changes(changes(spark, [("a", 1, 1, "x", "c")]), PK, ORDER)
    empty = changes(spark, []).filter("1=0")
    out = merge_snapshot(snapshot, empty, PK, ORDER)
    assert rows_of(out) == rows_of(snapshot)


def test_merge_equals_global_fold(spark):
    """Incremental (day-by-day) merging == one-shot fold (§3.3)."""
    log = [
        ("a", 1, 1, "a1", "c"), ("b", 1, 2, "b1", "c"),
        ("a", 2, 3, "a2", "u"), ("c", 2, 4, None, "d"),
        ("b", 3, 5, None, "d"), ("c", 3, 6, "c1", "u"),
        ("a", 4, 7, None, "d"), ("d", 4, 8, "d1", "r"),
    ]
    full = changes(spark, log)
    folded = apply_changes(full, PK, ORDER)
    snap = apply_changes(full.filter("timestamp <= 2"), PK, ORDER)
    merged = merge_snapshot(snap, full.filter("timestamp > 2"), PK, ORDER)
    assert rows_of(merged) == rows_of(folded)


def test_coalesce_policy_fills_partial_updates(spark):
    df = changes(
        spark,
        [("a", 1, 1, "v1", "c"), ("a", 2, 2, None, "u"), ("a", 3, 3, None, "u")],
    )
    out = coalesce_updates(df.drop("__op"), PK, ORDER)
    assert rows_of(out) == {("a", 3, 3, "v1")}


def test_latest_per_key_multiple_keys(spark):
    df = changes(
        spark,
        [("a", 1, 1, "x", "c"), ("a", 5, 2, "y", "u"),
         ("b", 9, 3, "p", "c"), ("b", 2, 4, "q", "u")],
    )
    out = latest_per_key(df, PK, ORDER)
    assert rows_of(out.select("id", "v")) == {("a", "y"), ("b", "p")}


def test_merge_null_pk_rows_accumulate_not_overwrite(spark):
    """SQL join semantics: a NULL key matches nothing — a null-keyed
    snapshot row always survives, a null-keyed change always appends.
    Pinned so the data-loss-vs-accumulation behavior is explicit (CDC
    upstreams must guarantee non-null keys; see merge_snapshot doc)."""
    snapshot = spark.createDataFrame(
        [(None, 0, 0, "snap"), ("a", 0, 0, "a0")], "id string, timestamp int, event_id int, v string"
    )
    batch = changes(
        spark,
        [(None, 5, 5, "chg", "u"), ("a", 5, 5, "a5", "u")],
    )
    out = merge_snapshot(snapshot, batch, PK, ORDER)
    got = rows_of(out)
    # keyed row overwritten; BOTH null-key rows present
    assert ("a", 5, 5, "a5") in got
    assert ("a", 0, 0, "a0") not in got
    assert (None, 0, 0, "snap") in got
    assert (None, 5, 5, "chg") in got
    assert len(got) == 3


def test_merge_schema_evolution_new_column_nulls_old_rows(spark):
    """Changes carrying a NEW payload column merge via unionByName
    (allowMissingColumns): surviving snapshot rows get NULL for it —
    additive schema evolution without rewriting the snapshot."""
    snapshot = spark.createDataFrame(
        [("a", 0, 0, "a0"), ("b", 0, 0, "b0")],
        "id string, timestamp int, event_id int, v string",
    )
    batch = spark.createDataFrame(
        [("a", 5, 5, "a5", "extra", "u")],
        "id string, timestamp int, event_id int, v string, w string, __op string",
    )
    out = merge_snapshot(snapshot, batch, PK, ORDER)
    got = {r.id: (r.v, r.w) for r in out.collect()}
    assert got == {"a": ("a5", "extra"), "b": ("b0", None)}

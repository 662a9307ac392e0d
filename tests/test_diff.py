"""table_diff classification edge cases: presence with all-null
payload, null-vs-value as change, null-vs-null as no change."""

from __future__ import annotations

from spark_cdc_replication_spark.operators.diff import table_diff


def test_table_diff_classification(spark):
    left = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", None), ("d", 4), ("e", None)],
        "k string, v int",
    )
    right = spark.createDataFrame(
        [("a", 1), ("b", 3), ("c", None), ("e", 5), ("f", 6)],
        "k string, v int",
    )
    out = {r.k: r.diff_status for r in table_diff(left, right, ["k"], ["v"]).collect()}
    assert out == {
        "a": "unchanged",  # equal values
        "b": "changed",    # 2 -> 3
        "c": "unchanged",  # null == null (eqNullSafe)
        "d": "removed",    # left only
        "e": "changed",    # null -> 5
        "f": "added",      # right only — present even if v were null
    }

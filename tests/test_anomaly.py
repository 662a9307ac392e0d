"""Exact-integer z-score outliers (operators/anomaly.py)."""

from __future__ import annotations

import statistics

from spark_cdc_replication_spark.operators.anomaly import zscore_outliers


def _df(spark, groups):
    rows = [(g, i, v) for g, vals in groups.items() for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "g string, i long, v long")


def test_matches_float_zscore_model(spark):
    # NB: the outlier inflates its own group's stdev, so z is bounded
    # by ~sqrt(n) — series must be long enough for a 3-sigma flag.
    groups = {
        "a": [10] * 10 + [11, 9] * 5 + [50],    # 50 is a blowout (z ~ 4.4)
        "b": [5, 5, 5, 5, 5],                   # zero variance: nothing flags
        "c": [100],                             # n < 2: nothing flags
        "d": [0] * 15 + [1],                    # small bump (z ~ 3.75)
        # regression for the missing-factor-n draft: 25 sits at
        # z ~ 1.85 — inside (t/sqrt(n), t], exactly the band the wrong
        # inequality (x*n-S)^2*(n-1) > t^2*(n*Q-S^2) misflags.
        "e": [10] * 20 + [25, 40],
    }
    got = {
        (r.g, r.i)
        for r in zscore_outliers(_df(spark, groups), ["g"], "v", threshold=3).collect()
    }
    expected = set()
    for g, vals in groups.items():
        if len(vals) < 2:
            continue
        mu = statistics.mean(vals)
        sd = statistics.stdev(vals)
        for i, v in enumerate(vals):
            if sd > 0 and abs(v - mu) / sd > 3:
                expected.add((g, i))
    assert got == expected and ("a", 20) in got and ("d", 15) in got
    # group e: 40 (z~3.99) flags, 25 (z~1.85) must NOT
    assert ("e", 21) in got and ("e", 20) not in got


def test_threshold_monotone_and_columns_preserved(spark):
    groups = {"a": [10] * 20 + [25, 40]}
    df = _df(spark, groups)
    t2 = {(r.g, r.i) for r in zscore_outliers(df, ["g"], "v", threshold=2).collect()}
    t3 = {(r.g, r.i) for r in zscore_outliers(df, ["g"], "v", threshold=3).collect()}
    assert t3 <= t2
    out = zscore_outliers(df, ["g"], "v")
    assert out.columns == df.columns

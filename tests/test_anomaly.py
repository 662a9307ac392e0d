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


def test_large_values_do_not_wrap_int64(spark):
    # dev^2*(n-1) reaches ~1.6e21 here — far past int64 — so the old
    # long-arithmetic formulation wrapped silently and flipped the
    # decision; the decimal(38,0) path must flag exactly the blowout.
    base = 10**9
    groups = {"a": [base] * 11 + [2 * base]}   # z ~ 3.18 for the 2e9
    mu = statistics.mean(groups["a"])
    sd = statistics.stdev(groups["a"])
    assert abs(2 * base - mu) / sd > 3          # the float model agrees
    got = {
        (r.g, r.i)
        for r in zscore_outliers(_df(spark, groups), ["g"], "v", threshold=3).collect()
    }
    assert got == {("a", 11)}


def test_fractional_threshold_exact_not_truncated(spark):
    # "e": 25 sits at z ~ 1.85: below t=2.5 but above t=2 — so if 2.5
    # were truncated to 2 (the old int(threshold)) it would misflag.
    groups = {"e": [10] * 20 + [25, 40]}
    df = _df(spark, groups)
    got = {(r.g, r.i) for r in zscore_outliers(df, ["g"], "v", threshold=2.5).collect()}
    assert got == {("e", 21)}                   # only the 40 (z ~ 3.99)
    frac = {
        (r.g, r.i)
        for r in zscore_outliers(
            df, ["g"], "v", threshold=__import__("fractions").Fraction(5, 2)
        ).collect()
    }
    assert frac == got


def test_unrepresentable_float_threshold_rejected(spark):
    import pytest

    df = _df(spark, {"a": [1, 2, 3]})
    with pytest.raises(ValueError, match="Fraction"):
        zscore_outliers(df, ["g"], "v", threshold=0.1)
    with pytest.raises(ValueError, match="positive"):
        zscore_outliers(df, ["g"], "v", threshold=0)

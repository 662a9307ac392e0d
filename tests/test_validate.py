"""Data-quality validation (operators/validate.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_cdc_replication_spark.operators.validate import (
    check_foreign_key,
    check_rows,
    check_unique,
    validate,
)


def _facts(spark):
    rows = [
        (1, 10, 5.0),
        (2, 10, -1.0),   # negative amount
        (2, 20, 3.0),    # duplicate id
        (3, 99, 2.0),    # orphan dim key
        (4, None, 0.0),  # NULL fk: not an orphan by contract
    ]
    return spark.createDataFrame(rows, "id long, dim_id long, amount double")


def _dim(spark):
    return spark.createDataFrame([(10,), (20,)], "k long")


def test_row_rules_one_pass(spark):
    out = check_rows(
        _facts(spark),
        [
            ("amount_nonneg", F.col("amount") < 0),
            ("dim_not_null", F.col("dim_id").isNull()),
        ],
    )
    got = {r.rule: r.violations for r in out.collect()}
    assert got == {"amount_nonneg": 1, "dim_not_null": 1}
    # one scan: a single Aggregate over the relation
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") == 1


def test_unique_and_fk(spark):
    uniq = check_unique(_facts(spark), ["id"]).collect()[0]
    assert (uniq.rule, uniq.violations) == ("unique(id)", 1)
    fk = check_foreign_key(_facts(spark), ["dim_id"], _dim(spark), ["k"]).collect()[0]
    assert (fk.rule, fk.violations) == ("fk(dim_id)", 1)  # only id=3; NULL excluded


def test_validate_composes_and_requires_rules(spark):
    out = validate(
        _facts(spark),
        row_rules=[("amount_nonneg", F.col("amount") < 0)],
        unique_keys=[["id"]],
        foreign_keys=[(["dim_id"], _dim(spark), ["k"])],
    )
    got = {r.rule: r.violations for r in out.collect()}
    assert got == {"amount_nonneg": 1, "unique(id)": 1, "fk(dim_id)": 1}
    with pytest.raises(ValueError):
        validate(_facts(spark))


def test_drift_report_psi_terms(spark):
    """operators/validate.py::drift_report: shares are Laplace-smoothed
    over the category union (single-cohort categories finite), both
    share columns sum to ~1, psi_term sign tracks direction, and a
    shifted cohort's |PSI| dwarfs an identical one's."""
    from spark_cdc_replication_spark.operators.validate import drift_report

    a = spark.createDataFrame(
        [(i, "x" if i < 80 else "y") for i in range(100)], "id long, c string"
    )
    b_same = spark.createDataFrame(
        [(i, "x" if i < 80 else "y") for i in range(100)], "id long, c string"
    )
    b_shift = spark.createDataFrame(
        [(i, "x" if i < 20 else ("y" if i < 90 else "z")) for i in range(100)],
        "id long, c string",
    )
    same = {r.category: r for r in drift_report(a, b_same, "c").collect()}
    assert set(same) == {"x", "y"}
    assert all(abs(r.psi_term) < 1e-9 for r in same.values())
    shift = {r.category: r for r in drift_report(a, b_shift, "c").collect()}
    assert set(shift) == {"x", "y", "z"}
    # z exists only in cohort b: smoothing keeps its term finite
    assert shift["z"].n_a == 0 and shift["z"].psi_term > 0
    assert shift["x"].psi_term > 0.5  # 80% -> 20% is a big shift
    for rows in (same, shift):
        assert abs(sum(r.share_a for r in rows.values()) - 1.0) < 1e-4
        assert abs(sum(r.share_b for r in rows.values()) - 1.0) < 1e-4


def test_drift_report_grouped_equals_per_group_reports(spark):
    """operators/validate.py::drift_report_grouped — each group's rows
    must equal drift_report() run on that group's cohorts alone
    (group-local shares, totals, and category count k), including a
    NULL group key and a category present in only one cohort."""
    from pyspark.sql import functions as F

    from spark_cdc_replication_spark.operators.validate import (
        drift_report,
        drift_report_grouped,
    )

    rows_a = (
        [("d1", "x")] * 7 + [("d1", "y")] * 3
        + [("d2", "x")] * 2 + [("d2", "z")] * 8
        + [(None, "x")] * 4
    )
    rows_b = (
        [("d1", "x")] * 2 + [("d1", "w")] * 5
        + [("d2", "z")] * 1
        + [(None, "x")] * 1 + [(None, "y")] * 2
    )
    a = spark.createDataFrame(rows_a, "g string, c string")
    b = spark.createDataFrame(rows_b, "g string, c string")
    got = drift_report_grouped(a, b, "c", ["g"]).collect()
    by_group = {}
    for r in got:
        by_group.setdefault(r.g, set()).add(
            (r.category, r.n_a, r.n_b, r.share_a, r.share_b, r.psi_term)
        )
    for g in ["d1", "d2", None]:
        cond = F.col("g").isNull() if g is None else (F.col("g") == g)
        want = {
            (r.category, r.n_a, r.n_b, r.share_a, r.share_b, r.psi_term)
            for r in drift_report(a.filter(cond), b.filter(cond), "c").collect()
        }
        assert by_group.get(g) == want, f"group {g!r} diverges"

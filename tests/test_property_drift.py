"""Property-based check of the drift report (operators/validate.py::
drift_report / drift_from_counts).

Invariants, for ANY pair of small categorical cohorts:

* each ``psi_term`` is >= 0 (share delta and log-ratio always share a
  sign), and 0 iff the smoothed shares are equal;
* both share columns sum to 1 (smoothing is over the category UNION);
* the report is cohort-symmetric: swapping a and b swaps (n_a, n_b)
  and (share_a, share_b) and preserves psi_term per category;
* categories present in either cohort all appear, with exact counts.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spark_cdc_replication_spark.operators.validate import drift_report

CATS = ["a", "b", "c", "d"]

cohort = st.lists(st.sampled_from(CATS), min_size=1, max_size=20)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(xs=cohort, ys=cohort)
def test_drift_report_invariants(spark, xs, ys):
    a = spark.createDataFrame([(i, v) for i, v in enumerate(xs)], "id long, c string")
    b = spark.createDataFrame([(i, v) for i, v in enumerate(ys)], "id long, c string")
    fwd = {r.category: r for r in drift_report(a, b, "c").collect()}
    rev = {r.category: r for r in drift_report(b, a, "c").collect()}

    assert set(fwd) == set(xs) | set(ys)
    from collections import Counter

    cx, cy = Counter(xs), Counter(ys)
    for cat, r in fwd.items():
        assert (r.n_a, r.n_b) == (cx.get(cat, 0), cy.get(cat, 0))
        assert r.psi_term >= 0
        if r.share_a == r.share_b:
            assert r.psi_term == 0
        s = rev[cat]
        assert (s.n_a, s.n_b) == (r.n_b, r.n_a)
        assert (s.share_a, s.share_b) == (r.share_b, r.share_a)
        # symmetric up to the 6-dp rounding of each engine-side product
        assert abs(s.psi_term - r.psi_term) <= 1e-6
    assert abs(sum(r.share_a for r in fwd.values()) - 1.0) < 1e-4
    assert abs(sum(r.share_b for r in fwd.values()) - 1.0) < 1e-4

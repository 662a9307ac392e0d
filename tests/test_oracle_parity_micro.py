"""Cross-engine parity on PLANTED micro-corpora for oracles whose
branches the driver fixture never exercises: the sf0.01 documents
table contains no bullets, ellipses, or symbol runs, so the
text_gopher_flags oracle passing at sf0.01 proves nothing about the
bullet/ellipsis/symbol regex parity between Spark and DuckDB — and
events' cohorts share every category, leaving events_drift_psi's
single-cohort coalesce branches dark.  These tests replay the EXACT
registered oracle SQL over planted rows that light every branch and
compare against the Spark operator row-for-row."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F


def _duck_rows(sql: str, **views: pd.DataFrame):
    con = duckdb.connect()
    con.execute("SET threads=2")
    for name, df in views.items():
        con.register(name, df)
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    out = []
    for row in res.df().itertuples(index=False, name=None):
        out.append(tuple(None if pd.isna(v) else v for v in row))
    return cols, set(out)


def _spark_rows(df):
    return df.columns, {tuple(r) for r in df.collect()}


GOPHER_DOCS = [
    (1, "the cat sat with all of them and that should be fine " * 5),
    (2, "too few words"),
    (3, "\n".join(["- bullet the a line of text here ok fine"] * 19 + ["plain"]) ),
    (4, "\n".join(["the a line that trails off..."] * 4 + ["a plain line here"]) ),
    (5, ("the a word " * 10) + "# ### " + "..." * 4 + " … end"),
    (6, ("12345 9876 " * 15) + "the a"),
    (7, ""),
]


def test_gopher_oracle_parity_on_planted_branches(spark):
    from spark_cdc_replication_spark.operators.textanalysis import gopher_rules
    from spark_cdc_replication_spark.workloads.llmdata import (
        ORACLE_TEXT_GOPHER_FLAGS,
    )

    sdf = spark.createDataFrame(GOPHER_DOCS, "doc_id long, text string")
    got_cols, got = _spark_rows(
        gopher_rules(sdf, min_words=50, required_stopwords=("the", "a"))
    )
    want_cols, want = _duck_rows(
        ORACLE_TEXT_GOPHER_FLAGS,
        documents=pd.DataFrame(GOPHER_DOCS, columns=["doc_id", "text"]),
    )
    assert sorted(got_cols) == sorted(want_cols)
    # align column order before comparing tuples
    order = [got_cols.index(c) for c in want_cols]
    got_aligned = {tuple(t[i] for i in order) for t in got}
    assert got_aligned == want
    # sanity: the planted corpus actually lights the dark branches
    by_id = {r.doc_id: r for r in gopher_rules(
        sdf, min_words=50, required_stopwords=("the", "a")
    ).collect()}
    assert not by_id[3].bullet_ok      # 19/20 bullet lines
    assert not by_id[4].ellipsis_ok    # 4/5 ellipsis line endings
    assert not by_id[5].symbol_ok      # '#' + '...' + unicode ellipsis
    assert not by_id[6].alpha_ok       # digit-word dominated
    assert not by_id[7].wc_ok          # empty text


DRIFT_EVENTS = [
    # cohort a (even user_id) only: "gamma"; cohort b only: "delta";
    # NULL category in BOTH cohorts — must pair up as ONE bucket
    # (null-safe join), not two spurious half-empty rows
    (0, "alpha"), (2, "alpha"), (4, "beta"), (6, "gamma"), (8, None),
    (1, "alpha"), (3, "beta"), (5, "beta"), (7, "delta"), (9, "delta"),
    (11, None),
]


def test_drift_oracle_parity_on_single_cohort_categories(spark):
    from spark_cdc_replication_spark.operators.validate import drift_report
    from spark_cdc_replication_spark.workloads.events_analytics import (
        ORACLE_EVENTS_DRIFT_PSI,
    )

    sdf = spark.createDataFrame(DRIFT_EVENTS, "user_id long, event_type string")
    got_cols, got = _spark_rows(
        drift_report(
            sdf.filter(F.col("user_id") % 2 == 0),
            sdf.filter(F.col("user_id") % 2 == 1),
            "event_type",
        )
    )
    want_cols, want = _duck_rows(
        ORACLE_EVENTS_DRIFT_PSI,
        events=pd.DataFrame(DRIFT_EVENTS, columns=["user_id", "event_type"]),
    )
    assert sorted(got_cols) == sorted(want_cols)
    order = [got_cols.index(c) for c in want_cols]
    got_aligned = {tuple(t[i] for i in order) for t in got}
    assert got_aligned == want
    cats = {t[want_cols.index("category")] for t in want}
    assert {"gamma", "delta", None} <= cats  # single-cohort + NULL branches ran
    # NULL category is exactly ONE matched bucket with both counts
    ci, ai, bi = (want_cols.index(c) for c in ("category", "n_a", "n_b"))
    null_rows = [t for t in got_aligned if t[ci] is None]
    assert len(null_rows) == 1 and (null_rows[0][ai], null_rows[0][bi]) == (1, 1)

"""Hot-key skew fixture for the text-hygiene operators (VERDICT r4
"next" #7): a corpus where one token / one line appears in 50% of all
documents must not funnel into a single task.

The skew-safety witnesses are structural, per the plan (the same model
as test_skew_bucketing):

* unigram_logprob — the per-token corpus count must be a TWO-PHASE
  hash aggregate (``partial_sum`` before the exchange: the hot token
  enters the shuffle as at most one row per input partition), with no
  WindowExec anywhere (WindowExec has no partial aggregation — the r4
  formulation would hold one row per hot-token-containing document in
  ONE task);
* remove_repeated_lines — the repeated-line census must likewise show
  partial aggregation on the line key, and the removal side stays a
  broadcast (no shuffle of the exploded corpus lines by line value).

Plus value-level correctness on the skewed fixture for both.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from spark_cdc_replication_spark.operators.textanalysis import (
    remove_repeated_lines,
    unigram_logprob,
)

N_DOCS = 2_000


def _hot_token_corpus(spark):
    # 50% of docs contain the hot token; every doc has two unique tokens
    return spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.when(F.col("id") % 2 == 0, F.lit("hotword ")).otherwise(F.lit("")),
            F.lit("u"), F.col("id").cast("string"),
            F.lit(" v"), F.col("id").cast("string"),
        ).alias("text"),
    )


def test_unigram_logprob_hot_token_plan_and_values(spark):
    out = unigram_logprob(_hot_token_corpus(spark))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    # the per-token census: partial_sum BEFORE the __tok exchange
    assert "partial_sum" in plan
    assert "Exchange hashpartitioning(__tok" in plan

    got = {r.doc_id: r for r in out.collect()}
    assert len(got) == N_DOCS
    total = N_DOCS // 2 + 2 * N_DOCS  # hot occurrences + unique tokens
    lp_hot = math.floor(math.log((N_DOCS // 2) / total) * 1e6)
    lp_unique = math.floor(math.log(1 / total) * 1e6)
    assert got[0].n_tokens == 3
    assert got[0].logprob_micro == lp_hot + 2 * lp_unique
    assert got[1].n_tokens == 2
    assert got[1].logprob_micro == 2 * lp_unique


def test_remove_repeated_lines_hot_line_plan_and_values(spark):
    docs = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.when(F.col("id") % 2 == 0, F.lit("all rights reserved\n")).otherwise(
                F.lit("")
            ),
            F.lit("body "), F.col("id").cast("string"),
        ).alias("text"),
    )
    out = remove_repeated_lines(docs, min_docs=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the line census aggregates with map-side partials on the line key
    assert "partial_count" in plan
    # the removal side is broadcast: the exploded corpus lines are never
    # shuffled by line value for the anti-join
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan

    got = {r.doc_id: r.text for r in out.collect()}
    assert len(got) == N_DOCS  # every doc keeps its unique body line
    assert got[0] == "body 0"
    assert got[1] == "body 1"
    assert not any("all rights reserved" in t for t in got.values())


def test_bigram_logprob_values_and_plan(spark):
    """Hand-computed bigram conditional MLE on a tiny corpus, plus the
    same structural skew witnesses as unigram (partial aggregation, no
    per-token window)."""
    import math

    from spark_cdc_replication_spark.operators.textanalysis import bigram_logprob

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "x")],
        "doc_id long, text string",
    )
    out = bigram_logprob(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_sum" in plan

    got = {r.doc_id: r for r in out.collect()}
    # corpus bigram counts: (a,b)=3, (b,a)=1, (b,c)=1; left: a·=3, b·=2
    lp_ab = math.floor(math.log(3 / 3) * 1e6)   # 0
    lp_ba = math.floor(math.log(1 / 2) * 1e6)
    lp_bc = math.floor(math.log(1 / 2) * 1e6)
    assert got[1].n_bigrams == 3
    assert got[1].logprob_micro == 2 * lp_ab + lp_ba
    assert got[2].n_bigrams == 2
    assert got[2].logprob_micro == lp_ab + lp_bc
    assert 3 not in got  # single-word doc: no bigrams, no row


def test_ngram_coverage_superset_disjoint_and_parity(spark):
    """ngram_coverage floors: a source containing every target doc
    covers 1.0 (1e6 micro); a disjoint-vocabulary source covers 0;
    and the planted corpus replays the EXACT prepared r11 oracle SQL
    row-for-row."""
    import duckdb
    import pandas as pd

    from spark_cdc_replication_spark.operators.textanalysis import ngram_coverage
    from spark_cdc_replication_spark.workloads.llmdata import (
        ORACLE_TEXT_NGRAM_COVERAGE,
    )

    t1 = "quantum field theory entangles boson and fermion states"
    t2 = "the boson lattice couples every fermion field"
    docs = pd.DataFrame(
        [
            (1, t1, "src0"),
            (2, t2, "src0"),
            (3, t1 + " " + t2, "superset"),  # contains both target docs
            (4, "simmer the onion butter sauce then whisk it", "disjoint"),
        ],
        columns=["doc_id", "text", "source"],
    )
    sdocs = spark.createDataFrame(docs)
    out = {
        r.source: r
        for r in ngram_coverage(
            sdocs, sdocs.filter(F.col("source") == "src0"), n=3
        ).collect()
    }
    assert out["src0"].coverage_micro == 1_000_000
    assert out["disjoint"].coverage_micro == 0 and out["disjoint"].n_matched == 0
    # the superset doc covers every gram except the two spanning the
    # concatenation seam it introduces — still strictly > 0.9
    assert out["superset"].n_matched >= out["superset"].n_target_grams - 2
    assert all(r.n_target_grams == out["src0"].n_target_grams for r in out.values())

    con = duckdb.connect()
    con.register("documents", docs)
    res = con.execute(ORACLE_TEXT_NGRAM_COVERAGE)
    cols = [d[0] for d in res.description]
    want = set(map(tuple, res.fetchall()))
    got = {tuple(r[c] for c in cols) for r in out.values()}
    assert got == want

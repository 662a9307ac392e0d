"""BM25 retrieval (operators/search.py): ranking semantics on a
hand-built corpus + the scale-shape plan contract."""

from __future__ import annotations

import math

from spark_cdc_replication_spark.operators.search import bm25_topk


def _docs(spark):
    rows = [
        (1, "apple banana cherry"),
        (2, "apple apple apple banana"),
        (3, "cherry cherry durian"),
        (4, "banana durian durian durian"),
        (5, "elderberry fig grape"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _queries(spark, *terms, qid=0):
    return spark.createDataFrame([(qid, t) for t in terms], "query_id int, term string")


def test_matches_model_scores(spark):
    """Spark BM25 == a transparent pure-python model of the same formula."""
    corpus = {
        1: ["apple", "banana", "cherry"],
        2: ["apple", "apple", "apple", "banana"],
        3: ["cherry", "cherry", "durian"],
        4: ["banana", "durian", "durian", "durian"],
        5: ["elderberry", "fig", "grape"],
    }
    n = len(corpus)
    avgdl = sum(len(v) for v in corpus.values()) / n
    k1, b = 1.2, 0.75

    def score(terms, doc):
        s = 0.0
        for t in set(terms):
            tf = corpus[doc].count(t)
            if tf == 0:
                continue
            df = sum(1 for d in corpus.values() if t in d)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(corpus[doc]) / avgdl))
        return round(s, 6)

    got = {
        (r.doc_id, r.rank): r.score
        for r in bm25_topk(
            _docs(spark), _queries(spark, "apple", "durian"), k=5, min_token_len=1
        ).collect()
    }
    expected = sorted(
        ((d, score(["apple", "durian"], d)) for d in corpus if score(["apple", "durian"], d) > 0),
        key=lambda x: (-x[1], x[0]),
    )
    assert got == {(d, i + 1): s for i, (d, s) in enumerate(expected)}


def test_rank_properties(spark):
    """Higher tf ranks higher; rarer terms outweigh common ones."""
    out = {
        r.rank: r.doc_id
        for r in bm25_topk(_docs(spark), _queries(spark, "apple"), k=5, min_token_len=1).collect()
    }
    # doc 2 has tf=3 for 'apple', doc 1 has tf=1.
    assert out[1] == 2 and out[2] == 1 and len(out) == 2

    # 'elderberry' (df=1) must outscore 'banana' (df=3) at equal tf=1:
    # doc 5 (rare term only) beats doc 1 (common term only).
    both = bm25_topk(
        _docs(spark), _queries(spark, "elderberry", "banana"), k=5, min_token_len=1
    ).collect()
    by_doc = {r.doc_id: r.score for r in both}
    assert by_doc[5] > by_doc[1]


def test_matches_model_property(spark):
    """Random corpora + random query terms vs the pure-python model:
    pins tokenization (min length filter), df/dl/avgdl accounting,
    rounding, and rank tie-breaks across generated shapes."""
    import math

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    VOCAB = ["aa", "bbb", "cccc", "ddddd", "ee", "ffff"]

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
    )
    @given(
        docs=st.lists(
            st.lists(st.sampled_from(VOCAB), min_size=0, max_size=8),
            min_size=1,
            max_size=8,
        ),
        terms=st.sets(st.sampled_from(VOCAB), min_size=1, max_size=3),
    )
    def check(docs, terms):
        k1, b, min_len = 1.2, 0.75, 3
        corpus = {i: [w for w in ws if len(w) >= min_len] for i, ws in enumerate(docs)}
        corpus = {i: ws for i, ws in corpus.items() if ws}  # docs w/o tokens drop out of dl
        if not corpus:
            return
        n = len(corpus)
        avgdl = sum(len(v) for v in corpus.values()) / n

        def score(doc):
            s = 0.0
            for t in terms:
                tf = corpus[doc].count(t)
                if tf == 0:
                    continue
                df = sum(1 for d in corpus.values() if t in d)
                idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
                s += idf * (tf * (k1 + 1)) / (
                    tf + k1 * (1 - b + b * len(corpus[doc]) / avgdl)
                )
            return round(s, 6)

        expected = sorted(
            ((d, score(d)) for d in corpus if score(d) > 0),
            key=lambda x: (-x[1], x[0]),
        )[:4]
        df = spark.createDataFrame(
            [(i, " ".join(ws)) for i, ws in enumerate(docs)],
            "doc_id long, text string",
        )
        got = [
            (r.doc_id, r.score)
            for r in bm25_topk(df, _queries(spark, *sorted(terms)), k=4)
            .orderBy("rank")
            .collect()
        ]
        assert got == expected

    check()


def test_no_term_window_and_query_broadcast(spark):
    """Plan contract: no WindowExec before the final per-query ranking
    over the corpus-sized relations (the df/dl aggregates are groupBys
    with map-side partials), and the query-term side is broadcast."""
    out = bm25_topk(_docs(spark), _queries(spark, "apple"), k=5, min_token_len=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # Exactly one Window node: the final row_number over
    # (query_id)-sized data ("WindowGroupLimit" entries are the pushed
    # top-k pre-filter, not a window exec).
    assert plan.count("Window [") == 1
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan


# --------------------------------------------------------------------------
# rrf_fuse
# --------------------------------------------------------------------------

def _ranking(spark, rows):
    return spark.createDataFrame(rows, "query_id int, doc_id long, rank int")


def test_rrf_fuse_semantics(spark):
    """Fused score is sum of 1/(k0+rank) per system; candidates in only
    one system get only that term (no imputation); ties break on id."""
    from spark_cdc_replication_spark.operators.search import rrf_fuse

    kw = _ranking(spark, [(0, 10, 1), (0, 11, 2), (0, 12, 3)])
    vec = _ranking(spark, [(0, 11, 1), (0, 13, 2)])
    out = {
        r.doc_id: (r.rrf_score, r.rank)
        for r in rrf_fuse([kw, vec], k=10, k0=60).collect()
    }
    # 11 appears rank 2 (kw) + rank 1 (vec): 1/62 + 1/61 — top.
    assert out[11][1] == 1
    assert out[11][0] == round(1 / 62 + 1 / 61, 9)
    # 10: kw rank 1 only; 13: vec rank 2 only -> both 1/(60+r) singles.
    assert out[10][0] == round(1 / 61, 9)
    assert out[13][0] == round(1 / 62, 9)
    # 10 and 13 tie on nothing (1/61 > 1/62): order 10 then 12/13 tie at
    # 1/62+0 vs 1/63?  12 is kw rank 3 -> 1/63, 13 is 1/62.
    assert [d for d, v in sorted(out.items(), key=lambda kv: kv[1][1])] == [
        11, 10, 13, 12
    ]


def test_rrf_fuse_equal_score_tiebreak_and_k(spark):
    from spark_cdc_replication_spark.operators.search import rrf_fuse

    # Two docs with identical single-system ranks -> identical scores;
    # tie breaks on ascending id, and k truncates.
    kw = _ranking(spark, [(0, 7, 1), (0, 5, 1)])
    got = rrf_fuse([kw], k=1, k0=60).collect()
    assert len(got) == 1 and got[0].doc_id == 5 and got[0].rank == 1


def test_rrf_fuse_requires_input():
    import pytest as _pytest

    from spark_cdc_replication_spark.operators.search import rrf_fuse

    with _pytest.raises(ValueError):
        rrf_fuse([])

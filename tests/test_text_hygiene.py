"""Round-3 corpus-hygiene operators: repetition stats, contamination
audit, PII scrub, deterministic epoch shuffle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_cdc_replication_spark.operators.privacy import pii_stats, redact
from spark_cdc_replication_spark.operators.sampling import corpus_shuffle
from spark_cdc_replication_spark.operators.textanalysis import (
    contamination_check,
    repetition_stats,
)


def test_repetition_stats_flags_repetitious_text(spark):
    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),        # one word repeated
            (2, "all words here are fully distinct"),
            (3, "single"),                                # no bigrams
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_stats(docs).collect()}
    assert got[1].n_words == 6
    assert got[1].distinct_word_frac == round(1 / 6, 6)
    assert got[1].top_bigram_frac == 1.0  # every bigram is "spam spam"
    assert got[2].distinct_word_frac == 1.0
    assert got[2].top_bigram_frac == 0.2  # 5 distinct bigrams, top = 1/5
    assert got[3].top_bigram_frac is None  # < 2 words


def test_contamination_check_counts_benchmark_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),   # fully contaminated
            (2, "a totally unrelated sentence here"),
            (3, "quick brown fox elsewhere entirely now"),  # 1 shared 3-gram
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in contamination_check(train, bench, n=3).collect()}
    assert got[1].n_shingles == 3 and got[1].contaminated_frac == 1.0
    assert got[2].n_contaminated == 0
    assert got[3].n_contaminated == 1  # "quick brown fox"


def test_pii_stats_and_redact(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@corp.example.org today"),
            (2, "server 10.0.255.3 and backup 192.168.1.1"),
            (3, "call +44-555-1234 or +1-555-0000"),
            (4, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in pii_stats(docs).collect()}
    assert (got[1].n_email, got[1].n_ipv4, got[1].n_phone) == (1, 0, 0)
    assert (got[2].n_email, got[2].n_ipv4, got[2].n_phone) == (0, 2, 0)
    assert (got[3].n_email, got[3].n_ipv4, got[3].n_phone) == (0, 0, 2)
    assert (got[4].n_email, got[4].n_ipv4, got[4].n_phone) == (0, 0, 0)

    red = {r.doc_id: r.text for r in redact(docs).collect()}
    assert red[1] == "mail me at <EMAIL> today"
    assert red[2] == "server <IP> and backup <IP>"
    assert red[3] == "call <PHONE> or <PHONE>"
    assert red[4] == "nothing sensitive here"


def test_corpus_shuffle_is_a_deterministic_permutation(spark):
    docs = spark.range(1000).select(F.col("id").alias("doc_id"))
    a = corpus_shuffle(docs, seed="s1").collect()
    b = corpus_shuffle(docs.repartition(7), seed="s1").collect()
    # same addresses regardless of input partitioning
    assert {(r.shard, r.doc_id, r.pos) for r in a} == {
        (r.shard, r.doc_id, r.pos) for r in b
    }
    # every doc exactly once; positions are 1..n_shard_members per shard
    assert len({r.doc_id for r in a}) == 1000
    by_shard: dict[str, list[int]] = {}
    for r in a:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, poses in by_shard.items():
        assert sorted(poses) == list(range(1, len(poses) + 1)), shard
    # a different seed yields a different permutation
    c = corpus_shuffle(docs, seed="s2").collect()
    assert {(r.shard, r.doc_id, r.pos) for r in c} != {
        (r.shard, r.doc_id, r.pos) for r in a
    }
    # wider shard key: 256 shards, still a permutation
    wide = corpus_shuffle(docs, seed="s1", shard_chars=2).collect()
    assert len({r.doc_id for r in wide}) == 1000
    assert len({r.shard for r in wide}) > 16


def test_cross_corpus_candidates_catches_fuzzy_leak_and_broadcasts_bench(spark):
    from spark_cdc_replication_spark.operators.dedup import (
        cross_corpus_candidates,
        minhash_signatures,
    )

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            # reformatted leak: case + whitespace noise, normalizes away
            (1, "The  Quick  Brown  Fox  Jumps  Over  The  Lazy  Dog  Tonight"),
            (2, "completely unrelated sentence about distributed query engines"),
            (3, "another unrelated document mentioning parquet and shuffles"),
        ],
        "doc_id long, text string",
    )
    cands = cross_corpus_candidates(
        minhash_signatures(train), minhash_signatures(bench), min_est_jaccard=0.99
    )
    got = {(r.id_train, r.id_bench) for r in cands.collect()}
    assert got == {(1, 100)}
    # the bench side must broadcast — the training corpus is never
    # shuffled through a sort-merge exchange for the band join
    plan = cands._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_decontaminate_removes_leaks_keeps_clean_and_handles_shared_ids(spark):
    """The composed pipeline returns the cleaned TRAIN corpus: the
    reformatted leak goes, clean docs stay with all their columns, and
    — unlike ngram_jaccard_pairs — train/bench id spaces may overlap
    (each side is shingled separately)."""
    from spark_cdc_replication_spark.operators.dedup import decontaminate

    bench = spark.createDataFrame(
        # id 1 deliberately collides with a train id
        [(1, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "completely unrelated sentence about distributed query engines"),
            (2, "The  Quick  Brown  Fox  Jumps  Over  The  Lazy  Dog  Tonight"),
            (3, "another unrelated document mentioning parquet and shuffles"),
        ],
        "doc_id long, text string",
    )
    out = decontaminate(
        train, bench, min_est_jaccard=0.99, min_jaccard=0.999
    )
    assert {r.doc_id for r in out.collect()} == {1, 3}
    assert out.columns == train.columns


def test_dedup_corpus_keeps_lowest_id_per_dup_group(spark):
    from spark_cdc_replication_spark.operators.dedup import dedup_corpus

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            # normalized duplicates of doc 1 — only the lowest id survives
            (2, "The  Quick  Brown  Fox  Jumps  Over  The  Lazy  Dog  Tonight"),
            (5, "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG TONIGHT"),
            (3, "completely unrelated sentence about distributed query engines"),
            # too short to shingle (< 3 tokens): never a candidate, always kept
            (4, "tiny doc"),
            (6, "tiny doc"),
        ],
        "doc_id long, text string",
    )
    out = dedup_corpus(corpus, min_est_jaccard=0.99, min_jaccard=0.999)
    assert {r.doc_id for r in out.collect()} == {1, 3, 4, 6}
    assert out.columns == corpus.columns


def test_remove_repeated_lines_drops_boilerplate_keeps_order(spark):
    from spark_cdc_replication_spark.operators.textanalysis import (
        remove_repeated_lines,
    )

    boiler = "subscribe now"
    corpus = spark.createDataFrame(
        [
            (1, f"{boiler}\nalpha beta\ngamma delta"),
            (2, f"{boiler}\nepsilon zeta"),
            (3, f"eta theta\n{boiler}\niota kappa"),
            (4, boiler),  # all-boilerplate doc: drops out entirely
            (5, "unique line one\nunique line two"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.text for r in remove_repeated_lines(corpus, min_docs=3).collect()}
    assert out == {
        1: "alpha beta\ngamma delta",
        2: "epsilon zeta",
        3: "eta theta\niota kappa",  # middle line removed, order kept
        5: "unique line one\nunique line two",
    }


def test_prepare_corpus_equals_chained_triad(spark):
    """The fused pipeline must return exactly what chaining
    filter_corpus |> dedup_corpus |> decontaminate returns — the
    semantic claim in hygiene.py's docstring, checked end to end."""
    from spark_cdc_replication_spark.operators.dedup import (
        decontaminate,
        dedup_corpus,
    )
    from spark_cdc_replication_spark.operators.hygiene import prepare_corpus
    from spark_cdc_replication_spark.operators.textanalysis import filter_corpus

    good = (
        "the cat and the dog ran to the park and it was fun for all of "
        "them in the sun that day with friends"
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog tonight and it was great")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, good),
            (2, good.upper().replace(" ", "  ")),  # near-dup of 1
            (3, "the " * 25),                       # fails repetition filter
            (4, good + " but then it started to rain on all of them suddenly"),
            # reformatted eval leak: case+whitespace noise normalizes away
            (5, ("the quick brown fox jumps over the lazy dog tonight and it "
                 "was great").upper().replace(" ", "  ")),
            (6, "der hund und die katze und der vogel " * 4),
        ],
        "doc_id long, text string",
    )
    kw = dict(
        num_hashes=16, shingle_n=3, num_bands=8,
        min_est_jaccard=0.5, min_jaccard=0.8,
    )
    fkw = dict(
        min_quality=0.1, langs=("en",), min_words=10,
        min_distinct_word_frac=0.2, max_top_bigram_frac=0.3,
    )
    fused = prepare_corpus(corpus, bench, **fkw, **kw)
    chained = decontaminate(
        dedup_corpus(filter_corpus(corpus, **fkw), **kw), bench, **kw
    )
    assert sorted((r.doc_id, r.text) for r in fused.collect()) == sorted(
        (r.doc_id, r.text) for r in chained.collect()
    )
    assert fused.columns == corpus.columns
    # and the fixture exercises every stage: something was filtered,
    # deduped, decontaminated, and kept
    ids = {r.doc_id for r in fused.collect()}
    assert 1 in ids and 4 in ids
    assert 2 not in ids      # near-dup of 1
    assert 3 not in ids      # repetition filter
    assert 5 not in ids      # eval leak
    assert 6 not in ids      # language filter


def test_remove_repeated_lines_nonbroadcast_path_identical(spark):
    """The escape hatch (repeated-line set too big for the driver at
    web scale) must produce byte-identical survivors via the shuffled
    anti-join."""
    from spark_cdc_replication_spark.operators.textanalysis import (
        remove_repeated_lines,
    )

    boiler = "all rights reserved"
    corpus = spark.createDataFrame(
        [(i, f"{boiler}\nbody line {i} a\nbody line {i} b") for i in range(20)],
        "doc_id long, text string",
    )
    a = remove_repeated_lines(corpus, min_docs=3, broadcast_removal=True)
    b = remove_repeated_lines(corpus, min_docs=3, broadcast_removal=False)
    assert sorted((r.doc_id, r.text) for r in a.collect()) == sorted(
        (r.doc_id, r.text) for r in b.collect()
    )
    plan_a = a._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_a or "BroadcastNestedLoop" in plan_a


def test_remove_repeated_lines_sep_is_literal_not_regex(spark):
    """sep='.' must split on the dot character, not the match-anything
    regex (which would explode every doc into per-char fragments)."""
    from spark_cdc_replication_spark.operators.textanalysis import (
        remove_repeated_lines,
    )

    corpus = spark.createDataFrame(
        [
            (1, "boiler line.alpha beta"),
            (2, "boiler line.gamma delta"),
            (3, "boiler line.epsilon zeta"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.text
        for r in remove_repeated_lines(corpus, sep=".", min_docs=3).collect()
    }
    assert out == {1: "alpha beta", 2: "gamma delta", 3: "epsilon zeta"}


def test_contamination_check_accepts_text_only_benchmark(spark):
    """Eval frames often carry no id column — the benchmark side only
    needs text_col (ADVICE r4)."""
    bench = spark.createDataFrame(
        [("the quick brown fox jumps",)], "text string"
    )
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "a totally unrelated sentence here"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in contamination_check(train, bench, n=3).collect()}
    assert got[1].contaminated_frac == 1.0
    assert got[2].n_contaminated == 0


def test_unigram_logprob_plan_has_no_window_over_tokens(spark):
    """Corpus term counts must come from a partial-aggregating groupBy,
    never a per-token window (WindowExec single-tasks hot stop-words at
    scale — VERDICT r4 design note #1)."""
    from spark_cdc_replication_spark.operators.textanalysis import unigram_logprob

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the dog sat")],
        "doc_id long, text string",
    )
    out = unigram_logprob(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "HashAggregate" in plan
    got = {r.doc_id: r for r in out.collect()}
    # 9 tokens total; doc 2: the(3/9) dog(1/9) sat(2/9)
    import math

    expect = sum(
        math.floor(math.log(c / 9) * 1e6) for c in (3, 1, 2)
    )
    assert got[2].n_tokens == 3
    assert got[2].logprob_micro == expect


def test_filter_corpus_applies_each_threshold(spark):
    from spark_cdc_replication_spark.operators.textanalysis import filter_corpus

    good = "the cat and the dog ran to the park and it was fun for all of " \
           "them in the sun that day with friends"  # en, varied, long enough
    corpus = spark.createDataFrame(
        [
            (1, good),
            (2, "der hund und die katze das ist nicht ein mit für von und der " * 2),
            (3, "the the the the the the the the the the the the the the the the the the the the"),
            (4, "the cat sat"),  # too short
            (5, good + " again"),
        ],
        "doc_id long, text string",
    )
    out = filter_corpus(
        corpus, min_quality=0.1, langs=("en",), min_words=20,
        min_distinct_word_frac=0.3, max_top_bigram_frac=0.3,
    )
    assert {r.doc_id for r in out.collect()} == {1, 5}
    assert out.columns == corpus.columns


def test_prepare_corpus_without_bench_is_filter_plus_dedup(spark):
    """bench=None skips decontamination: the result equals
    filter_corpus |> dedup_corpus alone."""
    from spark_cdc_replication_spark.operators.dedup import dedup_corpus
    from spark_cdc_replication_spark.operators.hygiene import prepare_corpus
    from spark_cdc_replication_spark.operators.textanalysis import filter_corpus

    good = (
        "the cat and the dog ran to the park and it was fun for all of "
        "them in the sun that day with friends"
    )
    corpus = spark.createDataFrame(
        [
            (1, good),
            (2, good.upper().replace(" ", "  ")),  # near-dup of 1
            (3, "der hund und die katze und der vogel " * 4),  # wrong lang
            (4, good + " but then it started to rain on all of them suddenly"),
        ],
        "doc_id long, text string",
    )
    kw = dict(num_hashes=16, shingle_n=3, num_bands=8,
              min_est_jaccard=0.5, min_jaccard=0.8)
    fkw = dict(min_quality=0.1, langs=("en",), min_words=10,
               min_distinct_word_frac=0.2, max_top_bigram_frac=0.3)
    fused = prepare_corpus(corpus, None, **fkw, **kw)
    chained = dedup_corpus(filter_corpus(corpus, **fkw), **kw)
    assert sorted((r.doc_id, r.text) for r in fused.collect()) == sorted(
        (r.doc_id, r.text) for r in chained.collect()
    )
    assert {r.doc_id for r in fused.collect()} == {1, 4}


def test_gopher_rules_flags(spark):
    """Gopher hard-cutoff rules (operators/textanalysis.py::
    gopher_rules): each rule is an independent boolean, the
    conjunction is gopher_pass, and every rule can fail alone."""
    from spark_cdc_replication_spark.operators.textanalysis import gopher_rules

    good = "the cat sat with all of them and that should be fine " * 5
    docs = spark.createDataFrame(
        [
            (1, good),                                     # passes everything
            (2, "too short to pass the word count rule"),  # wc fails
            (3, ("a " * 60).strip()),                      # mean word len < 3
            (4, good + " ###### " * 12),                   # symbol ratio
            (5, "\n".join(["- bullet line the and of"] * 8 + ["plain"])
                + " " + good),                             # bullet frac > 0.9? no: 8/10 lines -> passes
            (6, "\n".join([(good[:40] + "...")] * 5)),     # every line ends ...
            (7, ("12345 67890 " * 30) + "the and"),        # alpha frac fails
            (8, "zz yy xx ww vv uu tt ss rr qq " * 10),    # no required stopwords
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in gopher_rules(docs, min_words=20).collect()}
    assert got[1].gopher_pass
    assert not got[2].wc_ok and got[2].mwl_ok
    assert not got[3].mwl_ok
    assert not got[4].symbol_ok and got[4].wc_ok
    assert got[5].bullet_ok and got[5].gopher_pass is not None
    assert not got[6].ellipsis_ok
    assert not got[7].alpha_ok and got[7].wc_ok
    assert not got[8].stop_ok and not got[8].gopher_pass
    # the conjunction is exactly the AND of the individual flags
    for r in got.values():
        assert r.gopher_pass == (
            r.wc_ok and r.mwl_ok and r.symbol_ok and r.bullet_ok
            and r.ellipsis_ok and r.alpha_ok and r.stop_ok
        )


def test_gopher_rules_zero_shuffle_plan(spark):
    """The whole rule set must stay one codegen'd scan+project —
    doc-local signals may never pay an exchange."""
    from spark_cdc_replication_spark.operators.textanalysis import gopher_rules

    docs = spark.createDataFrame([(1, "the a b")], "doc_id long, text string")
    plan = gopher_rules(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_filter_corpus_matches_chained_feature_operators(spark):
    """The r8 Generate-barrier rewrite of filter_corpus (tokenize
    arrays materialized once per row) must keep the EXACT survivor
    set of the chained append-projection formulation it replaced —
    same formulas, same NULL semantics, different physical shape."""
    from pyspark.sql import functions as F

    from spark_cdc_replication_spark.operators.textanalysis import (
        filter_corpus,
        language_id,
        quality_score,
        repetition_stats,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog and then runs far "
            "away to the deep green forest where it finds a quiet stream and "
            "drinks the cool water before resting under an old oak tree"),
        (2, "word " * 60),                      # repetitious: low distinct frac
        (3, "le chat est sur la table et il dort bien " * 5),  # french
        (4, "short text"),                       # under min_words
        (5, None),                               # NULL text
        (6, ""),                                 # empty
        (7, "a b c d e f g h i j k l m n o p q r s t u v w x y z " * 3),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(min_quality=0.2, langs=("en",), min_words=15,
              min_distinct_word_frac=0.3, max_top_bigram_frac=0.5)
    got = {r.doc_id for r in filter_corpus(df, **kw).collect()}
    feats = repetition_stats(
        language_id(quality_score(df, append=True), append=True), append=True
    )
    keep = (
        (F.col("quality") >= kw["min_quality"])
        & F.col("pred_lang").isin(list(kw["langs"]))
        & (F.col("n_words") >= kw["min_words"])
        & (F.col("distinct_word_frac") >= kw["min_distinct_word_frac"])
        & (F.coalesce(F.col("top_bigram_frac"), F.lit(0.0)) <= kw["max_top_bigram_frac"])
    )
    want = {r.doc_id for r in feats.filter(keep).select("doc_id").collect()}
    assert got == want and got  # non-empty and identical


def test_filter_corpus_arrow_matches_expression_path_boundary_rows(spark):
    """r18: the vectorized Arrow keep-mask (arrow_filter=True, default)
    must keep the EXACT survivor set of the native expression path on
    rows engineered to land ON each threshold — where Spark's
    round(_, 6) HALF_UP semantics decide the comparison — plus the
    NULL/blank/unicode/whitespace edge shapes."""
    from spark_cdc_replication_spark.operators.textanalysis import filter_corpus

    rows = [
        # quality exactly 0.5: 10 tokens, 1 stopword, 0 punct ->
        # (10/100 + 1.0 + 4*(1/10)) / 3 = 0.5
        (1, "the w1a w2a w3a w4a w5a w6a w7a w8a w9a".replace("1a", "one")),
        (2, "the aa bb cc dd ee ff gg hh ii"),
        # one fewer stopword: quality just below
        (3, "xx aa bb cc dd ee ff gg hh ii"),
        # dwf exactly 0.3: 10 tokens, 3 distinct
        (4, "aa aa aa aa bb bb bb bb cc cc"),
        # dwf just below: 10 tokens, 2 distinct
        (5, "aa aa aa aa aa bb bb bb bb bb"),
        # tbf exactly 0.2: 11 tokens, 10 bigrams, top bigram "aa bb" x2
        (6, "aa bb cc dd ee aa bb ff gg hh ii"),
        # tbf just above 0.2: 3/10
        (7, "aa bb aa bb aa bb ff gg hh ii zz"),
        # min_words boundary: exactly 10 and 9 tokens
        (8, "the cat and dog ran to park in sun fun"),
        (9, "the cat and dog ran to park in sun"),
        # NULL / empty / whitespace-only / trailing newline
        (10, None),
        (11, ""),
        (12, " \t\n\x0b\f\r"),
        (13, "the cat and the dog ran to the park today\n"),
        # unicode markers and case-sensitivity of stopwords
        (14, "für von und der die das ist nicht ein mit"),
        (15, "的 是 了 在 我 有 和 不 人 这"),
        (16, "The THE tHe the aa bb cc dd ee ff"),
        # multi-whitespace separators
        (17, "the  cat\t\tand\nthe   dog ran to the park today"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for kw in (
        dict(min_quality=0.5, langs=("en",), min_words=10,
             min_distinct_word_frac=0.3, max_top_bigram_frac=0.2),
        dict(min_quality=0.5, langs=("en", "de", "zh"), min_words=5,
             min_distinct_word_frac=0.3, max_top_bigram_frac=0.2),
        # 'und' = no marker matched anywhere (streaming ingest uses it)
        dict(min_quality=0.0, langs=("en", "und"), min_words=5,
             min_distinct_word_frac=0.0, max_top_bigram_frac=1.0),
    ):
        arrow = {r.doc_id for r in filter_corpus(df, **kw).collect()}
        expr = {
            r.doc_id
            for r in filter_corpus(df, **kw, arrow_filter=False).collect()
        }
        assert arrow == expr and arrow  # identical and non-empty
    # the arrow path is the default and its plan has exactly one
    # Python-eval node and zero exchanges (one scan, no shuffle)
    plan = (
        filter_corpus(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in plan and "Exchange" not in plan


def test_tokenizer_ignores_leading_trailing_whitespace(spark):
    """r8 fix: trim() strips only spaces, so 'hello world\\n' used to
    tokenize as ['hello','world',''] — a phantom empty token inflating
    every raw-word stat; whitespace-only text must count 0 tokens."""
    from spark_cdc_replication_spark.operators.textanalysis import text_stats

    df = spark.createDataFrame(
        [(1, "hello world\n"), (2, "\tab cd"), (3, "\t \n"), (4, None)],
        "doc_id long, text string",
    )
    stats = {r.doc_id: r.n_tokens for r in text_stats(df).collect()}
    assert stats[1] == 2
    assert stats[2] == 2
    assert stats[3] == 0
    assert stats[4] is None or stats[4] == 0


def test_quality_score_null_text_scores_like_empty(spark):
    """r8 fix: F.least skips NULLs, so NULL text used to get a perfect
    len_score (quality 0.667, better than real mediocre docs); it must
    score exactly like empty text."""
    from spark_cdc_replication_spark.operators.textanalysis import quality_score

    df = spark.createDataFrame(
        [(1, None), (2, "")], "doc_id long, text string"
    )
    out = {r.doc_id: (r.len_score, r.quality) for r in quality_score(df).collect()}
    assert out[1] == out[2]
    assert out[1][0] == 0.0


def test_repeated_lines_keep_blanks_and_null_docs(spark):
    """r8 fixes: blank lines are structure (never boilerplate, however
    many docs contain one), and a NULL-text doc survives as empty
    instead of vanishing from the output."""
    from spark_cdc_replication_spark.operators.textanalysis import (
        remove_repeated_lines,
    )

    rows = [
        (1, "keep me\n\nbody one"),
        (2, "other\n\nbody two"),
        (3, "third\n\nbody three"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.text for r in remove_repeated_lines(df, min_docs=3).collect()}
    assert out[1] == "keep me\n\nbody one"  # blank line survives
    assert out[4] == ""  # NULL doc present, as empty


def test_quantize_fingerprint_distinguishes_null_elements(spark):
    """r8 fix: concat_ws drops NULL elements, so [1.0, NULL, 0.5] used
    to fingerprint identically to [1.0, 0.5]."""
    from spark_cdc_replication_spark.operators.embeddings import quantize_int8

    df = spark.createDataFrame(
        [(1, [1.0, None, 0.5]), (2, [1.0, 0.5])],
        "vec_id long, embedding array<float>",
    )
    out = {r.vec_id: r.q_fp for r in quantize_int8(df).collect()}
    assert out[1] != out[2]


def test_fuzzy_block_keys_split_on_any_whitespace(spark):
    """r8 fix: a literal-space split treated 'foo\\tbar' as ONE token,
    so its clean single-space twin never became a candidate."""
    from spark_cdc_replication_spark.operators.stringmatch import (
        first_token,
        last_token,
    )

    df = spark.createDataFrame([(1, "foo\tbar")], "id long, name string")
    row = df.select(
        first_token(F.col("name")).alias("f"), last_token(F.col("name")).alias("l")
    ).first()
    assert row.f == "foo" and row.l == "bar"


def test_k_anonymity_planted_classes(spark):
    """Hand-computable fixture: QI = (city), classes CHI=3, NYC=2,
    LA=1 -> n=6, classes=3, min=1; at k=2 one class (LA, 1 row) is
    below; at k=3 two classes (LA + NYC, 3 rows); prosecutor risk is
    exactly n_classes/n = 3/6 = 0.5."""
    from spark_cdc_replication_spark.operators.privacy import k_anonymity

    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(
            ["chi", "chi", "chi", "nyc", "nyc", "la"]
        )],
        "id long, city string",
    )
    got = {r.k: r for r in k_anonymity(df, ["city"], ks=(2, 3)).collect()}
    assert set(got) == {2, 3}
    for r in got.values():
        assert (r.n_rows, r.n_classes, r.min_class_size) == (6, 3, 1)
        assert r.prosecutor_risk_micro == 500_000
    assert (got[2].classes_below, got[2].rows_below) == (1, 1)
    assert got[2].suppression_micro == 1_000_000 // 6
    assert (got[3].classes_below, got[3].rows_below) == (2, 3)
    assert got[3].suppression_micro == 500_000


def test_k_anonymity_null_qi_groups_and_invariance(spark):
    """NULL quasi-identifier values form ONE class (deterministic
    audit of sparse attributes), and the all-integer report is
    partition-invariant."""
    from spark_cdc_replication_spark.operators.privacy import k_anonymity

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "x")], "id long, attr string"
    )
    rows = {r.k: r for r in k_anonymity(df, ["attr"], ks=(2,)).collect()}
    # NULLs group together: classes = {NULL: 2, x: 1}
    assert (rows[2].n_classes, rows[2].classes_below, rows[2].rows_below) == (2, 1, 1)
    base = sorted(map(tuple, k_anonymity(df, ["attr"]).collect()))
    again = sorted(map(tuple, k_anonymity(df.repartition(7), ["attr"]).collect()))
    assert base == again


def test_k_anonymity_monotone_in_k_and_empty_input(spark):
    from spark_cdc_replication_spark.operators.privacy import k_anonymity

    df = spark.range(40).select(
        F.col("id"), (F.col("id") % 7).alias("bucket")
    )
    rows = sorted(k_anonymity(df, ["bucket"], ks=(2, 5, 6, 7)).collect())
    for a, b in zip(rows, rows[1:]):
        assert a.classes_below <= b.classes_below
        assert a.rows_below <= b.rows_below
        assert a.suppression_micro <= b.suppression_micro
    # 40 rows over 7 buckets: sizes are 6x5 + 1x... -> 40 = 5*5 + 2*...
    # exact: buckets 0..4 get 6 rows (id%7 in 0..4 for ids 0..39), 5,6 get 5
    assert rows[-1].n_classes == 7
    # empty input: vacuous audit, len(ks) rows, zero counts, NULL rates
    empty = spark.createDataFrame([], "id long, bucket long")
    erows = k_anonymity(empty, ["bucket"], ks=(2, 5)).collect()
    assert len(erows) == 2
    for r in erows:
        assert (r.n_rows, r.n_classes, r.classes_below, r.rows_below) == (0, 0, 0, 0)
        assert r.suppression_micro is None and r.prosecutor_risk_micro is None


def test_k_anonymity_cross_engine_parity_on_planted_customer(spark):
    """Replay the EXACT prepared r13 oracle SQL over a planted
    customer table and compare row-for-row against the registered
    query's operator call — the pre-debut proof every staged oracle
    gets (DSIR / corpus_divergence precedent)."""
    import duckdb
    import pandas as pd

    from spark_cdc_replication_spark.operators.privacy import k_anonymity
    from spark_cdc_replication_spark.workloads.llmdata import (
        ORACLE_PII_KANONYMITY,
    )

    cust = pd.DataFrame(
        [
            (i, f"Customer#{i}", i % 4, (i * 997.13) % 5000 - 1000,
             ["AUTO", "HOUSE", "SHIP"][i % 3])
            for i in range(60)
        ],
        columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    )
    con = duckdb.connect()
    con.register("customer", cust)
    res = con.execute(ORACLE_PII_KANONYMITY)
    cols = [d[0] for d in res.description]
    want = set(map(tuple, res.fetchall()))
    sdf = k_anonymity(
        spark.createDataFrame(cust),
        [
            F.col("c_nationkey"),
            F.col("c_mktsegment"),
            F.floor(F.col("c_acctbal") / F.lit(1000.0)).alias("__acct_band"),
        ],
        ks=(2, 5, 10, 25),
    )
    got = {tuple(r[c] for c in cols) for r in sdf.collect()}
    assert got == want


def test_k_anonymity_suppression_is_sufficient(spark):
    """Semantic property behind suppression_micro: deleting exactly
    the rows of below-k classes must leave a k-anonymous table (the
    re-audit reports zero classes below k), and the deleted fraction
    must equal the original audit's suppression_micro."""
    from spark_cdc_replication_spark.operators.privacy import k_anonymity

    df = spark.range(200).select(
        F.col("id"),
        (F.xxhash64(F.col("id")) % 23).alias("attr"),  # ragged classes
    )
    k = 8
    audit = {r.k: r for r in k_anonymity(df, ["attr"], ks=(k,)).collect()}[k]
    sizes = df.groupBy("attr").count()
    survivors = (
        df.join(sizes.filter(F.col("count") >= k).select("attr"), on="attr")
        .select("id", "attr")
    )
    n_kept = survivors.count()
    assert audit.n_rows - n_kept == audit.rows_below
    re_audit = {r.k: r for r in k_anonymity(survivors, ["attr"], ks=(k,)).collect()}[k]
    assert re_audit.classes_below == 0 and re_audit.rows_below == 0
    assert re_audit.min_class_size is None or re_audit.min_class_size >= k


def test_l_diversity_planted_classes(spark):
    """Hand-computable: class A = {x,x,y} (2 distinct), B = {z,z}
    (1 distinct, homogeneous), C = {w} (1 distinct, homogeneous).
    n=6, classes=3, min diversity 1, homogeneous rows = 3."""
    from spark_cdc_replication_spark.operators.privacy import l_diversity

    df = spark.createDataFrame(
        [
            (1, "A", "x"), (2, "A", "x"), (3, "A", "y"),
            (4, "B", "z"), (5, "B", "z"),
            (6, "C", "w"),
        ],
        "id long, qi string, sens string",
    )
    got = {r.l: r for r in l_diversity(df, ["qi"], "sens", ls=(2, 3)).collect()}
    for r in got.values():
        assert (r.n_rows, r.n_classes, r.min_distinct_sensitive) == (6, 3, 1)
        assert r.homogeneous_rows == 3
    assert (got[2].classes_below, got[2].rows_below) == (2, 3)
    assert got[2].suppression_micro == 500_000
    assert (got[3].classes_below, got[3].rows_below) == (3, 6)
    assert got[3].suppression_micro == 1_000_000


def test_l_diversity_null_sensitive_and_invariance(spark):
    """NULL sensitive values do NOT attest diversity (count DISTINCT
    ignores NULLs in Spark and ANSI SQL alike): an all-NULL class has
    diversity 0 and is below every l.  All-integer output is
    partition-invariant."""
    from spark_cdc_replication_spark.operators.privacy import l_diversity

    df = spark.createDataFrame(
        [(1, "A", None), (2, "A", None), (3, "B", "x"), (4, "B", "y")],
        "id long, qi string, sens string",
    )
    rows = {r.l: r for r in l_diversity(df, ["qi"], "sens", ls=(2,)).collect()}
    assert rows[2].min_distinct_sensitive == 0  # the all-NULL class
    assert (rows[2].classes_below, rows[2].rows_below) == (1, 2)
    assert rows[2].homogeneous_rows == 2
    base = sorted(map(tuple, l_diversity(df, ["qi"], "sens").collect()))
    again = sorted(
        map(tuple, l_diversity(df.repartition(5), ["qi"], "sens").collect())
    )
    assert base == again
    # empty input: vacuous audit, guarded divisions
    empty = spark.createDataFrame([], "id long, qi string, sens string")
    erows = l_diversity(empty, ["qi"], "sens", ls=(2,)).collect()
    assert len(erows) == 1 and erows[0].n_rows == 0
    assert erows[0].suppression_micro is None


def test_l_diversity_cross_engine_parity_on_planted_customer(spark):
    """Replay the EXACT prepared oracle SQL over a planted customer
    table and compare row-for-row (the staging proof every prepared
    oracle gets)."""
    import duckdb
    import pandas as pd

    from spark_cdc_replication_spark.operators.privacy import l_diversity
    from spark_cdc_replication_spark.workloads.llmdata import (
        ORACLE_PII_LDIVERSITY,
    )

    cust = pd.DataFrame(
        [
            (i, f"Customer#{i}", i % 5, (i * 739.07) % 4000 - 500,
             ["AUTO", "HOUSE", "SHIP", "FOOD"][i % 4] if i % 11 else None)
            for i in range(80)
        ],
        columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    )
    con = duckdb.connect()
    con.register("customer", cust)
    res = con.execute(ORACLE_PII_LDIVERSITY)
    cols = [d[0] for d in res.description]
    want = set(map(tuple, res.fetchall()))
    sdf = l_diversity(
        spark.createDataFrame(cust),
        [
            F.col("c_nationkey"),
            F.floor(F.col("c_acctbal") / F.lit(1000.0)).alias("__acct_band"),
        ],
        "c_mktsegment",
        ls=(2, 3, 5),
    )
    got = {tuple(r[c] for c in cols) for r in sdf.collect()}
    assert got == want


def test_t_closeness_cross_engine_parity_on_planted_customer(spark):
    """Replay the EXACT prepared ORACLE_PII_TCLOSENESS SQL over a
    planted customer table — including NULL-band (NULL-QI) classes and
    NULL sensitive rows — and compare row-for-row (the staging proof
    every prepared oracle gets)."""
    import duckdb
    import pandas as pd

    from spark_cdc_replication_spark.operators.privacy import t_closeness
    from spark_cdc_replication_spark.workloads.llmdata import (
        ORACLE_PII_TCLOSENESS,
    )

    cust = pd.DataFrame(
        [
            (i, f"Customer#{i}", i % 5,
             None if i % 13 == 0 else (i * 739.07) % 4000 - 500,
             ["AUTO", "HOUSE", "SHIP", "FOOD"][i % 4] if i % 11 else None)
            for i in range(80)
        ],
        columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    )
    con = duckdb.connect()
    con.register("customer", cust)
    res = con.execute(ORACLE_PII_TCLOSENESS)
    cols = [d[0] for d in res.description]
    want = set(map(tuple, res.fetchall()))
    sdf = t_closeness(
        spark.createDataFrame(cust),
        [
            F.col("c_nationkey"),
            F.floor(F.col("c_acctbal") / F.lit(1000.0)).alias("__acct_band"),
        ],
        "c_mktsegment",
        ts=(100_000, 200_000, 300_000),
    )
    got = {tuple(r[c] for c in cols) for r in sdf.collect()}
    assert got == want

    # all-NULL sensitive: zero disclosed classes — BOTH engines must
    # still emit one vacuous row per threshold (the oracle's per_t is
    # a LEFT JOIN for exactly this)
    con2 = duckdb.connect()
    con2.register("cust_base", cust)
    con2.execute(
        "CREATE VIEW customer AS SELECT c_custkey, c_name, c_nationkey, "
        "c_acctbal, CAST(NULL AS VARCHAR) AS c_mktsegment FROM cust_base"
    )
    res2 = con2.execute(ORACLE_PII_TCLOSENESS)
    want2 = set(map(tuple, res2.fetchall()))
    sdf2 = t_closeness(
        spark.createDataFrame(cust).withColumn(
            "c_mktsegment", F.lit(None).cast("string")
        ),
        [
            F.col("c_nationkey"),
            F.floor(F.col("c_acctbal") / F.lit(1000.0)).alias("__acct_band"),
        ],
        "c_mktsegment",
        ts=(100_000, 200_000, 300_000),
    )
    got2 = {tuple(r[c] for c in cols) for r in sdf2.collect()}
    assert len(want2) == 3 and got2 == want2


def test_line_dedup_doc_cross_engine_parity_on_planted_docs(spark):
    """Replay the EXACT prepared ORACLE_TEXT_LINE_DEDUP_DOC SQL over
    planted documents (long, exactly-8-word, and short texts) and
    compare the registered query's output row-for-row."""
    import duckdb
    import pandas as pd

    from spark_cdc_replication_spark.workloads.llmdata import (
        ORACLE_TEXT_LINE_DEDUP_DOC,
        q_text_line_dedup_doc,
    )

    words = "alpha bravo charlie delta echo foxtrot golf hotel " \
            "india juliet kilo lima mike november oscar papa quebec"
    docs = pd.DataFrame(
        [(0, words), (1, "one two three"), (2, " ".join(words.split()[:8]))],
        columns=["doc_id", "text"],
    )
    con = duckdb.connect()
    con.register("documents", docs)
    res = con.execute(ORACLE_TEXT_LINE_DEDUP_DOC)
    cols = [d[0] for d in res.description]
    want = set(map(tuple, res.fetchall()))

    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(docs).write.parquet(os.path.join(td, "documents.parquet"))
        sdf = q_text_line_dedup_doc(spark, td)
        got = {tuple(r[c] for c in cols) for r in sdf.collect()}
    assert got == want


def test_k_anonymize_picks_finest_passing_level(spark):
    """Ladder choice: level 0 (zip, all singletons) cannot meet k=3
    with a zero suppression budget; level 1 (city, classes of 4) can —
    the output must be recoded at city granularity, keep every row,
    and re-audit k-anonymous."""
    from spark_cdc_replication_spark.operators.privacy import (
        k_anonymity,
        k_anonymize,
    )

    df = spark.createDataFrame(
        [(i, f"z{i}", ["chi", "nyc", "la"][i % 3]) for i in range(12)],
        "id long, zip string, city string",
    )
    out = k_anonymize(
        df,
        levels=[[F.col("zip")], [F.col("city")]],
        out_names=["area"],
        carry_cols=["id"],
        k=3,
        max_suppression_micro=0,
    )
    rows = out.collect()
    assert len(rows) == 12 and {r.area for r in rows} == {"chi", "nyc", "la"}
    assert {r.id for r in rows} == set(range(12))  # carry col intact
    audit = k_anonymity(out, ["area"], ks=(3,)).collect()[0]
    assert audit.classes_below == 0 and audit.min_class_size >= 3


def test_k_anonymize_suppresses_within_budget(spark):
    """When the finest level's below-k fraction fits the budget, it is
    chosen and exactly the below-k rows are suppressed."""
    from spark_cdc_replication_spark.operators.privacy import k_anonymize

    df = spark.createDataFrame(
        [(i, "A") for i in range(5)] + [(99, "B")],
        "id long, g string",
    )
    out = k_anonymize(
        df,
        levels=[[F.col("g")]],
        out_names=["g2"],
        carry_cols=["id"],
        k=2,
        max_suppression_micro=200_000,  # 1/6 of rows ~ 166,667 fits
    )
    rows = out.collect()
    assert {r.id for r in rows} == set(range(5))  # the singleton B row dropped
    assert all(r.g2 == "A" for r in rows)


def test_k_anonymize_coarsest_fallback_suppresses_remainder(spark):
    """If even the coarsest rung cannot meet the budget, it is used
    anyway and ITS below-k remainder suppressed — the output is
    k-anonymous by construction (possibly empty)."""
    from spark_cdc_replication_spark.operators.privacy import k_anonymize

    df = spark.createDataFrame([(1, "A"), (2, "B")], "id long, g string")
    out = k_anonymize(
        df,
        levels=[[F.col("g")]],
        out_names=["g2"],
        carry_cols=["id"],
        k=2,
        max_suppression_micro=0,
    )
    assert out.collect() == []


def test_k_anonymize_null_rung_is_null_safe(spark):
    """A ladder rung that generalizes an attribute to NULL produces
    NULL-keyed classes; suppression must still reach them (null-safe
    anti-join) — plain equality would let every below-k NULL-keyed
    class dodge the drop."""
    from spark_cdc_replication_spark.operators.privacy import k_anonymize

    df = spark.createDataFrame(
        [(i, "x", i * 100) for i in range(5)] + [(9, "y", 900)],
        "id long, seg string, bal long",
    )
    out = k_anonymize(
        df,
        # single rung: keep seg, fully generalize bal to NULL
        levels=[[F.col("seg"), F.lit(None).cast("long")]],
        out_names=["seg2", "band"],
        carry_cols=["id"],
        k=2,
        max_suppression_micro=1_000_000,
    )
    rows = out.collect()
    # class (y, NULL) has size 1 < k and MUST be suppressed
    assert {r.id for r in rows} == set(range(5))
    assert all(r.band is None for r in rows)


def test_k_anonymize_validates_ladder(spark):
    from spark_cdc_replication_spark.operators.privacy import k_anonymize

    df = spark.createDataFrame([(1, "a")], "id long, g string")
    with pytest.raises(ValueError, match="levels"):
        k_anonymize(df, levels=[], out_names=["g2"], carry_cols=["id"])
    with pytest.raises(ValueError, match="levels"):
        k_anonymize(
            df, levels=[[F.col("g"), F.col("g")]], out_names=["g2"], carry_cols=["id"]
        )


def test_dedup_lines_in_doc_all_mode(spark):
    """First occurrence of each non-empty line survives in order;
    empty lines are structure and always survive; other columns and
    NULL text pass through."""
    from spark_cdc_replication_spark.operators.textanalysis import (
        dedup_lines_in_doc,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha\nbeta\nalpha\n\ngamma\nbeta\nalpha", "keep"),
            (2, "\n\nonly\n\n", "keep"),
            (3, None, "keep"),
        ],
        "doc_id long, text string, extra string",
    )
    got = {r.doc_id: r.text for r in dedup_lines_in_doc(docs).collect()}
    assert got[1] == "alpha\nbeta\n\ngamma"
    assert got[2] == "\n\nonly\n\n"      # blanks untouched in all-mode
    assert got[3] is None
    assert dedup_lines_in_doc(docs).columns == ["doc_id", "text", "extra"]


def test_dedup_lines_in_doc_consecutive_mode(spark):
    """Adjacent runs collapse to one (blank runs included); the same
    line reappearing later survives — the log-cleanup rule."""
    from spark_cdc_replication_spark.operators.textanalysis import (
        dedup_lines_in_doc,
    )

    docs = spark.createDataFrame(
        [
            (1, "tick\ntick\ntick\nboom\ntick\n\n\nend"),
            (2, "a\nb\na"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.text
        for r in dedup_lines_in_doc(docs, mode="consecutive").collect()
    }
    assert got[1] == "tick\nboom\ntick\n\nend"
    assert got[2] == "a\nb\na"

    import pytest

    with pytest.raises(ValueError, match="all|consecutive"):
        dedup_lines_in_doc(docs, mode="bogus")


def test_dedup_lines_in_doc_zero_shuffle_plan(spark):
    """The 100 TB contract: no exchange anywhere — pure per-row
    projection."""
    from spark_cdc_replication_spark.operators.textanalysis import (
        dedup_lines_in_doc,
    )

    docs = spark.createDataFrame(
        [(1, "a\na\nb")], "doc_id long, text string"
    )
    plan = dedup_lines_in_doc(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def _excise(spark, docs_rows, bench_rows, n=4):
    from spark_cdc_replication_spark.operators.textanalysis import (
        excise_contaminated_spans,
    )

    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    bench = spark.createDataFrame(bench_rows, "text string")
    return excise_contaminated_spans(docs, bench, n=n).collect()


def test_excise_contaminated_spans_surgical(spark):
    """The planted benchmark passage is cut out of a mostly-clean doc;
    the doc survives with its other words (casing preserved), and the
    counters say exactly what happened."""
    bench = [("what is the capital of france",)]
    docs = [
        (
            1,
            "My Blog Post quotes: what is the capital of france end of "
            "quote and Continues normally",
        ),
        (2, "an entirely clean document with NOTHING  leaked\tin it"),
        (3, None),
        (4, "short clean text"),
    ]
    got = {r.doc_id: r for r in _excise(spark, docs, bench, n=6)}
    # doc 1: starts at word 4 ("what") -> words 4..9 excised
    assert got[1].text == "My Blog Post quotes: end of quote and Continues normally"
    assert got[1].n_spans_excised == 1 and got[1].n_words_removed == 6
    # untouched docs are BYTE-identical (double space + tab preserved)
    assert got[2].text == "an entirely clean document with NOTHING  leaked\tin it"
    assert got[2].n_spans_excised == 0 and got[2].n_words_removed == 0
    assert got[3].text is None
    assert got[4].text == "short clean text"


def test_excise_contaminated_spans_overlap_merge_and_full_leak(spark):
    """Overlapping matches merge into one excised region; a fully
    leaked doc becomes the empty string but is never dropped; matching
    is case-insensitive."""
    bench = [("alpha beta gamma delta",), ("gamma delta epsilon zeta",)]
    docs = [
        # matches at 0 (alpha..delta) and 2 (gamma..zeta): union [0,6)
        (1, "alpha beta GAMMA delta epsilon zeta tail words here"),
        (2, "Alpha Beta Gamma Delta"),  # the whole doc is the leak
    ]
    got = {r.doc_id: r for r in _excise(spark, docs, bench, n=4)}
    assert got[1].text == "tail words here"
    assert got[1].n_spans_excised == 2 and got[1].n_words_removed == 6
    assert got[2].text == ""
    assert got[2].n_words_removed == 4
    # 2 rows in, 2 rows out — excision never drops documents
    assert len(got) == 2


def test_excise_fixpoint_closes_seam_stitched_leaks(spark):
    """r15: the documented seam caveat, closed — excising 'b c d' from
    'a b c d e f g' stitches 'a e f', itself a benchmark trigram; a
    single pass leaves it, fixpoint=True re-excises until a pass finds
    nothing, with counters ACCUMULATED across passes.  On seam-free
    fixtures (and with max_passes=1) fixpoint is row-identical to the
    single pass, and clean docs stay byte-identical."""
    from spark_cdc_replication_spark.operators.textanalysis import (
        excise_contaminated_spans,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "h i j k l m")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([("b c d",), ("a e f",)], "text string")

    single = {r.doc_id: r for r in
              excise_contaminated_spans(docs, bench, n=3).collect()}
    assert single[1].text == "a e f g"          # the stitched leak survives
    assert (single[1].n_spans_excised, single[1].n_words_removed) == (1, 3)

    fixed = {r.doc_id: r for r in
             excise_contaminated_spans(docs, bench, n=3, fixpoint=True).collect()}
    assert fixed[1].text == "g"                  # pass 2 excised the seam
    assert (fixed[1].n_spans_excised, fixed[1].n_words_removed) == (2, 6)
    assert fixed[2].text == "h i j k l m"        # clean doc byte-identical
    assert (fixed[2].n_spans_excised, fixed[2].n_words_removed) == (0, 0)

    # max_passes=1 degenerates to the single pass exactly
    capped = {r.doc_id: r for r in
              excise_contaminated_spans(
                  docs, bench, n=3, fixpoint=True, max_passes=1).collect()}
    assert {k: tuple(v) for k, v in capped.items()} == {
        k: tuple(v) for k, v in single.items()
    }

    # seam-free fixture: fixpoint ≡ single pass row for row
    nf_docs = spark.createDataFrame(
        [(1, "alpha beta GAMMA delta epsilon zeta tail words here"),
         (2, "Alpha Beta Gamma Delta")],
        "doc_id long, text string",
    )
    nf_bench = spark.createDataFrame(
        [("alpha beta gamma delta",), ("gamma delta epsilon zeta",)],
        "text string",
    )
    one = sorted(map(tuple, excise_contaminated_spans(
        nf_docs, nf_bench, n=4).collect()))
    fp = sorted(map(tuple, excise_contaminated_spans(
        nf_docs, nf_bench, n=4, fixpoint=True).collect()))
    assert one == fp


def test_excise_equivalence_with_contamination_check(spark, sf_dir):
    """Every document contamination_check flags (>= 1 matching
    n-gram... on the same normalized tokenization) must come back
    rewritten, and every unflagged one byte-identical — pinned on the
    planted fixture the audit queries use."""
    from pyspark.sql import functions as F

    from spark_cdc_replication_spark.operators.textanalysis import (
        excise_contaminated_spans,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    bench = docs.filter(F.col("doc_id") % 50 == 0).select("text")
    train = docs.filter(F.col("doc_id") % 50 != 0)
    out = excise_contaminated_spans(train, bench, n=8)
    # rewritten iff touched
    touched = {r.doc_id for r in out.filter("n_spans_excised > 0").collect()}
    orig = {r.doc_id: r.text for r in train.collect()}
    for r in out.collect():
        if r.doc_id in touched:
            assert r.n_words_removed > 0
        else:
            assert r.text == orig[r.doc_id]
    # idempotence on this fixture: a second pass finds nothing
    out.persist()
    again = excise_contaminated_spans(
        out.select("doc_id", "text"), bench, n=8
    )
    assert again.filter("n_spans_excised > 0").count() == 0
    out.unpersist()


def test_t_closeness_hand_computed_exact(spark):
    """Two planted classes with hand-derivable total-variation
    distances: class A (3x of {x,y}, global 3:1) has t = 1/4 exactly,
    the singleton class B (1y) has t = 3/4 — integer micro-units from
    the exact-fraction formula, no float anywhere."""
    from spark_cdc_replication_spark.operators.privacy import t_closeness

    df = spark.createDataFrame(
        [("A", "x"), ("A", "x"), ("A", "x"), ("B", "y")],
        "qi string, v string",
    )
    got = {
        r.t_micro: r
        for r in t_closeness(df, ["qi"], "v", ts=(100_000, 300_000)).collect()
    }
    for r in got.values():
        assert r.n_rows == 4 and r.n_classes == 2
        assert r.max_t_micro == 750_000
    assert (got[100_000].classes_above, got[100_000].rows_above) == (2, 4)
    assert (got[300_000].classes_above, got[300_000].rows_above) == (1, 1)


def test_t_closeness_uniform_table_is_zero_and_null_excluded(spark):
    """Every class distributed exactly like the global table -> max_t
    0; NULL sensitive rows disclose nothing (excluded from both
    distributions, all-NULL classes excluded entirely); empty input is
    the vacuous report."""
    from spark_cdc_replication_spark.operators.privacy import t_closeness

    uniform = spark.createDataFrame(
        [("A", "x"), ("A", "y"), ("B", "x"), ("B", "y")],
        "qi string, v string",
    )
    r = t_closeness(uniform, ["qi"], "v", ts=(0,)).collect()[0]
    assert r.max_t_micro == 0 and r.classes_above == 0

    with_null = spark.createDataFrame(
        [("A", "x"), ("A", None), ("C", None)], "qi string, v string"
    )
    r = t_closeness(with_null, ["qi"], "v", ts=(500_000,)).collect()[0]
    # class C vanishes (nothing disclosed); A's NULL doesn't count
    assert r.n_classes == 1 and r.n_rows == 1 and r.max_t_micro == 0

    empty = spark.createDataFrame([], "qi string, v string")
    r = t_closeness(empty, ["qi"], "v", ts=(100_000,)).collect()[0]
    assert r.n_rows == 0 and r.n_classes == 0 and r.classes_above == 0


def test_t_closeness_partition_invariance(spark):
    """All-integer output must be identical under any physical layout
    (the l_diversity floor, applied to the third triad member): the
    exact-integer distance sum is order-independent by construction."""
    from spark_cdc_replication_spark.operators.privacy import t_closeness

    rows = [(i % 7, ["x", "y", "z", None][i % 4]) for i in range(200)]
    df = spark.createDataFrame(rows, "qi int, v string")
    base = sorted(map(tuple, t_closeness(df, ["qi"], "v").collect()))
    again = sorted(
        map(tuple, t_closeness(df.repartition(13), ["qi"], "v").collect())
    )
    assert base == again


def test_t_closeness_null_qi_forms_a_real_class(spark):
    """r14 ADVICE regression: NULL quasi-identifier values must group
    into a real equivalence class (the siblings' groupBy semantics) —
    the old null-unsafe multi-column join silently dropped the skewed
    NULL-QI class, understating risk.  On the ADVICE repro both
    classes have t = 1/4 exactly: class A {x,y} vs global 3:1 and the
    NULL class {x,x} vs global 3:1 each sum to 1/2 absolute mass."""
    from spark_cdc_replication_spark.operators.privacy import (
        k_anonymity,
        t_closeness,
    )

    df = spark.createDataFrame(
        [("A", "x"), ("A", "y"), (None, "x"), (None, "x")],
        "qi string, v string",
    )
    r = t_closeness(df, ["qi"], "v", ts=(200_000, 300_000)).collect()
    got = {row.t_micro: row for row in r}
    for row in got.values():
        assert (row.n_rows, row.n_classes) == (4, 2)
        assert row.max_t_micro == 250_000
    assert (got[200_000].classes_above, got[200_000].rows_above) == (2, 4)
    assert (got[300_000].classes_above, got[300_000].rows_above) == (0, 0)
    # agreement with the sibling audit's class census
    ka = k_anonymity(df, ["qi"], ks=(1,)).collect()[0]
    assert (ka.n_rows, ka.n_classes) == (4, 2)

    # multi-column QI: a NULL in ONE field still keys one class
    df2 = spark.createDataFrame(
        [("A", None, "x"), ("A", None, "y"), ("A", 1, "x")],
        "q1 string, q2 int, v string",
    )
    r2 = t_closeness(df2, ["q1", "q2"], "v", ts=(0,)).collect()[0]
    assert (r2.n_rows, r2.n_classes) == (3, 2)


def test_t_closeness_matches_exact_python_model_on_customer(spark, sf_dir):
    """Cross-check on real data: the operator's integer micro-unit
    distances over (nation, balance-band) vs market segment must equal
    an exact-fraction python model row for row (same integer div)."""
    from collections import Counter, defaultdict

    from pyspark.sql import functions as F

    from spark_cdc_replication_spark.operators.privacy import t_closeness

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    qi = [
        F.col("c_nationkey"),
        F.floor(F.col("c_acctbal") / F.lit(1000.0)).alias("__band"),
    ]
    ts = (100_000, 200_000, 300_000)
    got = {
        r.t_micro: (r.n_rows, r.n_classes, r.max_t_micro, r.classes_above, r.rows_above)
        for r in t_closeness(cust, qi, "c_mktsegment", ts=ts).collect()
    }

    rows = cust.select(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / F.lit(1000.0)).alias("band"),
        "c_mktsegment",
    ).collect()
    cells = defaultdict(Counter)
    glob: Counter = Counter()
    for r in rows:
        if r.c_mktsegment is None:
            continue
        cells[(r.c_nationkey, r.band)][r.c_mktsegment] += 1
        glob[r.c_mktsegment] += 1
    N = sum(glob.values())
    t_by_class = {}
    for key, cnt in cells.items():
        nc = sum(cnt.values())
        s0 = sum(abs(a * N - glob[v] * nc) - glob[v] * nc for v, a in cnt.items())
        t_by_class[key] = (s0 + N * nc) * 1_000_000 // (2 * nc * N)
    for t in ts:
        above = [k for k, tv in t_by_class.items() if tv > t]
        want = (
            N,
            len(cells),
            max(t_by_class.values()) if t_by_class else 0,
            len(above),
            sum(sum(cells[k].values()) for k in above),
        )
        assert got[t] == want, (t, got[t], want)


def test_k_anonymize_joint_l_diversity_suppresses_homogeneous_classes(spark):
    """k alone passes a homogeneous class (the textbook homogeneity
    attack); with sensitive_col + l=2 the release must come back both
    k-anonymous AND l-diverse by construction, and defaults (l=1) must
    behave exactly as before."""
    from pyspark.sql import functions as F

    from spark_cdc_replication_spark.operators.privacy import (
        k_anonymity,
        k_anonymize,
        l_diversity,
    )

    # class A: 5 rows, ALL sensitive 'x' (k=5 ok, l=2 fails);
    # class B: 5 rows, mixed sensitive (both ok)
    rows = [("A", 100 + i, "x") for i in range(5)] + [
        ("B", 200 + i, "x" if i % 2 else "y") for i in range(5)
    ]
    df = spark.createDataFrame(rows, "qi string, payload long, v string")
    levels = [(F.col("qi"),), (F.lit(None).cast("string"),)]

    # default path: k=5 holds at the finest rung, nothing suppressed
    plain = k_anonymize(df, levels, ["qi_out"], ["payload"], k=5)
    assert plain.count() == 10

    # joint path, generous budget: the homogeneous class A must be
    # suppressed at the finest rung (5 of 10 rows within budget)
    released = k_anonymize(
        df, levels, ["qi_out"], ["payload", "v"], k=5,
        max_suppression_micro=500_000, sensitive_col="v", l=2,
    )
    got = released.collect()
    assert {r.payload for r in got} == {200, 201, 202, 203, 204}
    # by-construction re-audit: k-anonymous AND l-diverse
    ka = k_anonymity(released, [F.col("qi_out")], ks=(5,)).collect()[0]
    assert ka.rows_below == 0
    ld = l_diversity(released, [F.col("qi_out")], "v", ls=(2,)).collect()[0]
    assert ld.classes_below == 0

    # tight budget: suppressing A (50%) busts 10% -> coarsen to the
    # NULL rung, where the single global class is diverse and whole
    coarse = k_anonymize(
        df, levels, ["qi_out"], ["payload", "v"], k=5,
        max_suppression_micro=100_000, sensitive_col="v", l=2,
    )
    assert coarse.count() == 10
    assert {r.qi_out for r in coarse.collect()} == {None}

    import pytest

    with pytest.raises(ValueError, match="requires sensitive_col"):
        k_anonymize(df, levels, ["qi_out"], ["payload"], l=2)


def test_fixpoint_registry_seam_fixture_pins_two_pass_counters(spark, sf_dir):
    """The r16 registry surface (text_excise_spans_fixpoint) on its
    planted seam fixture: every 20th doc needs exactly TWO passes —
    the zzb trigram first, then the seam-stitched zza trigram —
    ending as ``<original> zza1`` with accumulated counters (2, 6);
    every other doc is byte-identical with (0, 0).  Pins the same
    closed-form expectations ORACLE_TEXT_EXCISE_SPANS_FIXPOINT
    replays, so the prepared oracle and the operator can't drift."""
    from spark_cdc_replication_spark.workloads.llmdata import (
        q_text_excise_spans_fixpoint,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    orig = {r.doc_id: r.text for r in docs.collect()}
    rows = {r.doc_id: r for r in q_text_excise_spans_fixpoint(spark, sf_dir).collect()}
    assert set(rows) == set(orig)

    import hashlib

    planted = clean = 0
    for doc_id, r in rows.items():
        if doc_id % 20 == 0:
            expect = orig[doc_id] + " zza1"
            assert (r.n_spans_excised, r.n_words_removed) == (2, 6)
            planted += 1
        else:
            expect = orig[doc_id]
            assert (r.n_spans_excised, r.n_words_removed) == (0, 0)
            clean += 1
        assert r.text_fp == hashlib.md5(expect.encode()).hexdigest()
    assert planted > 0 and clean > 0


def test_excise_repeated_spans_removes_cross_doc_boilerplate(spark):
    """The self-supervised exciser: a boilerplate trigram planted in 3
    docs is cut from ALL of them (every occurrence is noise), a
    within-doc-only repeat never triggers (distinct-doc count is 1),
    unique docs pass byte-identical, min_docs is a hard boundary, and
    overlapping repeated grams merge into one span union."""
    from spark_cdc_replication_spark.operators.textanalysis import (
        excise_repeated_spans,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha one COMMON BOILER PLATE omega"),
            (2, "beta two common boiler plate"),
            (3, "common Boiler Plate gamma three four"),
            # within-doc repetition only — must survive whole
            (4, "self self self self self self"),
            (5, "a perfectly unique document here"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in excise_repeated_spans(docs, n=3, min_docs=2).collect()}
    assert out[1].text == "alpha one omega"
    assert out[2].text == "beta two"
    assert out[3].text == "gamma three four"
    assert (out[1].n_spans_excised, out[1].n_words_removed) == (1, 3)
    assert out[4].text == "self self self self self self"
    assert (out[4].n_spans_excised, out[4].n_words_removed) == (0, 0)
    assert out[5].text == "a perfectly unique document here"

    # min_docs boundary: the same plant with min_docs=4 touches nothing
    clean = excise_repeated_spans(docs, n=3, min_docs=4)
    assert clean.filter("n_spans_excised > 0").count() == 0
    assert {r.text for r in clean.collect()} == {r.text for r in docs.collect()}

    # overlap merge: docs 6/7 share the 4-word run 'p q r s', so with
    # n=3 two overlapping starts (p q r, q r s) merge into one cut of
    # 4 words — 2 span starts counted, 4 words removed
    more = spark.createDataFrame(
        [(6, "x p q r s y"), (7, "z p q r s w")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in excise_repeated_spans(more, n=3, min_docs=2).collect()}
    assert got[6].text == "x y" and got[7].text == "z w"
    assert (got[6].n_spans_excised, got[6].n_words_removed) == (2, 4)


def test_excise_repeated_spans_edges_and_partition_invariance(spark):
    """NULL/empty/short docs pass byte-identical with zero counters;
    a fully-boilerplate doc becomes the empty string (never dropped);
    results are invariant to the input partitioning."""
    from spark_cdc_replication_spark.operators.textanalysis import (
        excise_repeated_spans,
    )

    docs = spark.createDataFrame(
        [
            (1, "shared run of words here plus one tail"),
            (2, "shared run of words here plus one"),
            (3, None),
            (4, ""),
            (5, "tiny"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in excise_repeated_spans(docs, n=7, min_docs=2).collect()}
    assert out[1].text == "tail" and out[2].text == ""
    assert (out[2].n_spans_excised, out[2].n_words_removed) == (1, 7)
    assert out[3].text is None and out[3].n_spans_excised == 0
    assert out[4].text == "" and out[4].n_words_removed == 0
    assert out[5].text == "tiny"
    assert excise_repeated_spans(docs, n=7, min_docs=2).count() == 5

    a = sorted(map(tuple, excise_repeated_spans(docs.repartition(1), n=7, min_docs=2).collect()))
    b = sorted(map(tuple, excise_repeated_spans(docs.repartition(13), n=7, min_docs=2).collect()))
    assert a == b


def test_excise_repeated_spans_matches_all_positions_python_model(spark, sf_dir):
    """The whole real sf0.001 corpus vs a brute-force python model:
    tokenize lowercased, count DISTINCT docs per 12-gram, excise the
    union of [p, p+12) at every start whose gram lives in >= 2 docs,
    re-emit original-case survivors — byte-for-byte per doc, counters
    exact.  The corpus carries natural cross-doc repeats (its vocab is
    tiny), so this exercises real collisions, not just plants."""
    import re as _re

    from spark_cdc_replication_spark.operators.textanalysis import (
        excise_repeated_spans,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    rows = {r.doc_id: r.text for r in docs.collect()}
    n = 12

    def toks(t):
        t = _re.sub(r"^\s+|\s+$", "", t or "")
        return t.split() if t else []

    gram_docs = {}
    for did, t in rows.items():
        w = [x.lower() for x in toks(t)]
        for p in range(len(w) - n + 1):
            gram_docs.setdefault(tuple(w[p : p + n]), set()).add(did)
    expected = {}
    for did, t in rows.items():
        orig = toks(t)
        w = [x.lower() for x in orig]
        starts = [
            p
            for p in range(len(w) - n + 1)
            if len(gram_docs[tuple(w[p : p + n])]) >= 2
        ]
        cut = set()
        for p in starts:
            cut.update(range(p, p + n))
        kept = [orig[i] for i in range(len(orig)) if i not in cut]
        text = " ".join(kept) if starts else t
        expected[did] = (text, len(starts), len(orig) - len(kept) if starts else 0)

    got = {
        r.doc_id: (r.text, r.n_spans_excised, r.n_words_removed)
        for r in excise_repeated_spans(docs, n=n, min_docs=2).collect()
    }
    assert got == expected
    assert any(v[1] > 0 for v in got.values()), "fixture lost its natural repeats"

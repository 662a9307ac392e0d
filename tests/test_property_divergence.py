"""Property-based checks of the r10/r11 mixture/provenance/coverage
diagnostics against FULL independent Python reimplementations
(oracle-independent floors — the model shares no code with the
operators, only the published spec: md5 bucketing, Laplace smoothing,
floored micro-unit JSD terms; char shingles, stride, doc-freq cap,
cross-source pairing; word-n-gram target coverage with exact integer
division).
"""

from __future__ import annotations

import hashlib
import math
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spark_cdc_replication_spark.operators.dedup import cross_source_overlap
from spark_cdc_replication_spark.operators.sampling import unigram_divergence

VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
SOURCES = ["s0", "s1", "s2"]
B = 16  # few buckets -> real collisions between vocabulary words

corpus_strategy = st.lists(
    st.tuples(
        st.sampled_from(SOURCES),
        st.lists(st.sampled_from(VOCAB), min_size=0, max_size=8).map(" ".join),
    ),
    min_size=1,
    max_size=14,
)


def _norm(text: str) -> str:
    return re.sub(r"\s+", " ", text.lower()).strip()


def _bucket(tok: str) -> int:
    return int(hashlib.md5(f"dsir:{tok}".encode()).hexdigest()[:8], 16) % B


def _counts(texts: list[str]) -> dict[int, int]:
    out: dict[int, int] = {}
    for t in texts:
        nt = _norm(t)
        if not nt:
            continue  # blank docs are excluded (token_count semantics)
        for tok in nt.split(" "):
            b = _bucket(tok)
            out[b] = out.get(b, 0) + 1
    return out


def model_divergence(rows, target_texts):
    """Spec: per source with >= 1 token, (n_tokens, jsd_micro)."""
    tc = _counts(target_texts)
    nt = sum(tc.values())
    by_src: dict[str, list[str]] = {}
    for s, t in rows:
        by_src.setdefault(s, []).append(t)
    out = {}
    for s, texts in by_src.items():
        gc = _counts(texts)
        ng = sum(gc.values())
        if ng == 0:
            continue
        jsd = 0
        for b in range(B):
            p = (gc.get(b, 0) + 1) / (ng + B)
            q = (tc.get(b, 0) + 1) / (nt + B)
            jsd += math.floor(500000.0 * p * math.log(2 * p / (p + q)))
            jsd += math.floor(500000.0 * q * math.log(2 * q / (p + q)))
        out[s] = (ng, jsd)
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus_strategy, st.lists(st.sampled_from(VOCAB), min_size=1, max_size=6))
def test_divergence_matches_python_model(spark, rows, target_words):
    target_texts = [" ".join(target_words)]
    docs = spark.createDataFrame(
        [(i, s, t) for i, (s, t) in enumerate(rows)],
        "doc_id long, source string, text string",
    )
    tgt = spark.createDataFrame(
        [(1000 + i, "tgt", t) for i, t in enumerate(target_texts)],
        "doc_id long, source string, text string",
    )
    got = {
        r.source: (r.n_tokens, r.jsd_micro)
        for r in unigram_divergence(docs, tgt, num_buckets=B).collect()
    }
    assert got == model_divergence(rows, target_texts)


# --- cross_source_overlap vs an all-pairs model ------------------------

SHINGLE_LEN = 8
STRIDE = 3

span_strategy = st.lists(
    st.tuples(
        st.sampled_from(SOURCES),
        st.text(alphabet="abc d", min_size=0, max_size=24),
    ),
    min_size=1,
    max_size=10,
)


def _shingles(text: str) -> set:
    t = _norm(text)
    if len(t) < SHINGLE_LEN:
        return set()
    return {
        t[i : i + SHINGLE_LEN]
        for i in range(0, max(len(t) - SHINGLE_LEN, 0) + 1, STRIDE)
    }


def model_cross_source(rows, cap):
    sh_sets = [(_shingles(t)) for _, t in rows]
    # doc-frequency cap applies to DISTINCT (doc, shingle) postings
    freq: dict[str, int] = {}
    for s in sh_sets:
        for g in s:
            freq[g] = freq.get(g, 0) + 1
    kept = [{g for g in s if freq[g] <= cap} for s in sh_sets]
    pairs = set()
    for i in range(len(rows)):
        for j in range(len(rows)):
            si, sj = rows[i][0], rows[j][0]
            if si >= sj:
                continue
            if kept[i] & kept[j]:
                pairs.add((si, i, sj, j))
    out: dict[tuple, int] = {}
    for sa, _, sb, _ in pairs:
        out[(sa, sb)] = out.get((sa, sb), 0) + 1
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(span_strategy, st.integers(min_value=2, max_value=5))
def test_cross_source_matches_all_pairs_model(spark, rows, cap):
    docs = spark.createDataFrame(
        [(i, s, t) for i, (s, t) in enumerate(rows)],
        "doc_id long, source string, text string",
    )
    got = {
        (r.source_a, r.source_b): r.n_pairs
        for r in cross_source_overlap(
            docs, shingle_len=SHINGLE_LEN, stride=STRIDE, max_doc_freq=cap
        ).collect()
    }
    assert got == model_cross_source(rows, cap)


# --- ngram_coverage vs an independent model ----------------------------

N_GRAM = 2  # bigrams so short random docs actually produce grams


def _word_grams(text: str, n: int = N_GRAM) -> set:
    toks = _norm(text).split(" ") if _norm(text) else []
    return {
        " ".join(toks[i : i + n]) for i in range(0, len(toks) - n + 1)
    }


def model_coverage(rows, target_texts, n: int = N_GRAM):
    """Spec: one row per df group value — (n_matched, n_target_grams)
    where n_matched = |distinct grams anywhere in the group ∩ target
    gram set| and the target set unions over all target docs."""
    tgt = set()
    for t in target_texts:
        tgt |= _word_grams(t, n)
    by_src: dict[str, set] = {}
    for s, t in rows:
        by_src.setdefault(s, set()).update(_word_grams(t, n))
    return {s: (len(g & tgt), len(tgt)) for s, g in by_src.items()}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    corpus_strategy,
    st.lists(
        st.lists(st.sampled_from(VOCAB), min_size=0, max_size=6).map(" ".join),
        min_size=1,
        max_size=3,
    ),
)
def test_ngram_coverage_matches_python_model(spark, rows, target_texts):
    from spark_cdc_replication_spark.operators.textanalysis import ngram_coverage

    docs = spark.createDataFrame(
        [(i, s, t) for i, (s, t) in enumerate(rows)],
        "doc_id long, source string, text string",
    )
    tgt = spark.createDataFrame(
        [(1000 + i, "tgt", t) for i, t in enumerate(target_texts)],
        "doc_id long, source string, text string",
    )
    got = {
        r.source: (r.n_matched, r.n_target_grams, r.coverage_micro)
        for r in ngram_coverage(docs, tgt, n=N_GRAM).collect()
    }
    want = model_coverage(rows, target_texts)
    assert set(got) == {s for s, _ in rows}  # every group, incl. zero rows
    for s, (m, nt, cov) in got.items():
        wm, wnt = want[s]
        assert (m, nt) == (wm, wnt), s
        assert cov == (0 if wnt == 0 else (wm * 1_000_000) // wnt), s

"""Property-based check of the composed dedup pipeline.

Invariant: at the equality-level threshold, ``dedup_corpus`` over ANY
small corpus equals the brute-force specification — compute every
pair's exact shingle-set Jaccard in plain Python, remove each doc that
matches a smaller id.  Soundness of the model: with <= ~50 shingles per
doc, jaccard >= 0.999 forces EQUAL shingle sets, equal sets hash to
identical minhash signatures, and identical signatures always collide
in the band join — so the LSH candidate stage provably cannot miss a
qualifying pair, making the banded pipeline and the all-pairs model
exactly comparable (no recall slack needed).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spark_cdc_replication_spark.operators.dedup import dedup_corpus

VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]

#: A document is 3-12 words from a tiny vocabulary (so duplicate and
#: near-miss texts actually occur); ids are the list positions.
doc_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=3, max_size=12).map(" ".join),
    min_size=1,
    max_size=12,
)


def shingle_set(text: str, n: int = 3) -> frozenset:
    words = text.lower().split()
    return frozenset(
        " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
    )


def model_survivors(texts: list[str], min_jaccard: float = 0.999) -> set[int]:
    """All-pairs spec: drop i if some j < i has jaccard >= threshold."""
    sets = [shingle_set(t) for t in texts]
    removed = set()
    for i in range(len(texts)):
        for j in range(i):
            a, b = sets[i], sets[j]
            if not a or not b:
                continue
            jac = len(a & b) / len(a | b)
            if jac >= min_jaccard:
                removed.add(i)
                break
    return set(range(len(texts))) - removed


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(doc_strategy)
def test_dedup_corpus_matches_all_pairs_model(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = dedup_corpus(df, min_est_jaccard=0.99, min_jaccard=0.999)
    got = {r.doc_id for r in out.collect()}
    assert got == model_survivors(texts)


def model_clean(
    train: list[str], bench: list[str], min_jaccard: float = 0.999
) -> set[int]:
    """All-pairs spec for decontamination: drop train doc i if ANY
    bench doc matches it at the threshold."""
    bsets = [shingle_set(t) for t in bench]
    kept = set()
    for i, t in enumerate(train):
        a = shingle_set(t)
        hit = any(
            b and a and len(a & b) / len(a | b) >= min_jaccard for b in bsets
        )
        if not hit:
            kept.add(i)
    return kept


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(doc_strategy, doc_strategy)
def test_decontaminate_matches_all_pairs_model(spark, train_texts, bench_texts):
    from spark_cdc_replication_spark.operators.dedup import decontaminate

    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train_texts)], "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(i, t) for i, t in enumerate(bench_texts)], "doc_id long, text string"
    )
    out = decontaminate(train, bench, min_est_jaccard=0.99, min_jaccard=0.999)
    got = {r.doc_id for r in out.collect()}
    assert got == model_clean(train_texts, bench_texts)


def _py_containment(texts, n=3, min_containment=0.0, max_doc_freq=None):
    """Plain-Python specification of containment_pairs: distinct word
    n-gram sets per doc, optional doc-frequency cap applied to BOTH
    sides, directional |A∩B|/|A| for every ordered pair."""
    import collections

    grams = {}
    for i, t in enumerate(texts):
        w = t.split()
        grams[i] = {tuple(w[j : j + n]) for j in range(len(w) - n + 1)}
    if max_doc_freq is not None:
        df_count = collections.Counter(g for gs in grams.values() for g in gs)
        grams = {
            i: {g for g in gs if df_count[g] <= max_doc_freq}
            for i, gs in grams.items()
        }
    out = {}
    for a, ga in grams.items():
        if not ga:
            continue
        for b, gb in grams.items():
            if a == b:
                continue
            shared = len(ga & gb)
            c = shared / len(ga)
            if shared and c >= min_containment:
                out[(a, b)] = round(c, 6)
    return out


@given(docs=doc_strategy, cap=st.one_of(st.none(), st.integers(1, 6)))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_containment_pairs_matches_python_model(spark, docs, cap):
    """operators/dedup.py::containment_pairs equals the all-pairs
    Python specification exactly — pairs, direction, df-cap semantics,
    and the 6-decimal containment value — on arbitrary small corpora
    from a tiny vocabulary (so shared/hot grams actually occur).
    Threshold 0 so every evidenced pair must surface."""
    from spark_cdc_replication_spark.operators.dedup import containment_pairs

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = {
        (r.id_a, r.id_b): r.containment
        for r in containment_pairs(
            df, n=3, min_containment=0.0, max_doc_freq=cap
        ).collect()
    }
    want = _py_containment(docs, n=3, min_containment=0.0, max_doc_freq=cap)
    assert got == want


@given(
    n=st.integers(min_value=2, max_value=24),
    edges=st.lists(
        st.tuples(st.integers(0, 23), st.integers(0, 23)), max_size=20
    ),
)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_split_cluster_safe_never_splits_a_component(spark, n, edges):
    """Property: under ANY pair graph, two docs connected by a path of
    pair edges land in the same split, and docs in no edge keep
    split_assign's assignment exactly."""
    from spark_cdc_replication_spark.operators.sampling import (
        split_assign,
        split_cluster_safe,
    )

    edges = [(a % n, b % n) for a, b in edges if a % n != b % n]
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(n)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(edges or None, "id_a long, id_b long") if edges else (
        spark.createDataFrame([], "id_a long, id_b long")
    )
    weights = (("train", 0.4), ("val", 0.3), ("test", 0.3))
    got = {
        r.doc_id: r.split
        for r in split_cluster_safe(docs, pairs, weights=weights).collect()
    }
    assert set(got) == set(range(n))
    # union-find ground truth in plain python
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    for i in range(n):
        assert got[i] == got[find(i)], f"component of {i} split across sets"
    plain = {
        r.doc_id: r.split for r in split_assign(docs, weights=weights).collect()
    }
    touched = {x for e in edges for x in e}
    for i in set(range(n)) - touched:
        assert got[i] == plain[i]


# --------------------------------------------------------------------------
# decontaminate_semantic vs an exact arithmetic model
# --------------------------------------------------------------------------

vec_strategy = st.lists(
    st.integers(min_value=-3, max_value=3), min_size=4, max_size=4
).map(lambda xs: [float(x) for x in xs])


def model_semantic_clean(train, bench, tau):
    """Exact spec mirroring the native path's arithmetic: cosine =
    dot / (sqrt(na) * sqrt(nb)) — with small-INTEGER components the
    dot and norms are exact in double, so the model and the engine
    compute bit-identical cosines (no summation-order slack)."""
    import math

    def cos(a, b):
        da = sum(x * x for x in a)
        db = sum(x * x for x in b)
        if da == 0 or db == 0:
            return None  # undefined: never contaminates
        return sum(x * y for x, y in zip(a, b)) / (math.sqrt(da) * math.sqrt(db))

    kept = set()
    for i, t in enumerate(train):
        hit = any(
            (c := cos(t, b)) is not None and round(c, 6) >= tau for b in bench
        )
        if not hit:
            kept.add(i)
    return kept


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(vec_strategy, min_size=1, max_size=8),
    st.lists(vec_strategy, min_size=0, max_size=3),
    st.sampled_from([0.5, 0.9]),
)
def test_decontaminate_semantic_matches_exact_model(spark, train, bench, tau):
    """Both impls must reproduce the all-pairs spec.  Boundary
    examples (a cosine within 1e-4 of the threshold) are assumed away:
    the arrow path normalizes BEFORE the dot (one rounding per
    element), so a last-ulp disagreement at the exact 6-decimal edge
    is allowed by its documented contract — everywhere else the two
    impls and the model must agree exactly."""
    import math

    from hypothesis import assume

    from spark_cdc_replication_spark.operators.dedup import decontaminate_semantic

    def cos(a, b):
        da = sum(x * x for x in a)
        db = sum(x * x for x in b)
        if da == 0 or db == 0:
            return None
        return sum(x * y for x, y in zip(a, b)) / (math.sqrt(da) * math.sqrt(db))

    assume(
        all(
            c is None or abs(c - tau) > 1e-4
            for t in train
            for b in bench
            for c in [cos(t, b)]
        )
    )
    want = model_semantic_clean(train, bench, tau)
    tdf = spark.createDataFrame(
        [(i, v) for i, v in enumerate(train)], "vec_id long, embedding array<float>"
    )
    bdf = spark.createDataFrame(
        [(i + 1000, v) for i, v in enumerate(bench)],
        "vec_id long, embedding array<float>",
    )
    for impl in ("native", "arrow"):
        got = {
            r.vec_id
            for r in decontaminate_semantic(
                tdf, bdf, min_cosine=tau, impl=impl
            ).collect()
        }
        assert got == want, impl


def model_excise(train: list[str], bench: list[str], n: int = 3):
    """Pure-python spec for span excision: position p in doc i is a
    leak start when the lowercased word-n-gram at p appears anywhere
    in bench; the union of [p, p+n) word ranges is removed; docs with
    no match stay byte-identical."""
    bgrams = set()
    for t in bench:
        w = t.lower().split()
        bgrams |= {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}
    out = []
    for t in train:
        w = t.split()
        lw = [x.lower() for x in w]
        starts = [
            p
            for p in range(len(w) - n + 1)
            if " ".join(lw[p : p + n]) in bgrams
        ]
        if not starts:
            out.append((t, 0, 0))
            continue
        cut = set()
        for p in starts:
            cut |= set(range(p, p + n))
        kept = [w[i] for i in range(len(w)) if i not in cut]
        out.append((" ".join(kept), len(starts), len(w) - len(kept)))
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(doc_strategy, doc_strategy)
def test_excise_contaminated_spans_matches_python_model(spark, train, bench):
    from spark_cdc_replication_spark.operators.textanalysis import (
        excise_contaminated_spans,
    )

    tdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train)], "doc_id long, text string"
    )
    bdf = spark.createDataFrame([(t,) for t in bench], "text string")
    got = {
        r.doc_id: (r.text, r.n_spans_excised, r.n_words_removed)
        for r in excise_contaminated_spans(tdf, bdf, n=3).collect()
    }
    want = model_excise(train, bench, n=3)
    assert got == {i: w for i, w in enumerate(want)}


def model_line_dedup(text: str, mode: str) -> str:
    lines = text.split("\n")
    if mode == "consecutive":
        out = [l for i, l in enumerate(lines) if i == 0 or l != lines[i - 1]]
    else:
        seen: set[str] = set()
        out = []
        for l in lines:
            if l == "" or l not in seen:
                out.append(l)
            seen.add(l)
    return "\n".join(out)


#: documents as 1-8 newline-joined lines over a tiny line vocabulary
#: (duplicates and blank lines occur constantly)
lines_strategy = st.lists(
    st.lists(
        st.sampled_from(["alpha", "beta", "gamma", ""]), min_size=1, max_size=8
    ).map("\n".join),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lines_strategy, st.sampled_from(["all", "consecutive"]))
def test_dedup_lines_in_doc_matches_python_model(spark, texts, mode):
    from spark_cdc_replication_spark.operators.textanalysis import (
        dedup_lines_in_doc,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r.doc_id: r.text for r in dedup_lines_in_doc(df, mode=mode).collect()}
    assert got == {i: model_line_dedup(t, mode) for i, t in enumerate(texts)}

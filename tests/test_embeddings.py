"""Embedding quantization + unigram-LM scoring operator tests."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from spark_cdc_replication_spark.fixtures import load_table
from spark_cdc_replication_spark.operators.embeddings import quantize_int8
from spark_cdc_replication_spark.operators.textanalysis import unigram_logprob


def test_quantize_int8_bounds_and_reconstruction(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    # recompute q values locally and check range + reconstruction error
    rows = emb.select("vec_id", "embedding").limit(50).collect()
    out = {r.vec_id: r for r in quantize_int8(emb).collect()}
    for r in rows:
        o = out[r.vec_id]
        xs = [float(v) for v in r.embedding]
        scale = max(abs(v) for v in xs)
        assert o.n_dims == len(xs)
        assert o.scale_micro == math.floor(scale * 1e6)
        qs = [math.floor(v * 127.0 / scale + 0.5) for v in xs]
        assert all(-127 <= q <= 127 for q in qs)
        # reconstruction error bounded by half a quantization step
        for v, q in zip(xs, qs):
            assert abs(q * scale / 127.0 - v) <= scale / 127.0 * 0.5 + 1e-9


def test_quantize_int8_zero_vector(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    row = quantize_int8(df).collect()[0]
    assert row.scale_micro == 0
    import hashlib

    assert row.q_fp == hashlib.md5(b"0,0,0").hexdigest()


def test_unigram_logprob_orders_common_above_rare(spark):
    # 20 docs of a shared word + 1 doc of a unique word: the unique-word
    # doc must score strictly lower per token
    rows = [(i, "common common common") for i in range(20)]
    rows.append((99, "zzyzxq"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in unigram_logprob(df).collect()}
    common = out[0].logprob_micro / out[0].n_tokens
    rare = out[99].logprob_micro / out[99].n_tokens
    assert rare < common < 0
    assert out[0].n_tokens == 3 and out[99].n_tokens == 1
    # exact value: ln(60/61) for each of the 3 tokens
    expected = 3 * math.floor(math.log(60 / 61) * 1e6)
    assert out[0].logprob_micro == expected


def test_project_random_matches_sequential_python_model(spark):
    """Each projected component must equal a left-to-right python
    accumulation (IEEE double) of vec . plane — bit-exact, which is
    what makes the micro-unit oracle hashable."""
    import math

    from spark_cdc_replication_spark.operators.embeddings import project_random
    from spark_cdc_replication_spark.operators.similarity import deterministic_planes

    planes = deterministic_planes(1, 4, 6)[0]
    vecs = [[0.5, -1.25, 3.0, 0.125, -2.5, 1.0], [1e-3, 2e-3, -5.0, 4.0, 0.0, 7.5]]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r.vec_id, r.pos): r.proj_micro
        for r in project_random(df, planes).collect()
    }
    import numpy as np

    for i, v in enumerate(vecs):
        v32 = [float(np.float32(x)) for x in v]  # storage is float32
        for j, plane in enumerate(planes):
            acc = 0.0
            for a, b in zip(v32, plane):
                acc = acc + a * b
            assert got[(i, j)] == math.floor(acc * 1e6), (i, j)


def test_knn_label_majority_and_tie_break(spark):
    from spark_cdc_replication_spark.operators.similarity import knn_label

    # 1-D embeddings: cosine is sign-based, so craft neighbors by sign.
    # Query 0 (positive): neighbors 1..4 positive.  Labels: two 7s,
    # one 3, one 9 -> majority 7.  With k=2 it sees labels {7, 3}
    # (ranked by cosine=1.0 tie -> lowest neighbor ids) -> tie 1-1
    # breaks to the SMALLER label 3.
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [2.0, 0.1], 7),
        (2, [3.0, -0.1], 3),
        (3, [4.0, 0.2], 7),
        (4, [5.0, -0.2], 9),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    queries = df.filter("vec_id = 0").selectExpr("vec_id as query_id", "embedding")
    maj = knn_label(df, queries, k=4)
    assert [(r.query_id, r.label, r.votes) for r in maj.collect()] == [(0, 7, 2)]


def test_label_separation_matches_integer_model(spark):
    """label_separation == a Python model that mirrors the exact
    integer micro-unit pipeline (quantize -> floored-mean centroid ->
    integer dot/norm -> floor(cos*1e6) -> rounded mean), on a
    handmade 2-cluster + noise-label layout; NULL-label, NULL-vector
    and zero-norm rows are excluded; rival ties break to the smaller
    label; a tight cluster's margin beats a spread one's."""
    from spark_cdc_replication_spark.operators.embeddings import label_separation

    rows = [
        # label 0: tight cluster on +x
        (1, [1.0, 0.0, 0.0], 0),
        (2, [0.9, 0.1, 0.0], 0),
        (3, [1.1, -0.1, 0.0], 0),
        # label 1: spread cluster around +y
        (4, [0.0, 1.0, 0.3], 1),
        (5, [0.4, 0.8, -0.3], 1),
        (6, [-0.4, 1.2, 0.0], 1),
        # label 2: lone vector between the two
        (7, [0.7, 0.7, 0.0], 2),
        # excluded rows
        (8, [0.5, 0.5, 0.5], None),
        (9, None, 0),
        (10, [0.0, 0.0, 0.0], 1),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {r.label: r for r in label_separation(df).collect()}

    import struct

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    M = 1_000_000

    def quant(v):
        return [math.floor(f32(e) * M) for e in v]

    members = {}
    for _, v, lab in rows:
        if lab is None or v is None:
            continue
        q = quant(v)
        if sum(x * x for x in q) == 0:
            continue
        members.setdefault(lab, []).append(q)

    def centroid(vs):
        n = len(vs)
        return [math.floor(sum(col) / n) for col in zip(*vs)]

    def cos(a, b):
        na = math.sqrt(float(sum(x * x for x in a)))
        nb = math.sqrt(float(sum(x * x for x in b)))
        return float(sum(x * y for x, y in zip(a, b))) / (na * nb)

    cents = {lab: centroid(vs) for lab, vs in members.items()}
    assert set(got) == set(cents)
    for lab, vs in members.items():
        cms = [math.floor(cos(v, cents[lab]) * M) for v in vs]
        exp_coh = round(sum(cms) / len(cms), 6)
        rivals = sorted(
            ((math.floor(cos(cents[lab], cents[o]) * M), o) for o in cents if o != lab),
            key=lambda t: (-t[0], t[1]),
        )
        r = got[lab]
        assert r.n_vecs == len(vs)
        assert r.mean_cohesion_micro == exp_coh, (lab, r.mean_cohesion_micro, exp_coh)
        assert (r.rival_cos_micro, r.rival_label) == rivals[0], (lab, r)
        assert r.margin_micro == round(exp_coh - rivals[0][0], 6)

    # semantics: the tight cluster coheres harder than the spread one
    assert got[0].mean_cohesion_micro > got[1].mean_cohesion_micro
    # label 2 sits between 0 and 1: its rival cosine is the largest
    assert got[2].rival_cos_micro >= max(got[0].rival_cos_micro, got[1].rival_cos_micro)


def test_label_separation_rival_tie_breaks_to_smaller_label(spark):
    from spark_cdc_replication_spark.operators.embeddings import label_separation

    # labels 1 and 2 are IDENTICAL clusters: label 0's rival cosine to
    # each is the same integer, so the tie must break to label 1.
    rows = [
        (1, [1.0, 0.0], 0), (2, [1.0, 0.1], 0),
        (3, [0.0, 1.0], 1), (4, [0.1, 1.0], 1),
        (5, [0.0, 1.0], 2), (6, [0.1, 1.0], 2),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {r.label: r for r in label_separation(df).collect()}
    assert got[0].rival_label == 1
    # identical clusters see each other at cos ~= 1; floor-quantization
    # may land at 999999 when sqrt(d)*sqrt(d) rounds a hair above d —
    # deterministic (same IEEE ops both engines), so pin the floor
    assert got[1].rival_label == 2 and got[1].rival_cos_micro >= 999_999


def test_label_outliers_finds_the_planted_outlier(spark):
    from spark_cdc_replication_spark.operators.embeddings import label_outliers

    # label 0: a tight cluster near +x with ONE planted vector pointing
    # the other way; label 1: a clean cluster near +y.
    rows = [
        (1, [1.0, 0.0], 0), (2, [1.0, 0.05], 0), (3, [0.95, 0.1], 0),
        (4, [-1.0, 0.2], 0),  # the planted outlier
        (5, [0.0, 1.0], 1), (6, [0.05, 1.0], 1),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = label_outliers(df, k=1).collect()
    by_label = {r.label: r for r in got}
    assert by_label[0].vec_id == 4 and by_label[0].rank == 1
    # ranks are per label: both labels surface exactly one row at k=1
    assert sorted(by_label) == [0, 1]
    # full queue is rank-dense and k-capped
    full = label_outliers(df, k=10).collect()
    per = {}
    for r in full:
        per.setdefault(r.label, []).append(r.rank)
    assert sorted(per[0]) == [1, 2, 3, 4] and sorted(per[1]) == [1, 2]
    # the planted outlier is rank 1 with the lowest cos_micro
    lab0 = sorted((r for r in full if r.label == 0), key=lambda r: r.rank)
    assert lab0[0].vec_id == 4
    assert lab0[0].cos_micro == min(r.cos_micro for r in lab0)


def test_label_outliers_contract_matches_separation_membership(spark):
    """The two audits share quantization/membership helpers: rows the
    separation audit excludes (NULL label/vector, zero norm) never
    appear in the outlier queue, and every included member does at a
    large enough k."""
    from spark_cdc_replication_spark.operators.embeddings import (
        label_outliers,
        label_separation,
    )

    rows = [
        (1, [1.0, 0.0], 0), (2, [0.9, 0.1], 0),
        (3, None, 0),            # NULL vector: excluded
        (4, [0.0, 0.0], 0),      # zero norm: excluded
        (5, [0.0, 1.0], None),   # NULL label: excluded
        (6, [0.0, 1.0], 1),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    sep = {r.label: r.n_vecs for r in label_separation(df).collect()}
    out = label_outliers(df, k=100).collect()
    per = {}
    for r in out:
        per.setdefault(r.label, set()).add(r.vec_id)
    assert {lab: len(ids) for lab, ids in per.items()} == sep == {0: 2, 1: 1}
    assert 3 not in per[0] and 4 not in per[0]
    # determinism under repartitioning
    again = label_outliers(df.repartition(5), k=100).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_embedding_outliers_cross_engine_parity_on_planted_corpus(spark):
    """The r10 oracle, proven before it debuts (the DSIR precedent):
    replay the EXACT prepared oracle SQL over a planted corpus and
    compare row-for-row against the operator."""
    import duckdb
    import pandas as pd

    from spark_cdc_replication_spark.operators.embeddings import label_outliers
    from spark_cdc_replication_spark.workloads.llmdata import (
        ORACLE_EMBEDDING_OUTLIERS,
    )

    rows = [
        (1, [1.0, 0.0, 0.2, 0.1], 0), (2, [0.9, 0.1, 0.2, 0.1], 0),
        (3, [-0.8, 0.3, 0.0, 0.0], 0), (4, [1.0, 0.0, 0.1, 0.2], 0),
        (5, [0.0, 1.0, 0.3, 0.0], 1), (6, [0.1, 0.9, 0.3, 0.1], 1),
        (7, [0.2, -1.0, 0.0, 0.3], 1),
    ]
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    con = duckdb.connect()
    con.register("embeddings", pdf)
    res = con.execute(ORACLE_EMBEDDING_OUTLIERS)
    cols = [d[0] for d in res.description]
    want = set(map(tuple, res.fetchall()))

    sdf = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    got = {tuple(r[c] for c in cols) for r in label_outliers(sdf, k=10).collect()}
    assert got == want

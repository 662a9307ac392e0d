"""Deterministic sampling / splitting / packing operator tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_cdc_replication_spark.fixtures import load_table
from spark_cdc_replication_spark.operators.sampling import (
    deterministic_sample,
    pack_greedy,
    pack_offsets,
    split_assign,
)


def test_deterministic_sample_is_stable_and_nested(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    s10 = {r.doc_id for r in deterministic_sample(docs, 0.1).select("doc_id").collect()}
    s10_again = {
        r.doc_id
        for r in deterministic_sample(docs.repartition(7), 0.1).select("doc_id").collect()
    }
    # stable under repartitioning (Spark's sample() is not)
    assert s10 == s10_again
    # nested: everything kept at 10% is kept at 30%
    s30 = {r.doc_id for r in deterministic_sample(docs, 0.3).select("doc_id").collect()}
    assert s10 <= s30
    assert 0.02 < len(s10) / docs.count() < 0.25  # roughly the rate


def test_rate_cut_rounds_to_nearest_bucket(spark, sf_dir):
    # 0.07 is not float-representable: 0.07 * 10000 = 699.999...;
    # plain truncation gave threshold 699 (one bucket short of user
    # intent), and DuckDB's CAST rounds — the floor(x+0.5) contract
    # pins both engines to 700.  Checked three ways: the pure helper,
    # the python-side path (deterministic_sample), and the
    # column-side path (weighted_sample with a literal rate column).
    from spark_cdc_replication_spark.operators.sampling import (
        _rate_cut,
        hash_bucket,
        weighted_sample,
    )

    assert _rate_cut(0.07) == 700
    assert _rate_cut(0.05) == 500          # representable rates unchanged
    docs = load_table(spark, sf_dir, "documents")
    expect = {
        r.doc_id
        for r in docs.filter(hash_bucket("doc_id") < 700).select("doc_id").collect()
    }
    got_py = {
        r.doc_id for r in deterministic_sample(docs, 0.07).select("doc_id").collect()
    }
    got_col = {
        r.doc_id
        for r in weighted_sample(docs, F.lit(0.07)).select("doc_id").collect()
    }
    assert got_py == expect and got_col == expect


def test_split_assign_total_and_disjoint(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = split_assign(docs, (("train", 0.8), ("val", 0.1), ("test", 0.1)))
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == docs.count()
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"]


def greedy_model(sizes: list[int], budget: int) -> list[int]:
    out, pack, fill = [], 0, 0
    for t in sizes:
        if fill > 0 and fill + t > budget:
            pack, fill = pack + 1, 0
        out.append(pack)
        fill += t
    return out


def test_pack_greedy_matches_python_model_and_never_overflows(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    budget = 2048
    out = pack_greedy(
        docs, token_col="n_chars", budget=budget,
        order_cols=["doc_id"], part_cols=["source"], id_cols=["doc_id"],
    )
    rows = out.collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    for source, members in by_source.items():
        members.sort(key=lambda r: r.doc_id)
        want = greedy_model([int(r.n_chars) for r in members], budget)
        assert [r.pack_id for r in members] == want, source
        # no pack overflows unless it is a single oversized document
        fills: dict[int, list[int]] = {}
        for r in members:
            fills.setdefault(r.pack_id, []).append(int(r.n_chars))
        for sizes in fills.values():
            assert sum(sizes) <= budget or len(sizes) == 1


def test_pack_offsets_partitions_are_contiguous(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = pack_offsets(docs, "n_chars", 2048, ["doc_id"], ["source"])
    rows = out.select("source", "doc_id", "pack_id").collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    for members in by_source.values():
        members.sort(key=lambda r: r.doc_id)
        ids = [r.pack_id for r in members]
        # pack ids are non-decreasing along the layout order, start at 0
        assert ids[0] == 0
        assert all(a <= b for a, b in zip(ids, ids[1:]))


def test_sample_k_per_group_exact_uniform_and_nested(spark, sf_dir):
    from spark_cdc_replication_spark.operators.sampling import sample_k_per_group

    docs = load_table(spark, sf_dir, "documents")
    s5 = sample_k_per_group(docs, ["source"], k=5)
    sizes = {r["source"]: r["n"] for r in s5.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    per_group = {r["source"]: r["n"] for r in docs.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    for src, n in sizes.items():
        assert n == min(5, per_group[src]), src
    # prefix nesting: the k=2 sample is a subset of the k=5 sample
    s2 = {(r.doc_id, r.source) for r in sample_k_per_group(docs, ["source"], k=2).select("doc_id", "source").collect()}
    s5set = {(r.doc_id, r.source) for r in s5.select("doc_id", "source").collect()}
    assert s2 < s5set


def test_mixture_sample_hits_target_proportions(spark, sf_dir):
    from spark_cdc_replication_spark.operators.sampling import mixture_sample

    docs = load_table(spark, sf_dir, "documents")
    weights = {"src0": 4.0, "src1": 1.0}
    out = mixture_sample(docs, weights)
    by_src = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # only weighted strata survive
    assert set(by_src) <= {"src0", "src1"}
    # the binding stratum (largest weight per row available) keeps ~everything
    n0 = docs.filter(F.col("source") == "src0").count()
    assert by_src.get("src0", 0) >= n0 * 0.99
    # achieved ratio tracks 4:1 (hash-sampling tolerance at tiny sf)
    ratio = by_src["src0"] / max(by_src.get("src1", 0), 1)
    assert 1.5 < ratio < 12.0
    # deterministic: stable under repartitioning
    a = {r.doc_id for r in out.select("doc_id").collect()}
    b = {
        r.doc_id
        for r in mixture_sample(docs.repartition(7), weights).select("doc_id").collect()
    }
    assert a == b
    # pure downsample: output rows are input rows
    assert a <= {r.doc_id for r in docs.select("doc_id").collect()}


def test_token_budget_sample_prefix_semantics(spark):
    from spark_cdc_replication_spark.operators.sampling import token_budget_sample

    # ten docs of 10 tokens each in one source: budget 35 keeps the
    # first 3 docs in hash order; the crossing doc is dropped whole
    docs = spark.createDataFrame(
        [(i, "s", " ".join(f"w{i}x{j}" for j in range(10))) for i in range(10)],
        "doc_id long, source string, text string",
    )
    out = token_budget_sample(docs, budget=35)
    rows = out.collect()
    assert len(rows) == 3
    assert all(r.n_tokens == 10 for r in rows)
    assert out.columns == docs.columns + ["n_tokens"]

    # hash order: the kept set is exactly the 3 lowest md5(doc_id)
    import hashlib

    order = sorted(range(10), key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
    assert {r.doc_id for r in rows} == set(order[:3])

    # prefix-nested across budgets; whole corpus kept when it fits
    bigger = {r.doc_id for r in token_budget_sample(docs, budget=70).collect()}
    assert {r.doc_id for r in rows} <= bigger and len(bigger) == 7
    assert token_budget_sample(docs, budget=1_000).count() == 10

    # stable under repartitioning (hash-deterministic, not RNG)
    again = {r.doc_id for r in token_budget_sample(docs.repartition(7), 35).collect()}
    assert again == {r.doc_id for r in rows}


def test_token_budget_sample_two_phase_equals_single_window(spark):
    """The bucketed formulation must be EXACTLY the naive one-window-
    per-stratum prefix sum, bucket boundaries included."""
    from pyspark.sql import Window

    from spark_cdc_replication_spark.functions.text import token_count
    from spark_cdc_replication_spark.operators.sampling import token_budget_sample

    docs = spark.createDataFrame(
        [
            (i, f"src{i % 3}", " ".join(f"t{i}w{j}" for j in range(1 + i % 7)))
            for i in range(500)
        ],
        "doc_id long, source string, text string",
    )
    budget = 120
    got = {
        (r.doc_id, r.n_tokens)
        for r in token_budget_sample(docs, budget, bucket_chars=1).collect()
    }
    h = F.md5(F.col("doc_id").cast("string"))
    w = (
        Window.partitionBy("source")
        .orderBy(h, "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    naive = (
        docs.select("doc_id", token_count("text").alias("n_tokens"), F.col("source"))
        .withColumn("__cum", F.sum("n_tokens").over(w))
        .filter(F.col("__cum") <= budget)
    )
    assert got == {(r.doc_id, r.n_tokens) for r in naive.collect()}


def test_token_budget_sample_null_stratum_kept(spark):
    """NULL strata are an ordinary group (single-window semantics) —
    the bucketed join must not drop them (null != null in equi-joins)."""
    from spark_cdc_replication_spark.operators.sampling import token_budget_sample

    docs = spark.createDataFrame(
        [(1, None, "a b c"), (2, "s", "d e f"), (3, None, "g h i")],
        "doc_id long, source string, text string",
    )
    out = token_budget_sample(docs, budget=100)
    assert {r.doc_id for r in out.collect()} == {1, 2, 3}
    # and the budget applies per NULL-group too
    tight = token_budget_sample(docs, budget=3)
    got = {r.doc_id for r in tight.collect()}
    assert 2 in got and len(got) == 2  # one of the two NULL docs fits

    import pytest

    with pytest.raises(ValueError, match="n_tokens"):
        token_budget_sample(docs.withColumnRenamed("text", "n_tokens"),
                            budget=1, text_col="n_tokens")


def test_token_budget_sample_matches_python_model_property(spark):
    """Property test for the two-phase prefix sum: random corpora
    (random strata incl. NULL, random token counts, random budgets)
    must match a pure-python single-pass model exactly — bucket
    boundaries, crossing docs, zero-token docs and all."""
    import hashlib

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from spark_cdc_replication_spark.operators.sampling import token_budget_sample

    corpus_strategy = st.lists(
        st.tuples(
            st.sampled_from(["a", "b", None]),      # stratum
            st.integers(min_value=0, max_value=6),  # token count
        ),
        min_size=1,
        max_size=25,
    )

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(corpus_strategy, st.integers(min_value=0, max_value=30))
    def run(rows, budget):
        data = [
            (i, src, " ".join(f"t{i}w{j}" for j in range(ntok)))
            for i, (src, ntok) in enumerate(rows)
        ]
        df = spark.createDataFrame(data, "doc_id long, source string, text string")
        got = {r.doc_id for r in token_budget_sample(df, budget, bucket_chars=1).collect()}

        # python model: per stratum, walk docs in (md5(id), id) order,
        # keep while inclusive running total <= budget
        expect = set()
        by_stratum: dict = {}
        for i, (src, ntok) in enumerate(rows):
            by_stratum.setdefault(src, []).append((i, ntok))
        for docs in by_stratum.values():
            docs.sort(key=lambda d: (hashlib.md5(str(d[0]).encode()).hexdigest(), d[0]))
            cum = 0
            for i, ntok in docs:
                cum += ntok
                if cum <= budget:
                    expect.add(i)
        assert got == expect

    run()


def test_quality_band_sample_bands_and_rates(spark):
    """Band assignment at/around the cuts, rate monotonicity, and the
    nested-sample guarantee within a band."""
    from spark_cdc_replication_spark.operators.sampling import (
        hash_bucket,
        quality_band_sample,
    )

    rows = [(i, float(s)) for i, s in enumerate([-3, -2, -1, 0, 1, 2, 3] * 100)]
    df = spark.createDataFrame(rows, "doc_id long, score double")
    out = quality_band_sample(
        df, "score", cuts=[-2.0, 0.0, 2.0], rates=[0.0, 0.3, 0.7, 1.0]
    )
    got = {r.doc_id: r.band for r in out.collect()}
    # band 0 (score <= -2) keeps nothing; band 3 (> 2) keeps all
    scores = dict(rows)
    assert all(scores[d] > -2.0 for d in got)
    assert all(d in got for d, s in rows if s > 2.0)
    # boundary: score == cut belongs to the LOWER band (<=)
    assert all(got[d] == 1 for d, s in rows if s == 0.0 and d in got)
    assert all(got[d] == 2 for d, s in rows if s == 2.0 and d in got)
    # nested: every survivor at rate r also survives at rate r' > r
    bigger = {
        r.doc_id
        for r in quality_band_sample(
            df, "score", cuts=[-2.0, 0.0, 2.0], rates=[0.0, 0.6, 0.9, 1.0]
        ).collect()
    }
    assert set(got) <= bigger
    # decision is the shared md5 bucket: survivors of band 1 are
    # exactly the rows whose bucket < 0.3 * 10000
    b1 = {d for d, s in rows if -2.0 < s <= 0.0}
    expect_b1 = {
        r.doc_id
        for r in df.filter(hash_bucket("doc_id") < 3000).collect()
        if r.doc_id in b1
    }
    assert {d for d in got if got[d] == 1} == expect_b1


def test_quality_band_sample_null_scores(spark):
    from spark_cdc_replication_spark.operators.sampling import quality_band_sample

    df = spark.createDataFrame(
        [(1, None), (2, 5.0)], "doc_id long, score double"
    )
    none_kept = quality_band_sample(df, "score", [0.0], [1.0, 1.0], null_rate=0.0)
    assert [r.doc_id for r in none_kept.collect()] == [2]
    all_kept = quality_band_sample(df, "score", [0.0], [1.0, 1.0], null_rate=1.0)
    assert {r.doc_id: r.band for r in all_kept.collect()} == {1: None, 2: 1}


def test_quality_band_sample_rejects_bad_cuts(spark):
    import pytest

    from spark_cdc_replication_spark.operators.sampling import quality_band_sample

    df = spark.createDataFrame([(1, 1.0)], "doc_id long, score double")
    with pytest.raises(ValueError, match="ascending"):
        quality_band_sample(df, "score", cuts=[1.0, 0.0], rates=[0.1, 0.2, 0.3])
    with pytest.raises(ValueError, match="len"):
        quality_band_sample(df, "score", cuts=[0.0], rates=[0.1])


def test_split_temporal_embargo_semantics(spark):
    """operators/sampling.py::split_temporal: strict train < cutoff,
    test >= cutoff + embargo, the gap labeled embargo, NULL ts -> NULL
    split; explicit test_start equivalent to the interval form; both
    cutoff args together rejected."""
    import datetime as dt

    import pytest

    from spark_cdc_replication_spark.operators.sampling import split_temporal

    rows = [
        (1, dt.datetime(2024, 1, 10)),
        (2, dt.datetime(2024, 1, 21, 23, 59, 59)),
        (3, dt.datetime(2024, 1, 22)),            # == cutoff: embargo
        (4, dt.datetime(2024, 1, 22, 12)),
        (5, dt.datetime(2024, 1, 23)),            # == cutoff+1d: test
        (6, dt.datetime(2024, 1, 29)),
        (7, None),
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    got = {
        r.id: r.split
        for r in split_temporal(
            df, "ts", train_end="2024-01-22 00:00:00", embargo="1 day"
        ).collect()
    }
    assert got == {
        1: "train", 2: "train", 3: "embargo", 4: "embargo",
        5: "test", 6: "test", 7: None,
    }
    explicit = {
        r.id: r.split
        for r in split_temporal(
            df, "ts",
            train_end="2024-01-22 00:00:00",
            test_start="2024-01-23 00:00:00",
        ).collect()
    }
    assert explicit == got
    # no embargo: the boundary row goes straight to test
    tight = {
        r.id: r.split
        for r in split_temporal(df, "ts", train_end="2024-01-22 00:00:00").collect()
    }
    assert tight[3] == "test" and tight[2] == "train"
    with pytest.raises(ValueError, match="not both"):
        split_temporal(df, "ts", "2024-01-22", test_start="x", embargo="1 day")


def test_split_temporal_rejects_bad_cutoffs(spark):
    """Garbage or out-of-order cutoffs must raise driver-side, never
    silently embargo the whole dataset (code review r7)."""
    import datetime as dt

    import pytest

    from spark_cdc_replication_spark.operators.sampling import split_temporal

    df = spark.createDataFrame([(1, dt.datetime(2024, 1, 10))], "id long, ts timestamp")
    with pytest.raises(ValueError, match="not a valid timestamp"):
        split_temporal(df, "ts", train_end="2024-13-01")
    with pytest.raises(ValueError, match="not a valid timestamp"):
        split_temporal(df, "ts", train_end="2024-01-22", test_start="soon")
    with pytest.raises(ValueError, match="before train_end"):
        split_temporal(df, "ts", train_end="2024-01-22", test_start="2024-01-21")
    with pytest.raises(ValueError, match="nonnegative"):
        split_temporal(df, "ts", train_end="2024-01-22", embargo="-1 day")


def test_temperature_mixture_flattens_and_is_deterministic(spark):
    """operators/sampling.py::temperature_mixture — alpha=0.5 keeps
    the smallest stratum (~)fully and downsamples a 4x stratum to
    ~sqrt(1/4)=0.5 of itself; alpha=1 is exactly a no-op on non-NULL
    strata (the cut math is float-exact at w=n); NULL strata drop;
    the survivor set is a pure function of the keys."""
    import pytest

    from spark_cdc_replication_spark.operators.sampling import temperature_mixture

    rows = (
        [(i, "a") for i in range(400)]
        + [(1000 + i, "b") for i in range(100)]
        + [(2000 + i, None) for i in range(10)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_mixture(df, alpha=0.5)
    kept = {(r.doc_id, r.source) for r in out.collect()}
    b_kept = [k for k in kept if k[1] == "b"]
    a_kept = [k for k in kept if k[1] == "a"]
    assert len(b_kept) >= 99  # min stratum: only a 9999/10000 cut edge may trim
    assert 160 <= len(a_kept) <= 240  # ~400 * sqrt(100/400) = 200
    assert not [k for k in kept if k[1] is None]
    # deterministic: same keys -> same survivors
    again = {(r.doc_id, r.source) for r in temperature_mixture(df, alpha=0.5).collect()}
    assert again == kept
    # alpha=1: natural mix is untouched (w=n makes every cut exactly 10000)
    full = {(r.doc_id, r.source) for r in temperature_mixture(df, alpha=1.0).collect()}
    assert full == {(i, s) for i, s in rows if s is not None}
    with pytest.raises(ValueError):
        temperature_mixture(df, alpha=1.5)


def test_split_assign_composes_with_samplers_and_nullsafe(spark):
    """The r8 namespacing fix: split_assign hashes 'split:'||key, so a
    sampled corpus still populates EVERY split (with the samplers'
    shared unsalted space, any sample rate <= train weight left
    val/test literally empty); NULL keys get a NULL split instead of
    silently landing in the last-named one; over-committed or empty
    weight specs raise."""
    import pytest

    from spark_cdc_replication_spark.operators.sampling import (
        deterministic_sample,
        split_assign,
    )

    df = spark.createDataFrame(
        [(i,) for i in range(4000)] + [(None,)], "doc_id long"
    )
    sampled = deterministic_sample(df.filter(F.col("doc_id").isNotNull()), 0.5)
    counts = {
        r["split"]: r["n"]
        for r in split_assign(sampled)
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # 0.98/0.01/0.01 split of a 0.5 bucket-sample: every split present
    assert counts.get("train", 0) > 0
    assert counts.get("val", 0) > 0, counts
    assert counts.get("test", 0) > 0, counts

    nulls = split_assign(df).filter(F.col("doc_id").isNull()).collect()
    assert len(nulls) == 1 and nulls[0]["split"] is None

    with pytest.raises(ValueError, match="sum to <= 1"):
        split_assign(df, weights=(("train", 0.7), ("val", 0.7), ("test", 0.1)))
    with pytest.raises(ValueError, match="at least one"):
        split_assign(df, weights=())


def test_hash_order_prefilter_composes_with_k_per_group(spark):
    """hash_order_prefilter keeps a PREFIX of (md5, key) order, so
    top-k-per-group over the prefiltered frame equals the unfiltered
    top-k exactly — the documented composition deterministic_sample
    cannot provide (its bucket-mod survivors scatter across hash
    order)."""
    from spark_cdc_replication_spark.operators.sampling import (
        hash_order_prefilter,
        sample_k_per_group,
    )

    rows = [(i, "g%d" % (i % 3)) for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    full = {
        (r.doc_id, r.source)
        for r in sample_k_per_group(df, ["source"], k=5).collect()
    }
    pre = hash_order_prefilter(df, 0.05)
    composed = {
        (r.doc_id, r.source)
        for r in sample_k_per_group(pre, ["source"], k=5).collect()
    }
    assert composed == full


def test_calibrate_scores_matches_percent_rank_model(spark):
    """Exact calibration == the percent_rank definition computed in
    Python ((count of strictly-lower scores)/(n-1), ties share the
    rank), NULL scores sort last (DuckDB's default, pinned Spark-side
    with asc_nulls_last), and the result survives repartitioning."""
    from spark_cdc_replication_spark.operators.sampling import calibrate_scores

    rows = [
        (1, "a", 0.2), (2, "a", 0.4), (3, "a", 0.4), (4, "a", 0.9),
        (5, "a", None),
        (6, "b", 0.5),
        (7, "c", 0.1), (8, "c", 0.1),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, score double")
    got = {
        r.doc_id: r.pct
        for r in calibrate_scores(df, "score", "source", out_col="pct").collect()
    }

    by_group: dict[str, list[tuple[int, float]]] = {}
    for doc_id, src, score in rows:
        by_group.setdefault(src, []).append((doc_id, score))
    for src, members in by_group.items():
        n = len(members)
        for doc_id, score in members:
            if n == 1:
                expect = 0.0
            elif score is None:
                # nulls-last: rank below every non-null and any
                # earlier... all NULLs tie with each other
                lower = sum(1 for _, s in members if s is not None)
                expect = round(lower / (n - 1), 6)
            else:
                lower = sum(
                    1 for _, s in members if s is not None and s < score
                )
                expect = round(lower / (n - 1), 6)
            assert got[doc_id] == expect, (doc_id, got[doc_id], expect)

    again = {
        r.doc_id: r.pct
        for r in calibrate_scores(
            df.repartition(5), "score", "source", out_col="pct"
        ).collect()
    }
    assert again == got


def test_calibrate_scores_binned_matches_ecdf_model(spark):
    """Binned calibration == the Python model exactly (below-bin mass
    / group size), NULL scores get NULL pct and contribute no mass,
    out-of-range scores clamp into the edge bins, and within a source
    the pct is monotone non-decreasing in score."""
    from spark_cdc_replication_spark.operators.sampling import (
        calibrate_scores_binned,
    )

    rows = [
        (1, "a", 0.0), (2, "a", 0.1), (3, "a", 0.1001), (4, "a", 0.5),
        (5, "a", 1.0), (6, "a", None), (7, "a", -0.3), (8, "a", 1.7),
        (9, "b", 0.25), (10, "b", 0.75),
        # NULL group is a REAL stratum (matches the exact variant's
        # window-partition semantics) — needs the null-safe group join
        (11, None, 0.2), (12, None, 0.9),
    ]
    bins = 16
    df = spark.createDataFrame(rows, "doc_id long, source string, score double")
    out = calibrate_scores_binned(
        df, "score", "source", bins=bins, out_col="pct"
    ).collect()
    got = {r.doc_id: r.pct for r in out}

    import math

    def model_bin(s):
        if s is None:
            return None
        return min(max(math.floor(s * bins / 1.0), 0), bins - 1)

    by_group: dict[str, list[tuple[int, int | None]]] = {}
    for doc_id, src, score in rows:
        by_group.setdefault(src, []).append((doc_id, model_bin(score)))
    for src, members in by_group.items():
        n = sum(1 for _, b in members if b is not None)
        for doc_id, b in members:
            if b is None:
                assert got[doc_id] is None
            else:
                below = sum(
                    1 for _, ob in members if ob is not None and ob < b
                )
                assert got[doc_id] == round(below / n, 6), (
                    doc_id, got[doc_id], below, n,
                )

    # no __-prefixed helper columns leak
    assert {c for c in out[0].asDict()} == {
        "doc_id", "source", "score", "pct"
    }


def test_calibrate_binned_tracks_exact_on_fixture(spark, sf_dir):
    """On the real corpus the binned ECDF obeys its provable envelope
    against the exact percent_rank: with ls = strictly-lower scores,
    lb = strictly-lower bins, c = own-bin occupancy, exact - binned =
    (n*(ls - lb) + lb) / (n*(n-1)) with ls - lb in [0, c-1], so
    0 <= exact - binned <= c_max/(n-1) per source.  This is the
    resolution contract the scale path is sold on — the gap is
    within-bin mass, NOT a flat 1/bins (tied/clustered scores widen
    it) — and it guards the bin formula against clamp/off-by-one
    regressions on real score distributions."""
    from spark_cdc_replication_spark.fixtures import load_table
    from spark_cdc_replication_spark.operators.sampling import (
        calibrate_scores,
        calibrate_scores_binned,
    )
    from spark_cdc_replication_spark.operators.textanalysis import quality_score

    docs = load_table(spark, sf_dir, "documents")
    scored = quality_score(docs, append=True).select("doc_id", "source", "quality")
    rows = scored.collect()
    exact = {
        r.doc_id: r.pct
        for r in calibrate_scores(scored, "quality", "source", out_col="pct").collect()
    }
    binned = {
        r.doc_id: r.pct
        for r in calibrate_scores_binned(
            scored, "quality", "source", bins=256, out_col="pct"
        ).collect()
    }
    assert set(exact) == set(binned)

    import math
    from collections import Counter, defaultdict

    by_src = defaultdict(list)
    for r in rows:
        by_src[r.source].append(r)
    eps = 2e-6  # both sides round to 6 decimals
    for src, members in by_src.items():
        n = len(members)
        occupancy = Counter(
            min(max(math.floor(r.quality * 256), 0), 255) for r in members
        )
        bound = max(occupancy.values()) / (n - 1)
        for r in members:
            gap = exact[r.doc_id] - binned[r.doc_id]
            assert -eps <= gap <= bound + eps, (src, r.doc_id, gap, bound)


def test_padding_waste_buckets_truncation_and_exclusions(spark):
    from spark_cdc_replication_spark.operators.sampling import padding_waste

    rows = [
        (1, 1), (2, 16), (3, 17), (4, 100), (5, 512), (6, 600),
        (7, 0), (8, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    out = {r.bucket_cap: r for r in padding_waste(df, "n_tok").collect()}

    # 0-token and NULL-token docs are excluded entirely
    assert sum(r.n_docs for r in out.values()) == 6
    assert set(out) == {16, 32, 128, 512}
    b16 = out[16]
    assert b16.n_docs == 2 and b16.total_tokens == 17      # 1 + 16
    assert b16.pad_bucketed == 15 and b16.pad_naive == 2 * 512 - 17
    b32 = out[32]
    assert b32.n_docs == 1 and b32.pad_bucketed == 32 - 17
    b128 = out[128]
    assert b128.pad_bucketed == 28 and b128.pad_naive == 412
    # 600 truncates to 512: zero padding in its own bucket AND naive
    b512 = out[512]
    assert b512.n_docs == 2 and b512.total_tokens == 1024
    assert b512.pad_bucketed == 0 and b512.pad_naive == 0
    assert b512.pad_frac_bucketed == 0.0
    assert b16.pad_frac_bucketed == round(15 / (2 * 16), 6)
    assert b16.pad_frac_naive == round((2 * 512 - 17) / (2 * 512), 6)


def test_padding_waste_rejects_bad_caps(spark):
    import pytest

    from spark_cdc_replication_spark.operators.sampling import padding_waste

    df = spark.createDataFrame([(1, 5)], "doc_id long, n_tok long")
    with pytest.raises(ValueError, match="positive"):
        padding_waste(df, "n_tok", caps=())
    with pytest.raises(ValueError, match="positive"):
        padding_waste(df, "n_tok", caps=(0, 16))


# ---------------------------------------------------------------------------
# DSIR importance resampling (rows-only floors until the r10 oracle debut)
# ---------------------------------------------------------------------------

#: Planted micro-corpus: target speaks "physics" vocabulary; the raw
#: pool mixes physics-voiced docs (1, 2) with cooking-voiced docs
#: (3, 4) and one blank doc.  Selection must prefer the physics docs.
_DSIR_TARGET = [
    (100, "quantum field theory entangles boson and fermion states"),
    (101, "the boson lattice couples every fermion field"),
    (102, "entangled states collapse under field measurement"),
]
_DSIR_RAW = [
    (1, "fermion and boson field states entangle in the lattice"),
    (2, "quantum measurement collapses the entangled field"),
    (3, "simmer the onion butter sauce then whisk the roux"),
    (4, "fold the dough and proof it before the bake"),
    (5, "   "),
]


def _dsir_frames(spark):
    schema = "doc_id long, text string"
    return (
        spark.createDataFrame(_DSIR_RAW, schema),
        spark.createDataFrame(_DSIR_TARGET, schema),
    )


def test_dsir_weights_prefer_target_vocabulary(spark):
    from spark_cdc_replication_spark.operators.sampling import importance_weights

    raw, target = _dsir_frames(spark)
    rows = {
        r.doc_id: r
        for r in importance_weights(raw, target, num_buckets=64).collect()
    }
    # every raw doc with >=1 token gets exactly one row; blank doc 5 is
    # EXCLUDED (token_count's blank-counts-0 semantics — without the
    # filter it would score via the '' pseudo-token's bucket)
    assert set(rows) == {1, 2, 3, 4}
    # length-normalized weights: physics docs strictly above cooking docs
    mean = {k: r.weight_micro / r.n_tokens for k, r in rows.items()}
    assert min(mean[1], mean[2]) > max(mean[3], mean[4])
    # n_tokens matches the whitespace tokenizer
    assert rows[1].n_tokens == 9


def test_dsir_weights_deterministic_and_partition_invariant(spark):
    from spark_cdc_replication_spark.operators.sampling import importance_weights

    raw, target = _dsir_frames(spark)
    a = sorted(map(tuple, importance_weights(raw, target).collect()))
    b = sorted(
        map(
            tuple,
            importance_weights(raw.repartition(7), target.repartition(3)).collect(),
        )
    )
    assert a == b


def test_dsir_sample_k_exact_rank_dense_and_directional(spark):
    from spark_cdc_replication_spark.operators.sampling import sample_importance

    raw, target = _dsir_frames(spark)
    # gumbel_scale=0 degenerates to deterministic top-k by mean weight:
    # the two physics docs must be exactly the k=2 keep-set
    top = sample_importance(raw, target, k=2, num_buckets=64, gumbel_scale=0.0)
    got = {r.doc_id: r.rank for r in top.collect()}
    assert set(got) == {1, 2}
    assert sorted(got.values()) == [1, 2]
    # with noise the keep-set is still k-exact and rank-dense
    noisy = sample_importance(raw, target, k=3, num_buckets=64, gumbel_scale=1.0)
    rows = noisy.collect()
    assert len(rows) == 3
    assert sorted(r.rank for r in rows) == [1, 2, 3]


def test_dsir_relational_scoring_matches_inline(spark, monkeypatch):
    """Above _MAX_INLINE_BUCKETS importance_weights switches from the
    inlined-literal-array plan to the relational broadcast-join plan
    (ADVICE r9: a ~10k-literal lambda array bloats codegen); the two
    must be value-identical.  Force the threshold down so the SAME
    bucket count runs both plans."""
    from spark_cdc_replication_spark.operators import sampling

    raw, target = _dsir_frames(spark)
    inline = sorted(
        map(tuple, sampling.importance_weights(raw, target, num_buckets=64).collect())
    )
    monkeypatch.setattr(sampling, "_MAX_INLINE_BUCKETS", 2)
    relational = sorted(
        map(tuple, sampling.importance_weights(raw, target, num_buckets=64).collect())
    )
    assert relational == inline


def test_dsir_smoothing_keeps_target_unseen_buckets_finite(spark):
    from spark_cdc_replication_spark.operators.sampling import importance_weights

    schema = "doc_id long, text string"
    raw = spark.createDataFrame([(1, "zzzz qqqq xxxx")], schema)
    target = spark.createDataFrame([(9, "totally disjoint vocabulary")], schema)
    rows = importance_weights(raw, target, num_buckets=64).collect()
    assert len(rows) == 1 and rows[0].n_tokens == 3
    # Laplace smoothing: finite (and negative — raw-only vocabulary)
    assert rows[0].weight_micro < 0


def test_dsir_cross_engine_parity_on_planted_corpus(spark):
    """The r10 oracle, proven before it debuts: replay the EXACT
    prepared oracle SQL strings over the planted corpus and compare
    row-for-row against the operator — same comparison the driver
    gate will run (value normalization matches tools/check_oracle)."""
    import duckdb
    import pandas as pd

    from spark_cdc_replication_spark.operators.sampling import (
        importance_weights,
        sample_importance,
    )
    from spark_cdc_replication_spark.workloads.llmdata import (
        ORACLE_SAMPLE_IMPORTANCE,
        ORACLE_SAMPLE_IMPORTANCE_WEIGHTS,
    )

    # the registered queries split documents on source = 'src0'
    docs = pd.DataFrame(
        [(i, t, "src0") for i, t in _DSIR_TARGET]
        + [(i, t, "srcX") for i, t in _DSIR_RAW],
        columns=["doc_id", "text", "source"],
    )
    con = duckdb.connect()
    con.register("documents", docs)

    sdocs = spark.createDataFrame(docs)
    raw = sdocs.filter(F.col("source") != "src0")
    target = sdocs.filter(F.col("source") == "src0")

    for sql, df in (
        (
            ORACLE_SAMPLE_IMPORTANCE_WEIGHTS,
            importance_weights(raw, target, num_buckets=256),
        ),
        (
            ORACLE_SAMPLE_IMPORTANCE,
            sample_importance(raw, target, k=100, num_buckets=256, gumbel_scale=1.0),
        ),
    ):
        res = con.execute(sql)
        cols = [d[0] for d in res.description]
        want = {
            tuple(round(v, 6) if isinstance(v, float) else v for v in row)
            for row in res.fetchall()
        }
        got = {
            tuple(
                round(v, 6) if isinstance(v, float) else v
                for v in (r[c] for c in cols)
            )
            for r in df.collect()
        }
        assert got == want


def test_divergence_directional_and_deterministic(spark):
    """unigram_divergence: a target-voiced source scores strictly
    lower JSD than a disjoint-vocabulary source; values are partition
    invariant (BIGINT micro-unit sums commute)."""
    from spark_cdc_replication_spark.operators.sampling import unigram_divergence

    schema = "doc_id long, text string, source string"
    docs = spark.createDataFrame(
        [(i, t, "src0") for i, t in _DSIR_TARGET]
        + [(i, t, "physics") for i, t in _DSIR_RAW[:2]]
        + [(i, t, "cooking") for i, t in _DSIR_RAW[2:4]]
        + [(5, "   ", "blankonly")],
        schema,
    )
    out = unigram_divergence(docs, docs.filter(F.col("source") == "src0"))
    rows = {r.source: r for r in out.collect()}
    # all-blank sources have no tokens and no row (matches the oracle)
    assert set(rows) == {"src0", "physics", "cooking"}
    # self-divergence is the floor; target-voiced < disjoint-voiced
    assert rows["src0"].jsd_micro < rows["physics"].jsd_micro < rows["cooking"].jsd_micro
    again = {
        r.source: r
        for r in unigram_divergence(
            docs.repartition(7), docs.filter(F.col("source") == "src0").repartition(3)
        ).collect()
    }
    assert {(r.source, r.n_tokens, r.jsd_micro) for r in rows.values()} == {
        (r.source, r.n_tokens, r.jsd_micro) for r in again.values()
    }


def test_divergence_cross_engine_parity_on_planted_corpus(spark):
    """Replay the EXACT prepared r11 oracle SQL over a planted corpus
    and compare row-for-row (the pre-debut proof the DSIR pair got in
    r9)."""
    import duckdb
    import pandas as pd

    from spark_cdc_replication_spark.operators.sampling import unigram_divergence
    from spark_cdc_replication_spark.workloads.llmdata import ORACLE_CORPUS_DIVERGENCE

    docs = pd.DataFrame(
        [(i, t, "src0") for i, t in _DSIR_TARGET]
        + [(i, t, "srcA") for i, t in _DSIR_RAW[:2]]
        + [(i, t, "srcB") for i, t in _DSIR_RAW[2:]],
        columns=["doc_id", "text", "source"],
    )
    con = duckdb.connect()
    con.register("documents", docs)
    res = con.execute(ORACLE_CORPUS_DIVERGENCE)
    cols = [d[0] for d in res.description]
    want = set(map(tuple, res.fetchall()))
    sdocs = spark.createDataFrame(docs)
    got = {
        tuple(r[c] for c in cols)
        for r in unigram_divergence(
            sdocs, sdocs.filter(F.col("source") == "src0")
        ).collect()
    }
    assert got == want


def bestfit_model(sizes: list[int], budget: int) -> list[int]:
    """Pure-python BFD spec: place in (size desc, position asc) order
    into the tightest-fitting open pack (capacity ties -> lowest id)."""
    order = sorted(range(len(sizes)), key=lambda i: (-sizes[i], i))
    packs: list[int] = []  # remaining per pack id
    out = [0] * len(sizes)
    for i in order:
        t = sizes[i]
        fits = [(rem, pid) for pid, rem in enumerate(packs) if rem >= t]
        if fits:
            rem, pid = min(fits)
        else:
            pid = len(packs)
            packs.append(max(budget, t))
            rem = packs[pid]
        packs[pid] = rem - t
        out[i] = pid
    return out


def test_pack_bestfit_matches_python_model_and_never_overflows(spark, sf_dir):
    from spark_cdc_replication_spark.operators.sampling import pack_bestfit

    docs = load_table(spark, sf_dir, "documents")
    budget = 2048
    rows = pack_bestfit(
        docs, token_col="n_chars", budget=budget,
        part_cols=["source"], id_cols=["doc_id"],
    ).collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    for source, members in by_source.items():
        members.sort(key=lambda r: r.doc_id)
        want = bestfit_model([int(r.n_chars) for r in members], budget)
        assert [r.pack_id for r in members] == want, source
        fills: dict[int, list[int]] = {}
        for r in members:
            fills.setdefault(r.pack_id, []).append(int(r.n_chars))
        for sizes in fills.values():
            assert sum(sizes) <= budget or len(sizes) == 1


def test_pack_bestfit_beats_greedy_on_the_fixture(spark, sf_dir):
    """Not a theorem (neither order dominates per-instance), but on the
    real fixture's length mix BFD must use no MORE packs than greedy —
    the reason the operator exists."""
    from spark_cdc_replication_spark.operators.sampling import (
        pack_bestfit,
        pack_greedy,
    )

    docs = load_table(spark, sf_dir, "documents")
    budget = 2048
    n_bfd = (
        pack_bestfit(docs, "n_chars", budget, ["source"], ["doc_id"])
        .select("source", "pack_id").distinct().count()
    )
    n_greedy = (
        pack_greedy(docs, "n_chars", budget, ["doc_id"], ["source"], ["doc_id"])
        .select("source", "pack_id").distinct().count()
    )
    assert n_bfd <= n_greedy
    # same rows, same token totals — only the arrangement differs
    assert (
        pack_bestfit(docs, "n_chars", budget, ["source"], ["doc_id"]).count()
        == docs.count()
    )


def test_pack_bestfit_deterministic_under_repartitioning(spark, sf_dir):
    from spark_cdc_replication_spark.operators.sampling import pack_bestfit

    docs = load_table(spark, sf_dir, "documents")
    a = sorted(
        map(tuple, pack_bestfit(docs, "n_chars", 2048, ["source"], ["doc_id"]).collect())
    )
    b = sorted(
        map(
            tuple,
            pack_bestfit(
                docs.repartition(13), "n_chars", 2048, ["source"], ["doc_id"]
            ).collect(),
        )
    )
    assert a == b


def test_split_cluster_safe_coplaces_transitively(spark):
    """The leakage guard: a chain of verified pairs (A~B, B~C) must
    land all three members in ONE split even though A and C were never
    a pair — and a doc in no pair keeps exactly split_assign's
    assignment (same namespace), so dedup awareness never reshuffles
    the non-duplicated corpus."""
    from spark_cdc_replication_spark.operators.sampling import (
        split_assign,
        split_cluster_safe,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(40)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(3, 17), (17, 29), (5, 11)], "id_a long, id_b long"
    )
    weights = (("train", 0.5), ("val", 0.25), ("test", 0.25))
    got = {
        r.doc_id: r.split
        for r in split_cluster_safe(docs, pairs, weights=weights).collect()
    }
    assert got[3] == got[17] == got[29]  # the transitive chain
    assert got[5] == got[11]
    plain = {
        r.doc_id: r.split for r in split_assign(docs, weights=weights).collect()
    }
    clustered = {3, 17, 29, 5, 11}
    for d in set(got) - clustered:
        assert got[d] == plain[d]
    # cluster members adopt the REPRESENTATIVE's plain assignment
    assert got[3] == plain[3] and got[5] == plain[5]
    # determinism under repartitioning
    again = {
        r.doc_id: r.split
        for r in split_cluster_safe(
            docs.repartition(7), pairs.repartition(3), weights=weights
        ).collect()
    }
    assert again == got


def test_split_cluster_safe_null_key_and_empty_pairs(spark):
    from spark_cdc_replication_spark.operators.sampling import (
        split_assign,
        split_cluster_safe,
    )

    docs = spark.createDataFrame(
        [(1, "a"), (None, "keyless")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    got = {r.text: r.split for r in split_cluster_safe(docs, pairs).collect()}
    assert got["keyless"] is None  # the split_assign NULL contract
    # with no pairs at all the result IS split_assign
    plain = {r.text: r.split for r in split_assign(docs).collect()}
    assert got == plain


def test_split_cluster_safe_string_keys_match_split_assign(spark):
    """ADVICE r12: unpaired docs must hash EXACTLY the bytes
    split_assign hashes, for arbitrary key types.  The old long-space
    rep NULLed non-numeric string keys (giving them a NULL split) and
    collapsed zero-padded numeric strings ("007" -> 7 -> same bucket
    as "7"); the string-space rep keeps both faithful."""
    from spark_cdc_replication_spark.operators.sampling import (
        split_assign,
        split_cluster_safe,
    )

    docs = spark.createDataFrame(
        [("alpha", 1), ("beta", 2), ("007", 3), ("7", 4), ("gamma", 5)],
        "doc_id string, n long",
    )
    pairs = spark.createDataFrame([("alpha", "beta")], "id_a string, id_b string")
    weights = (("train", 0.4), ("val", 0.3), ("test", 0.3))
    got = {
        r.doc_id: r.split
        for r in split_cluster_safe(docs, pairs, weights=weights).collect()
    }
    plain = {
        r.doc_id: r.split for r in split_assign(docs, weights=weights).collect()
    }
    assert got["alpha"] == got["beta"] == plain["alpha"]  # rep = min("alpha","beta")
    # every unpaired string key keeps split_assign's exact assignment —
    # including the non-numeric and the zero-padded one
    for k in ("007", "7", "gamma"):
        assert got[k] == plain[k] and got[k] is not None


def test_split_cluster_safe_cross_engine_parity_on_planted_corpus(spark):
    """Replay the EXACT prepared oracle SQL over a planted corpus and
    compare row-for-row (the staging proof every prepared oracle
    gets): ground-truth components by normalized-text equality must
    agree with the LSH + verify + dup_clusters + rep-keyed split."""
    import duckdb
    import pandas as pd

    from spark_cdc_replication_spark.workloads.llmdata import (
        ORACLE_SPLIT_CLUSTER_SAFE,
        q_split_cluster_safe,
    )

    base = [
        (i, f"planted document number {i} with several distinct words here")
        for i in range(0, 60)
    ]
    docs = pd.DataFrame(base, columns=["doc_id", "text"])
    con = duckdb.connect()
    con.register("documents", docs)
    res = con.execute(ORACLE_SPLIT_CLUSTER_SAFE)
    cols = [d[0] for d in res.description]
    want = set(map(tuple, res.fetchall()))

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(docs).coalesce(1).write.mode("overwrite").parquet(
            f"{td}/documents.parquet"
        )
        got = {
            tuple(r[c] for c in cols)
            for r in q_split_cluster_safe(spark, td).collect()
        }
    assert got == want

"""Incremental streaming corpus dedup must converge to the same corpus
as batch exact_dedup over everything seen — across micro-batches AND
across duplicate re-deliveries."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_cdc_replication_spark.fixtures import load_table
from spark_cdc_replication_spark.operators.dedup import exact_dedup
from spark_cdc_replication_spark.streaming.corpus_ingest import corpus_dedup_stream


def _run(spark, src, tmp_path):
    stream = spark.readStream.schema(
        "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).parquet(src)
    q = corpus_dedup_stream(
        stream,
        corpus_dir=str(tmp_path / "corpus"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)


def test_streaming_dedup_converges_to_batch_exact_dedup(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    src = str(tmp_path / "src")

    # batch 1: first half.  batch 2: second half, PLUS a re-delivery
    # of the first half under new doc_ids (at-least-once upstream →
    # cross-batch index anti-join must drop it), PLUS an in-batch
    # duplicate of the second half under new doc_ids (within-batch
    # min-id rule must drop it).
    half = docs.filter(F.col("doc_id") % 2 == 0)
    rest = docs.filter(F.col("doc_id") % 2 == 1)
    redelivered = half.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    in_batch_dup = rest.withColumn("doc_id", F.col("doc_id") + 2_000_000)

    half.write.mode("append").parquet(src)
    _run(spark, src, tmp_path)

    rest.unionByName(redelivered).unionByName(in_batch_dup).write.mode(
        "append"
    ).parquet(src)
    _run(spark, src, tmp_path)

    got = spark.read.parquet(str(tmp_path / "corpus"))
    # every surviving text is unique by normalized form
    from spark_cdc_replication_spark.functions.text import fingerprint

    n_fp = got.select(fingerprint("text").alias("fp")).distinct().count()
    assert got.count() == n_fp

    # same content set (and cardinality) as batch exact_dedup over all
    # originals: one survivor per distinct normalized text
    assert got.count() == exact_dedup(docs).count()
    got_fps = {r.fp for r in got.select(fingerprint("text").alias("fp")).collect()}
    exp_fps = {
        r.fp
        for r in docs.select(fingerprint("text").alias("fp")).distinct().collect()
    }
    assert got_fps == exp_fps
    # re-delivered duplicates never re-entered (original ids won)
    assert got.filter(F.col("doc_id") >= 1_000_000).count() == 0


def test_partial_corpus_commit_heals_on_replay(spark, sf_dir, tmp_path):
    """Crash-after-partial-write: rows that reached the corpus WITHOUT
    the epoch completing must not duplicate when the batch replays —
    the guard (fp column) travels with the data, so it covers them."""
    from spark_cdc_replication_spark.functions.text import fingerprint

    docs = load_table(spark, sf_dir, "documents").limit(200)
    corpus = str(tmp_path / "corpus")
    src = str(tmp_path / "src")
    docs.write.parquet(src)

    # simulate a crashed epoch that committed half its part files
    partial = docs.filter(F.col("doc_id") % 2 == 0).withColumn(
        "fp", fingerprint("text")
    )
    partial.write.mode("append").parquet(corpus)
    before = spark.read.parquet(corpus).count()

    _run(spark, src, tmp_path)  # "replay" delivers ALL 200 docs

    got = spark.read.parquet(corpus)
    n_fp = got.select("fp").distinct().count()
    assert got.count() == n_fp  # zero duplicated content
    assert got.count() == docs.select(fingerprint("text")).distinct().count()
    assert got.count() > before  # the odd half did land


def test_streaming_ingest_decontaminates_each_batch(spark, sf_dir, tmp_path):
    """With a bench corpus attached, the stream converges to the same
    survivor set as the BATCH pipeline (dedup then decontaminate) over
    everything seen: leaks — including a perturbed copy arriving in a
    LATER batch — never enter the corpus; clean docs all do."""
    from spark_cdc_replication_spark.functions.text import fingerprint
    from spark_cdc_replication_spark.operators.dedup import decontaminate

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    bench = (
        docs.filter(F.col("doc_id") % 50 == 0).select("doc_id", "text").persist()
    )
    clean = docs.filter(F.col("doc_id") % 50 != 0)
    # reformatted leaks: one per bench doc, landing in the SECOND drop
    leaks = bench.select(
        (F.col("doc_id") + 30_000).alias("doc_id"),
        F.upper(F.regexp_replace("text", " ", "  ")).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("leak").alias("source"),
        F.length("text").cast("bigint").alias("n_chars"),
    )

    src = str(tmp_path / "src")
    opts = {"min_est_jaccard": 0.99, "min_jaccard": 0.999}

    def run():
        stream = spark.readStream.schema(
            "doc_id bigint, text string, lang string, source string, n_chars bigint"
        ).parquet(src)
        q = corpus_dedup_stream(
            stream,
            corpus_dir=str(tmp_path / "corpus"),
            checkpoint_dir=str(tmp_path / "ckpt"),
            bench=bench,
            decontaminate_opts=opts,
        )
        q.awaitTermination(120)

    clean.filter(F.col("doc_id") % 2 == 0).write.mode("append").parquet(src)
    run()
    clean.filter(F.col("doc_id") % 2 == 1).unionByName(leaks).write.mode(
        "append"
    ).parquet(src)
    run()

    got = spark.read.parquet(str(tmp_path / "corpus"))
    assert got.filter(F.col("source") == "leak").count() == 0
    # batch-pipeline equivalence on content fingerprints (fingerprint-
    # distinct mirrors the stream's min-id-per-fp exact-dedup rule)
    batch_survivors = decontaminate(clean.unionByName(leaks), bench, **opts)

    def fps(df):
        return {
            r.fp for r in df.select(fingerprint("text").alias("fp")).distinct().collect()
        }

    assert fps(got) == fps(batch_survivors)
    bench.unpersist()


def test_streaming_ingest_full_hygiene_triad_equals_batch(spark, sf_dir, tmp_path):
    """filter_opts + bench = the streaming prepare_corpus: across two
    drops (junk, dups and leaks mixed in), the landed corpus holds
    exactly the fingerprints of batch filter -> exact-dedup ->
    decontaminate over everything seen."""
    from spark_cdc_replication_spark.functions.text import fingerprint
    from spark_cdc_replication_spark.operators.dedup import decontaminate
    from spark_cdc_replication_spark.operators.textanalysis import filter_corpus

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    bench = (
        docs.filter(F.col("doc_id") % 50 == 0).select("doc_id", "text").persist()
    )
    clean = docs.filter(F.col("doc_id") % 50 != 0)
    leaks = bench.select(
        (F.col("doc_id") + 30_000_000).alias("doc_id"),
        F.upper(F.regexp_replace("text", " ", "  ")).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("leak").alias("source"),
        F.length("text").cast("bigint").alias("n_chars"),
    )
    junk = spark.range(5).select(
        (F.col("id") + 40_000_000).alias("doc_id"),
        F.lit("the the the the the the the the the the").alias("text"),
        F.lit("en").alias("lang"),
        F.lit("junk").alias("source"),
        F.lit(40).cast("bigint").alias("n_chars"),
    )
    redelivered = clean.filter(F.col("doc_id") % 2 == 0).withColumn(
        "doc_id", F.col("doc_id") + 50_000_000
    )

    src = str(tmp_path / "src")
    dopts = {"min_est_jaccard": 0.99, "min_jaccard": 0.999}
    fopts = {"min_quality": 0.1, "min_words": 10, "min_distinct_word_frac": 0.2}

    def run():
        stream = spark.readStream.schema(
            "doc_id bigint, text string, lang string, source string, n_chars bigint"
        ).parquet(src)
        q = corpus_dedup_stream(
            stream,
            corpus_dir=str(tmp_path / "corpus"),
            checkpoint_dir=str(tmp_path / "ckpt"),
            bench=bench,
            decontaminate_opts=dopts,
            filter_opts=fopts,
        )
        q.awaitTermination(120)

    clean.filter(F.col("doc_id") % 2 == 0).unionByName(junk).write.mode(
        "append"
    ).parquet(src)
    run()
    clean.filter(F.col("doc_id") % 2 == 1).unionByName(leaks).unionByName(
        redelivered
    ).write.mode("append").parquet(src)
    run()

    got = spark.read.parquet(str(tmp_path / "corpus"))
    assert got.filter(F.col("source") == "leak").count() == 0
    assert got.filter(F.col("source") == "junk").count() == 0

    everything = clean.unionByName(leaks).unionByName(junk).unionByName(redelivered)
    batch_survivors = decontaminate(
        filter_corpus(everything, **fopts), bench, **dopts
    )

    def fps(df):
        return {
            r.fp
            for r in df.select(fingerprint("text").alias("fp")).distinct().collect()
        }

    assert fps(got) == fps(batch_survivors)
    # and the stream's exact-dedup held: one row per fingerprint
    assert got.count() == got.select("fp").distinct().count()


def test_prepare_corpus_served_equals_batch_pipeline(spark, sf_dir):
    """The staged hash-green bound (r12 debut, shares
    ORACLE_PREPARE_CORPUS): the streaming hygiene triad's landed corpus
    — ingest-time filter + exact-fingerprint dedup + fuzzy
    decontamination over q_prepare_corpus's exact synthesized fixture —
    must reproduce the BATCH prepare_corpus pipeline ROW FOR ROW (ids
    and text fingerprints), not just at fingerprint-set equivalence.
    On this fixture every planted near-dup normalizes away, so
    LSH-at-0.999 dedup and exact-fingerprint dedup pick the same
    survivors; a drift in stage order, filter thresholds, or the
    dedup/decontaminate composition breaks the equality."""
    from spark_cdc_replication_spark.workloads.llmdata import (
        q_prepare_corpus,
        q_prepare_corpus_served,
    )

    batch = sorted(tuple(r) for r in q_prepare_corpus(spark, sf_dir).collect())
    served = sorted(
        tuple(r) for r in q_prepare_corpus_served(spark, sf_dir).collect()
    )
    assert len(batch) > 0
    assert served == batch


def test_streaming_semantic_decontamination_blocks_paraphrase_leaks(
    spark, sf_dir, tmp_path
):
    """Ingest-time SEMANTIC decontamination: a scaled copy of a bench
    embedding (cosine 1.0, but a completely different TEXT — the
    paraphrase case the n-gram stage is blind to) must never land,
    across micro-batches, and the landed corpus must equal the batch
    arrow-path operator over the same input."""
    from spark_cdc_replication_spark.operators.dedup import (
        decontaminate_semantic,
    )

    emb = load_table(spark, sf_dir, "embeddings").limit(300)
    # docs-like frame: unique text per row so the dedup/ngram stages
    # pass everything — any drop is attributable to the semantic stage
    docs = emb.select(
        F.col("vec_id").alias("doc_id"),
        F.concat(
            F.lit("wholly unique document body number "),
            F.col("vec_id").cast("string"),
            F.lit(" with several more tokens"),
        ).alias("text"),
        "embedding",
    )
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    clean = docs.filter(F.col("doc_id") % 50 != 0)
    # scaled copy = same direction (cosine 1.0) + unseen text
    leaks = bench.select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"),
        F.concat(
            F.lit("totally different paraphrased wording "),
            F.col("doc_id").cast("string"),
            F.lit(" sharing zero shingles with the original"),
        ).alias("text"),
        F.transform("embedding", lambda x: x * F.lit(3.0))
        .cast("array<float>")
        .alias("embedding"),
    )

    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")

    def run():
        stream = spark.readStream.schema(
            "doc_id bigint, text string, embedding array<float>"
        ).parquet(src)
        q = corpus_dedup_stream(
            stream,
            corpus_dir=corpus,
            checkpoint_dir=str(tmp_path / "ckpt"),
            semantic_bench=bench,
            semantic_opts={"min_cosine": 0.92},
        )
        q.awaitTermination(120)

    # epoch 1: half the clean docs + half the leaks; epoch 2: the rest
    # (the bench matrix must survive across epochs in the closure)
    c1, c2 = clean.filter(F.col("doc_id") % 2 == 0), clean.filter(
        F.col("doc_id") % 2 == 1
    )
    l1, l2 = leaks.filter(F.col("doc_id") % 2 == 0), leaks.filter(
        F.col("doc_id") % 2 == 1
    )
    c1.unionByName(l1).write.mode("append").parquet(src)
    run()
    c2.unionByName(l2).write.mode("append").parquet(src)
    run()

    got = spark.read.parquet(corpus)
    assert got.filter(F.col("doc_id") >= 5_000_000).count() == 0, (
        "a planted semantic leak landed"
    )
    # batch ≡ stream: the arrow-path operator over the full input
    # keeps exactly the ids the stream landed
    full_input = clean.unionByName(leaks)
    expected = decontaminate_semantic(
        full_input, bench, id_col="doc_id", min_cosine=0.92, impl="arrow"
    )
    assert {r.doc_id for r in got.select("doc_id").collect()} == {
        r.doc_id for r in expected.select("doc_id").collect()
    }


def test_streaming_span_excision_lands_cleaned_text_with_matching_fp(
    spark, sf_dir, tmp_path
):
    """excise_opts: the leaked span is cut out at the door (documents
    land REWRITTEN, not dropped), the landed fp covers the cleaned
    text (the cross-epoch dedup index cannot diverge from the bytes on
    disk), two docs identical only after excision dedup to one, and
    the survivors equal the batch operator over the same input."""
    import pytest

    from spark_cdc_replication_spark.functions.text import fingerprint
    from spark_cdc_replication_spark.operators.textanalysis import (
        excise_contaminated_spans,
    )

    bench = spark.createDataFrame(
        [("what is the capital of france",)], "text string"
    )
    docs = spark.createDataFrame(
        [
            (1, "My Post quotes: what is the capital of france end quote"),
            (2, "a perfectly clean document with plenty of original words"),
            # 3 and 4 differ ONLY inside the leaked span's surroundings:
            # after excision both become "Prefix words suffix words"
            (3, "Prefix words what is the capital of france suffix words"),
            (4, "Prefix  words what IS the Capital of France suffix\twords"),
        ],
        "doc_id long, text string",
    )
    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")

    def run():
        stream = spark.readStream.schema("doc_id bigint, text string").parquet(src)
        q = corpus_dedup_stream(
            stream,
            corpus_dir=corpus,
            checkpoint_dir=str(tmp_path / "ckpt"),
            bench=bench,
            excise_opts={"n": 6},
        )
        q.awaitTermination(120)

    docs.filter(F.col("doc_id") <= 2).write.mode("append").parquet(src)
    run()
    docs.filter(F.col("doc_id") >= 3).write.mode("append").parquet(src)
    run()

    got = spark.read.parquet(corpus)
    rows = {r.doc_id: r for r in got.collect()}
    assert rows[1].text == "My Post quotes: end quote"
    assert rows[2].text == "a perfectly clean document with plenty of original words"
    # 3 and 4 collapsed to one survivor (min id) AFTER excision
    assert 3 in rows and 4 not in rows
    # the landed fp is the fingerprint of the LANDED text, row for row
    refp = got.withColumn("refp", fingerprint("text"))
    assert refp.filter("fp <> refp").count() == 0
    # batch ≡ stream on text content (modulo the within-stream dedup)
    expected = excise_contaminated_spans(docs, bench, n=6)
    exp_texts = {r.text for r in expected.collect()}
    assert {r.text for r in got.collect()} <= exp_texts

    # config validation: excise without bench / with decontaminate
    stream = spark.readStream.schema("doc_id bigint, text string").parquet(src)
    with pytest.raises(ValueError, match="requires bench"):
        corpus_dedup_stream(
            stream, corpus, str(tmp_path / "ck2"), excise_opts={}
        )
    with pytest.raises(ValueError, match="mutually exclusive"):
        corpus_dedup_stream(
            stream, corpus, str(tmp_path / "ck3"),
            bench=bench, excise_opts={}, decontaminate_opts={},
        )
    # r14 ADVICE: text_col/id_col riding ANY opts dict would otherwise
    # TypeError inside foreachBatch on the first micro-batch — every
    # per-batch operator receives them explicitly
    with pytest.raises(ValueError, match="excise_opts must not carry"):
        corpus_dedup_stream(
            stream, corpus, str(tmp_path / "ck4"),
            bench=bench, excise_opts={"text_col": "text"},
        )
    with pytest.raises(ValueError, match="decontaminate_opts must not carry"):
        corpus_dedup_stream(
            stream, corpus, str(tmp_path / "ck5"),
            bench=bench, decontaminate_opts={"id_col": "doc_id"},
        )
    with pytest.raises(ValueError, match="filter_opts must not carry"):
        corpus_dedup_stream(
            stream, corpus, str(tmp_path / "ck6"),
            filter_opts={"text_col": "text", "id_col": "doc_id"},
        )


def test_streaming_excision_then_filter_drops_gutted_docs(spark, tmp_path):
    """Code review r14: with BOTH excise_opts and filter_opts set, the
    quality filter must judge the POST-excision text — a document that
    is mostly a benchmark passage is excised to a stub that fails the
    length threshold and must NOT land, while a long document that
    merely quotes the passage lands rewritten."""
    bench = spark.createDataFrame(
        [("alpha beta gamma delta epsilon zeta",)], "text string"
    )
    long_tail = " ".join(f"original word number {i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            # fully-leaked: excises to '' -> min_words filter drops it
            (1, "alpha beta gamma delta epsilon zeta"),
            # mostly clean: excised but still > 10 words -> lands
            (2, f"alpha beta gamma delta epsilon zeta {long_tail}"),
        ],
        "doc_id long, text string",
    )
    src = str(tmp_path / "src")
    docs.write.parquet(src)
    stream = spark.readStream.schema("doc_id bigint, text string").parquet(src)
    q = corpus_dedup_stream(
        stream,
        corpus_dir=str(tmp_path / "corpus"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        bench=bench,
        excise_opts={"n": 6},
        # isolate the length-after-excision interplay: neutralize the
        # language/repetition thresholds the synthetic text would trip
        filter_opts={
            "min_words": 10,
            "min_quality": 0.0,
            "langs": ("en", "und"),
            "min_distinct_word_frac": 0.0,
            "max_top_bigram_frac": 1.0,
        },
    )
    q.awaitTermination(120)
    got = {r.doc_id: r.text for r in spark.read.parquet(str(tmp_path / "corpus")).collect()}
    assert set(got) == {2}
    assert got[2] == long_tail


def test_streaming_span_excision_fixpoint_closes_seams_at_the_door(
    spark, tmp_path
):
    """excise_opts forwards raw operator kwargs, so ``fixpoint=True``
    must work INSIDE foreachBatch — the mode runs per-pass driver
    actions (limit(1).count()) and touched-only localCheckpoints
    within the micro-batch, exactly the machinery worth a streaming
    regression pin.  Seam fixture from the unit floor: excising
    'b c d' from 'a b c d e f g' stitches 'a e f', itself a bench
    trigram only pass 2 can see — the landed text must be the
    TWO-pass result, across two separate checkpointed epochs."""
    bench = spark.createDataFrame([("b c d",), ("a e f",)], "text string")
    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")

    def run():
        stream = spark.readStream.schema("doc_id bigint, text string").parquet(src)
        q = corpus_dedup_stream(
            stream,
            corpus_dir=corpus,
            checkpoint_dir=str(tmp_path / "ckpt"),
            bench=bench,
            excise_opts={"n": 3, "fixpoint": True},
        )
        q.awaitTermination(120)

    spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "h i j k l m")],
        "doc_id long, text string",
    ).write.mode("append").parquet(src)
    run()
    spark.createDataFrame(
        [(3, "x y a b c d e f g tail")], "doc_id long, text string"
    ).write.mode("append").parquet(src)
    run()

    rows = {r.doc_id: r.text for r in spark.read.parquet(corpus).collect()}
    assert rows[1] == "g"                     # both passes applied
    assert rows[2] == "h i j k l m"           # clean doc byte-identical
    # epoch 2: pass 1 cuts 'b c d', stitching 'a e f' mid-string for
    # pass 2 — landed text is the fixpoint, not the single pass
    assert rows[3] == "x y g tail"


def test_streaming_boilerplate_excision_enforces_a_published_gram_index(
    spark, tmp_path
):
    """The discover/enforce split: a batch repeated_grams pass over
    yesterday's corpus publishes the boilerplate index; the ingest
    stream excises every FURTHER copy at the door — landed text is
    scrubbed, fp covers the landed bytes, clean docs byte-identical,
    and two docs identical only after boilerplate removal dedup to
    one.  Composes with the quality filter (it judges post-excision
    text).  Validation: boilerplate_opts without grams, unknown keys."""
    import pytest

    from spark_cdc_replication_spark.functions.text import fingerprint
    from spark_cdc_replication_spark.operators.textanalysis import (
        repeated_grams,
    )

    legal = "released under the standard license terms apply everywhere"
    yesterday = spark.createDataFrame(
        [
            (100, f"first historic doc {legal} more words"),
            (101, f"second historic doc {legal} other words"),
        ],
        "doc_id long, text string",
    )
    grams = repeated_grams(yesterday, n=8, min_docs=2).persist()
    assert grams.count() > 0

    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    spark.createDataFrame(
        [
            (1, f"fresh article one {legal} tail one"),
            (2, "a clean arriving document with plenty of words"),
            # 3/4 identical once the boilerplate goes -> one survivor
            (3, f"Shared body {legal} suffix words"),
            (4, f"Shared  body {legal} suffix  words"),
        ],
        "doc_id long, text string",
    ).write.mode("append").parquet(src)
    stream = spark.readStream.schema("doc_id bigint, text string").parquet(src)
    q = corpus_dedup_stream(
        stream,
        corpus_dir=corpus,
        checkpoint_dir=str(tmp_path / "ckpt"),
        boilerplate_grams=grams,
        boilerplate_opts={"n": 8},
    )
    q.awaitTermination(120)

    rows = {r.doc_id: r for r in spark.read.parquet(corpus).collect()}
    assert rows[1].text == "fresh article one tail one"
    assert rows[2].text == "a clean arriving document with plenty of words"
    assert 3 in rows and 4 not in rows
    assert rows[3].text == "Shared body suffix words"
    refp = spark.read.parquet(corpus).withColumn("refp", fingerprint("text"))
    assert refp.filter("fp <> refp").count() == 0

    with pytest.raises(ValueError, match="requires boilerplate_grams"):
        corpus_dedup_stream(
            spark.readStream.schema("doc_id bigint, text string").parquet(src),
            corpus, str(tmp_path / "ck2"), boilerplate_opts={"n": 8},
        )
    with pytest.raises(ValueError, match="supports only 'n'"):
        corpus_dedup_stream(
            spark.readStream.schema("doc_id bigint, text string").parquet(src),
            corpus, str(tmp_path / "ck3"),
            boilerplate_grams=grams, boilerplate_opts={"min_docs": 2},
        )
    grams.unpersist()

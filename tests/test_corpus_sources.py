"""Corpus source/sink: JSONL explicit-schema ingestion (malformed lines
quarantined, not fatal), wholetext reader, and the size-capped
training-shard writer."""

from __future__ import annotations

import glob
import json
import os

from spark_cdc_replication_spark.fixtures import load_table
from spark_cdc_replication_spark.sources.corpus import (
    read_jsonl_corpus,
    read_text_corpus,
    write_training_shards,
)


def test_jsonl_corpus_roundtrip_and_corrupt_quarantine(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").limit(50).collect()
    src = tmp_path / "corpus.jsonl"
    with open(src, "w") as fh:
        for r in docs:
            fh.write(json.dumps(r.asDict()) + "\n")
        fh.write("{this is not json\n")

    # cache: Spark disallows uncached queries whose referenced columns
    # are only _corrupt_record (QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    df = read_jsonl_corpus(spark, str(src)).cache()
    good = df.filter("_corrupt_record IS NULL")
    bad = df.filter("_corrupt_record IS NOT NULL")
    assert good.count() == len(docs)
    assert bad.count() == 1
    got = {r.doc_id: r.text for r in good.collect()}
    assert got == {r.doc_id: r.text for r in docs}

    clean = read_jsonl_corpus(spark, str(src), keep_corrupt=False)
    assert clean.count() == len(docs)
    assert "_corrupt_record" not in clean.columns


def test_text_corpus_one_doc_per_file(spark, tmp_path):
    d = tmp_path / "txt"
    d.mkdir()
    for i in range(3):
        (d / f"doc{i}.txt").write_text(f"document {i}\nwith two lines")
    df = read_text_corpus(spark, str(d))
    rows = df.collect()
    assert len(rows) == 3  # wholetext: file = document, newlines kept
    assert all("\nwith two lines" in r.text for r in rows)


def test_training_shards_capped_and_partitioned(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    out = str(tmp_path / "shards")
    write_training_shards(
        docs, out, rows_per_shard=100, partition_cols=("source",)
    )
    back = spark.read.parquet(out)
    assert back.count() == n
    # every physical file respects the cap
    for f in glob.glob(os.path.join(out, "**", "*.parquet"), recursive=True):
        assert spark.read.parquet(f).count() <= 100, f
    # hive layout by source
    assert glob.glob(os.path.join(out, "source=*")), "partitioned layout missing"

"""Continuous inverted-index maintenance: stream new documents into
the persisted BM25/tf-idf token index.

``SCALE.md`` sells the ``(doc, term, tf)`` aggregate as "the
inverted-index build, run once and persisted, with streaming
maintainers keeping it current" — this module is that maintainer,
completing the pattern the ANN index already has
(``streaming/index_stream.py``).

The arriving document stream is mapped through
``operators.search.token_index`` — term frequencies, document length,
and the term-hash partition are all computed INSIDE each document's
row (array HOFs; a document arrives as exactly one row), so the
transform is stateless and the NATIVE partitioned file sink applies:
per-epoch transactional commit gives exactly-once on retry for free,
the same reasoning as raw landing (``streaming/ingest.py``) and the
IVF index (``index_stream.py``; contrast ``corpus_ingest.py``, whose
batch body reads prior state and therefore needs ``foreachBatch``).

The index lands partitioned BY ``bucket`` (term-hash), exactly the
layout ``bm25_topk_from_index(prune_buckets=True)`` probes — a query
touches only its terms' bucket directories regardless of corpus size.
Per-term ``df`` and the global (N, avgdl) stats are NOT maintained as
running state — they are cheap aggregates over the (pruned,
column-projected) index at query time, and keeping them incrementally
would turn the stateless append into a read-modify-write for two
scalars.  Assumes append-only document ids (re-streaming an edited
document would add a second (doc, term) generation); updates belong
to the CDC merge layer upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators.search import DEFAULT_BUCKETS, token_index


def token_index_stream(
    documents: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_token_len: int = 3,
    num_buckets: int = DEFAULT_BUCKETS,
    available_now: bool = True,
) -> StreamingQuery:
    """Append a streaming document frame's index rows
    ``(doc_id, term, tf, dl, bucket)`` to the bucket-partitioned
    inverted index at ``index_dir``.

    Streamed-vs-batch equivalence — as data and as
    ``bm25_topk_from_index`` input — is pinned by
    ``tests/test_token_index_stream.py`` (the ``test_index_stream.py``
    pattern).
    """
    rows = token_index(
        documents,
        text_col=text_col,
        id_col=id_col,
        min_token_len=min_token_len,
        num_buckets=num_buckets,
    )
    writer = (
        rows.writeStream.format("parquet")
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .option("path", index_dir)
        .partitionBy("bucket")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

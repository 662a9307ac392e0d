"""Continuous ANN index maintenance: stream new embeddings into the
persisted IVF inverted file.

Production ANN corpora grow continuously; rebuilding the index per
drop re-scans everything.  Here the arriving stream is assigned to
FROZEN centroids (the Arrow matmul UDF from ``operators/similarity``)
and appended to the inverted file partitioned BY cell — exactly the
layout ``ivf_topk`` probes, so queries read only their ``nprobe``
cells' directories regardless of corpus size.

Sink choice: the NATIVE partitioned file sink, not ``foreachBatch`` —
cell assignment is a stateless per-row transform, so the native sink's
per-epoch transactional commit gives exactly-once on retry for free
(the same reasoning as raw landing, ``streaming/ingest.py``; contrast
with ``corpus_ingest.py`` where the batch body must read prior state
and ``foreachBatch`` is required).

Centroids stay frozen between retrains by design: IVF recall degrades
gracefully as the corpus drifts, and retraining is a batch job
(``ivf_centroids``' Lloyd iterations) that atomically swaps in a new
index directory — the standard FAISS operational pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators.similarity import ivf_assign, ivf_assign_int8, ivfpq_assign


def ivf_index_stream(
    embeddings: DataFrame,
    centroids: list[list[float]],
    index_dir: str,
    checkpoint_dir: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    available_now: bool = True,
    precision: str = "float",
    codebooks: list[list[list[float]]] | None = None,
) -> StreamingQuery:
    """Append a streaming embedding frame to the cell-partitioned
    inverted file at ``index_dir``.

    ``precision="int8"`` maintains the compressed inverted file
    (:func:`..operators.similarity.ivf_assign_int8` — 4x smaller
    resident index) instead of the float one; ``precision="pq"``
    maintains the IVF-PQ layout (:func:`..operators.similarity.
    ivfpq_assign` — 8-16 byte codes per vector, the 100 TB resident
    tier) and requires ``codebooks`` (frozen between retrains exactly
    like the centroids — the FAISS operational pattern).  All three
    are stateless per-row transforms, so the exactly-once argument is
    unchanged.  Streamed-vs-batch equivalence is parametrized over all
    precisions in ``tests/test_index_stream.py``.
    """
    if precision not in ("float", "int8", "pq"):
        raise ValueError(
            f"precision must be 'float', 'int8' or 'pq', got {precision!r}"
        )
    if codebooks is not None and precision != "pq":
        raise ValueError(
            f"codebooks only apply to precision='pq' (got {precision!r}) — "
            "a float/int8 index ignores them, which is never what a caller "
            "holding trained codebooks wants"
        )
    if precision == "pq":
        if codebooks is None:
            raise ValueError("precision='pq' requires codebooks")
        assigned = ivfpq_assign(
            embeddings, centroids, codebooks, vec_col=vec_col, id_col=id_col
        )
    else:
        build = ivf_assign if precision == "float" else ivf_assign_int8
        assigned = build(embeddings, centroids, vec_col=vec_col, id_col=id_col)
    writer = (
        assigned.writeStream.format("parquet")
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .option("path", index_dir)
        .partitionBy("cell")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

"""BM25 keyword retrieval over a document corpus ([EXT] — no
reference counterpart; the classic Robertson/Spärck Jones ranking as
used by Lucene, with the +1-inside-the-log idf so scores are always
positive).

A training-data pipeline needs keyword retrieval for targeted corpus
audits (find documents matching benchmark phrases, leaked PII
patterns, domain probes) without standing up a search cluster —
retrieval-shaped decontamination at corpus scale.

Scale shape (one token shuffle, no window over terms):

* the query set is the bounded side: broadcast everywhere it appears;
  the corpus is never shuffled by anything except the one
  ``(doc, term)`` aggregate — the same inverted-index-build shuffle
  tf-idf pays, with map-side partial aggregation (a stop-word term
  never concentrates raw rows in one task, unlike a
  ``count() OVER (PARTITION BY term)`` formulation — see the
  unigram_logprob skew fix, VERDICT r4);
* document length (``dl``) derives from the tf relation
  (``SUM(tf) GROUP BY doc``), not a second pass over the token
  explode;
* ``df`` is computed AFTER the broadcast semi-restriction to query
  terms, so the per-term aggregate shuffles only matching rows;
* the dl join streams the big per-doc relation against the broadcast
  matched side — no shuffle of per-doc state;
* scores are rounded to 6 decimals before ranking so ranking (and
  cross-engine comparison) never depends on float summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import normalized


def _tokens(docs: DataFrame, text_col: str, id_col: str, min_len: int) -> DataFrame:
    return docs.select(
        F.col(id_col), F.explode(F.split(normalized(text_col), " ")).alias("term")
    ).filter(F.length("term") >= min_len)


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    term_col: str = "term",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    min_token_len: int = 3,
) -> DataFrame:
    """Top-``k`` documents per query by BM25.

    ``queries`` holds ``(query_id, term)`` rows — one row per query
    term, normalized like the corpus.  Returns
    ``(query_id, doc_id, score, rank)`` with rank 1 = best; ties on
    the rounded score break by ascending doc id for determinism.

    idf = ln(1 + (N - df + 0.5)/(df + 0.5))  (Lucene variant, > 0)
    score(q, d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
    """
    toks = _tokens(docs, text_col, id_col, min_token_len)
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("__n"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("__avgdl"),
    )

    qterms = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(term_col).alias("term")
    ).dropDuplicates(["query_id", "term"])
    # Restrict the corpus tf relation to query terms FIRST (broadcast
    # hash join, corpus side streams) — df and scoring both read the
    # restricted relation.
    matched = tf.join(F.broadcast(qterms.select("term").distinct()), on="term")
    # tf has exactly one row per (doc, term): plain count == doc count.
    df_rel = matched.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    scored_terms = (
        matched.join(F.broadcast(df_rel), on="term")
        .join(F.broadcast(qterms), on="term")
        .join(dl, on=id_col)  # matched side broadcast by AQE; dl streams
        .join(F.broadcast(stats))
        .withColumn(
            "__idf",
            F.log(
                F.lit(1.0)
                + (F.col("__n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "__w",
            F.col("__idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("__avgdl"))
            ),
        )
    )
    per_doc = scored_terms.groupBy("query_id", id_col).agg(
        F.round(F.sum("__w"), 6).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc(id_col))
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", "rank")
    )

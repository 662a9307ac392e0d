"""The composed corpus-hygiene pipeline ([EXT], no reference
counterpart): quality filter -> near-dup removal -> benchmark
decontamination — the sequence every real pre-training data pipeline
runs before a corpus is training-ready — as ONE operator.

Callers previously chained ``textanalysis.filter_corpus``,
``dedup.dedup_corpus`` and ``dedup.decontaminate``; the composition
here fuses what the plans allow:

* ONE minhash-signature build over the filtered corpus serves BOTH the
  within-corpus LSH (dedup) and the cross-corpus LSH (decontamination)
  — chained calls each built their own;
* ONE shingle-set build serves both verify joins;
* ONE removal anti-join applies the union of the dedup and
  decontamination removal-id sets — chained calls each re-filtered the
  corpus through its own anti-join.

Fusing the two removal stages is semantically exact: dedup removes a
doc iff a smaller-id filter-survivor shares its verified near-dup
relation, and decontamination is a per-document predicate against the
benchmark — neither depends on the other's removals, so
``filter |> dedup |> decontaminate`` equals
``filter |> (remove dedup-ids ∪ contaminated-ids)`` (property-tested
against the chained composition in ``tests/test_text_hygiene.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import (
    _shingle_sets,
    cross_corpus_candidates,
    minhash_lsh_candidates,
    minhash_signatures,
    shingle_jaccard,
)
from .textanalysis import filter_corpus


def prepare_corpus(
    df: DataFrame,
    bench: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_quality: float = 0.5,
    langs: tuple[str, ...] = ("en",),
    min_words: int = 10,
    min_distinct_word_frac: float = 0.3,
    max_top_bigram_frac: float = 0.2,
    num_hashes: int = 32,
    shingle_n: int = 3,
    num_bands: int = 8,
    min_est_jaccard: float = 0.5,
    min_jaccard: float = 0.8,
    broadcast_removal: bool = True,
    checkpoint_survivors: bool = True,
) -> DataFrame:
    """Return the training-ready corpus: quality-filtered, near-dup
    deduplicated (lowest id per duplicate group survives), and purged
    of documents whose n-gram Jaccard against any ``bench`` document is
    ``>= min_jaccard``.  Every input column of ``df`` is preserved.

    ``bench=None`` skips the decontamination stage (filter + dedup
    only).  LSH parameters are shared by the dedup and decontamination
    stages — they describe the same near-duplicate relation.

    What fuses vs what re-scans (SCALE.md "hygiene triad"): the
    filtered corpus is consumed in three genuinely different shapes —
    signature build (explode/groupBy), shingle-set build (per-row
    array), and the final anti-join (row-preserving filter) — so the
    corpus IS read more than once; what the fusion removes is the
    *duplicated derived work* (second signature build, second shingle
    build, second full-corpus anti-join) that the chained calls paid.
    The removal set stays broadcast unless ``broadcast_removal=False``
    (same escape hatch and bound argument as ``dedup_corpus`` /
    ``decontaminate``).

    ``checkpoint_survivors`` (default on) materializes the filtered
    corpus once via a deferred ``localCheckpoint`` — without it, every
    downstream branch re-evaluates the filter subtree (now a single
    scan+project+filter since the zero-shuffle ``repetition_stats``
    rewrite, but still a full corpus re-scan per branch): measured
    16.2 s -> 6.6 s at sf0.1 from this one cut (before the rewrite;
    ~4.5 s after).  localCheckpoint blocks are executor-local
    (lost-executor recompute is NOT possible past the cut), and are
    auto-released when the DataFrame is garbage-collected — the right
    default for a pipeline stage consumed a handful of times.  On a
    cluster where executor loss mid-pipeline must be survivable, pass
    ``checkpoint_survivors=False`` and persist/checkpoint the filtered
    corpus upstream with the caller-owned lifecycle instead.
    """
    kept = filter_corpus(
        df,
        text_col=text_col,
        id_col=id_col,
        min_quality=min_quality,
        langs=langs,
        min_words=min_words,
        min_distinct_word_frac=min_distinct_word_frac,
        max_top_bigram_frac=max_top_bigram_frac,
    )
    if checkpoint_survivors:
        kept = kept.localCheckpoint(eager=False)
    # sigs and sh are referenced by several branches too, but their
    # rebuilds all read the (checkpointed) survivors and Spark's
    # exchange reuse dedupes the identical aggregate subtrees —
    # measured, checkpointing them as well bought nothing (6.6 s both
    # ways at sf0.1); the survivor cut is the one that matters.
    sigs = minhash_signatures(kept, text_col, id_col, num_hashes, shingle_n)
    sh = _shingle_sets(kept, text_col, id_col, shingle_n)

    # -- within-corpus near-dup removal ids (dedup_corpus algebra) -----
    cands = minhash_lsh_candidates(
        sigs, id_col=id_col, num_bands=num_bands, min_est_jaccard=min_est_jaccard
    )
    dd = (
        cands.select("id_a", "id_b")
        .join(sh.withColumnsRenamed({id_col: "id_a", "__sh": "sh_a"}), on="id_a")
        .join(sh.withColumnsRenamed({id_col: "id_b", "__sh": "sh_b"}), on="id_b")
    )
    # pairs arrive id_a < id_b: id_b is always the non-canonical side
    removal = (
        dd.select(F.col("id_b").alias(id_col), shingle_jaccard("sh_a", "sh_b").alias("__j"))
        .filter(F.col("__j") >= min_jaccard)
        .select(id_col)
    )

    # -- benchmark decontamination ids (decontaminate algebra) ---------
    if bench is not None:
        bsigs = minhash_signatures(bench, text_col, id_col, num_hashes, shingle_n)
        bcands = cross_corpus_candidates(
            sigs,
            bsigs,
            id_col=id_col,
            num_bands=num_bands,
            min_est_jaccard=min_est_jaccard,
        )
        bsh = _shingle_sets(bench, text_col, id_col, shingle_n, out_col="sh_b").select(
            F.col(id_col).alias("id_bench"), "sh_b"
        )
        dc = (
            bcands.select("id_train", "id_bench")
            .join(
                sh.withColumnsRenamed({id_col: "id_train", "__sh": "sh_a"}),
                on="id_train",
            )
            .join(F.broadcast(bsh), on="id_bench")
        )
        contaminated = (
            dc.select(
                F.col("id_train").alias(id_col),
                shingle_jaccard("sh_a", "sh_b").alias("__j"),
            )
            .filter(F.col("__j") >= min_jaccard)
            .select(id_col)
        )
        removal = removal.unionByName(contaminated)

    removal = removal.distinct()
    if broadcast_removal:
        removal = F.broadcast(removal)
    return kept.join(removal, on=id_col, how="left_anti")

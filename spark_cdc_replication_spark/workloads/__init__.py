"""Query registry: every implemented operator exposed as a
``(spark, sf_dir) -> DataFrame`` callable plus (where SQL-expressible)
an equivalent DuckDB oracle SQL string.

Modules register into ``QUERIES`` / ``ORACLE``; ``__spark_entry__.py``
re-exports them for the driver's correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


#: The driver's correctness gate checks the FIRST 50 registry entries
#: in insertion order, so which queries earn a driver-green row each
#: round is a deliberate rotation, not an accident of module order.
#: Round-5 window (every name must carry a full rows+schema+hash
#: oracle; tools/check_coverage.py enforces >=1 in-window entry per
#: operator family AND a <=2-round staleness bound per oracle query
#: against the CORRECTNESS_r*.json history):
#:
#: * the 17 analytics whose last driver-green row is r2 — at the
#:   staleness bound, must rotate in now;
#: * the 8 never-driver-green oracles: the three r4-new operators
#:   (dedup_corpus / text_line_dedup / text_filter_corpus — VERDICT r4
#:   "next" #1) and the five r5-new ones (prepare_corpus,
#:   cdc_snapshot_asof, sample_token_budget, similarity_ivf_int8_all,
#:   text_bigram_logprob);
#: * 13 of the 25 r3-green llmdata queries (every one not in-window is
#:   either superseded-in-algebra by an in-window query or explicitly
#:   queued for r6 — see below);
#: * 2 family-floor keeps from the r4 window (range_join_signup_views,
#:   pii_scrub) so no family loses driver coverage;
#: * 10 late-r5 additions, never-green so they must debut in-window,
#:   each taking the slot of a query whose algebra it pins or whose
#:   family stays covered: rollup_incremental (cube_revenue's slot;
#:   "rollup_" holds the olap floor), events_hopping_6h_2h
#:   (events_sessionize's slot; "events_" floor held), text_bm25_topk
#:   (tfidf_top_terms's slot; BM25's tf/df algebra is a strict
#:   superset), dedup_semantic (dedup_embedding_cosine's slot; its
#:   oracle embeds that pair predicate + the survivor anti-join),
#:   fuzzy_join_parts (dedup_shared_shingles's slot; dedup keeps 4
#:   other in-window oracles), sample_quality_bands
#:   (sample_quality_weighted's slot; the weighted Bernoulli is a
#:   strict subset), embedding_project (split_assign's slot; sampling
#:   floor still 5-deep), similarity_knn_label (multimodal_resize's
#:   slot; multimodal_frames holds that floor), validate_orders
#:   (text_lang_stats's slot; text keeps 5 in-window oracles), and
#:   events_anomaly_days (embedding_label_centroids's slot; no floor
#:   on embeddings).
#: Everything left out is r3/r4-green and rotates back in r6 within
#: the staleness bound.  The r6 must-rotate set: clean_corpus,
#: chunk_documents, top_words, text_fingerprints (sat out r4+r5),
#: plus the ten displaced above (cube_revenue, events_sessionize,
#: tfidf_top_terms, dedup_embedding_cosine, dedup_shared_shingles,
#: sample_quality_weighted, split_assign, multimodal_resize,
#: text_lang_stats, embedding_label_centroids).
GATE_WINDOW: tuple[str, ...] = (
    # never-driver-green first (8)
    "dedup_corpus",
    "text_line_dedup",
    "text_filter_corpus",
    "prepare_corpus",
    "cdc_snapshot_asof",
    "sample_token_budget",
    "similarity_ivf_int8_all",
    "text_bigram_logprob",
    # analytics last green in r2 (17)
    "q4_order_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_part_value",
    "q12_ship_priority_dist",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_brand_supplier_count",
    "q17_small_quantity_revenue",
    "q19_bracket_revenue",
    "q20_dominant_suppliers",
    "q22_sales_opportunity",
    "customer_retention_setops",
    "yoy_customer_diff",
    "profile_orders",
    # 13 llmdata keeps last green in r3, interleaved with 8 of the 10
    # late-r5 debuts (slot-for-slot swaps documented above)
    "dedup_minhash_verified",
    "dedup_simhash_verified",
    "fuzzy_join_parts",
    "dedup_semantic",
    "similarity_lsh_all",
    "similarity_ivf_all",
    "text_quality_score",
    "text_language_id",
    "validate_orders",
    "top_words_salted",
    "text_bm25_topk",
    "events_anomaly_days",
    "sample_stratified",
    "sample_k_per_source",
    "sample_quality_bands",
    "embedding_project",
    "pack_sequences",
    "corpus_stats",
    "similarity_knn_label",
    "multimodal_frames",
    "decontaminate_fuzzy",
    # the other 2 late-r5 debuts + 2 family-floor keeps from r4
    "rollup_incremental",
    "events_hopping_6h_2h",
    "range_join_signup_views",
    "pii_scrub",
)


def collect_registry() -> tuple[dict[str, QueryFn], dict[str, str]]:
    from . import analytics, cdc, events_analytics, llmdata

    registered: dict[str, QueryFn] = {}
    oracle: dict[str, str] = {}
    for mod in (cdc, llmdata, events_analytics, analytics):
        registered.update(mod.QUERIES)
        oracle.update(mod.ORACLE)
    missing = set(oracle) - set(registered)
    assert not missing, f"oracle entries without queries: {missing}"

    assert len(GATE_WINDOW) == 50, f"gate window has {len(GATE_WINDOW)} slots"
    assert len(set(GATE_WINDOW)) == 50, "duplicate names in gate window"
    dangling = [n for n in GATE_WINDOW if n not in registered]
    assert not dangling, f"gate window names not registered: {dangling}"
    no_oracle = [n for n in GATE_WINDOW if n not in oracle]
    assert not no_oracle, f"gate window names without oracles: {no_oracle}"

    # Window first; then the remaining oracle-bearing queries (they
    # hold driver-green rows from a previous round and rotate back in);
    # oracle-less (approximate, rows-only) entries close the tail.
    queries = {
        **{k: registered[k] for k in GATE_WINDOW},
        **{k: v for k, v in registered.items() if k in oracle and k not in GATE_WINDOW},
        **{k: v for k, v in registered.items() if k not in oracle},
    }
    return queries, oracle

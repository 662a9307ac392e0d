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
#: Round-18 window (every name must carry a full rows+schema+hash
#: oracle; tools/check_coverage.py enforces >=1 in-window entry per
#: operator family AND a <=2-round staleness bound per oracle query
#: against the CORRECTNESS_r*.json history):
#:
#: * the 44 queries whose last driver-green row is r15 — at the
#:   staleness bound, exactly what `tools/check_coverage.py --plan`
#:   printed under "MANDATORY for THIS round" once
#:   CORRECTNESS_r17.json landed: mandatory, all in;
#: * no debut this round (r18 is the second OPTIMIZATION round — no
#:   new features; the staged-debut pipeline resumes with the next
#:   build round);
#: * 6 r16-greens pulled forward from the due-next pool, chosen to
#:   driver-certify exactly the paths this optimization round
#:   touches: `text_filter_corpus` is the hygiene-filter operator
#:   being rewritten onto the Arrow boundary (VERDICT r17 item 1)
#:   and `prepare_corpus_served` its composed streaming-parity
#:   consumer; `text_bm25_topk` and `similarity_hybrid_rrf` cover the
#:   BM25 serve-path action-count work (item 7);
#:   `dedup_corpus_weighted` is the heaviest dedup headline line
#:   (consumer of any CC/verify change); `q1_pricing_summary` is the
#:   r17-regressed analytics line, so any q1 adjudication this round
#:   lands with a fresh driver-green row.
#:
#: The steady 3-round cycle over the 144-oracle registry: each
#: round's window = the r-3 leftovers (mandatory) + as many r-2
#: greens as fit + any never-green debuts + semantics-changed
#: re-earners.
GATE_WINDOW: tuple[str, ...] = (
    # at the staleness bound — last driver-green r15 (44, mandatory)
    "approx_distinct_bound",
    "approx_percentile_bound",
    "asof_purchase_view",
    "cdc_coalesce_updates",
    "cdc_json_flatten",
    "cdc_name_sanitize",
    "cdc_route_ops",
    "cdc_union_dedup",
    "chunk_documents",
    "clean_corpus",
    "cohort_retention",
    "corpus_shuffle",
    "corpus_stats",
    "cube_revenue",
    "customer_deciles",
    "daily_revenue_trend",
    "decontaminate_corpus",
    "dedup_containment",
    "dedup_minhash_verified",
    "dedup_simhash_verified",
    "embedding_label_centroids",
    "events_tumbling_6h",
    "fuzzy_join_parts",
    "multimodal_audio_vad",
    "multimodal_frames",
    "pii_prevalence",
    "q10_returned_revenue",
    "q21_waiting_supplier",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_revenue_forecast",
    "rollup_revenue",
    "sample_quality_weighted",
    "sample_stratified",
    "similarity_hybrid_rrf_ivf_all",
    "similarity_pq_all",
    "split_assign",
    "split_cluster_safe",
    "text_fingerprints",
    "text_lang_stats",
    "text_repetition",
    "text_stats",
    "tfidf_top_terms",
    "top_orders_per_customer",
    # 6 r16-greens pulled forward (r19 mandatory shrinks; chosen to
    # certify the operators this optimization round touches, see above)
    "text_filter_corpus",
    "prepare_corpus_served",
    "text_bm25_topk",
    "similarity_hybrid_rrf",
    "dedup_corpus_weighted",
    "q1_pricing_summary",
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

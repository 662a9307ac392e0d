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
#: Round-12 window (every name must carry a full rows+schema+hash
#: oracle; tools/check_coverage.py enforces >=1 in-window entry per
#: operator family AND a <=2-round staleness bound per oracle query
#: against the CORRECTNESS_r*.json history):
#:
#: * the 37 queries whose last driver-green row is r9 — at the
#:   staleness bound, exactly what `tools/check_coverage.py --plan`
#:   printed under "MANDATORY for THIS round" once
#:   CORRECTNESS_r11.json landed: mandatory, all in;
#: * TWO debuts (never-green oracles must be in-window), both staged
#:   rows-only in r11 with shared oracles hash-verified at sf0.01 by
#:   both the r11 builder and the r11 judge:
#:   `similarity_hybrid_rrf_ivf_all` (full-probe nprobe=16=all-cells
#:   index-served hybrid — lossless, so it shares
#:   ORACLE_SIMILARITY_HYBRID_RRF, the `similarity_ivf_all`
#:   precedent) and `prepare_corpus_served` (the streaming hygiene
#:   triad's landed corpus — single availableNow batch makes
#:   min-id-per-fp == lowest-id-survives, so it shares
#:   ORACLE_PREPARE_CORPUS; `prepare_corpus_served` also holds the
#:   hygiene family floor this round);
#: * 2 family-floor fills (the mandatory 37 + debuts cover NO privacy
#:   or multimodal query): `pii_prevalence` (alternating with
#:   `pii_scrub`, green r11) and `multimodal_features` — both
#:   r10-greens from the due-next pool, so they double as
#:   pull-forwards;
#: * 9 more r10-greens pulled forward so r13's mandatory list shrinks
#:   to 39 (= 50 due-next - 11 refreshed here), chosen to keep the
#:   adjudication-watch lines fresh (`cdc_merge_incremental` was the
#:   r11 driver-bench CREEP line, adjudicated to noise;
#:   `similarity_pq_all` keeps the PQ family's watch fixture warm;
#:   `rollup_incremental` was sf3's worst calibrated line) and to
#:   spread family coverage (`multimodal_frames` keeps both modality
#:   fixtures fresh, `clean_corpus` doubles the hygiene floor).
#:
#: The steady 3-round cycle over the 139-oracle registry: each
#: round's window = the r-3 leftovers (mandatory) + as many r-2
#: greens as fit + any never-green debuts + semantics-changed
#: re-earners.
GATE_WINDOW: tuple[str, ...] = (
    # at the staleness bound — last driver-green r9 (37, mandatory)
    "approx_distinct_bound",
    "approx_percentile_bound",
    "asof_forward_tolerance",
    "cdc_coalesce_updates",
    "cdc_json_flatten",
    "cdc_name_sanitize",
    "cdc_route_ops",
    "cdc_union_dedup",
    "chunk_documents",
    "cohort_retention",
    "corpus_shuffle",
    "corpus_stats",
    "cube_revenue",
    "customer_deciles",
    "daily_revenue_trend",
    "decontaminate_fuzzy",
    "dedup_corpus",
    "dedup_minhash_verified",
    "dedup_simhash_verified",
    "embedding_label_centroids",
    "events_tumbling_6h",
    "fuzzy_join_parts",
    "q10_returned_revenue",
    "q21_waiting_supplier",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "rollup_revenue",
    "sample_quality_weighted",
    "similarity_hybrid_rrf",
    "similarity_topk",
    "split_assign",
    "text_fingerprints",
    "text_lang_stats",
    "text_repetition",
    "text_stats",
    "tfidf_top_terms",
    "top_orders_per_customer",
    # the two r12 debuts (never-green oracles must be in-window;
    # prepare_corpus_served holds the hygiene family floor)
    "similarity_hybrid_rrf_ivf_all",
    "prepare_corpus_served",
    # family-floor fills the mandatory 37 + debuts miss (both
    # r10-greens from the due-next pool, so they double as pulls)
    "pii_prevalence",
    "multimodal_features",
    # 9 more r10-greens pulled forward (r13 mandatory drops to 39)
    "cdc_merge_incremental",
    "cdc_snapshot_merge",
    "multimodal_frames",
    "clean_corpus",
    "similarity_pq_all",
    "rollup_incremental",
    "q6_revenue_forecast",
    "events_drift_psi",
    "sample_stratified",
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

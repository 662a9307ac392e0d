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
#: Round-13 window (every name must carry a full rows+schema+hash
#: oracle; tools/check_coverage.py enforces >=1 in-window entry per
#: operator family AND a <=2-round staleness bound per oracle query
#: against the CORRECTNESS_r*.json history):
#:
#: * the 39 queries whose last driver-green row is r10 — at the
#:   staleness bound, exactly what `tools/check_coverage.py --plan`
#:   printed under "MANDATORY for THIS round" once
#:   CORRECTNESS_r12.json landed: mandatory, all in;
#: * ONE debut (never-green oracles must be in-window; the remaining
#:   staged debuts are capacity-gated at ~1/round): `pii_kanonymity`
#:   against its own ORACLE_PII_KANONYMITY — prepared and
#:   parity-pinned when the query was staged rows-only in r12,
#:   hash-verified at sf0.01 by both the r12 builder (3 sfs) and the
#:   r12 judge.  It also holds the privacy family floor, which the
#:   mandatory 39 miss;
#: * 3 family-floor fills the mandatory 39 + debut miss — hygiene
#:   (`prepare_corpus`), multimodal (`multimodal_resize` +
#:   `multimodal_audio_vad`, keeping both modality fixtures fresh)
#:   and olap (`pivot_status_revenue`) — all r11-greens from the
#:   due-next pool, so they double as pull-forwards;
#: * 6 more r11-greens pulled forward so r14's mandatory list shrinks
#:   accordingly, chosen to keep the adjudication-watch lines fresh
#:   (`events_hopping_6h_2h` is the r12 driver-bench line above its
#:   multi-round envelope — VERDICT r12 "What's wrong" #2 — and
#:   `asof_purchase_view` the other sub-second flag; `dedup_semantic`
#:   anchors the sf3 dedup watch) and to spread family coverage
#:   (`cdc_last_writer_wins` keeps the LWW window fixture warm,
#:   `text_contamination` doubles the contamination floor,
#:   `pii_scrub` alternates back in for privacy breadth).
#:
#: The steady 3-round cycle over the 140-oracle registry: each
#: round's window = the r-3 leftovers (mandatory) + as many r-2
#: greens as fit + any never-green debuts + semantics-changed
#: re-earners.
GATE_WINDOW: tuple[str, ...] = (
    # at the staleness bound — last driver-green r10 (39, mandatory)
    "cdc_antijoin_survivors",
    "decontaminate_corpus",
    "dedup_containment",
    "dedup_exact",
    "dedup_representatives",
    "embedding_outliers",
    "embedding_project",
    "embedding_separation",
    "events_anomaly_days",
    "events_session_window",
    "events_sessionize",
    "funnel_conversion",
    "pack_padding_waste",
    "pack_sequences",
    "q2_best_supplier_per_part",
    "q4_order_priority",
    "q8_market_share",
    "q9_product_profit",
    "range_join_signup_views",
    "sample_importance",
    "sample_importance_weights",
    "sample_mixture_temperature",
    "sample_quality_bands",
    "sample_token_budget",
    "similarity_hard_negatives",
    "similarity_ivf_all",
    "similarity_ivf_int8_all",
    "similarity_knn_label",
    "split_temporal",
    "text_bigram_logprob",
    "text_bm25_topk",
    "text_filter_corpus",
    "text_language_id",
    "text_line_dedup",
    "text_quality_calibrate_binned",
    "text_quality_score",
    "top_words_salted",
    "user_behavior_topk",
    "validate_orders",
    # the r13 debut (never-green oracles must be in-window; also
    # holds the privacy family floor)
    "pii_kanonymity",
    # family-floor fills the mandatory 39 + debut miss (hygiene,
    # multimodal x2, olap — all r11-greens from the due-next pool,
    # so they double as pulls)
    "prepare_corpus",
    "multimodal_resize",
    "multimodal_audio_vad",
    "pivot_status_revenue",
    # 6 more r11-greens pulled forward (r14 mandatory shrinks)
    "events_hopping_6h_2h",
    "asof_purchase_view",
    "cdc_last_writer_wins",
    "dedup_semantic",
    "text_contamination",
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

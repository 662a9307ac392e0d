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
#: Round-11 window (every name must carry a full rows+schema+hash
#: oracle; tools/check_coverage.py enforces >=1 in-window entry per
#: operator family AND a <=2-round staleness bound per oracle query
#: against the CORRECTNESS_r*.json history):
#:
#: * the 32 queries whose last driver-green row is r8 — at the
#:   staleness bound, exactly what `tools/check_coverage.py` printed
#:   when CORRECTNESS_r10.json landed: mandatory, all in;
#: * FIVE debuts (never-green oracles must be in-window) — all staged
#:   rows-only in r10 with prepared oracle SQL hash-verified at sf0.01
#:   by both the r10 builder and the r10 judge: `corpus_divergence` +
#:   `corpus_divergence_served` (per-source JSD in DSIR's
#:   hashed-unigram space, batch and streaming-artifact-served twins
#:   sharing one oracle), `dedup_cross_source` (postings-plan
#:   copied-span audit per source pair), `text_ngram_coverage`
#:   (per-source trigram recall of the exemplar), and
#:   `multimodal_audio_vad` (windowed pseudo-VAD framing — it also
#:   holds the multimodal family floor);
#: * 3 family-floor fills (the mandatory 32 + debuts cover NO privacy /
#:   contamination / hygiene query), all r9-greens so they double as
#:   pull-forwards: `pii_scrub` (alternating with `pii_prevalence`,
#:   green r10), `text_contamination`, `prepare_corpus`;
#: * 10 more r9-greens pulled forward so r12's mandatory list shrinks
#:   to 37 (= 50 - 13 r9-greens refreshed here), chosen to keep the
#:   adjudication-watch lines fresh (`q18_large_orders` was a r10
#:   creep flag; `dedup_semantic` flagged at sf1 in r10's bench) and
#:   to spread family coverage.
#:
#: The steady 3-round cycle over the 137-oracle registry: each
#: round's window = the r-3 leftovers (mandatory) + as many r-2
#: greens as fit + any never-green debuts + semantics-changed
#: re-earners.
GATE_WINDOW: tuple[str, ...] = (
    # at the staleness bound — last driver-green r8 (32, mandatory)
    "asof_purchase_view",
    "cdc_increment_append",
    "cdc_last_writer_wins",
    "cdc_raw_partition_stats",
    "customer_retention_setops",
    "dedup_clusters",
    "dedup_clusters_logstar",
    "dedup_embedding_cosine",
    "dedup_ngram_jaccard",
    "dedup_shared_shingles",
    "events_drift_psi_daily",
    "events_drift_psi_served",
    "events_hopping_6h_2h",
    "pivot_status_revenue",
    "profile_orders",
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
    "q7_volume_shipping",
    "sample_k_per_source",
    "similarity_hard_negatives_ivf_all",
    "similarity_lsh_all",
    "text_gopher_flags",
    "text_quality_calibrate",
    "yoy_customer_diff",
    # the five r11 debuts (never-green oracles must be in-window;
    # multimodal_audio_vad holds the multimodal family floor)
    "corpus_divergence",
    "corpus_divergence_served",
    "dedup_cross_source",
    "text_ngram_coverage",
    "multimodal_audio_vad",
    # family-floor fills the mandatory 32 + debuts miss (all r9-greens)
    "pii_scrub",
    "text_contamination",
    "prepare_corpus",
    # 10 more r9-greens pulled forward (r12 mandatory drops to 37)
    "cdc_snapshot_asof",
    "q1_pricing_summary",
    "q18_large_orders",
    "dedup_semantic",
    "similarity_ivfpq_all",
    "text_unigram_logprob",
    "embedding_quantize",
    "sample_mixture",
    "top_words",
    "multimodal_resize",
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

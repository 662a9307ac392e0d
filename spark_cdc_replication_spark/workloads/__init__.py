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
#: Round-16 window (every name must carry a full rows+schema+hash
#: oracle; tools/check_coverage.py enforces >=1 in-window entry per
#: operator family AND a <=2-round staleness bound per oracle query
#: against the CORRECTNESS_r*.json history):
#:
#: * the 42 queries whose last driver-green row is r13 — at the
#:   staleness bound, exactly what `tools/check_coverage.py --plan`
#:   printed under "MANDATORY for THIS round" once
#:   CORRECTNESS_r15.json landed: mandatory, all in;
#: * ONE debut (never-green oracles must be in-window; the staged
#:   debuts are capacity-gated at ~1/round): `dedup_corpus_weighted`
#:   against its own ORACLE_DEDUP_CORPUS_WEIGHTED — prepared and
#:   parity-pinned when the query was staged rows-only in r12,
#:   hash-verified at sf0.01 by the r14/r15 builders and the r14/r15
#:   judges (500/500 rows);
#: * 7 r14-greens pulled forward from the due-next pool so r17's
#:   mandatory list shrinks, chosen to keep the flagship under the
#:   hash check (`cdc_snapshot_merge` is `entry()`'s query), to keep
#:   the heaviest plan-audited lines fresh (`prepare_corpus_served`
#:   is the served twin of the #1 bench line — it also holds the
#:   hygiene family floor the mandatory 42 miss;
#:   `similarity_hybrid_rrf` is a top-5 bench line;
#:   `q1_pricing_summary` the heaviest classic TPC-H agg), to sit
#:   parity next to this round's debut (`dedup_corpus` shares the
#:   3-member planting fixture with `dedup_corpus_weighted`), and to
#:   spread family coverage (`pii_ldiversity` keeps the privacy triad
#:   fresh next to the staged `pii_tcloseness` pre-certification;
#:   `events_drift_psi` anchors the streaming drift monitors).
#:
#: The steady 3-round cycle over the 143-oracle registry: each
#: round's window = the r-3 leftovers (mandatory) + as many r-2
#: greens as fit + any never-green debuts + semantics-changed
#: re-earners.
GATE_WINDOW: tuple[str, ...] = (
    # at the staleness bound — last driver-green r13 (42, mandatory)
    "cdc_antijoin_survivors",
    "cdc_last_writer_wins",
    "dedup_exact",
    "dedup_representatives",
    "embedding_outliers",
    "embedding_project",
    "embedding_separation",
    "events_anomaly_days",
    "events_hopping_6h_2h",
    "events_sessionize",
    "funnel_conversion",
    "multimodal_resize",
    "pack_padding_waste",
    "pack_sequences",
    "pii_scrub",
    "pivot_status_revenue",
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
    "text_contamination",
    "text_filter_corpus",
    "text_language_id",
    "text_line_dedup",
    "text_quality_calibrate_binned",
    "text_quality_score",
    "top_words_salted",
    "user_behavior_topk",
    "validate_orders",
    # the r16 debut (never-green oracles must be in-window)
    "dedup_corpus_weighted",
    # 7 r14-greens pulled forward from the due-next pool (r17
    # mandatory shrinks; flagship + heavy lines + debut parity +
    # family breadth, see above)
    "cdc_snapshot_merge",
    "prepare_corpus_served",
    "similarity_hybrid_rrf",
    "q1_pricing_summary",
    "dedup_corpus",
    "pii_ldiversity",
    "events_drift_psi",
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

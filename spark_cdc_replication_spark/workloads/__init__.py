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
#: Round-15 window (every name must carry a full rows+schema+hash
#: oracle; tools/check_coverage.py enforces >=1 in-window entry per
#: operator family AND a <=2-round staleness bound per oracle query
#: against the CORRECTNESS_r*.json history):
#:
#: * the 41 queries whose last driver-green row is r12 — at the
#:   staleness bound, exactly what `tools/check_coverage.py --plan`
#:   printed under "MANDATORY for THIS round" once
#:   CORRECTNESS_r14.json landed: mandatory, all in (they also cover
#:   every family floor, so no fills are needed this round);
#: * ONE debut (never-green oracles must be in-window; the staged
#:   debuts are capacity-gated at ~1/round): `split_cluster_safe`
#:   against its own ORACLE_SPLIT_CLUSTER_SAFE — prepared and
#:   parity-pinned when the query was staged rows-only in r12,
#:   hash-verified at sf0.01 by the r12/r13/r14 builders and the
#:   r13/r14 judges;
#: * 8 r13-greens pulled forward from the due-next pool so r16's
#:   mandatory list shrinks, chosen to keep the adjudication-watch
#:   lines fresh (`decontaminate_corpus` is the r13/r14 watch line —
#:   plans pinned identical by tools/plandiff_decontaminate.py;
#:   `multimodal_audio_vad` was a record-session flag at sf3 in r14,
#:   adjudicated clean) and to keep the most expensive plan-audited
#:   lines under the driver's hash check (`prepare_corpus` and
#:   `dedup_containment` are the #1/#2 bench lines,
#:   `events_session_window` the heaviest streaming-window line) and
#:   to spread family coverage (`asof_purchase_view` holds the
#:   asof/range-join family floor the mandatory 41 miss;
#:   `dedup_semantic` warms the embedding-dedup
#:   fixture the staged `decontaminate_semantic` debut shares;
#:   `pii_kanonymity` keeps the privacy triad fresh next to this
#:   round's t_closeness NULL-QI fix).
#:
#: The steady 3-round cycle over the 142-oracle registry: each
#: round's window = the r-3 leftovers (mandatory) + as many r-2
#: greens as fit + any never-green debuts + semantics-changed
#: re-earners.
GATE_WINDOW: tuple[str, ...] = (
    # at the staleness bound — last driver-green r12 (41, mandatory)
    "approx_distinct_bound",
    "approx_percentile_bound",
    "cdc_coalesce_updates",
    "cdc_json_flatten",
    "cdc_merge_incremental",
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
    "dedup_minhash_verified",
    "dedup_simhash_verified",
    "embedding_label_centroids",
    "events_tumbling_6h",
    "fuzzy_join_parts",
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
    "similarity_topk",
    "split_assign",
    "text_fingerprints",
    "text_lang_stats",
    "text_repetition",
    "text_stats",
    "tfidf_top_terms",
    "top_orders_per_customer",
    # the r15 debut (never-green oracles must be in-window)
    "split_cluster_safe",
    # 8 r13-greens pulled forward from the due-next pool (r16
    # mandatory shrinks; watch lines + heavy lines + family breadth,
    # see above)
    "decontaminate_corpus",
    "prepare_corpus",
    "dedup_containment",
    "events_session_window",
    "asof_purchase_view",
    "dedup_semantic",
    "pii_kanonymity",
    "multimodal_audio_vad",
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

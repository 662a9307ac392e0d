"""Declarative data-quality validation ([EXT] — the Deequ/dbt-test
shape, rebuilt as plain DataFrame algebra): assert row-level
constraints, key uniqueness, and referential integrity over a table
and get back one tiny ``(rule, violations)`` frame.

The CDC pipeline's natural companion: run it on every merged snapshot
(or raw landing) and alert on nonzero counts — the reference has no
quality gate at all, so a poisoned upstream lands silently.

Scale shape:

* ALL row-local rules ride ONE aggregate over ONE scan (conditional
  sums with map-side partials) — adding a rule adds a column, never a
  scan (the ``profile_orders`` one-pass discipline); the single-row
  result unpivots executor-side via ``stack``;
* uniqueness is ``count(*) - count(distinct key)`` — one extra
  aggregate whose shuffle carries only the key columns;
* referential integrity is a LEFT ANTI join counting orphans — AQE
  broadcasts bounded dimensions, and the count collapses map-side.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_rows(df: DataFrame, rules: Sequence[tuple[str, Column]]) -> DataFrame:
    """Row-level rules: ``(rule_name, violation_predicate)`` pairs —
    the predicate is true when the ROW VIOLATES the rule (so NULL
    predicate results count as non-violations; wrap with
    ``coalesce(pred, lit(True))`` to treat unknown as violation).
    One scan, one aggregate, however many rules.  An EMPTY input
    yields 0 violations per rule (not SUM's NULL) — a clean-but-empty
    snapshot must read as clean."""
    names = [name for name, _ in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names: {sorted(names)}")
    aggs = [
        F.coalesce(F.sum(F.when(pred, 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias(name)
        for name, pred in rules
    ]
    row = df.agg(*aggs)
    stack = ", ".join(
        f"'{lit}', `{alias}`" for lit, alias in (_q(n) for n in names)
    )
    return row.selectExpr(f"stack({len(rules)}, {stack}) AS (rule, violations)")


def check_unique(df: DataFrame, key_cols: Sequence[str], rule: str | None = None) -> DataFrame:
    """Duplicate-key count: ``count(*) - count(distinct key)`` (rows
    beyond the first per key), with the key taken as a STRUCT of
    ``key_cols``.

    NULL semantics (deliberate, and different from a bare
    ``COUNT(DISTINCT col)``): struct comparison treats NULL fields as
    a real, equal-to-itself value, so NULL-keyed rows form a group —
    two all-NULL keys count as one distinct key and therefore one
    violation.  Plain SQL ``COUNT(DISTINCT col)`` instead SKIPS
    NULL-keyed rows entirely: a table with a single NULL-keyed row
    reports 0 violations here but 1 under that formulation.  For a
    uniqueness rule the struct grouping is the useful reading (two
    NULL-keyed rows ARE a key collision); SQL oracles must mirror it
    with ``COUNT(DISTINCT (col1, col2))`` / a row-value comparison, or
    keep their fixtures NULL-free.  Forbid NULL keys outright with a
    separate not-null row rule in :func:`check_rows`."""
    name = rule or f"unique({', '.join(key_cols)})"
    key = F.struct(*[F.col(c) for c in key_cols])
    return df.agg(
        (F.count(F.lit(1)) - F.count_distinct(key)).cast("long").alias("violations")
    ).select(F.lit(name).alias("rule"), "violations")


def _q(name: str) -> tuple[str, str]:
    """Escape a rule name for the stack() literal and its backquoted
    alias (the merge_statement identifier discipline, catalog.py)."""
    return name.replace("'", "''"), name.replace("`", "``")


def check_foreign_key(
    df: DataFrame,
    key_cols: Sequence[str],
    dim: DataFrame,
    dim_key_cols: Sequence[str],
    rule: str | None = None,
) -> DataFrame:
    """Orphan count: fact rows whose (non-null) key has no match in
    ``dim``.  NULL keys are not orphans (SQL join semantics — use a
    not-null row rule to forbid them)."""
    name = rule or f"fk({', '.join(key_cols)})"
    probe = df.select(
        *[F.col(c).alias(d) for c, d in zip(key_cols, dim_key_cols)]
    ).na.drop()
    orphans = probe.join(
        dim.select(*dim_key_cols).dropDuplicates(list(dim_key_cols)),
        on=list(dim_key_cols),
        how="left_anti",
    )
    return orphans.agg(F.count(F.lit(1)).cast("long").alias("violations")).select(
        F.lit(name).alias("rule"), "violations"
    )


def validate(
    df: DataFrame,
    row_rules: Sequence[tuple[str, Column]] = (),
    unique_keys: Sequence[Sequence[str]] = (),
    foreign_keys: Sequence[tuple[Sequence[str], DataFrame, Sequence[str]]] = (),
) -> DataFrame:
    """Compose every check into one ``(rule, violations)`` frame.

    Each check GROUP (row rules / one uniqueness key / one FK) scans
    ``df`` once — row rules share a single scan no matter how many,
    but uniqueness and FK checks are separate aggregates by nature.
    When ``df`` is an expensive derivation (not a table scan),
    persist/checkpoint it first; for plain tables the extra scans are
    footer-pruned column reads (keys only)."""
    parts = []
    if row_rules:
        parts.append(check_rows(df, row_rules))
    for keys in unique_keys:
        parts.append(check_unique(df, keys))
    for keys, dim, dim_keys in foreign_keys:
        parts.append(check_foreign_key(df, keys, dim, dim_keys))
    if not parts:
        raise ValueError("no rules given")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def drift_report(
    a: DataFrame,
    b: DataFrame,
    col: str,
    smooth: float = 0.5,
) -> DataFrame:
    """Categorical distribution drift between two cohorts of the same
    column — the monitoring op every production data pipeline runs
    when a new corpus snapshot / ingest day lands: did the composition
    shift?

    Output: one row per observed category with both cohorts' counts,
    shares, and the per-bucket PSI term
    ``(share_a - share_b) * ln(share_a / share_b)`` (Population
    Stability Index; sum the column for the scalar — the classic
    alert thresholds are PSI < 0.1 stable, 0.1-0.25 drifting, > 0.25
    shifted).  Shares are additive-smoothed with ``smooth`` pseudo
    counts over the UNION of observed categories, so a category
    present in only one cohort contributes a finite term instead of
    ±inf — the standard Laplace fix.

    Deliberately PER-BUCKET (no final sum): every value is one
    division / one ln of exact integer counts, so the whole report is
    engine-exact and oracle-hash-checkable — no cross-row float
    summation whose order could differ between engines.

    Scale shape: one map-side-partial groupBy per cohort on the
    single column (counts only cross the network — bytes per distinct
    category), a full outer join of the two tiny count relations, and
    the totals ride a single-row cross join each.  Nothing scales
    with row count but the two scans.
    """
    ca = a.groupBy(F.col(col).alias("category")).agg(
        F.count(F.lit(1)).alias("n")
    )
    cb = b.groupBy(F.col(col).alias("category")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return drift_from_counts(ca, cb, smooth=smooth)


def drift_report_grouped(
    a: DataFrame,
    b: DataFrame,
    col: str,
    group_cols: list[str],
    smooth: float = 0.5,
) -> DataFrame:
    """:func:`drift_report` computed INDEPENDENTLY per group — the
    production "PSI per ingest day / per source" monitor: within each
    group, shares and the category count ``k`` are group-local, so a
    day whose composition matches the reference day scores ~0
    regardless of what other days did.

    Output: ``group_cols + (category, n_a, n_b, share_a, share_b,
    psi_term)``; sum ``psi_term`` within a group for that group's PSI.
    Same per-bucket engine-exact contract as :func:`drift_report` (one
    division / ln of exact integer counts — no cross-row float sums).

    Shape: two map-side-partial count aggregates on
    ``group_cols + [col]`` (counts only cross the network), one
    null-safe full outer join of the two count relations, and the
    per-group totals ride a second counts-only aggregate joined back
    on the group key — AQE-governed; the totals relation is
    group-cardinality-bounded, not row-bounded, so nothing here scales
    with corpus size except the two scans.
    """
    keys = [*group_cols, "category"]
    left = a.groupBy(
        *group_cols, F.col(col).alias("category")
    ).agg(F.count(F.lit(1)).alias("n_a"))
    right = b.groupBy(
        *[F.col(g).alias(f"__r_{g}") for g in group_cols],
        F.col(col).alias("__rc"),
    ).agg(F.count(F.lit(1)).alias("n_b"))
    cond = left["category"].eqNullSafe(right["__rc"])
    for g in group_cols:
        cond = cond & left[g].eqNullSafe(right[f"__r_{g}"])
    joined = left.join(right, cond, "full_outer").select(
        *[
            F.coalesce(left[g], right[f"__r_{g}"]).alias(g)
            for g in group_cols
        ],
        F.coalesce(left["category"], right["__rc"]).alias("category"),
        F.coalesce("n_a", F.lit(0)).alias("n_a"),
        F.coalesce("n_b", F.lit(0)).alias("n_b"),
    )
    # totals keys renamed before the join-back: `tot` derives from
    # `joined`, so same-named columns would be an ambiguous self-join
    tot = joined.groupBy(
        *[F.col(g).alias(f"__t_{g}") for g in group_cols]
    ).agg(
        F.sum("n_a").alias("__ta"),
        F.sum("n_b").alias("__tb"),
        F.count(F.lit(1)).alias("__k"),
    )
    tcond = None
    for g in group_cols:
        c = F.col(g).eqNullSafe(F.col(f"__t_{g}"))
        tcond = c if tcond is None else (tcond & c)
    sa = (F.col("n_a") + F.lit(smooth)) / (F.col("__ta") + F.lit(smooth) * F.col("__k"))
    sb = (F.col("n_b") + F.lit(smooth)) / (F.col("__tb") + F.lit(smooth) * F.col("__k"))
    return joined.join(tot, tcond).select(
        *group_cols,
        "category",
        "n_a",
        "n_b",
        F.round(sa, 6).alias("share_a"),
        F.round(sb, 6).alias("share_b"),
        F.round((sa - sb) * F.log(sa / sb), 6).alias("psi_term"),
    )


def drift_from_counts(
    ca: DataFrame,
    cb: DataFrame,
    smooth: float = 0.5,
) -> DataFrame:
    """:func:`drift_report`'s math over pre-aggregated count relations
    — ``(category, n)`` each.  This is the streaming-twin entry point
    (``streaming/drift_stream.py`` maintains the observed counts
    additively and re-derives the report per epoch), split out so
    batch and stream provably share one implementation.

    The join is NULL-SAFE on category: a NULL category (rows with an
    unknown value) is one real bucket that must pair up across
    cohorts — a plain equi-key full outer would leave the two NULL
    rows unmatched, double-counting ``__k`` and reporting spurious
    drift on identical cohorts (caught by code review r7; the
    SQL twin uses ``IS NOT DISTINCT FROM``).
    """
    left = ca.select("category", F.col("n").alias("n_a"))
    right = cb.select(F.col("category").alias("__rc"), F.col("n").alias("n_b"))
    joined = left.join(
        right, left["category"].eqNullSafe(right["__rc"]), "full_outer"
    ).select(
        F.coalesce(left["category"], F.col("__rc")).alias("category"),
        F.coalesce("n_a", F.lit(0)).alias("n_a"),
        F.coalesce("n_b", F.lit(0)).alias("n_b"),
    )
    # Totals and category count as single-row broadcast joins; shares
    # are smoothed over the union of categories so both columns sum
    # to 1 and no share is ever zero.
    tot = joined.agg(
        F.sum("n_a").alias("__ta"),
        F.sum("n_b").alias("__tb"),
        F.count(F.lit(1)).alias("__k"),
    )
    sa = (F.col("n_a") + F.lit(smooth)) / (F.col("__ta") + F.lit(smooth) * F.col("__k"))
    sb = (F.col("n_b") + F.lit(smooth)) / (F.col("__tb") + F.lit(smooth) * F.col("__k"))
    return (
        joined.crossJoin(F.broadcast(tot))
        .select(
            "category",
            "n_a",
            "n_b",
            F.round(sa, 6).alias("share_a"),
            F.round(sb, 6).alias("share_b"),
            F.round((sa - sb) * F.log(sa / sb), 6).alias("psi_term"),
        )
    )

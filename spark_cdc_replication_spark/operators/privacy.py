"""PII detection / redaction for training corpora ([EXT]).

Regex-based scrubbing of the classic personally-identifying patterns
(emails, IPv4 addresses, phone numbers) — the standard pre-training
hygiene pass.  Everything is native ``regexp_extract_all`` /
``regexp_replace`` (whole-stage codegen, zero Python), and each
pattern has an exact DuckDB twin so the workload query is fully
oracle-checkable.

The pattern set is deliberately small and dialect-portable (no
lookarounds, no word-boundary semantics that differ between Java
regex and RE2); production deployments extend ``PII_PATTERNS`` with
locale-specific entries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: name -> (pattern, replacement).  Ordered: redaction applies top to
#: bottom (emails first so their domains aren't half-eaten by other
#: rules).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", "<IP>"),
    "phone": (r"\+\d{1,3}-\d{3}-\d{4}", "<PHONE>"),
}


def pii_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII hit counts plus the fingerprint of the fully
    redacted text.

    Output: ``(id_col, n_email, n_ipv4, n_phone, redacted_fp)`` where
    ``redacted_fp = md5(text with every pattern replaced)`` — the md5
    pins the exact redaction output without shipping document bodies
    through the result, and is engine-portable (unlike xxhash64).

    One scan, one projection: counting and redaction are row-local, so
    this parallelizes embarrassingly at any corpus size.
    """
    counts = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))).alias(
            f"n_{name}"
        )
        for name, (pat, _) in PII_PATTERNS.items()
    ]
    redacted = F.col(text_col)
    for pat, repl in PII_PATTERNS.values():
        redacted = F.regexp_replace(redacted, pat, repl)
    return df.select(F.col(id_col), *counts, F.md5(redacted).alias("redacted_fp"))


def pii_prevalence(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-level PII audit report: one row per ``PII_PATTERNS``
    entry with how many documents contain >= 1 hit and the total hit
    count — the compliance summary a redaction pass publishes (is PII
    0.1% of documents or 40%?), complementing :func:`pii_stats`'s
    per-document detail.

    Output: ``(pii_type, docs_with_hits, total_hits)``, one row per
    pattern, deterministic order-independent content.

    Shape: the same single codegen'd scan as :func:`pii_stats` (every
    regex count is row-local), then one map-side-partial aggregate —
    exactly ``2 x |patterns|`` longs cross the network per input
    partition, and the pattern-per-row unpivot happens on the final
    1-row relation.  Nothing scales with corpus size but the scan.
    """
    counts = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))).alias(
            f"__n_{name}"
        )
        for name, (pat, _) in PII_PATTERNS.items()
    ]
    per_doc = df.select(*counts)
    aggs = []
    for name in PII_PATTERNS:
        c = F.col(f"__n_{name}")
        aggs.append(
            F.sum(F.when(c > 0, 1).otherwise(0)).cast("long").alias(f"__docs_{name}")
        )
        aggs.append(F.sum(c).cast("long").alias(f"__hits_{name}"))
    totals = per_doc.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("pii_type"),
                F.coalesce(F.col(f"__docs_{name}"), F.lit(0)).alias("docs_with_hits"),
                F.coalesce(F.col(f"__hits_{name}"), F.lit(0)).alias("total_hits"),
            )
            for name in PII_PATTERNS
        ]
    )
    return totals.select(F.explode(rows).alias("__r")).select("__r.*")


def k_anonymity(
    df: DataFrame,
    quasi_cols,
    ks=(2, 5, 10, 25),
) -> DataFrame:
    """k-anonymity risk audit over quasi-identifier columns — the
    structured-data complement of the regex scrubbers: before a table
    with demographic-ish columns is released (or joined into a training
    corpus), how re-identifiable are its rows?

    ``quasi_cols`` is the quasi-identifier tuple (strings or Column
    expressions — pass a binned expression for continuous attributes;
    raw continuous values make every row its own class and the audit
    degenerates to "everything is unique").  Rows sharing a QI tuple
    form an equivalence class; a row in a class smaller than ``k`` is
    re-identifiable at the 1-in-<k level.  NULL QI values group
    together (both Spark and ANSI GROUP BY treat NULL as one group), so
    a sparsely-populated attribute still audits deterministically.

    Output: one row per ``k`` (Sweeney's k-anonymity thresholds),
    columns ``(k, n_rows, n_classes, min_class_size, classes_below,
    rows_below, suppression_micro, prosecutor_risk_micro)`` —
    ``suppression_micro`` is the fraction of rows (x 1e6, exact integer
    division) that would need suppressing to reach k-anonymity by
    deletion alone, and ``prosecutor_risk_micro`` the expected
    prosecutor-model re-identification rate: an adversary who knows the
    QI tuple of every target succeeds on a random row with probability
    ``1/class_size``, and the exact expectation over rows is
    ``n_classes / n_rows`` (each class contributes ``sz * 1/sz = 1``).
    All-integer output, so the report hashes identically cross-engine.

    Shape at scale: ONE corpus-sized shuffle (the QI groupBy, with
    map-side partial counts), producing a classes relation bounded by
    the QI-domain cardinality — for release-grade QI tuples that is
    orders below row count; the audit itself is one more aggregate of
    that bounded relation to a single row, unpivoted driver-free to
    ``len(ks)`` rows.  No joins, nothing all-pairs, no collect.

    Empty input: returns ``len(ks)`` rows with zero counts and NULL
    rates (the divisions are guarded, since ANSI mode would otherwise
    raise on ``div 0``), rather than erroring — an audit of nothing is
    vacuous, not broken.
    """
    classes = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("__sz"))
    aggs = [
        F.coalesce(F.sum("__sz"), F.lit(0)).cast("long").alias("__n_rows"),
        F.count(F.lit(1)).cast("long").alias("__n_classes"),
        F.min("__sz").cast("long").alias("__min_sz"),
    ]
    for k in ks:
        below = F.col("__sz") < int(k)
        aggs.append(
            F.coalesce(F.sum(F.when(below, 1)), F.lit(0))
            .cast("long")
            .alias(f"__cb_{k}")
        )
        aggs.append(
            F.coalesce(F.sum(F.when(below, F.col("__sz"))), F.lit(0))
            .cast("long")
            .alias(f"__rb_{k}")
        )
    totals = classes.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(int(k)).cast("int").alias("k"),
                F.col("__n_rows").alias("n_rows"),
                F.col("__n_classes").alias("n_classes"),
                F.col("__min_sz").alias("min_class_size"),
                F.col(f"__cb_{k}").alias("classes_below"),
                F.col(f"__rb_{k}").alias("rows_below"),
                # the n>0 branch guards ANSI mode's divide-by-zero on
                # an empty input (vacuous audit -> NULL rates)
                F.expr(
                    f"CASE WHEN __n_rows > 0 THEN (__rb_{k} * 1000000) div __n_rows END"
                ).alias("suppression_micro"),
                F.expr(
                    "CASE WHEN __n_rows > 0 THEN (__n_classes * 1000000) div __n_rows END"
                ).alias("prosecutor_risk_micro"),
            )
            for k in ks
        ]
    )
    return totals.select(F.explode(rows).alias("__r")).select("__r.*")


def l_diversity(
    df: DataFrame,
    quasi_cols,
    sensitive_col,
    ls=(2, 3, 5),
) -> DataFrame:
    """l-diversity risk audit — the homogeneity-attack companion to
    :func:`k_anonymity` (Machanavajjhala et al.): a class can be large
    (k-anonymous) yet leak its sensitive attribute outright if every
    member shares one value.  Per Sweeney-style threshold ``l``, how
    many equivalence classes carry fewer than ``l`` DISTINCT sensitive
    values, and how many rows sit in them.

    ``quasi_cols`` as in :func:`k_anonymity` (NULL QI values group
    together).  A NULL ``sensitive_col`` value does NOT count toward a
    class's diversity — ``count(DISTINCT …)`` ignores NULLs in Spark
    and ANSI SQL alike, so an all-NULL class has diversity 0 and is
    below every ``l`` (conservative: an attribute nobody disclosed
    cannot attest diversity).

    Output: one row per ``l``, columns ``(l, n_rows, n_classes,
    min_distinct_sensitive, classes_below, rows_below,
    homogeneous_rows, suppression_micro)`` — ``homogeneous_rows`` is
    the l-independent count of rows whose class has <= 1 distinct
    sensitive value (the outright-disclosure set), and
    ``suppression_micro`` the fraction of rows (x 1e6, exact integer
    division) to delete for distinct-l-diversity by suppression alone.
    All-integer, hashes identically cross-engine.

    Shape at scale: ONE corpus-sized shuffle — a single
    ``groupBy(QI).agg(count, count_distinct(sensitive))`` (Spark plans
    the distinct via a partial expand on the same key partitioning;
    the class relation out of it is QI-domain-bounded) — then the same
    bounded single-row reduce + unpivot as :func:`k_anonymity`.  No
    joins, no collect; empty input returns the vacuous report (guarded
    divisions, ANSI-safe).
    """
    classes = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("__sz"),
        F.count_distinct(
            F.col(sensitive_col) if isinstance(sensitive_col, str) else sensitive_col
        ).alias("__nd"),
    )
    aggs = [
        F.coalesce(F.sum("__sz"), F.lit(0)).cast("long").alias("__n_rows"),
        F.count(F.lit(1)).cast("long").alias("__n_classes"),
        F.min("__nd").cast("long").alias("__min_nd"),
        F.coalesce(F.sum(F.when(F.col("__nd") <= 1, F.col("__sz"))), F.lit(0))
        .cast("long")
        .alias("__homog"),
    ]
    for l in ls:
        below = F.col("__nd") < int(l)
        aggs.append(
            F.coalesce(F.sum(F.when(below, 1)), F.lit(0))
            .cast("long")
            .alias(f"__cb_{l}")
        )
        aggs.append(
            F.coalesce(F.sum(F.when(below, F.col("__sz"))), F.lit(0))
            .cast("long")
            .alias(f"__rb_{l}")
        )
    totals = classes.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(int(l)).cast("int").alias("l"),
                F.col("__n_rows").alias("n_rows"),
                F.col("__n_classes").alias("n_classes"),
                F.col("__min_nd").alias("min_distinct_sensitive"),
                F.col(f"__cb_{l}").alias("classes_below"),
                F.col(f"__rb_{l}").alias("rows_below"),
                F.col("__homog").alias("homogeneous_rows"),
                # guarded like k_anonymity: ANSI div-0 on empty input
                F.expr(
                    f"CASE WHEN __n_rows > 0 THEN (__rb_{l} * 1000000) div __n_rows END"
                ).alias("suppression_micro"),
            )
            for l in ls
        ]
    )
    return totals.select(F.explode(rows).alias("__r")).select("__r.*")


def t_closeness(
    df: DataFrame,
    quasi_cols,
    sensitive_col,
    ts=(100_000, 200_000, 300_000),
) -> DataFrame:
    """t-closeness risk audit — the distribution-skew companion that
    completes the classic triad (Li et al. 2007): a class can be
    k-anonymous AND l-diverse yet still leak — e.g. 95% of one salary
    band where the population is uniform.  Per class C the distance is
    the VARIATIONAL (total-variation) distance between the class's
    sensitive-value distribution and the table-global one,
    ``t(C) = 1/2 * sum_v |P_C(v) - P(v)|``, the paper's categorical
    ground distance; the audit reports, per threshold ``t`` (in
    micro-units, e.g. 100_000 = 0.1), how many classes and rows exceed
    it, plus the table max.

    EXACT INTEGER ARITHMETIC end to end: with a_v = class count,
    n_c = class size, b_v = global count, N = total,
    ``|a_v/n_c - b_v/N| = |a_v*N - b_v*n_c| / (n_c*N)``, so the
    distance numerator is an integer sum and
    ``t_micro = (S + N*n_c) * 1_000_000 div (2*n_c*N)`` where
    ``S = sum_{v in C} (|a_v*N - b_v*n_c| - b_v*n_c)`` folds the
    values ABSENT from the class (each contributes b_v*n_c) into the
    closed-form ``+ N*n_c``.  Products ride DECIMAL(38,0) (N up to
    ~1e15 stays exact; int64 would overflow at N ~ 3e9), division is
    integer ``div`` — deterministic under any summation order, so a
    DuckDB twin can be prepared verbatim if this ever debuts.

    NULL sensitive values disclose nothing: they are excluded from
    BOTH distributions, and a class whose every sensitive value is
    NULL is excluded from the report entirely (consistent with
    :func:`l_diversity`, where such a class has diversity 0 — the
    homogeneity audit already covers it).  ``n_rows`` therefore counts
    disclosed (non-NULL-sensitive) rows.  NULL **quasi-identifier**
    values group together into a real equivalence class, exactly like
    the siblings' ``groupBy`` semantics — the QI key rides as one
    struct so every internal join is null-safe (struct equality treats
    NULL fields as equal; r14 ADVICE found the multi-column join
    dropping NULL-QI classes).

    Output: one row per ``t`` threshold, all-integer columns
    ``(t_micro, n_rows, n_classes, max_t_micro, classes_above,
    rows_above)``.

    Shape at scale: ONE corpus-sized shuffle — ``groupBy(QI,
    sensitive)`` with map-side partials — lands a frame bounded by
    |QI domain| x |sensitive domain|; class sizes, the global
    distribution, the per-class distance aggregate, and the final
    single-row reduce + unpivot all operate on that bounded relation
    (the global side broadcasts).  No corpus-side joins, no collect;
    empty input returns the vacuous report (guarded divisions).
    """
    qi = [
        (c if not isinstance(c, str) else F.col(c)).alias(f"__q{i}")
        for i, c in enumerate(quasi_cols)
    ]
    s = F.col(sensitive_col) if isinstance(sensitive_col, str) else sensitive_col
    # QI columns ride as ONE struct key: struct equality treats NULL
    # fields as equal, so NULL-QI rows form a class (and survive the
    # cells<->cls join) exactly as k_anonymity/l_diversity's pure
    # groupBy semantics promise — a null-unsafe multi-column join here
    # silently dropped the (often riskiest, most skewed) NULL-QI
    # classes from the audit.
    named = df.select(F.struct(*qi).alias("__qk"), s.alias("__v")).filter(
        F.col("__v").isNotNull()
    )
    dec = "decimal(38,0)"
    cells = named.groupBy("__qk", "__v").agg(
        F.count(F.lit(1)).cast(dec).alias("__a")
    )
    cls = cells.groupBy("__qk").agg(F.sum("__a").cast(dec).alias("__nc"))
    glob = cells.groupBy("__v").agg(F.sum("__a").cast(dec).alias("__b"))
    tot = glob.agg(F.coalesce(F.sum("__b"), F.lit(0)).cast(dec).alias("__N"))
    j = (
        cells.join(F.broadcast(glob), "__v")
        .join(cls, "__qk")
        .crossJoin(F.broadcast(tot))
    )
    term = (
        F.abs(F.col("__a") * F.col("__N") - F.col("__b") * F.col("__nc"))
        - F.col("__b") * F.col("__nc")
    )
    per_class = j.groupBy("__qk").agg(
        F.first("__nc").alias("__nc"),
        F.first("__N").alias("__N"),
        F.sum(term).alias("__s0"),
    )
    t_micro = F.expr(
        "CAST((__s0 + __N * __nc) * 1000000 div (2 * __nc * __N) AS BIGINT)"
    )
    scored = per_class.select(
        F.col("__nc").cast("long").alias("__nc"), t_micro.alias("__t")
    )
    aggs = [
        F.coalesce(F.sum("__nc"), F.lit(0)).cast("long").alias("__n_rows"),
        F.count(F.lit(1)).cast("long").alias("__n_classes"),
        F.coalesce(F.max("__t"), F.lit(0)).cast("long").alias("__max_t"),
    ]
    for t in ts:
        above = F.col("__t") > int(t)
        aggs.append(
            F.coalesce(F.sum(F.when(above, 1)), F.lit(0))
            .cast("long")
            .alias(f"__ca_{t}")
        )
        aggs.append(
            F.coalesce(F.sum(F.when(above, F.col("__nc"))), F.lit(0))
            .cast("long")
            .alias(f"__ra_{t}")
        )
    totals = scored.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(int(t)).cast("long").alias("t_micro"),
                F.col("__n_rows").alias("n_rows"),
                F.col("__n_classes").alias("n_classes"),
                F.col("__max_t").alias("max_t_micro"),
                F.col(f"__ca_{t}").alias("classes_above"),
                F.col(f"__ra_{t}").alias("rows_above"),
            )
            for t in ts
        ]
    )
    return totals.select(F.explode(rows).alias("__r")).select("__r.*")


def k_anonymize(
    df: DataFrame,
    levels,
    out_names,
    carry_cols,
    k: int = 5,
    max_suppression_micro: int = 50_000,
    sensitive_col=None,
    l: int = 1,
) -> DataFrame:
    """Make a table k-anonymous — the WRITE-path companion to
    :func:`k_anonymity`'s audit (redact : pii_stats :: k_anonymize :
    k_anonymity): Samarati-style global recoding over a lockstep
    generalization ladder, plus suppression of the below-k remainder.

    ``levels`` is the ladder: ``levels[i]`` is the full QI tuple (one
    Column expression per QI attribute, all over the ORIGINAL columns)
    at coarseness ``i`` — level 0 finest, e.g. ``(nation, segment,
    floor(bal/1000))`` → ``(nation, segment, floor(bal/5000))`` →
    ``(nation, segment, NULL)``.  The chosen level is the FINEST whose
    below-k row fraction is at most ``max_suppression_micro`` (x 1e-6);
    if none qualifies the coarsest level is used and its remainder
    suppressed anyway (loud in the audit, silent here by design — a
    release pipeline wants a table out, and the re-audit proves what
    it got).  Rows in below-k classes AT the chosen level are dropped
    (suppression), so the output is k-anonymous BY CONSTRUCTION under
    ``(out_names)`` — pinned by the re-audit property test.

    Pass ``sensitive_col`` + ``l > 1`` to ALSO enforce distinct
    l-diversity jointly (k-anonymity alone famously fails the
    homogeneity attack :func:`l_diversity` audits): a class is then
    suppressible when its size is below ``k`` OR its count of DISTINCT
    non-NULL sensitive values is below ``l``, both the rung decision's
    budget check and the final suppression using that joint rule — so
    the release is k-anonymous AND l-diverse by construction (all-NULL
    classes have diversity 0 and are suppressed, the conservative
    :func:`l_diversity` semantics).  The combined aggregate then
    groups by ``(every rung, sensitive)`` — cardinality bounded by the
    finest QI domain x the sensitive domain, still corpus-independent.
    Defaults (``l=1``) keep the original plan byte-identical.

    Output: ``carry_cols`` (non-identifying payload columns, kept
    verbatim) + the chosen level's QI expressions aliased to
    ``out_names``.  The original QI columns must NOT be in
    ``carry_cols`` — re-attaching them would undo the recoding.

    Shape at scale: ONE corpus-sized shuffle — a single aggregate
    grouped by EVERY level's expressions at once (per input row all
    ladder values are computed together, so the grouped frame's
    cardinality is the finest level's class count, QI-domain-bounded)
    — then per-level roll-ups and the level decision happen on that
    bounded frame (``len(levels)`` two-scalar driver actions); finally
    one projection pass with a left-anti join against the chosen
    level's below-k class keys (AQE broadcasts the key set when small;
    by construction it covers at most the suppression budget's rows —
    deliberately NOT hint-forced, the ngram_coverage lesson).
    """
    if not levels or not all(len(lvl) == len(out_names) for lvl in levels):
        raise ValueError("levels must be non-empty, each matching out_names")
    if l > 1 and sensitive_col is None:
        raise ValueError("l > 1 requires sensitive_col")
    lvl_names = [
        [f"__l{i}_{j}" for j in range(len(out_names))] for i in range(len(levels))
    ]
    flat = [
        e.alias(n)
        for lvl, names in zip(levels, lvl_names)
        for e, n in zip(lvl, names)
    ]
    diverse = sensitive_col is not None and l > 1
    if diverse:
        s_col = (
            F.col(sensitive_col) if isinstance(sensitive_col, str) else sensitive_col
        )
        flat = flat + [s_col.alias("__v")]
    combined = (
        df.groupBy(*flat).agg(F.count(F.lit(1)).alias("__n")).localCheckpoint()
    )

    def class_stats(names):
        aggs = [F.sum("__n").alias("__sz")]
        if diverse:
            aggs.append(F.count_distinct(F.col("__v")).alias("__nd"))
        return combined.groupBy(*names).agg(*aggs)

    def suppressible():
        cond = F.col("__sz") < k
        if diverse:
            cond = cond | (F.col("__nd") < l)
        return cond

    chosen = len(levels) - 1
    for i, names in enumerate(lvl_names):
        cls = class_stats(names)
        row = cls.agg(
            F.coalesce(F.sum("__sz"), F.lit(0)).alias("__tot"),
            F.coalesce(
                F.sum(F.when(suppressible(), F.col("__sz"))), F.lit(0)
            ).alias("__below"),
        ).collect()[0]
        tot, below_rows = row["__tot"], row["__below"]
        if tot == 0 or below_rows * 1_000_000 <= max_suppression_micro * tot:
            chosen = i
            break
    names = lvl_names[chosen]
    below = (
        class_stats(names)
        .filter(suppressible())
        .select(*[F.col(n).alias(f"__b_{o}") for n, o in zip(names, out_names)])
    )
    gen = df.select(
        *[F.col(c) for c in carry_cols],
        *[e.alias(o) for e, o in zip(levels[chosen], out_names)],
    )
    # NULL-SAFE anti-join: a ladder rung may generalize an attribute
    # to NULL (fully suppressed column); plain equality would never
    # match those class keys and the below-k rows would dodge
    # suppression
    cond = None
    for o in out_names:
        c = gen[o].eqNullSafe(below[f"__b_{o}"])
        cond = c if cond is None else cond & c
    return gen.join(below, on=cond, how="left_anti")


def redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace every ``PII_PATTERNS`` match in ``text_col`` in place —
    the write-path twin of :func:`pii_stats` for producing the cleaned
    corpus itself."""
    redacted = F.col(text_col)
    for pat, repl in PII_PATTERNS.values():
        redacted = F.regexp_replace(redacted, pat, repl)
    return df.withColumn(text_col, redacted)

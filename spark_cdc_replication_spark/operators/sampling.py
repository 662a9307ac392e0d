"""Deterministic sampling / splitting / packing for training-data
pipelines (``[EXT]``, no reference counterpart).

Everything here is *hash-deterministic*, never RNG-based: a sample
taken today equals the sample taken tomorrow on the same ids, survives
re-partitioning and re-runs (Spark's ``sample()`` does not — its seed
is per-partition-index, so any upstream repartition silently changes
the sample), and is reproducible by any other engine from the spec.
The hash is the first 8 hex chars of ``md5(key)`` — cheap, uniform,
and computable in ANSI SQL, which is what makes these operators
oracle-checkable in DuckDB.

Hash-space discipline: all SAMPLERS share the one unsalted
``md5(key)`` space deliberately — that is what makes samples nested
in rate and prefix-consistent across operators.  SPLIT assignment
(:func:`split_assign`) hashes a namespaced key (``"split:" || key``)
instead: if it shared the samplers' space, composing any sampler at
rate r with a split whose train fraction >= r would leave val/test
EMPTY (every surviving bucket already lies in the train range).
:func:`corpus_shuffle` namespaces by its caller-supplied seed for the
same reason.

All pure native expressions (codegen'd, shuffle-free row filters /
projections) except :func:`pack_greedy`, which is inherently
sequential per group and uses ``applyInPandas``, and the DSIR pair
(:func:`importance_weights` / :func:`sample_importance`), whose
bucket-count aggregates shuffle — map-side-partial and
``num_buckets``-bounded, documented on the operators.
"""

from __future__ import annotations

import math
from typing import Iterator, Mapping, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: hash buckets per unit of rate (1e-4 rate resolution)
_BUCKETS = 10_000


def _rate_cut(rate: float) -> int:
    """Rate -> bucket threshold, rounded to the NEAREST bucket
    (half-up) via ``floor(x + 0.5)`` — plain truncation turns a
    non-representable rate like 0.07 (-> 699.999...) into an
    off-by-one-bucket threshold, diverging from user intent and from
    any round-to-nearest oracle.  floor(x + 0.5) is bit-identical in
    Python, Spark, and DuckDB (no round-half-to-even ambiguity), so
    the SQL twin is ``CAST(floor(rate * 10000 + 0.5) AS BIGINT)``."""
    return math.floor(float(rate) * _BUCKETS + 0.5)


def _rate_cut_col(rate: Column) -> Column:
    """Column twin of :func:`_rate_cut` (same floor(x+0.5) contract)."""
    return F.floor(rate * _BUCKETS + F.lit(0.5)).cast("long")


def hash_bucket(key: Column | str, buckets: int = _BUCKETS) -> Column:
    """Uniform deterministic bucket in ``[0, buckets)`` from md5(key).

    SQL twin: ``CAST(('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8))
    AS BIGINT) % buckets`` (DuckDB) — verified to agree byte-for-byte
    with Spark's ``conv(substr(md5(cast(k as string)), 1, 8), 16, 10)``.
    """
    col = F.col(key) if isinstance(key, str) else key
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % buckets
    )


def deterministic_sample(
    df: DataFrame, rate: float, key_col: str = "doc_id"
) -> DataFrame:
    """Keep ~``rate`` of rows, decided per-row by ``hash(key) < rate``.

    Unlike ``df.sample(rate)`` the decision is a pure function of the
    key: stable across runs, partitionings, and engines, and a row kept
    at rate r is also kept at every rate > r (nested samples — grow a
    training subset without resampling everything).
    """
    return df.filter(hash_bucket(key_col) < _rate_cut(rate))


def stratified_sample(
    df: DataFrame,
    rates: Mapping[str, float],
    strata_col: str = "source",
    key_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the source-mixture knob of
    a corpus pipeline (e.g. keep 100% wiki, 10% web crawl).

    The rate lookup is a small CASE expression (bounded strata), so the
    whole operator is one codegen'd filter — no join, no shuffle.
    """
    expr = F.lit(float(default_rate))
    for value, rate in sorted(rates.items()):
        expr = F.when(F.col(strata_col) == value, F.lit(float(rate))).otherwise(expr)
    return df.filter(hash_bucket(key_col) < _rate_cut_col(expr))


def mixture_sample(
    df: DataFrame,
    weights: Mapping[str, float],
    strata_col: str = "source",
    key_col: str = "doc_id",
) -> DataFrame:
    """Downsample-only re-mixing toward target *proportions* — the
    domain-mixture step of a training-data pipeline ("web:wiki:code =
    6:2:1").  Unlike :func:`stratified_sample` (absolute per-stratum
    rates), the keep-rates here are derived from the data: the
    achievable corpus is bounded by the stratum that runs out first
    (scale ``T = min_s(n_s / w_s)`` rows per unit weight), and each
    stratum keeps ``rate_s = w_s * T / n_s`` via the deterministic
    hash filter.  Strata absent from ``weights`` are dropped.

    Shape: one bounded-cardinality count aggregate; the derived cut
    table (one row per stratum) broadcast-joins back onto the scan —
    no driver round-trip, so the whole thing stays one lazy plan and
    works identically at 100 TB (the fact table is never shuffled).
    """
    expr = F.lit(None).cast("double")
    for value, wt in sorted(weights.items()):
        expr = F.when(F.col(strata_col) == value, F.lit(float(wt))).otherwise(expr)
    tagged = df.withColumn("__w", expr).filter(F.col("__w").isNotNull())
    counts = tagged.groupBy(strata_col, "__w").agg(F.count(F.lit(1)).alias("__n"))
    t = counts.agg(F.min(F.col("__n") / F.col("__w")).alias("__t"))
    # floor(x + 0.5), not floor(x): the limiting stratum's rate is
    # exactly 1 in real arithmetic but its double rounds to
    # 9999.999...8 for ~4% of stratum sizes, and plain truncation would
    # silently drop that stratum's bucket-9999 rows — the same hazard
    # _rate_cut documents (code review r8; SQL twin mirrors the +0.5).
    cuts = counts.join(F.broadcast(t)).select(
        strata_col,
        F.floor(F.col("__w") * F.col("__t") / F.col("__n") * _BUCKETS + F.lit(0.5)).alias("__cut"),
    )
    return (
        tagged.join(F.broadcast(cuts), strata_col)
        .filter(hash_bucket(key_col) < F.col("__cut"))
        .drop("__w", "__cut")
    )


def temperature_mixture(
    df: DataFrame,
    alpha: float = 0.5,
    strata_col: str = "source",
    key_col: str = "doc_id",
) -> DataFrame:
    """Temperature-flattened re-mixing (α-sampling — the multilingual /
    UniMax data-balancing step): target proportions are derived from
    the corpus itself as ``n_s^alpha``, so dominant strata are
    downsampled toward the smaller ones instead of the caller naming
    absolute weights (:func:`mixture_sample`'s contract).  ``alpha=1``
    keeps the natural mix (no-op rates), ``alpha=0`` equalizes strata;
    the usual flattening range is 0.2-0.7.

    Downsample-only, like :func:`mixture_sample`: the scale factor
    ``T = min_s(n_s / n_s^alpha) = min_s n_s^(1-alpha)`` pins the
    smallest stratum at keep-everything, and stratum ``s`` keeps
    ``rate_s = n_s^alpha * T / n_s`` via the deterministic md5-hash
    Bernoulli (stable across runs/partitionings/engines, nested in
    rate).  Rows with a NULL stratum are dropped (no provable weight).

    ``alpha=0.5`` computes weights with ``sqrt`` — IEEE-754
    correctly-rounded in every engine, so the derived integer cuts are
    engine-exact and the op is oracle-hash-checkable; other alphas go
    through ``pow`` (within 1 ulp, same caveat as any cross-engine
    float comparison).

    Shape: identical to :func:`mixture_sample` — one bounded
    count aggregate, the one-row-per-stratum cut table broadcast back
    onto the scan; the fact table is never shuffled.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    # NULL strata are dropped BEFORE the count aggregate, not just by
    # the final join: a NULL group's n would otherwise enter the
    # min() scale factor and silently shrink every real stratum's rate.
    df = df.filter(F.col(strata_col).isNotNull())
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n"))
    nn = F.col("__n").cast("double")
    if alpha == 0.5:
        w = F.sqrt(nn)
    elif alpha == 0.0:
        w = F.lit(1.0)
    elif alpha == 1.0:
        w = nn
    else:
        w = F.pow(nn, F.lit(float(alpha)))
    weighted = counts.select(strata_col, "__n", w.alias("__w"))
    t = weighted.agg(F.min(F.col("__n") / F.col("__w")).alias("__t"))
    # floor(x + 0.5) — same double-rounding guard as mixture_sample.
    cuts = weighted.join(F.broadcast(t)).select(
        strata_col,
        F.floor(F.col("__w") * F.col("__t") / F.col("__n") * _BUCKETS + F.lit(0.5)).alias("__cut"),
    )
    return (
        df.join(F.broadcast(cuts), strata_col)
        .filter(hash_bucket(key_col) < F.col("__cut"))
        .drop("__cut")
    )


def weighted_sample(
    df: DataFrame,
    weight: Column,
    key_col: str = "doc_id",
) -> DataFrame:
    """Per-row Bernoulli with keep-probability = ``weight`` (a [0,1]
    column, e.g. a quality score) — deterministic: hash(key)/buckets <
    weight.  Quality-weighted corpus thinning in ONE codegen'd filter;
    like :func:`deterministic_sample`, raising a row's weight can only
    ADD it (nested across weightings), and the decision is independent
    of partitioning and engine."""
    return df.filter(hash_bucket(key_col) < _rate_cut_col(weight))


def quality_band_sample(
    df: DataFrame,
    score_col: str,
    cuts: Sequence[float],
    rates: Sequence[float],
    key_col: str = "doc_id",
    null_rate: float = 0.0,
    band_col: str | None = "band",
) -> DataFrame:
    """Score-band curation sampling — the "keep more of the good
    bands" knob of model-scored data curation (DCLM/FineWeb-style:
    score every document with a cheap quality model, then downsample
    the low bands instead of hard-filtering): band ``i`` is
    ``score <= cuts[i]`` (first match; ``len(rates) == len(cuts)+1``,
    the last rate is the above-all-cuts band), each band keeps its
    rows at ``rates[i]`` via the deterministic md5-hash Bernoulli.

    One codegen'd filter — no join, no shuffle; like every sampler
    here the decision is a pure function of the key, so samples are
    stable across runs/partitionings/engines and nested in each rate.
    NULL scores keep at ``null_rate``.  ``band_col`` (optional)
    appends the band index to the survivors.
    """
    if len(rates) != len(cuts) + 1:
        raise ValueError(f"need len(rates) == len(cuts)+1, got {len(rates)}/{len(cuts)}")
    # strictly ascending: a duplicated cut passes a sorted() check but
    # creates an unreachable band whose rate is silently dead (first
    # match wins) — reject it loudly instead (code review r8).
    if not all(float(a) < float(b) for a, b in zip(cuts, cuts[1:])):
        raise ValueError(f"cuts must be strictly ascending, got {list(cuts)}")
    if band_col and band_col in df.columns:
        raise ValueError(
            f"band_col {band_col!r} already exists; rename or pass band_col=None"
        )
    score = F.col(score_col)
    band = F.lit(len(cuts))
    rate = F.lit(float(rates[-1]))
    for i in range(len(cuts) - 1, -1, -1):
        band = F.when(score <= float(cuts[i]), F.lit(i)).otherwise(band)
        rate = F.when(score <= float(cuts[i]), F.lit(float(rates[i]))).otherwise(rate)
    band = F.when(score.isNull(), F.lit(None).cast("int")).otherwise(band)
    rate = F.when(score.isNull(), F.lit(float(null_rate))).otherwise(rate)
    out = df.filter(hash_bucket(key_col) < _rate_cut_col(rate))
    return out.withColumn(band_col, band) if band_col else out


def sample_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    k: int,
    key_col: str = "doc_id",
) -> DataFrame:
    """Exactly ``min(k, |group|)`` rows per group, chosen by hash order
    — the deterministic reservoir: uniform (md5 order is independent of
    any data column), stable across runs/engines, and a group's sample
    at k is a prefix of its sample at k' > k (grow without resampling).

    One shuffle on the group key.  The window sorts each group; when a
    single group is huge AND k is tiny, pre-filter with
    :func:`hash_order_prefilter` at a safe rate (>= ~10k/|group|)
    first — it keeps a PREFIX of the same (md5, key) order, so the
    composition returns exactly the unfiltered top-k.  Do NOT
    pre-filter with :func:`deterministic_sample`: its bucket is the
    md5 prefix MODULO 10000, which scatters across hash order — the
    survivors are a bucket subset, not an order prefix, and the
    composed top-k silently differs from the unfiltered one (code
    review r8).
    """
    w = Window.partitionBy(*group_cols).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def hash_order_prefilter(
    df: DataFrame, rate: float, key_col: str = "doc_id"
) -> DataFrame:
    """Keep the hash-ORDER prefix of ~``rate`` of rows: filters on the
    raw 32-bit md5-prefix value with NO modulo, so the survivor set is
    exactly the first ~``rate`` fraction of ``(md5(key), key)`` order
    — the order every rank-based operator here uses.  This is the
    correct cheap pre-filter for :func:`sample_k_per_group` /
    :func:`token_budget_sample` (same order, earlier cutoff);
    :func:`deterministic_sample`'s bucket-mod filter is NOT (it keeps
    a subset scattered uniformly across hash order).
    """
    cut = math.floor(float(rate) * float(2**32) + 0.5)
    prefix = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    return df.filter(prefix < cut)


def waterfill_quotas(sizes: Mapping[int, int], budget: int) -> dict[int, int]:
    """Water-filling allocation of ``budget`` slots over capacitated
    groups: repeatedly hand every unsaturated group an equal share of
    what is left (a group never receives more than its capacity); when
    the residue is smaller than the number of unsaturated groups, hand
    out single slots in ascending group order.  Deterministic, exact:
    ``sum(quotas) == min(budget, sum(sizes))``, every group with
    ``size >= budget // n_groups`` receives at least that fair share,
    and no group exceeds its capacity.  Driver-side by design — the
    input is one row per CLUSTER (bounded by ``num_clusters``), never
    per document."""
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    quotas = {c: 0 for c in sizes}
    remaining = {c: s for c, s in sizes.items() if s > 0}
    left = min(budget, sum(remaining.values()))
    while left > 0 and remaining:
        share = left // len(remaining)
        if share == 0:
            for c in sorted(remaining):
                if left == 0:
                    break
                quotas[c] += 1
                left -= 1
            break
        for c in list(remaining):
            take = min(share, remaining[c])
            quotas[c] += take
            remaining[c] -= take
            left -= take
            if remaining[c] == 0:
                del remaining[c]
    return quotas


def cluster_diverse_sample(
    corpus: DataFrame,
    budget: int,
    num_clusters: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    score_col: str | None = None,
    descending: bool = True,
    lloyd_iters: int = 2,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Semantic-density-FLATTENING subset selection — the
    diversification half of the D4 recipe (Tirumala et al., "D4:
    Improving LLM Pretraining via Document De-Duplication and
    Diversification", 2023): cluster the corpus in embedding space,
    then spend a global ``budget`` via water-filling over the clusters
    (equal share each, small clusters contribute everything and free
    their residue) so over-represented semantic regions are downsampled
    toward uniform while sparse regions keep every document.  This is
    the selection step that runs AFTER :func:`operators.dedup
    .dedup_semantic` has removed near-duplicates: dedup removes copies,
    this flattens what density remains.

    Within each cluster the quota goes to the TOP-``quota`` documents
    by ``score_col`` (``descending=False`` for loss-like scores;
    NULL scores rank last; ``id_col`` ascending tie-break), or — with
    no score — to the hash-order prefix (:func:`sample_k_per_group`'s
    deterministic-reservoir rule, uniform and stable across runs).
    Output = the selected rows with their ``cell`` attached.

    Pass ``centroids`` (from :func:`operators.similarity
    .ivf_centroids`) to reuse an already-trained index — the same
    centroids an ANN deployment already maintains; otherwise a
    deterministic index is trained here (lowest-id seeds +
    ``lloyd_iters`` Lloyd passes).

    Scale shape (100 TB): centroid training is ``lloyd_iters + 1``
    corpus scans with only ``cells x dim`` floats ever reaching the
    driver; assignment is ONE shuffle-free Arrow-matmul scan; cluster
    sizes are a ``num_clusters``-row collect; the only corpus shuffle
    is the per-cell rank window.  The quota table rides as a
    ``num_clusters``-entry LITERAL map expression rather than a
    broadcast join — a joined quota pushed ``isnotnull(cell)`` below
    the output projection and DUPLICATED the assignment UDF (two
    matmuls per row, plan-verified); the literal lookup keeps exactly
    one ``ArrowEvalPython`` in the plan (swap to a broadcast join only
    at genuinely huge nlist, ~10⁵+ cells, where the plan literal
    outgrows the duplicated scan).  When a single cell is huge and
    its quota tiny, pre-filter with :func:`hash_order_prefilter`
    (score-less mode composes exactly: same order, earlier cutoff)."""
    from .similarity import _cell_assign_udf, ivf_centroids

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    cents = centroids if centroids is not None else ivf_centroids(
        corpus, num_clusters, vec_col, id_col, lloyd_iters
    )
    # deferred localCheckpoint (r17): the cluster-size collect below
    # must run the assignment matmul anyway — checkpointing the
    # assigned frame there makes the final rank/filter pass read the
    # blocks instead of re-running the UDF scan, so post-training
    # assignment is ONE pass at runtime too, not just one plan node.
    # Blocks are corpus+cell-sized and live only for this job; the
    # executor-loss caveat is the same documented localCheckpoint
    # trade as the hygiene/excision pipelines.
    assigned = corpus.withColumn(
        "cell", _cell_assign_udf(cents)(vec_col)
    ).localCheckpoint(eager=False)
    sizes = {
        r["cell"]: r["n"]
        for r in assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    quotas = waterfill_quotas(sizes, budget)
    pairs: list[Column] = []
    for c, q in sorted(quotas.items()):
        pairs += [F.lit(int(c)), F.lit(int(q))]
    # coalesce is load-bearing: a bare element_at comparison lets
    # Catalyst INFER isnotnull(cell) and push it below the assignment
    # projection, duplicating the Arrow UDF (two matmuls per row —
    # the same inference a quota JOIN triggers); with the null
    # handled, no constraint is inferred and the plan keeps exactly
    # one ArrowEvalPython (pinned in tests)
    quota_expr = F.coalesce(
        F.element_at(F.create_map(*pairs), F.col("cell")), F.lit(0)
    )
    if score_col is None:
        order = [F.md5(F.col(id_col).cast("string")), F.col(id_col)]
    else:
        score = F.col(score_col)
        order = [
            score.desc_nulls_last() if descending else score.asc_nulls_last(),
            F.col(id_col),
        ]
    w = Window.partitionBy("cell").orderBy(*order)
    return (
        assigned.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= quota_expr)
        .drop("__rk")
    )


def token_budget_sample(
    df: DataFrame,
    budget: int,
    strata_col: str = "source",
    text_col: str = "text",
    key_col: str = "doc_id",
    bucket_chars: int = 2,
) -> DataFrame:
    """Keep, per stratum, the hash-ordered prefix of documents whose
    running token total stays ``<= budget`` — the unit real training
    mixtures are specified in ("30B tokens of code"), as opposed to the
    row-rate knobs of :func:`stratified_sample` / :func:`mixture_sample`.

    Deterministic like every sampler here: the per-stratum document
    order is ``(md5(key), key)``, so the sample is stable across runs /
    partitionings / engines, and the budget-``B`` sample is a PREFIX of
    every budget-``B' > B`` sample (grow a mixture without resampling).
    Documents are atomic — the first document that would cross the
    budget is dropped entirely (no partial docs), as are all after it.

    Output: the surviving rows with an appended ``n_tokens`` column.

    Scale shape — a naive formulation is one cumulative-sum window per
    stratum, which single-tasks a 100 TB stratum.  Two phases instead:
    (1) per-(stratum, hash-bucket) token sums — map-side partial
    aggregation, one row per bucket out; (2) bucket offsets via a
    window over the ``16^bucket_chars``-row-per-stratum bucket table
    (trivial), then the document-level running sum only WITHIN each
    (stratum, bucket) partition, offset by its bucket's prefix total.
    The bucket id is a prefix of the document hash, so bucket-major
    order equals global hash order and the result is exactly the
    single-window answer (oracle-checked against it) — with per-stratum
    parallelism restored to ``16^bucket_chars`` (the salted-top-k
    pattern applied to a prefix sum).
    """
    from ..functions.text import token_count

    if "n_tokens" in df.columns:
        raise ValueError(
            "token_budget_sample appends an n_tokens column; rename or "
            "drop the existing one first"
        )
    h = F.md5(F.col(key_col).cast("string"))
    # NULL text costs 0 tokens (kept, free) in BOTH ANSI and legacy
    # modes: under legacy Spark size(NULL) is -1, which would make the
    # running sum non-monotone and the kept set a non-prefix (code
    # review r8); the greatest(coalesce(., 0), 0) pins 0 either way,
    # and the SQL twin coalesces identically.
    n_tok = F.greatest(F.coalesce(token_count(text_col), F.lit(0)), F.lit(0))
    # NULL strata: a plain equi-join on the stratum would silently drop
    # NULL-keyed rows (null != null), while the single-window semantics
    # this must match treat NULL as an ordinary group — join on a
    # null-safe stand-in key instead.
    skey = F.coalesce(F.col(strata_col).cast("string"), F.lit("\x00<null>"))
    base = df.select(
        "*",
        n_tok.alias("n_tokens"),
        h.alias("__h"),
        F.substring(h, 1, bucket_chars).alias("__b"),
        skey.alias("__s"),
    )
    bsum = base.groupBy("__s", "__b").agg(F.sum("n_tokens").alias("__bt"))
    wb = Window.partitionBy("__s").orderBy("__b")
    boff = bsum.select(
        "__s",
        "__b",
        (F.coalesce(F.sum("__bt").over(wb.rowsBetween(Window.unboundedPreceding, -1)),
                    F.lit(0))).alias("__off"),
    )
    wd = Window.partitionBy("__s", "__b").orderBy("__h", key_col)
    cum = F.col("__off") + F.sum("n_tokens").over(
        wd.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        base.join(boff, on=["__s", "__b"])
        .withColumn("__cum", cum)
        .filter(F.col("__cum") <= budget)
        .select(*df.columns, "n_tokens")  # join reordered the key cols
    )


def corpus_shuffle(
    df: DataFrame,
    seed: str,
    id_col: str = "doc_id",
    shard_chars: int = 1,
) -> DataFrame:
    """Deterministic global training-order shuffle: every row gets a
    ``(shard, pos)`` address that is a pure function of ``(seed, id)``
    — the epoch-shuffle step of a training pipeline, reproducible
    across runs, partitionings, and engines (the reason NOT to use
    ``df.orderBy(rand(seed))``, whose order changes with the upstream
    partitioning).

    ``shard = first hex char(s) of md5(seed || id)`` (16^shard_chars
    shards), ``pos = row_number`` within the shard ordered by the full
    md5.  Readers stream shards in any order and rows by ``pos`` —
    a different seed produces an entirely different permutation.

    Scale: no global sort.  The only movement is one shuffle into
    16^``shard_chars`` ranges with a per-shard local sort; pick
    ``shard_chars`` so a shard fits an executor (2 -> 256 shards,
    3 -> 4096).  SQL twin in workloads/llmdata.py (md5 + row_number).
    """
    key = F.md5(F.concat(F.lit(f"{seed}-"), F.col(id_col).cast("string")))
    base = df.select(F.col(id_col), key.alias("__k"))
    w = Window.partitionBy(F.substring("__k", 1, shard_chars)).orderBy(
        "__k", id_col
    )
    return base.select(
        F.substring("__k", 1, shard_chars).alias("shard"),
        F.col(id_col),
        F.row_number().over(w).alias("pos"),
    )


def split_assign(
    df: DataFrame,
    weights: Sequence[tuple[str, float]] = (("train", 0.98), ("val", 0.01), ("test", 0.01)),
    key_col: str = "doc_id",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split by hash range —
    deterministic train/val/test partitioning.  Weights must sum to
    <= 1; any remainder falls into the LAST split (so (…, 1.0-eps)
    specs stay total).  A document never migrates between splits when
    data is added or re-ordered — the property RNG splits lack.

    The bucket comes from a NAMESPACED key (``"split:" || key``), not
    the samplers' shared hash space — see the module docstring: an
    unsalted split correlates with every sampler and silently empties
    val/test under composition (code review r8).  Rows with a NULL key
    get a NULL split (an unaddressable row must not silently land in
    the last-named split — typically ``test``); filter or key them
    upstream.
    """
    if not weights:
        raise ValueError("weights must name at least one split")
    if any(float(w) < 0 for _, w in weights):
        raise ValueError(f"split weights must be nonnegative: {list(weights)}")
    total = sum(float(w) for _, w in weights)
    if total > 1.0 + 1e-9:
        raise ValueError(
            f"split weights must sum to <= 1 (got {total}): {list(weights)} — "
            "an over-committed spec silently truncates later splits"
        )
    key = F.col(key_col)
    bucket = hash_bucket(F.concat(F.lit("split:"), key.cast("string")))
    upper = 0.0
    expr: Column | None = None
    for name, w in weights[:-1]:
        upper += float(w)
        cond = bucket < _rate_cut(upper)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = weights[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    expr = F.when(key.isNull(), F.lit(None).cast("string")).otherwise(expr)
    return df.withColumn(out_col, expr)


def split_cluster_safe(
    df: DataFrame,
    pairs: DataFrame,
    weights: Sequence[tuple[str, float]] = (
        ("train", 0.98),
        ("val", 0.01),
        ("test", 0.01),
    ),
    key_col: str = "doc_id",
    out_col: str = "split",
    id_a: str = "id_a",
    id_b: str = "id_b",
    broadcast_clusters: bool = True,
    **cluster_kwargs,
) -> DataFrame:
    """Leakage-safe hash split over duplicate CLUSTERS — the third
    member of the split family (:func:`split_assign` hashes documents,
    :func:`split_temporal` purges time): when near-duplicates of one
    document land on both sides of a train/test split, the test set is
    contaminated no matter how carefully it was sampled — the known
    LLM-eval failure :func:`split_assign` cannot prevent because it
    hashes each doc independently.  Here every member of a connected
    near-dup component (via :func:`~.dedup.dup_clusters` over
    ``pairs``, the verified candidate edges from MinHash/SimHash/pHash
    dedup) is keyed by its cluster REPRESENTATIVE (the component-min
    id), so the whole cluster lands in one split, transitively
    (A~B, B~C ⇒ A, B, C together even if A and C were never a pair).

    Documents in no pair keep ``rep = own key``, built in STRING
    space (``key.cast("string")``, exactly the bytes
    :func:`split_assign` hashes — NOT via a long cast, which would
    NULL out non-numeric string keys and re-bucket zero-padded
    numeric strings; ADVICE r12), and the bucket uses the SAME
    ``"split:"`` namespace as :func:`split_assign` — so their
    assignment is IDENTICAL to a plain hash split for ARBITRARY key
    types (pytest-pinned, including a string-key case): adding dedup
    awareness only ever MOVES cluster members, never reshuffles the
    non-duplicated corpus.  NULL keys get a NULL split (the
    :func:`split_assign` contract).

    Shape at scale: ``dup_clusters``'s label propagation shuffles only
    ``(node, label)`` longs over the pair-touched subset; attaching
    reps is one left join of the corpus against that (much smaller)
    labels frame, EXPLICITLY broadcast (r17 — the ``dedup_corpus``
    removal-join lesson repeated: the labels frame is a checkpointed
    RDD whose size estimate is the pessimistic default, so the
    planner kept this join sort-merge and shuffled every document
    BODY by id at runtime, plan-verified; the frame itself is bounded
    by the duplicate count).  If the duplicate population outgrows
    the driver, pass ``broadcast_clusters=False`` — the shuffle is
    then the honest cost, same escape hatch as ``broadcast_removal``.
    The split itself is one codegen'd projection; nothing else scales
    with document payloads.
    """
    from .dedup import dup_clusters

    clusters = dup_clusters(pairs, id_a=id_a, id_b=id_b, **cluster_kwargs).select(
        F.col("doc_id").alias("__ck"), F.col("cluster_id").alias("__rep_label")
    )
    if broadcast_clusters:
        clusters = F.broadcast(clusters)
    with_rep = (
        df.join(clusters, F.col(key_col) == F.col("__ck"), "left")
        .withColumn(
            "__rep",
            F.coalesce(
                F.col("__rep_label").cast("string"), F.col(key_col).cast("string")
            ),
        )
        .drop("__ck", "__rep_label")
    )
    return split_assign(
        with_rep, weights=weights, key_col="__rep", out_col=out_col
    ).drop("__rep")


def split_temporal(
    df: DataFrame,
    ts_col: str,
    train_end: str,
    test_start: str | None = None,
    embargo: str | None = None,
    out_col: str = "split",
) -> DataFrame:
    """Leakage-safe TEMPORAL train/test split — the assignment every
    time-series / recsys / market-data pipeline needs instead of a
    hash split (:func:`split_assign` leaks future information into
    training whenever rows are temporally correlated): ``train`` is
    strictly before ``train_end``, ``test`` at or after ``test_start``,
    and rows between the two are labeled ``embargo`` — the purge gap
    (de Prado's purged split) that keeps any label/feature window
    spanning the boundary out of BOTH sets.

    Give either ``test_start`` (explicit timestamp literal) or
    ``embargo`` (an INTERVAL string like ``'1 day'`` added to
    ``train_end``); with neither, ``test_start = train_end`` and no
    row is embargoed.  Cutoffs are caller-supplied literals by design
    — derived cutoffs (e.g. a quantile of ``ts``) would make the split
    move as data lands, the exact instability :func:`split_assign`'s
    hash addressing exists to prevent.

    NULL timestamps get a NULL split (unknown time cannot be proven
    leak-free); filter or coalesce upstream if they must train.
    Shape: one codegen'd projection, zero shuffle, zero actions.

    Cutoff literals are validated DRIVER-SIDE and fail fast — by
    evaluating the EXACT plan expressions on a one-row frame with the
    engine itself, not by re-parsing with Python (code review r7 +
    r8): ``datetime.fromisoformat``'s grammar diverges from Spark's
    cast grammar in both directions (it accepts compact forms Spark
    rejects, rejects timezone suffixes Spark parses), so a Python-side
    check both refuses valid input and lets through literals that cast
    to NULL — under non-ANSI Spark a NULL cutoff makes both
    comparisons NULL and every row silently lands in ``embargo``, a
    split that trains on nothing.  The same evaluation yields the
    resolved bounds, so an out-of-order ``test_start < train_end`` and
    a net-NEGATIVE embargo (including compound intervals like
    ``'1 day -25 hours'`` that no string check catches) are rejected
    as one ``hi < lo`` rule: rows in ``[hi, lo)`` would label
    ``train`` while being at/after the test boundary — the leakage
    this operator exists to prevent.
    """
    ts = F.col(ts_col)
    lo = F.lit(train_end).cast("timestamp")
    if test_start is not None and embargo is not None:
        raise ValueError("give test_start OR embargo, not both")
    if test_start is not None:
        hi = F.lit(test_start).cast("timestamp")
    elif embargo is not None:
        hi = lo + F.expr(f"INTERVAL {embargo}")
    else:
        hi = lo

    # One driver-side job over range(1) — no table scan — evaluating
    # the very expressions the projection will use, so validation can
    # never disagree with execution (ANSI raises here instead of
    # mid-job; non-ANSI yields NULL and is caught explicitly).
    try:
        probe = df.sparkSession.range(1).select(
            lo.alias("__lo"), hi.alias("__hi")
        ).first()
    except Exception as exc:  # ANSI cast/interval parse error
        raise ValueError(
            f"cutoff is not a valid timestamp/interval for this engine: "
            f"train_end={train_end!r}, test_start={test_start!r}, "
            f"embargo={embargo!r}"
        ) from exc
    if probe["__lo"] is None:
        raise ValueError(f"train_end is not a valid timestamp: {train_end!r}")
    if probe["__hi"] is None:
        raise ValueError(
            f"test_start/embargo is not a valid timestamp/interval: "
            f"{test_start if test_start is not None else embargo!r}"
        )
    if probe["__hi"] < probe["__lo"]:
        if embargo is not None:
            raise ValueError(
                f"embargo must be a nonnegative interval: {embargo!r} "
                f"(resolves to {probe['__hi']} < train_end {probe['__lo']})"
            )
        raise ValueError(
            f"test_start {test_start!r} is before train_end {train_end!r}"
        )
    label = (
        F.when(ts < lo, F.lit("train"))
        .when(ts >= hi, F.lit("test"))
        .when(ts.isNotNull(), F.lit("embargo"))
    )
    return df.withColumn(out_col, label)


def pack_offsets(
    df: DataFrame,
    token_col: str,
    budget: int,
    order_cols: Sequence[str],
    part_cols: Sequence[str] = (),
) -> DataFrame:
    """Offset-based sequence packing: documents are laid out in
    ``order_cols`` order and cut into packs of ``budget`` tokens by
    cumulative offset — ``pack_id = floor(start_offset / budget)``.

    A document whose tokens straddle a boundary belongs to the pack it
    STARTS in (packs can overflow by at most one document — the
    fixed-layout packing used when documents are later chunked anyway).
    One window (one shuffle on ``part_cols``), exact SQL twin via the
    same ``sum() OVER`` — this is the oracle-checkable variant;
    :func:`pack_greedy` is the never-overflow variant.
    """
    w = Window.partitionBy(*part_cols).orderBy(*[F.asc(c) for c in order_cols])
    start = F.coalesce(
        F.sum(F.col(token_col)).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    return df.withColumn("pack_id", F.floor(start / F.lit(budget)).cast("long"))


def pack_greedy(
    df: DataFrame,
    token_col: str,
    budget: int,
    order_cols: Sequence[str],
    part_cols: Sequence[str],
    id_cols: Sequence[str],
) -> DataFrame:
    """First-fit greedy packing with reset: a pack closes when the next
    document would exceed ``budget`` (documents larger than the budget
    get a pack of their own).  Never overflows, so it is the variant
    for hard context-length limits.

    The running "current pack fill" resets conditionally — not
    expressible as a window function — so each group is packed
    sequentially inside ``applyInPandas`` (Arrow-batched; one shuffle
    on ``part_cols``, the same shuffle :func:`pack_offsets` needs).
    Groups are independent, so 100 TB parallelism = number of strata;
    keep ``part_cols`` fine-grained (e.g. source x date-bucket).
    """
    out_cols = [*part_cols, *id_cols, token_col]
    schema_parts = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*out_cols).schema.fields
    )
    out_schema = f"{schema_parts}, pack_id bigint"
    order = list(order_cols)
    tok = token_col

    tiebreak = [c for c in id_cols if c not in order_cols]

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        # id_cols append as the tiebreak: a stable sort alone is only
        # stable w.r.t. the nondeterministic Arrow-batch arrival order,
        # so order_cols ties would give different pack_ids across runs
        # (code review r8).
        pdf = pdf.sort_values([*order, *tiebreak], kind="mergesort")
        ids = []
        pack_id, fill = 0, 0
        for t in pdf[tok].to_numpy():
            # NULL token counts cost 0 (same as pack_offsets, whose
            # window sum skips NULLs) instead of crashing int(NaN).
            t = 0 if pd.isna(t) else int(t)
            if fill > 0 and fill + t > budget:
                pack_id += 1
                fill = 0
            ids.append(pack_id)
            fill += t
        pdf = pdf[[c for c in out_cols]]
        return pdf.assign(pack_id=ids)

    return (
        df.select(*dict.fromkeys([*out_cols, *order]))
        .groupBy(*[F.col(c) for c in part_cols])
        .applyInPandas(pack, out_schema)
    )


def pack_bestfit(
    df: DataFrame,
    token_col: str,
    budget: int,
    part_cols: Sequence[str],
    id_cols: Sequence[str],
) -> DataFrame:
    """Best-fit-decreasing packing — the padding-efficiency variant of
    :func:`pack_greedy`: documents sort DESCENDING by token count (id
    tie-break) and each goes into the open pack with the SMALLEST
    remaining capacity that still fits, opening a new pack otherwise
    (oversized documents get a pack of their own; NULL counts cost 0).
    Never overflows, like ``pack_greedy``, but wastes far less padding
    when lengths vary — BFD's classic ``11/9·OPT + 6/9`` bin bound vs
    first-fit-in-arrival-order's ``17/10·OPT``.  There is deliberately
    no ``order_cols``: BFD chooses its own placement order (that IS
    the operator); when a curriculum/layout order must survive packing,
    use ``pack_greedy``.

    Deterministic: the (token desc, ids asc) sort fixes the placement
    sequence, and capacity ties break to the lowest pack id — the same
    input packs identically across runs, partitionings, and engines
    (pinned against a pure-Python model in
    ``tests/test_sampling.py``).

    Shape: one shuffle on ``part_cols`` into ``applyInPandas``
    (Arrow-batched; the bisect-on-remaining loop is O(n log n) per
    group).  Groups pack independently — 100 TB parallelism = number
    of strata; keep ``part_cols`` fine-grained (source x date-bucket),
    exactly the ``pack_greedy`` contract.
    """
    out_cols = [*part_cols, *id_cols, token_col]
    schema_parts = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*out_cols).schema.fields
    )
    out_schema = f"{schema_parts}, pack_id bigint"
    tok = token_col
    ids = list(id_cols)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        from bisect import bisect_left, insort

        order = pdf.assign(__neg=-pdf[tok].fillna(0)).sort_values(
            ["__neg", *ids], kind="mergesort"
        )
        # open packs as a sorted list of [remaining, pack_id]; the
        # leftmost entry with remaining >= t is the tightest fit, and
        # the (remaining, pack_id) key breaks capacity ties low
        open_packs: list[list[int]] = []
        next_id = 0
        assigned = {}
        for row_pos, t in zip(order.index, order[tok].to_numpy()):
            t = 0 if pd.isna(t) else int(t)
            i = bisect_left(open_packs, [t, -1])
            if i < len(open_packs):
                rem, pid = open_packs.pop(i)
                insort(open_packs, [rem - t, pid])
                assigned[row_pos] = pid
            else:
                assigned[row_pos] = next_id
                insort(open_packs, [max(budget - t, 0), next_id])
                next_id += 1
        out = pdf[[c for c in out_cols]]
        return out.assign(pack_id=[assigned[i] for i in pdf.index])

    return (
        df.select(*dict.fromkeys(out_cols))
        .groupBy(*[F.col(c) for c in part_cols])
        .applyInPandas(pack, out_schema)
    )


def calibrate_scores(
    df: DataFrame,
    score_col: str,
    group_col: str,
    out_col: str = "score_pct",
) -> DataFrame:
    """Per-group percentile calibration: ``percent_rank`` of the score
    within its group — the curation step that makes one quality
    threshold comparable ACROSS sources (each source's score
    distribution differs, so a global cut over-prunes some sources and
    under-prunes others; calibrating to within-source percentiles
    equalizes the pruning pressure).

    Ties share a rank deliberately (no id tie-break in the ORDER BY):
    equal scores must calibrate identically, and rank() tie semantics
    make the result deterministic without one.  NULL scores sort LAST
    (``asc_nulls_last``, pinning Spark to DuckDB's default) and
    therefore absorb the top percentiles — callers should coalesce or
    pre-filter NULL scores; :func:`calibrate_scores_binned` instead
    excludes them from the mass entirely.

    Scale: one shuffle on ``group_col``, then each group is ONE sorted
    task — exact percentile ranks need a total per-group order, so
    this is the semantics-defining variant for group sizes up to one
    executor's sort budget.  For web-scale groups use
    :func:`calibrate_scores_binned` (same contract to 1/bins
    resolution, no per-group sort).
    """
    w = Window.partitionBy(group_col).orderBy(F.col(score_col).asc_nulls_last())
    return df.withColumn(out_col, F.round(F.percent_rank().over(w), 6))


def calibrate_scores_binned(
    df: DataFrame,
    score_col: str,
    group_col: str,
    bins: int = 256,
    lo: float = 0.0,
    hi: float = 1.0,
    out_col: str = "score_pct",
    checkpoint_input: bool = True,
) -> DataFrame:
    """Broadcast-histogram ECDF calibration — the 100 TB path for
    :func:`calibrate_scores`.

    ``bin = clamp(floor((score - lo) * bins / (hi - lo)), 0, bins-1)``;
    ``pct = (# group rows in strictly lower bins) / (# group rows)``.
    Exactly defined (hence oracle-checkable), and within ``1/bins`` of
    the exact percent_rank for in-range scores.  NULL scores get a
    NULL ``out_col`` and contribute no mass.

    Plan shape (the point): the fact stream is never shuffled — the
    histogram is a map-side-partial ``groupBy(group, bin)`` whose
    result is bounded by ``|groups| * bins`` rows regardless of corpus
    size; the running sum is a window over that tiny frame; the
    calibrated percentile comes back via a BROADCAST join on
    ``(group, bin)``.  Contrast the exact variant's
    one-task-per-group sort.

    The input is consumed TWICE (histogram build + calibrated
    output), so by default it is materialized once via a deferred
    ``localCheckpoint`` — without it, both branches re-evaluate the
    caller's score expression, and a pushed-down NULL-bin filter
    evaluated it a third time inside the histogram scan: measured
    14.4 s -> ~5 s at sf1 on the quality-score query, i.e. the whole
    binned path now costs the same one scoring pass the exact variant
    pays (the ``prepare_corpus`` survivor-cut precedent).
    ``localCheckpoint`` blocks are executor-local — on a cluster
    where lost-executor recompute must be possible, pass
    ``checkpoint_input=False`` and persist upstream with a
    caller-owned lifecycle (then also keep the caller's score
    expression cheap, because both branches will re-run it).  The
    NULL-bin exclusion filters the AGGREGATED histogram (bounded
    rows), never the input scan, so it can never push a third
    evaluation into the scan either way.
    """
    if checkpoint_input:
        df = df.localCheckpoint(eager=False)
    span_bin = F.floor(
        (F.col(score_col) - F.lit(float(lo))) * F.lit(int(bins)) / F.lit(float(hi - lo))
    )
    bin_col = F.when(
        F.col(score_col).isNotNull(),
        F.least(F.greatest(span_bin, F.lit(0)), F.lit(int(bins) - 1)).cast("int"),
    )
    binned = df.withColumn("__bin", bin_col)
    hist = (
        binned.groupBy(group_col, "__bin")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__bin").isNotNull())
    )
    w_run = Window.partitionBy(group_col).orderBy("__bin")
    w_all = Window.partitionBy(group_col)
    cum = hist.select(
        F.col(group_col),
        F.col("__bin"),
        (F.sum("__c").over(w_run) - F.col("__c")).alias("__below"),
        F.sum("__c").over(w_all).alias("__n"),
    )
    # NULL-safe on the GROUP key: a NULL group is a real stratum in
    # the exact variant (window partitionBy groups NULLs together), so
    # the binned path must calibrate it too, not orphan it to NULL pct.
    # Plain equality on the BIN key: a NULL bin means a NULL score,
    # which by contract contributes no mass and gets a NULL pct.
    # Alias BOTH join keys on the cum side: cum derives from binned, so
    # un-aliased column refs resolve to the same lineage attribute and
    # Spark warns about (and may mis-resolve) a trivially-true predicate.
    cum = cum.select(
        F.col(group_col).alias("__g"),
        F.col("__bin").alias("__gbin"),
        "__below",
        "__n",
    )
    joined = binned.join(
        F.broadcast(cum),
        F.col(group_col).eqNullSafe(F.col("__g"))
        & (F.col("__bin") == F.col("__gbin")),
        how="left",
    ).drop("__gbin")
    return joined.withColumn(
        out_col, F.round(F.col("__below") / F.col("__n"), 6)
    ).drop("__bin", "__below", "__n", "__g")


def padding_waste(
    df: DataFrame,
    token_col: str,
    caps: Sequence[int] = (16, 32, 64, 128, 256, 512),
) -> DataFrame:
    """Length-bucketing padding audit: how much training compute the
    corpus wastes on pad tokens under power-of-two length bucketing
    versus naive pad-to-max batching.

    Each document is truncated to ``max(caps)`` tokens and assigned
    the smallest cap that holds it; per cap the audit reports document
    count, real tokens, pad tokens under bucketing (``cap - t``), pad
    tokens under naive batching (``max_cap - t``), and the wasted
    fraction of slots for both policies.  Documents with NULL or
    non-positive token counts are excluded (nothing to pack).  All
    integer arithmetic until the two final ratios, so the numbers are
    engine-exact.

    Scale: one codegen'd projection + a map-side-partial hash
    aggregate to ``len(caps)`` rows; no joins, no windows, nothing
    driver-side.
    """
    caps = sorted(int(c) for c in caps)
    if not caps or caps[0] <= 0:
        raise ValueError(f"caps must be positive, got {caps!r}")
    mx = caps[-1]
    t = F.least(F.col(token_col), F.lit(mx))
    cap_expr: Column = F.lit(mx)
    for c in reversed(caps[:-1]):
        cap_expr = F.when(t <= c, F.lit(c)).otherwise(cap_expr)
    return (
        df.filter(F.col(token_col) > 0)
        .select(t.alias("__t"), cap_expr.cast("long").alias("bucket_cap"))
        .groupBy("bucket_cap")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__t").alias("total_tokens"),
            F.sum(F.col("bucket_cap") - F.col("__t")).alias("pad_bucketed"),
            F.sum(F.lit(mx) - F.col("__t")).alias("pad_naive"),
        )
        .select(
            "bucket_cap",
            "n_docs",
            "total_tokens",
            "pad_bucketed",
            "pad_naive",
            F.round(
                F.col("pad_bucketed") / (F.col("n_docs") * F.col("bucket_cap")), 6
            ).alias("pad_frac_bucketed"),
            F.round(F.col("pad_naive") / (F.col("n_docs") * F.lit(mx)), 6).alias(
                "pad_frac_naive"
            ),
        )
    )


#: Largest DSIR bucket count scored via the inlined-literal-array plan
#: (shuffle-free but its expression tree holds one literal per bucket);
#: above this, :func:`importance_weights` switches to the value-identical
#: relational broadcast-join plan so paper-sized spaces (~10k buckets)
#: cannot bloat codegen/plan size.
_MAX_INLINE_BUCKETS = 1024


def importance_weights(
    df: DataFrame,
    target: DataFrame,
    num_buckets: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style hashed-n-gram importance weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    score every document in ``df`` (the raw corpus) by how much more
    likely its tokens are under a small TARGET corpus's unigram model
    than under the raw corpus's own — the published recipe for
    steering a web-scale crawl toward a quality exemplar without
    training a classifier.

    Tokens hash into ``num_buckets`` buckets (the paper's hashed
    feature space — what bounds the model at any corpus size;
    namespaced ``"dsir:" || token`` per the module's hash-space
    discipline), both corpora reduce to ``<= num_buckets`` Laplace-
    smoothed bucket counts, and

    ``lam_micro(b) = floor(1e6*ln((c_t(b)+1)/(N_t+B)))
                   - floor(1e6*ln((c_r(b)+1)/(N_r+B)))``

    Per doc: ``weight_micro = sum over token occurrences of
    lam_micro(bucket(token))`` — exact BIGINTs end-to-end (the
    micro-unit trick from ``unigram_logprob``), so the distributed
    sums are order-independent and engine-reproducible; the log
    importance weight is ``weight_micro / 1e6``.

    Output: ``(id_col, n_tokens, weight_micro)`` — one row per raw
    doc with at least one whitespace token, including docs whose every
    bucket is target-unseen (smoothing keeps the ratio finite).
    Blank and whitespace-only docs are EXCLUDED from both the scored
    output and the bucket-count models: the whitespace tokenizer maps
    them to a single ``''`` pseudo-token, which would hand them a
    weight driven by the ``''`` bucket's corpus statistics —
    inconsistent with ``token_count()``'s blank-counts-0 semantics.
    The prepared oracle SQL mirrors the same non-blank filter.

    Scale shape: the model build reduces BOTH corpora to
    ``<= num_buckets`` bucket counts via explode + map-side-partial
    ``groupBy`` (each count shuffle carries ``<= num_buckets x
    partitions`` partial rows at any corpus size), and the finished
    lambda table — ``num_buckets`` BIGINTs — is collected to the
    driver, the bounded-artifact pattern of the PQ codebooks and IVF
    centroid frames.  SCORING is then one shuffle-free projection:
    the lambda array inlines as a literal and each doc's weight is an
    in-row ``aggregate`` over its token array (bucket-hash lookup per
    token — the same md5 the explode path paid, minus the explode, the
    full-corpus (id, bucket) tf shuffle, the join, and the per-doc
    re-aggregate of the first relational cut; executed scoring plan:
    ONE parquet scan, ZERO exchanges).  The inlined lambda array is
    ``num_buckets`` literals inside the per-token aggregate lambda, so
    its expression tree grows with the bucket count; above
    ``_MAX_INLINE_BUCKETS`` (where a DSIR-paper-sized space of ~10k
    buckets would bloat codegen/plan size) scoring falls back to the
    relational formulation — explode to a per-doc (bucket, tf) frame
    and broadcast-join the lambda table — which is value-identical
    (the equivalence a pytest pins by forcing the threshold down).
    Local wall is flat vs the
    relational cut (19-23 s both ways at sf10 — the regex tokenizer
    dominates and runs either way), but the removed exchange carried
    one row per (doc, distinct bucket): at cluster scale that is a
    near-corpus-sized network transfer, the ``dedup_semantic``
    trade — the cluster-right plan that local[32]'s memcpy "network"
    cannot reward.  In-row integer summation is order-deterministic
    AND order-irrelevant (BIGINT addition commutes exactly), so
    values are unchanged from the relational formulation — the
    prepared oracle pins that.
    """
    if num_buckets < 2:
        raise ValueError(f"num_buckets must be >= 2, got {num_buckets}")
    b = F.lit(num_buckets)

    def nonblank(frame: DataFrame) -> DataFrame:
        from ..functions.text import normalized

        return frame.filter(F.length(normalized(text_col)) > 0)

    def bucketed(frame: DataFrame):
        tok = F.explode(_dsir_words(text_col)).alias("__tok")
        return nonblank(frame).select(tok).select(
            hash_bucket(F.concat(F.lit("dsir:"), F.col("__tok")), num_buckets).alias(
                "__b"
            )
        )

    tcnt = bucketed(target).groupBy("__b").agg(F.count(F.lit(1)).alias("__ct"))
    rcnt = bucketed(df).groupBy("__b").agg(F.count(F.lit(1)).alias("__cr"))
    # Corpus token totals = the sum of the bucket counts (every token
    # lands in exactly one bucket), so they fold over the ALREADY
    # AGGREGATED <= num_buckets count frames — Catalyst reuses the
    # count exchange (ReusedExchange), so neither corpus is
    # re-tokenized for its total.  A first cut computed each total as
    # sum(size(words)) over the raw frame: value-identical, but one
    # FULL extra tokenization scan per corpus — the regex tokenizer is
    # where this operator's wall time lives.
    tot_t = tcnt.agg(F.coalesce(F.sum("__ct"), F.lit(0)).alias("__nt"))
    tot_r = rcnt.agg(F.coalesce(F.sum("__cr"), F.lit(0)).alias("__nr"))
    lam_frame = (
        rcnt.join(tcnt, on="__b", how="left")
        .join(F.broadcast(tot_t))
        .join(F.broadcast(tot_r))
        .select(
            "__b",
            (
                F.floor(
                    F.log(
                        (F.coalesce(F.col("__ct"), F.lit(0)) + 1).cast("double")
                        / (F.col("__nt") + b).cast("double")
                    )
                    * 1e6
                )
                - F.floor(
                    F.log(
                        (F.col("__cr") + 1).cast("double")
                        / (F.col("__nr") + b).cast("double")
                    )
                    * 1e6
                )
            ).cast("long").alias("__lam"),
        )
    )

    if num_buckets > _MAX_INLINE_BUCKETS:
        # relational scoring: value-identical (BIGINT sums commute), one
        # (id, bucket) tf shuffle + a broadcast lambda join — the plan
        # whose expression tree does NOT grow with num_buckets
        tf = (
            nonblank(df)
            .select(F.col(id_col), F.explode(_dsir_words(text_col)).alias("__tok"))
            .select(
                id_col,
                hash_bucket(
                    F.concat(F.lit("dsir:"), F.col("__tok")), num_buckets
                ).alias("__b"),
            )
            .groupBy(id_col, "__b")
            .agg(F.count(F.lit(1)).alias("__tf"))
        )
        return (
            tf.join(F.broadcast(lam_frame), on="__b")
            .groupBy(id_col)
            .agg(
                F.sum("__tf").cast("long").alias("n_tokens"),
                F.sum(F.col("__tf") * F.col("__lam")).cast("long").alias(
                    "weight_micro"
                ),
            )
        )

    lam_rows = lam_frame.collect()  # <= num_buckets rows — the bounded artifact
    arr = [0] * num_buckets  # buckets with no raw token are never looked up
    for r in lam_rows:
        arr[r["__b"]] = int(r["__lam"])
    lam_arr = F.array(*[F.lit(v).cast("long") for v in arr])

    toks = F.col("__toks")
    score = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, tok: acc
        + F.element_at(
            lam_arr,
            (hash_bucket(F.concat(F.lit("dsir:"), tok), num_buckets) + 1).cast("int"),
        ),
    )
    # one staged projection: the token array materializes once; both
    # consumers (size + aggregate) live in the SAME projection, where
    # codegen's subexpression elimination dedupes the shared subtree
    # (the r8 gopher_rules lesson — a Generate barrier pays only when
    # CollapseProject multiplies references ACROSS projections)
    return (
        nonblank(df)
        .select(F.col(id_col), _dsir_words(text_col).alias("__toks"))
        .filter(toks.isNotNull())
        .select(
            id_col,
            F.size(toks).cast("long").alias("n_tokens"),
            score.alias("weight_micro"),
        )
    )


def _dsir_words(text_col: str):
    """Normalized whitespace tokens — the one tokenizer both DSIR
    aggregates and both corpora must share (a mismatch would shift
    every bucket count)."""
    from ..functions.text import normalized, words

    return words(normalized(text_col))


def sample_importance(
    df: DataFrame,
    target: DataFrame,
    k: int,
    num_buckets: int = 256,
    gumbel_scale: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    weights: DataFrame | None = None,
) -> DataFrame:
    """DSIR selection on top of :func:`importance_weights`: keep the
    ``k`` raw documents with the largest ``mean log importance weight
    + gumbel_scale * Gumbel noise`` — the Gumbel-top-k trick, which
    makes the keep-set an exact sample WITHOUT replacement from the
    softmax of the (length-normalized) importance weights, instead of
    a hard argmax that would collapse onto near-duplicate high-weight
    docs (the paper's stated reason to resample rather than rank).

    The "noise" is hash-deterministic like every sampler here:
    ``u = (hash_bucket("dsirgum:" || id, 2^20) + 0.5) / 2^20`` (the
    +0.5 keeps u strictly inside (0,1), so the double log is finite),
    ``g = -ln(-ln(u))``; ``gumbel_scale`` is the temperature — 0
    degenerates to deterministic top-k by weight, large values
    approach uniform sampling.  Ranking uses the 6-decimal-ROUNDED
    key with an id tie-break, so ranks cannot flip on a last-ulp
    ``ln`` disagreement between engines (the similarity-family rank
    lesson, applied before the oracle debuts rather than after).

    Output: ``(id_col, n_tokens, weight_micro, sample_key, rank)``,
    ``rank <= k``.  Scale: everything up to the ranking is
    :func:`importance_weights`; the ranking itself is a two-phase
    top-k — per-shard ``row_number`` over 64 hash shards keeps every
    sort partition-local, then the global window ranks only the
    surviving ``<= 64 * k`` rows — so no executor ever sorts the full
    doc stream.  The answer is identical to one global window: every
    global top-k row is necessarily a top-k row of its own shard, so
    the shard pass can never drop a global winner (and the oracle IS
    the one-window formulation, which pins that equivalence under the
    hash whenever this debuts).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if gumbel_scale < 0:
        raise ValueError(f"gumbel_scale must be >= 0, got {gumbel_scale}")
    # ``weights``: a precomputed :func:`importance_weights` frame
    # (id_col, n_tokens, weight_micro) — the materialize-once serve
    # path: production pipelines score the corpus once and sample
    # against the stored weights repeatedly (different k, different
    # temperature), so the ranking must not force a re-tokenize.
    # Values are identical either way (the weights frame IS the
    # function's output); None recomputes inline.
    w = weights if weights is not None else importance_weights(
        df, target, num_buckets=num_buckets, text_col=text_col, id_col=id_col
    )
    u = (
        hash_bucket(
            F.concat(F.lit("dsirgum:"), F.col(id_col).cast("string")), 1_048_576
        ).cast("double")
        + 0.5
    ) / 1_048_576.0
    key = F.round(
        F.col("weight_micro").cast("double")
        / 1e6
        / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double")
        + F.lit(float(gumbel_scale)) * -F.log(-F.log(u)),
        6,
    )
    keyed = w.withColumn("sample_key", key).withColumn(
        "__shard",
        hash_bucket(F.concat(F.lit("dsirshard:"), F.col(id_col).cast("string")), 64),
    )
    wshard = Window.partitionBy("__shard").orderBy(
        F.desc("sample_key"), F.asc(id_col)
    )
    cand = keyed.withColumn("__sr", F.row_number().over(wshard)).filter(
        F.col("__sr") <= k
    )
    win = Window.orderBy(F.desc("sample_key"), F.asc(id_col))
    return (
        cand.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select(id_col, "n_tokens", "weight_micro", "sample_key", "rank")
    )


def unigram_divergence(
    df: DataFrame,
    target: DataFrame,
    num_buckets: int = 256,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group Jensen-Shannon divergence between each group's
    hashed-unigram distribution and a TARGET corpus's — the mixture
    diagnostic that complements :func:`importance_weights`: DSIR
    scores individual documents against the target; this scores whole
    SOURCES, answering "which sources are already target-like (low
    JSD) and which would drag the mixture away (high JSD)" before any
    reweighting is chosen.

    Both distributions live in the same ``num_buckets`` hashed token
    space as DSIR (namespaced ``"dsir:" || token`` — deliberately the
    SAME space, so a source's divergence and its docs' importance
    weights are statements about one model), Laplace-smoothed over the
    full bucket domain:

    ``p_b = (c_g(b)+1)/(N_g+B)``, ``q_b = (c_t(b)+1)/(N_t+B)``,
    ``jsd_micro = Σ_b floor(5e5·p_b·ln(2p_b/(p_b+q_b)))
                + floor(5e5·q_b·ln(2q_b/(p_b+q_b)))``

    — each bucket's two contributions floored to integer micro-units
    THEN integer-summed, the module's engine-reproducibility recipe
    (BIGINT addition commutes; the only doubles are per-bucket
    expressions with a fixed evaluation shape mirrored in the oracle
    SQL).  Range ~[0, ln 2 ≈ 0.693]·1e6, biased at most 2·B micro-units
    low by the floors (each bucket contributes TWO independent floors —
    the p-term and the q-term — so the worst case is two units per
    bucket, not one).  Blank docs are excluded exactly as in
    :func:`importance_weights`.

    Output: ``(group_col, n_tokens, jsd_micro)``, one row per group
    with >= 1 token.

    Shape: two explode+count aggregates reduce BOTH corpora to
    bucket-count frames (map-side partials; ``<= groups x B`` and
    ``<= B`` rows); EVERYTHING downstream derives from those two
    frames — the smoothed ``groups x B`` domain comes from the
    per-group totals frame (itself a fold over the count frame, so
    exchange reuse serves it; deriving it from the raw corpus would
    re-tokenize — the DSIR totals lesson) via a ``sequence(0, B-1)``
    explode, and every join after the count aggregates is a
    broadcast.  The corpus is read once per side; nothing downstream
    scales with document count.
    """
    if num_buckets < 2:
        raise ValueError(f"num_buckets must be >= 2, got {num_buckets}")
    return divergence_from_counts(
        dsir_bucket_counts(df, num_buckets, text_col, (group_col,)),
        dsir_bucket_counts(target, num_buckets, text_col),
        num_buckets,
        group_col=group_col,
    )


def dsir_bucket_counts(
    df: DataFrame,
    num_buckets: int,
    text_col: str = "text",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """``(group_cols..., __b, __n)``: blank-filtered, ``dsir:``-
    namespaced hashed-unigram bucket counts — the ONE tokenize+bucket
    implementation :func:`unigram_divergence` and the streaming
    divergence monitor share, so batch and stream can never disagree
    about the token model.  Map-side-partial aggregate bounded at
    ``groups x num_buckets`` rows."""
    from ..functions.text import normalized

    cols = [F.col(c) for c in group_cols]
    return (
        df.filter(F.length(normalized(text_col)) > 0)
        .select(*cols, F.explode(_dsir_words(text_col)).alias("__tok"))
        .select(
            *cols,
            hash_bucket(
                F.concat(F.lit("dsir:"), F.col("__tok")), num_buckets
            ).alias("__b"),
        )
        .groupBy(*group_cols, "__b")
        .agg(F.count(F.lit(1)).alias("__n"))
    )


def divergence_from_counts(
    group_counts: DataFrame,
    target_counts: DataFrame,
    num_buckets: int,
    group_col: str = "source",
) -> DataFrame:
    """Per-group JSD report from ALREADY-AGGREGATED bucket counts
    (``(group_col, __b, __n)`` vs ``(__b, __n)``) — the exact tail of
    :func:`unigram_divergence`, factored out so the streaming monitor's
    incrementally-maintained counts produce the identical report (the
    ``drift_from_counts`` batch≡stream pattern).  Everything here is
    bucket-frame sized; nothing scales with the corpus."""
    b = num_buckets
    gcnt = group_counts.select(group_col, "__b", F.col("__n").alias("__cg"))
    tcnt = target_counts.select("__b", F.col("__n").alias("__ct"))
    gtot = gcnt.groupBy(group_col).agg(F.sum("__cg").alias("__ng"))
    ttot = tcnt.agg(F.coalesce(F.sum("__ct"), F.lit(0)).alias("__nt"))

    domain = gtot.select(
        group_col,
        "__ng",
        F.explode(F.sequence(F.lit(0), F.lit(b - 1))).alias("__b"),
    )
    p = (F.coalesce(F.col("__cg"), F.lit(0)) + 1).cast("double") / (
        F.col("__ng") + b
    ).cast("double")
    q = (F.coalesce(F.col("__ct"), F.lit(0)) + 1).cast("double") / (
        F.col("__nt") + b
    ).cast("double")
    contrib = (
        F.floor(F.lit(500000.0) * p * F.log((2 * p) / (p + q)))
        + F.floor(F.lit(500000.0) * q * F.log((2 * q) / (p + q)))
    ).cast("long")
    return (
        domain.join(F.broadcast(gcnt), on=[group_col, "__b"], how="left")
        .join(F.broadcast(tcnt), on="__b", how="left")
        .join(F.broadcast(ttot))
        .groupBy(group_col)
        .agg(
            F.max("__ng").cast("long").alias("n_tokens"),
            F.sum(contrib).alias("jsd_micro"),
        )
    )

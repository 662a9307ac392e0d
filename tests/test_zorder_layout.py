"""Z-order landing (sources/raw.py::land_zorder): the Morton key
itself, data preservation, and the actual data-skipping payoff —
row-group min/max footer stats must prune BOTH dimensions, where a
linear sort prunes only its leading column."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from spark_cdc_replication_spark.sources.raw import land_zorder, zorder_key


def _interleave2(x: int, y: int, bits: int) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_zorder_key_matches_python_model(spark):
    rows = [(x, y) for x in range(0, 64, 7) for y in range(0, 64, 5)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select(
        "x", "y", zorder_key([F.col("x"), F.col("y")], bits=6).alias("z")
    ).collect()
    for r in got:
        assert r.z == _interleave2(r.x, r.y, 6), (r.x, r.y)


def _rg_stats(root: str, col_idx: int):
    """[(min, max)] over every row group of every file under root."""
    out = []
    for path in glob.glob(f"{root}/*.parquet"):
        meta = pq.ParquetFile(path).metadata
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(col_idx).statistics
            out.append((st.min, st.max))
    return out


def _overlapping(stats, lo, hi) -> int:
    return sum(1 for mn, mx in stats if not (mx < lo or mn > hi))


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    """40k uniform (x, y) points, 16 files each layout.  The x-sorted
    layout cannot prune y at all (every file spans ~the full y range);
    the Z-ordered layout must prune substantially on BOTH dims.

    Range-shuffle boundaries come from RangePartitioner's reservoir
    sample, whose seed includes the RDD id — so file boundaries jitter
    with SESSION HISTORY (the same test sees 5-9 overlapping row
    groups depending on how many jobs ran before it; 9 broke the
    <= 8 bound once in a full-suite run).  Pinning a large sample size
    makes the boundaries (and this test) history-independent —
    measured identical layouts across six burned-rdd-id trials at
    2000 vs a 5-7/16 spread at the default 100."""
    n, side = 40_000, 200
    conf = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
    old = spark.conf.get(conf)
    spark.conf.set(conf, "2000")
    try:
        _run_zorder_pruning_checks(spark, tmp_path, n, side)
    finally:
        spark.conf.set(conf, old)


def _run_zorder_pruning_checks(spark, tmp_path, n, side):
    df = (
        spark.range(n)
        .select(
            (F.col("id") % side).alias("x"),
            # decorrelate y from x deterministically
            F.pmod(F.xxhash64("id"), F.lit(side)).alias("y"),
        )
    )
    linear = str(tmp_path / "linear")
    zo = str(tmp_path / "zorder")
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.parquet(linear)
    )
    land_zorder(df, zo, ["x", "y"], bits=8, num_partitions=16)

    # data preserved exactly
    back = spark.read.parquet(zo)
    assert back.count() == n
    assert (
        back.groupBy().agg(F.sum(F.col("x") * 100000 + F.col("y"))).collect()
        == df.groupBy().agg(F.sum(F.col("x") * 100000 + F.col("y"))).collect()
    )

    # schema is (x, y) in both layouts: col 0 = x, col 1 = y
    lin_x, lin_y = _rg_stats(linear, 0), _rg_stats(linear, 1)
    zo_cols = pq.ParquetFile(glob.glob(f"{zo}/*.parquet")[0]).schema_arrow.names
    zx, zy = zo_cols.index("x"), zo_cols.index("y")
    zo_x, zo_y = _rg_stats(zo, zx), _rg_stats(zo, zy)

    q = (20, 39)  # a 10%-of-range window on each dim
    # linear layout: great on x ...
    assert _overlapping(lin_x, *q) <= len(lin_x) // 4
    # ... but blind on y (every row group spans nearly the full range)
    assert _overlapping(lin_y, *q) == len(lin_y)
    # z-order: real pruning on BOTH dimensions
    assert _overlapping(zo_x, *q) <= len(zo_x) // 2
    assert _overlapping(zo_y, *q) <= len(zo_y) // 2
    # and strictly better than the linear layout on the non-leading dim
    assert _overlapping(zo_y, *q) < _overlapping(lin_y, *q)


def test_zorder_stable_ranges_for_incremental_landing(spark, tmp_path):
    """Passing explicit ranges bins every batch identically, so two
    appends land in the same key space (same min/max envelope rules)."""
    root = str(tmp_path / "incr")
    b1 = spark.range(0, 500).select(
        (F.col("id") % 100).alias("x"), (F.col("id") % 7).alias("y")
    )
    b2 = spark.range(500, 1000).select(
        (F.col("id") % 100).alias("x"), (F.col("id") % 7).alias("y")
    )
    ranges = {"x": (0, 99), "y": (0, 6)}
    land_zorder(b1, root, ["x", "y"], bits=6, num_partitions=2, ranges=ranges)
    land_zorder(b2, root, ["x", "y"], bits=6, num_partitions=2, ranges=ranges)
    assert spark.read.parquet(root).count() == 1000


def test_quantile_binning_beats_minmax_on_heavy_tail(spark, tmp_path):
    """Heavy-tailed x (95% of rows in [0, 100), 5% scattered out to
    ~1e9): min-max binning maps the whole bulk into bucket 0, so the
    Z key stops separating rows on x and footer stats stop pruning a
    bulk-region query; equal-population quantile cutpoints keep every
    bucket occupied and restore the pruning — the VERDICT r5 'next'
    #8 done-criterion."""
    n = 40_000
    df = spark.range(n).select(
        F.when(
            F.col("id") % 20 == 0, F.col("id") * 25_000 + 1_000_000
        ).otherwise(F.col("id") % 100).alias("x"),
        F.pmod(F.xxhash64("id"), F.lit(200)).alias("y"),
    )
    mm = str(tmp_path / "minmax")
    qt = str(tmp_path / "quantile")
    land_zorder(df, mm, ["x", "y"], bits=8, num_partitions=32)
    land_zorder(df, qt, ["x", "y"], bits=8, num_partitions=32, binning="quantile")

    # data preserved exactly under quantile binning
    back = spark.read.parquet(qt)
    assert back.count() == n
    assert (
        back.agg(F.sum(F.col("x") * 1_000 + F.col("y"))).collect()
        == df.agg(F.sum(F.col("x") * 1_000 + F.col("y"))).collect()
    )

    def stats_for(root, name):
        cols = pq.ParquetFile(glob.glob(f"{root}/*.parquet")[0]).schema_arrow.names
        return _rg_stats(root, cols.index(name))

    q = (20, 25)  # a narrow window inside the bulk (~6% of rows)
    mm_hit = _overlapping(stats_for(mm, "x"), *q)
    qt_hit = _overlapping(stats_for(qt, "x"), *q)
    mm_total = len(stats_for(mm, "x"))
    qt_total = len(stats_for(qt, "x"))
    # min-max: the bulk all shares bucket 0, so every row group spans it
    assert mm_hit > (3 * mm_total) // 4
    # quantile: the same query prunes a solid fraction of row groups.
    # The exact count jitters run-to-run (observed 14-17/32 on this
    # fixture): approxQuantile's Greenwald-Khanna sketch merge order is
    # not deterministic, so cutpoints — and row-group boundaries — move
    # within the relative-error band.  Bound at 60% so the pruning
    # claim stays real without riding the sketch's last bucket.
    assert qt_hit <= (3 * qt_total) // 5
    assert qt_hit < mm_hit


def test_quantile_cuts_stable_for_incremental_landing(spark, tmp_path):
    """Explicit cuts bin every batch identically (the stable-ranges
    contract, quantile form), and out-of-envelope values still land in
    the top bucket instead of erroring."""
    from spark_cdc_replication_spark.sources.raw import quantile_cuts

    root = str(tmp_path / "incr-q")
    b1 = spark.range(0, 500).select(
        (F.col("id") % 100).alias("x"), (F.col("id") % 7).alias("y")
    )
    b2 = spark.range(500, 1000).select(
        (F.col("id") % 100 + 50).alias("x"), (F.col("id") % 7).alias("y")
    )
    cuts = quantile_cuts(b1, ["x", "y"], bits=4)
    assert len(cuts["x"]) == 15
    land_zorder(b1, root, ["x", "y"], bits=4, num_partitions=2,
                binning="quantile", cuts=cuts)
    land_zorder(b2, root, ["x", "y"], bits=4, num_partitions=2,
                binning="quantile", cuts=cuts)
    assert spark.read.parquet(root).count() == 1000


def test_quantile_binning_rejects_wide_bits(spark, tmp_path):
    import pytest

    df = spark.range(10).select(F.col("id").alias("x"))
    with pytest.raises(ValueError, match="bits=8"):
        land_zorder(df, str(tmp_path / "z"), ["x"], bits=12, binning="quantile")
    with pytest.raises(ValueError, match="minmax|quantile"):
        land_zorder(df, str(tmp_path / "z"), ["x"], binning="equiwidth")


def test_zorder_key_three_columns_and_overflow_guard(spark):
    import pytest
    from pyspark.sql import functions as F

    # 3-way interleave: bit b of col i lands at position b*3 + i
    df = spark.createDataFrame([(1, 2, 4)], "x long, y long, z long")
    got = df.select(
        zorder_key([F.col("x"), F.col("y"), F.col("z")], bits=3).alias("m")
    ).collect()[0].m
    # x=0b001 -> bit0 at pos 0; y=0b010 -> bit1 at pos 4; z=0b100 -> bit2 at pos 8
    assert got == (1 << 0) | (1 << 4) | (1 << 8)

    with pytest.raises(ValueError, match="64-bit"):
        zorder_key([F.col("x")] * 6, bits=12)  # 72 bits > signed int64

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
    the Z-ordered layout must prune substantially on BOTH dims."""
    n, side = 40_000, 200
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

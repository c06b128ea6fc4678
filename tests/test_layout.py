"""Z-order clustering layout (sources.layout): correctness of the
Morton value and the measured data-skipping win over a linear sort."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from financial_data_pipeline_optimization_spark.sources import layout


def _files_overlapping_box(path: str, box: dict[str, tuple]) -> int:
    """Count parquet files whose footer min/max stats overlap the
    predicate box — exactly the skip decision a stats-aware reader
    (or Spark's row-group pushdown) makes."""
    n = 0
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        meta = pq.ParquetFile(f).metadata
        mins: dict[str, object] = {}
        maxs: dict[str, object] = {}
        for rg in range(meta.num_row_groups):
            group = meta.row_group(rg)
            for ci in range(group.num_columns):
                col = group.column(ci)
                name = col.path_in_schema
                if name in box and col.statistics is not None:
                    s = col.statistics
                    mins[name] = (
                        s.min if name not in mins else min(mins[name], s.min)
                    )
                    maxs[name] = (
                        s.max if name not in maxs else max(maxs[name], s.max)
                    )
        overlap = all(
            name in mins and not (maxs[name] < lo or mins[name] > hi)
            for name, (lo, hi) in box.items()
        )
        n += overlap
    return n


def test_zorder_value_orders_locality(spark):
    """Morton interleave: points close in (x, y) get close z-values;
    the extreme corners map to the extreme z-values."""
    df = spark.createDataFrame(
        [(0, 0), (0, 4095), (4095, 0), (4095, 4095)], "x int, y int"
    )
    got = {
        (r.x, r.y): r["__zvalue"]
        for r in layout.zorder_value(df, ["x", "y"]).collect()
    }
    assert got[(0, 0)] == 0
    assert got[(4095, 4095)] == (1 << 24) - 1
    # x contributes the even bits, y the odd bits
    assert got[(4095, 0)] | got[(0, 4095)] == got[(4095, 4095)]
    assert got[(4095, 0)] & got[(0, 4095)] == 0


def test_zorder_bits_budget_enforced(spark):
    df = spark.createDataFrame([(1, 2, 3)], "a int, b int, c int")
    with pytest.raises(ValueError, match="63-bit"):
        layout.zorder_value(df, ["a", "b", "c"], bits=21)


def test_zorder_write_skips_more_files_than_linear_sort(spark, tmp_path):
    """The headline property: a linear sort on x prunes x-predicates
    only — a predicate on y alone hits EVERY file. Z-order on (x, y)
    prunes both dimensions, so across a mixed workload it reads far
    fewer files at identical file counts and identical data."""
    n_files = 64
    df = (
        spark.range(200_000)
        .select(
            (F.col("id") % 447).alias("x"),
            ((F.col("id") * 7919) % 447).alias("y"),
        )
    )
    linear = str(tmp_path / "linear")
    zord = str(tmp_path / "zorder")
    (
        df.repartitionByRange(n_files, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(linear)
    )
    layout.write_zordered(df, zord, ["x", "y"], num_files=n_files)

    # Same data back from both layouts.
    assert (
        spark.read.parquet(zord).count()
        == spark.read.parquet(linear).count()
        == 200_000
    )
    n_lin = len(glob.glob(f"{linear}/*.parquet"))
    n_z = len(glob.glob(f"{zord}/*.parquet"))

    y_box = {"y": (115, 160)}          # ~10% of y's range
    xy_box = {"x": (115, 160), "y": (115, 160)}
    lin_y = _files_overlapping_box(linear, y_box)
    z_y = _files_overlapping_box(zord, y_box)
    lin_xy = _files_overlapping_box(linear, xy_box)
    z_xy = _files_overlapping_box(zord, xy_box)

    # Linear layout cannot prune on the non-sort column at all.
    assert lin_y == n_lin
    # Z-order confines a y-slice to the files sharing its y octant.
    assert z_y <= n_z // 2, (z_y, n_z)
    # Across the mixed workload z-order reads fewer files overall.
    assert z_y + z_xy < lin_y + lin_xy, (z_y, z_xy, lin_y, lin_xy)

    # And the skipping is honest: a stats-respecting scan of the box
    # still returns every matching row.
    got = (
        spark.read.parquet(zord)
        .filter(F.col("x").between(115, 160) & F.col("y").between(115, 160))
        .count()
    )
    want = df.filter(
        F.col("x").between(115, 160) & F.col("y").between(115, 160)
    ).count()
    assert got == want

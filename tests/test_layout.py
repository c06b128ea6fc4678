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


def test_layout_pipeline_compact_zorder_bucket(spark, tmp_path):
    """The full layout-maintenance pipeline at sf0.1 (VERDICT r4 #8):
    streaming-style small-file ingest -> compact_parquet ->
    write_zordered -> bucketed join, with the win MEASURED at each
    stage: compaction collapses the file count (bytes-sized), z-order
    skips most files on a 2-D box predicate where the round-robin
    compacted layout can skip none, and the bucketed self-join plans
    with zero Exchange."""
    import os

    from financial_data_pipeline_optimization_spark.sources import (
        bucketing,
        load_table,
        maintenance,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    n_rows = events.count()

    # 1. small-file ingest (what per-trigger streaming appends leave)
    ingest = str(tmp_path / "ingest")
    events.repartition(200).write.parquet(ingest)
    assert maintenance.parquet_file_count(spark, ingest) == 200

    # 2. compaction sizes file count from actual bytes, keeps the data
    n_out = maintenance.compact_parquet(
        spark, ingest, target_partition_bytes=512 << 10
    )
    assert n_out < 50, n_out
    assert maintenance.parquet_file_count(spark, ingest) == n_out
    compacted = spark.read.parquet(ingest)
    assert compacted.count() == n_rows

    # 3. z-order on (user_id, value): a ~10% x ~10% box predicate
    stats = events.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).first()
    u_lo = stats[0] + (stats[1] - stats[0]) * 45 // 100
    u_hi = stats[0] + (stats[1] - stats[0]) * 55 // 100
    v_lo = stats[2] + (stats[3] - stats[2]) * 0.45
    v_hi = stats[2] + (stats[3] - stats[2]) * 0.55
    box = {"user_id": (u_lo, u_hi), "value": (v_lo, v_hi)}

    zdir = str(tmp_path / "zordered")
    layout.write_zordered(compacted, zdir, ["user_id", "value"],
                          num_files=32)
    n_z = len(glob.glob(f"{zdir}/*.parquet"))
    # round-robin compacted layout: every file overlaps the box
    assert _files_overlapping_box(ingest, box) == n_out
    # z-ordered: the box confines to a small fraction of the files
    z_hit = _files_overlapping_box(zdir, box)
    assert z_hit <= n_z // 4, (z_hit, n_z)
    # the skipping is honest: same rows through the filter
    pred = (
        F.col("user_id").between(u_lo, u_hi)
        & F.col("value").between(v_lo, v_hi)
    )
    assert (
        spark.read.parquet(zdir).filter(pred).count()
        == events.filter(pred).count()
    )

    # 4. bucket the z-ordered table by user_id: co-located self-join
    # (events-to-events by user) plans with no shuffle at all
    table = "events_layout_pipeline_bucketed"
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the shuffle-join path so the zero-Exchange assertion is
        # about the bucket layout, not the tiny table broadcasting
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bucketing.write_bucketed_table(
            spark.read.parquet(zdir), table, ["user_id"], 8,
            path=str(tmp_path / "bucketed"),
        )
        joined = bucketing.bucketed_join(spark, table, table, "user_id")
        jvm = spark._jvm
        plan = joined._jdf.queryExecution().explainString(
            jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "simple"
            )
        )
        assert "Exchange" not in plan, plan[:1500]
        want = (
            events.groupBy("user_id")
            .count()
            .agg(F.sum(F.col("count") * F.col("count")))
            .first()[0]
        )
        assert joined.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql(f"DROP TABLE IF EXISTS {table}")

"""HLL sketch pre-aggregation (operators.sketch): accuracy and the
re-aggregability contract that makes it work at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from financial_data_pipeline_optimization_spark.operators import sketch


def _fixture(spark):
    # 50k rows, 5 groups, per-group distinct user counts known exactly.
    return spark.range(50_000).select(
        (F.col("id") % 5).alias("g"),
        ((F.col("id") * 13) % 4231).alias("user"),
    )


def test_sketch_estimate_within_tolerance(spark):
    df = _fixture(spark)
    est = sketch.estimate_distinct(
        sketch.build_distinct_sketches(df, ["g"], "user"), "user_hll"
    )
    exact = df.groupBy("g").agg(F.countDistinct("user").alias("exact"))
    joined = est.join(exact, "g").collect()
    assert len(joined) == 5
    for r in joined:
        assert abs(r.approx_distinct - r.exact) / r.exact < 0.05, r


def test_rollup_equals_sketch_of_union(spark):
    """Union-of-sketches ~= sketch-of-union: rolling partial sketches
    up to a coarser grouping estimates the same cardinality as
    sketching the raw data at that grouping — the property that lets a
    scheduled job maintain per-day sketches and answer per-month/
    all-time questions without touching raw facts. (Not bit-identical:
    the DataSketches union operator may promote the register
    representation, shifting the estimate within its error bound.)"""
    df = _fixture(spark).withColumn("half", (F.col("user") % 2))
    fine = sketch.build_distinct_sketches(df, ["g", "half"], "user")
    rolled = sketch.estimate_distinct(
        sketch.rollup_distinct_sketches(fine, ["g"], "user_hll"),
        "user_hll",
    )
    direct = sketch.estimate_distinct(
        sketch.build_distinct_sketches(df, ["g"], "user"), "user_hll"
    )
    exact = {
        r.g: r.exact
        for r in df.groupBy("g")
        .agg(F.countDistinct("user").alias("exact"))
        .collect()
    }
    a = {r.g: r.approx_distinct for r in rolled.collect()}
    b = {r.g: r.approx_distinct for r in direct.collect()}
    assert set(a) == set(b) == set(exact)
    for g in exact:
        assert abs(a[g] - b[g]) / exact[g] < 0.02, (g, a[g], b[g])
        assert abs(a[g] - exact[g]) / exact[g] < 0.05, (g, a[g])


def test_sketch_build_does_partial_aggregation(spark):
    """Map-side combine applies to the sketch build: each task reduces
    its rows to per-group sketches before the exchange, so shuffle
    volume is O(groups x sketch bytes), not O(rows)."""
    df = sketch.build_distinct_sketches(_fixture(spark), ["g"], "user")
    jvm = df.sparkSession._jvm
    plan = df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "partial_hll_sketch_agg" in plan, plan

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


# ---------------------------------------------------------------------------
# Misra–Gries heavy-hitter candidates
# ---------------------------------------------------------------------------


def _skewed(spark, n=20_000, heavy_every=3):
    """Planted-skew stream: value 'hot' at every ``heavy_every``-th row
    (frequency ~ n/3, far above n/k for k=32), the rest spread over a
    4001-value tail so no tail value is heavy."""
    return spark.range(n).select(
        F.when(F.col("id") % heavy_every == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("t"), (F.col("id") % 4001)))
        .alias("v")
    ).repartition(8)  # force multi-partition summaries


def test_misra_gries_finds_all_heavy_values(spark):
    """Pigeonhole guarantee: every value with global frequency > n/k
    appears among the merged per-partition candidates."""
    df = _skewed(spark)
    k = 32
    cand = sketch.misra_gries_candidates(df, "v", k=k)
    exact = df.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    n = df.count()
    heavy = exact.filter(F.col("c") * k > F.lit(n))
    assert heavy.count() >= 1  # the planted value is heavy
    missed = heavy.join(
        cand.withColumnRenamed("value", "v"), "v", "left_anti"
    ).count()
    assert missed == 0


def test_misra_gries_counts_lower_bound_exact(spark):
    df = _skewed(spark)
    cand = sketch.misra_gries_candidates(df, "v", k=32)
    exact = df.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    over = (
        cand.withColumnRenamed("value", "v")
        .join(exact, "v")
        .filter(F.col("mg_count") > F.col("c"))
        .count()
    )
    assert over == 0


def test_misra_gries_bounded_output(spark):
    """Each partition emits at most k rows, so the merged candidate set
    is bounded by k × partitions — the property that keeps the shuffle
    O(k·P) instead of O(distinct values)."""
    df = _skewed(spark)
    n_parts = df.select(F.spark_partition_id().alias("p")).agg(
        F.countDistinct("p")
    ).first()[0]
    cand_n = sketch.misra_gries_candidates(df, "v", k=32).count()
    assert cand_n <= 32 * n_parts


# ---------------------------------------------------------------------------
# Mergeable equi-width histogram quantiles
# ---------------------------------------------------------------------------


def test_histogram_quantile_within_one_bucket_of_exact(spark):
    df = spark.range(10_001).select(
        (F.col("id") % 4).alias("g"),
        (F.col("id") * 7919 % 100_000).cast("double").alias("x"),
    )
    width = 500.0
    hist = sketch.histogram_counts(df, ["g"], "x", width)
    est = sketch.histogram_quantile(hist, ["g"], 0.5, width)
    exact = df.groupBy("g").agg(
        F.expr("percentile(x, 0.5)").alias("m")
    )
    rows = est.join(exact, "g").collect()
    assert len(rows) == 4
    for r in rows:
        assert abs(r.est_quantile - r.m) <= width, r


def test_histogram_counts_merge_by_addition(spark):
    """Partial histograms from disjoint slices sum to the histogram of
    the union — the mergeability contract (per-day partials → any
    rollup) shared with the HLL sketches."""
    df = spark.range(8_000).select(
        F.lit(0).alias("g"),
        (F.col("id") % 997).cast("double").alias("x"),
        (F.col("id") % 2).alias("slice"),
    )
    width = 50.0
    whole = sketch.histogram_counts(df, ["g"], "x", width)
    parts = sketch.histogram_counts(df, ["g", "slice"], "x", width)
    merged = parts.groupBy("g", "bucket").agg(
        F.sum("bucket_count").alias("bucket_count")
    )
    w = {(r.g, r.bucket): r.bucket_count for r in whole.collect()}
    m = {(r.g, r.bucket): r.bucket_count for r in merged.collect()}
    assert w == m


def _bloom_fixture(spark):
    # 300 inserted keys (multiples of 7) out of a 4000-key universe.
    universe = spark.range(4000).select(F.col("id").alias("k"))
    present = universe.where(F.col("k") % 7 == 0).where(F.col("k") < 2100)
    return universe, present


def test_bloom_no_false_negatives(spark):
    universe, present = _bloom_fixture(spark)
    bloom = sketch.bloom_build(present, "k", depth=4, hex_digits=2)
    probed = sketch.bloom_probe(bloom, universe, "k", depth=4, hex_digits=2)
    truly = {r.k for r in present.collect()}
    rows = probed.collect()
    assert len(rows) == 4000
    for r in rows:
        if r.k in truly:
            assert r.maybe_present, f"false negative on {r.k}"
    # a 256-bit-per-row filter with 300 keys must also reject SOME
    # absent keys, or the test is vacuous
    rejected = [r.k for r in rows if not r.maybe_present]
    assert rejected and all(k not in truly for k in rejected)


def test_bloom_build_is_bounded_and_mergeable(spark):
    universe, present = _bloom_fixture(spark)
    a = present.where(F.col("k") < 1000)
    b = present.where(F.col("k") >= 1000)
    whole = sketch.bloom_build(present, "k", depth=4, hex_digits=2)
    merged = (
        sketch.bloom_build(a, "k", depth=4, hex_digits=2)
        .union(sketch.bloom_build(b, "k", depth=4, hex_digits=2))
        .distinct()
    )
    assert whole.count() <= 4 * 256
    assert (
        whole.exceptAll(merged).isEmpty()
        and merged.exceptAll(whole).isEmpty()
    )


def test_bloom_prefilter_matches_probe_and_join(spark):
    universe, present = _bloom_fixture(spark)
    bloom = sketch.bloom_build(present, "k", depth=4, hex_digits=2)
    kept = sketch.bloom_prefilter(
        universe, "k", bloom, depth=4, hex_digits=2
    )
    # bit-packed prefilter decides exactly what the relational probe
    # decides...
    probe_yes = {
        r.k
        for r in sketch.bloom_probe(
            bloom, universe, "k", depth=4, hex_digits=2
        ).collect()
        if r.maybe_present
    }
    kept_keys = {r.k for r in kept.collect()}
    assert kept_keys == probe_yes
    # ...and the guarded join equals the unguarded join exactly
    joined = kept.join(present.withColumnRenamed("k", "p"),
                       F.col("k") == F.col("p"))
    assert joined.count() == present.count()


def test_bloom_prefilter_plan_is_narrow(spark):
    """The fact-side prefilter must be a plain scan->filter: no join,
    no exchange — that IS the 100 TB point."""
    universe, present = _bloom_fixture(spark)
    bloom = sketch.bloom_build(present, "k", depth=4, hex_digits=2)
    kept = sketch.bloom_prefilter(
        universe, "k", bloom, depth=4, hex_digits=2
    )
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan, plan


def test_bloom_prefilter_validates_params(spark):
    import pytest as _pytest

    universe, present = _bloom_fixture(spark)
    bloom = sketch.bloom_build(present, "k", depth=4, hex_digits=2)
    with _pytest.raises(ValueError):
        sketch.bloom_prefilter(universe, "k", bloom, hex_digits=9)
    with _pytest.raises(ValueError):
        sketch.bloom_prefilter(universe, "k", bloom, depth=0)

"""Bucketed co-located joins: the shuffle really disappears.

Writes orders and lineitem bucketed on the order key, then asserts the
physical join plan contains NO Exchange on either side — the property
that makes fact-to-fact joins viable at 100 TB — and that results match
the unbucketed join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from financial_data_pipeline_optimization_spark.sources import load_table
from financial_data_pipeline_optimization_spark.sources.bucketing import (
    bucketed_join,
    write_bucketed_table,
)

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    write_bucketed_table(
        load_table(spark, SF_SMOKE, "orders"),
        "orders_b",
        ["o_orderkey"],
        8,
        sort_cols=["o_orderkey"],
        path=str(base / "orders_b"),
    )
    write_bucketed_table(
        load_table(spark, SF_SMOKE, "lineitem"),
        "lineitem_b",
        ["l_orderkey"],
        8,
        sort_cols=["l_orderkey"],
        path=str(base / "lineitem_b"),
    )
    yield "orders_b", "lineitem_b"
    for t in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _simple_plan(df) -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    orders_b, lineitem_b = bucketed_tables
    # force the non-broadcast path so the assertion is about bucketing,
    # not about the tiny test tables fitting a broadcast
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table(lineitem_b)
            .withColumnRenamed("l_orderkey", "o_orderkey")
            .join(spark.table(orders_b), "o_orderkey")
        )
        plan = _simple_plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    orders_b, _ = bucketed_tables
    agg = (
        spark.table(orders_b)
        .groupBy("o_orderkey")
        .agg(F.sum("o_totalprice").alias("s"))
    )
    assert "Exchange" not in _simple_plan(agg)


def test_bucketed_join_matches_unbucketed(spark, bucketed_tables):
    orders_b, lineitem_b = bucketed_tables
    bucketed = (
        spark.table(lineitem_b)
        .join(
            spark.table(orders_b),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("rev"),
        )
    )
    plain = (
        load_table(spark, SF_SMOKE, "lineitem")
        .join(
            load_table(spark, SF_SMOKE, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("rev"),
        )
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_bucket_pruning_on_key_equality(spark, bucketed_tables):
    orders_b, _ = bucketed_tables
    # autoBucketedScan turns bucketed reading off when no operator
    # needs the distribution — which also skips bucket pruning; pin it
    # so the filter-only scan still prunes to 1 bucket of 8
    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
    )
    try:
        df = spark.table(orders_b).filter(F.col("o_orderkey") == 42)
        plan = df._jdf.queryExecution().explainString(
            df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")

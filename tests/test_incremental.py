"""Incremental aggregate maintenance: batched == full recompute."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from financial_data_pipeline_optimization_spark.operators import incremental
from financial_data_pipeline_optimization_spark.sources import load_table

from .conftest import SF_SMOKE

KEYS = ["o_orderstatus"]
MEASURES = ["o_totalprice"]


def _final(state):
    return {
        tuple(r[k] for k in KEYS): (
            r.o_totalprice_count,
            round(r.o_totalprice_sum, 2),
            round(r.o_totalprice_avg, 4),
            r.o_totalprice_min,
            r.o_totalprice_max,
        )
        for r in incremental.finalize_metrics(state, KEYS, MEASURES).collect()
    }


def test_batched_merge_equals_full_recompute(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    thirds = [
        orders.filter(F.pmod(F.col("o_orderkey"), 3) == i) for i in range(3)
    ]
    state = None
    for b in thirds:
        state = incremental.merge_aggregate_state(state, b, KEYS, MEASURES)
    full = incremental.aggregate_state(orders, KEYS, MEASURES)
    assert _final(state) == _final(full)


def test_merge_is_order_insensitive(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    halves = [
        orders.filter(F.pmod(F.col("o_orderkey"), 2) == i) for i in range(2)
    ]
    ab = incremental.merge_aggregate_state(
        incremental.merge_aggregate_state(None, halves[0], KEYS, MEASURES),
        halves[1],
        KEYS,
        MEASURES,
    )
    ba = incremental.merge_aggregate_state(
        incremental.merge_aggregate_state(None, halves[1], KEYS, MEASURES),
        halves[0],
        KEYS,
        MEASURES,
    )
    assert _final(ab) == _final(ba)


def test_new_key_in_later_batch(spark):
    a = spark.createDataFrame([("X", 1.0), ("X", 3.0)], "k string, v double")
    b = spark.createDataFrame([("Y", 10.0)], "k string, v double")
    state = incremental.merge_aggregate_state(None, a, ["k"], ["v"])
    state = incremental.merge_aggregate_state(state, b, ["k"], ["v"])
    got = {
        r.k: (r.v_count, r.v_sum, r.v_avg, r.v_min, r.v_max)
        for r in incremental.finalize_metrics(state, ["k"], ["v"]).collect()
    }
    assert got == {
        "X": (2, 4.0, 2.0, 1.0, 3.0),
        "Y": (1, 10.0, 10.0, 10.0, 10.0),
    }


def test_checks_duplicate_keys_and_assert_unique(spark):
    from financial_data_pipeline_optimization_spark.operators import checks

    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], "k long, v string"
    )
    dupes = {tuple(r) for r in checks.duplicate_keys(df, ["k"]).collect()}
    assert dupes == {(1, 2)}
    with pytest.raises(ValueError, match="uniqueness violated"):
        checks.assert_unique(df, ["k"])
    checks.assert_unique(df, ["k", "v"])  # composite key is unique


def test_salted_join_rejects_right_and_full_outer(spark):
    """Salting replicates the non-skewed side once per salt value, so
    right/full-outer shapes would duplicate unmatched right rows — the
    operator must refuse rather than silently inflate output."""
    from financial_data_pipeline_optimization_spark.operators import joins

    a = spark.createDataFrame([(1, "x")], "k long, v string")
    b = spark.createDataFrame([(1, "y")], "k long, w string")
    for how in ("right", "right_outer", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="salted_join does not support"):
            joins.salted_join(a, b, on=["k"], how=how)
    # supported shapes still work and match the unsalted join
    got = joins.salted_join(a, b, on=["k"], how="inner").collect()
    assert [(r.k, r.v, r.w) for r in got] == [(1, "x", "y")]


def test_null_safe_key_distinguishes_null_from_empty(spark):
    """('a', NULL) and ('a', '') must hash to DIFFERENT stable ids —
    concat_ws would silently skip the NULL and collide them, and the
    anti-join merge keyed on the id would then drop a legitimate row."""
    from financial_data_pipeline_optimization_spark.functions import (
        portable_id,
        stable_id,
    )

    df = spark.createDataFrame(
        [("a", None), ("a", ""), (None, "a"), ("a", None)],
        "x string, y string",
    ).select(
        "x",
        "y",
        stable_id("x", "y").alias("sid"),
        portable_id("x", "y").alias("pid"),
    )
    rows = df.collect()
    a_null, a_empty, null_a, a_null2 = rows
    assert a_null.sid != a_empty.sid
    assert a_null.pid != a_empty.pid
    # order matters: (NULL,'a') != ('a',NULL)
    assert null_a.sid != a_null.sid
    # determinism: same key -> same id
    assert a_null.sid == a_null2.sid and a_null.pid == a_null2.pid

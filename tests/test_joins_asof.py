"""As-of join direction/tolerance semantics (operators.joins.asof_join).

The oracle-parity suite covers the backward and nearest paths over the
events table; these unit tests pin the contract on hand-built frames
where every expected match is enumerable by eye.
"""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from financial_data_pipeline_optimization_spark.operators import joins


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 12, minute)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [("u", 1, _ts(10)), ("u", 2, _ts(30)), ("v", 3, _ts(5))],
        "k string, id int, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u", _ts(8), 1.0),    # 2 min before left id=1
            ("u", _ts(11), 2.0),   # 1 min after  left id=1
            ("u", _ts(50), 3.0),   # 20 min after left id=2
            # key v has no right rows at all
        ],
        "k string, ts timestamp, val double",
    )
    return left, right


def _collect(df):
    return {r.id: (r.ts_right, r.val) for r in df.collect()}


def test_backward(spark, frames):
    left, right = frames
    got = _collect(
        joins.asof_join(left, right, ["k"], "ts", "ts")
        .withColumnRenamed("ts", "ts_left")
    )
    assert got[1] == (_ts(8), 1.0)     # latest at-or-before 12:10
    assert got[2] == (_ts(11), 2.0)    # 12:50 is in the future
    assert got[3] == (None, None)      # no rows for key v


def test_forward(spark, frames):
    left, right = frames
    got = _collect(
        joins.asof_join(left, right, ["k"], "ts", "ts", direction="forward")
    )
    assert got[1] == (_ts(11), 2.0)    # earliest at-or-after 12:10
    assert got[2] == (_ts(50), 3.0)
    assert got[3] == (None, None)


def test_nearest_prefers_smaller_gap_ties_backward(spark, frames):
    left, right = frames
    got = _collect(
        joins.asof_join(left, right, ["k"], "ts", "ts", direction="nearest")
    )
    # id=1: backward gap 2 min vs forward gap 1 min -> forward wins.
    assert got[1] == (_ts(11), 2.0)
    # id=2: backward gap 19 min vs forward 20 min -> backward wins.
    assert got[2] == (_ts(11), 2.0)
    assert got[3] == (None, None)


def test_nearest_tie_goes_backward(spark):
    left = spark.createDataFrame(
        [("u", 1, _ts(10))], "k string, id int, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u", _ts(7), 1.0), ("u", _ts(13), 2.0)],
        "k string, ts timestamp, val double",
    )
    got = _collect(
        joins.asof_join(left, right, ["k"], "ts", "ts", direction="nearest")
    )
    assert got[1] == (_ts(7), 1.0)


def test_tolerance_gates_all_directions(spark, frames):
    left, right = frames
    back = _collect(
        joins.asof_join(
            left, right, ["k"], "ts", "ts", tolerance="5 minutes"
        )
    )
    assert back[1] == (_ts(8), 1.0)    # 2 min gap, within 5
    assert back[2] == (None, None)     # 19 min gap, gated
    fwd = _collect(
        joins.asof_join(
            left, right, ["k"], "ts", "ts",
            direction="forward", tolerance="5 minutes",
        )
    )
    assert fwd[1] == (_ts(11), 2.0)
    assert fwd[2] == (None, None)      # 20 min gap, gated
    near = _collect(
        joins.asof_join(
            left, right, ["k"], "ts", "ts",
            direction="nearest", tolerance="1 minutes",
        )
    )
    assert near[1] == (_ts(11), 2.0)   # only the 1-min candidate survives
    assert near[2] == (None, None)


def test_exact_timestamp_matches_inclusive(spark):
    left = spark.createDataFrame(
        [("u", 1, _ts(10))], "k string, id int, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u", _ts(10), 9.0)], "k string, ts timestamp, val double"
    )
    for direction in ("backward", "forward", "nearest"):
        got = _collect(
            joins.asof_join(
                left, right, ["k"], "ts", "ts", direction=direction
            )
        )
        assert got[1] == (_ts(10), 9.0), direction


def test_unknown_direction_raises(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="unknown direction"):
        joins.asof_join(left, right, ["k"], "ts", "ts", direction="sideways")


def test_asof_single_shuffle(spark, frames):
    """All directions stay one exchange on the key — nearest's second
    window sorts within the same partitioning, no extra shuffle."""
    left, right = frames
    for direction in ("backward", "nearest"):
        df = joins.asof_join(
            left, right, ["k"], "ts", "ts", direction=direction
        )
        jvm = df.sparkSession._jvm
        plan = df._jdf.queryExecution().explainString(
            jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "simple"
            )
        )
        exchanges = [ln for ln in plan.splitlines() if "Exchange" in ln]
        assert len(exchanges) == 1, (direction, exchanges)
        assert "hashpartitioning" in exchanges[0], direction


# ---------------------------------------------------------------------------
# Blocked fuzzy matching (record linkage)
# ---------------------------------------------------------------------------


def test_blocked_fuzzy_pairs_matches_brute_force_within_blocks(spark):
    rows = [
        (1, "small ring", "A"),
        (2, "small king", "A"),   # lev 1 from #1, same block
        (3, "small ring", "B"),   # same text, different block → no pair
        (4, "large bolt", "A"),
        (5, "large belt", "A"),   # lev 1 from #4
        (6, "large bolts", "A"),  # lev 1 from #4 (insert), 2 from #5
        (7, None, "A"),
    ]
    df = spark.createDataFrame(rows, "id long, name string, grp string")
    got = {
        (r.a_id, r.b_id, r.edit_distance)
        for r in joins.blocked_fuzzy_pairs(
            df,
            "id",
            "name",
            [F.concat(F.split_part("name", F.lit(" "), F.lit(1)),
                      F.lit("|"), F.col("grp"))],
            max_distance=1,
        ).collect()
    }
    assert got == {(1, 2, 1), (4, 5, 1), (4, 6, 1)}


def test_blocked_fuzzy_pairs_emits_each_pair_once(spark):
    df = spark.createDataFrame(
        [(i, "alpha beta", "g") for i in range(5)],
        "id long, name string, grp string",
    )
    pairs = joins.blocked_fuzzy_pairs(
        df, "id", "name", [F.col("grp")], max_distance=0
    ).collect()
    assert len(pairs) == 10  # C(5,2), a_id < b_id each once
    assert all(p.a_id < p.b_id for p in pairs)


def test_blocked_fuzzy_pairs_plans_as_equi_join(spark):
    """The blocking key must plan as a hash/sort-merge EQUI join —
    never a cartesian product with a distance filter."""
    df = spark.createDataFrame(
        [(1, "a b", "g")], "id long, name string, grp string"
    )
    plan = (
        joins.blocked_fuzzy_pairs(df, "id", "name", [F.col("grp")])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan

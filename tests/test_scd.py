"""SCD2 merge semantics (operators.scd)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from financial_data_pipeline_optimization_spark.operators import scd


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _dim(spark):
    snap = spark.createDataFrame(
        [(1, "A", 10.0), (2, "B", 20.0), (3, "C", 30.0)],
        "k int, seg string, bal double",
    )
    return scd.scd2_snapshot(
        snap, ["k"], ["seg", "bal"], F.lit("2024-01-01").cast("timestamp")
    )


def _updates(spark):
    return spark.createDataFrame(
        [
            # k=1: real change then another change -> 3 versions
            (1, "A2", 10.0, _ts("2024-02-01")),
            (1, "A3", 11.0, _ts("2024-03-01")),
            # k=2: no-op update -> must compress away
            (2, "B", 20.0, _ts("2024-02-15")),
            # k=4: brand-new key -> single open version
            (4, "D", 40.0, _ts("2024-05-01")),
        ],
        "k int, seg string, bal double, change_ts timestamp",
    )


def test_scd2_chain_semantics(spark):
    out = scd.scd2_apply(_dim(spark), _updates(spark), ["k"], ["seg", "bal"])
    rows = {
        (r.k, r.effective_from.isoformat()): r
        for r in out.collect()
    }
    # k=1: base closed at 02-01, v2 closed at 03-01, v3 open.
    assert rows[(1, "2024-01-01T00:00:00")].effective_to == _ts("2024-02-01")
    assert rows[(1, "2024-02-01T00:00:00")].seg == "A2"
    assert rows[(1, "2024-02-01T00:00:00")].effective_to == _ts("2024-03-01")
    v3 = rows[(1, "2024-03-01T00:00:00")]
    assert v3.seg == "A3" and v3.effective_to is None and v3.is_current
    # k=2: the no-op update left exactly one (open) version.
    k2 = [r for (k, _), r in rows.items() if k == 2]
    assert len(k2) == 1 and k2[0].is_current and k2[0].effective_to is None
    # k=3: untouched key passes through open.
    k3 = [r for (k, _), r in rows.items() if k == 3]
    assert len(k3) == 1 and k3[0].is_current
    # k=4: new key inserted open with the update's timestamp.
    k4 = rows[(4, "2024-05-01T00:00:00")]
    assert k4.is_current and k4.effective_to is None
    assert out.count() == 6


def test_scd2_replay_idempotent(spark):
    """Re-applying the same batch is a no-op: identical versions
    compress, so counts and open rows are unchanged."""
    once = scd.scd2_apply(_dim(spark), _updates(spark), ["k"], ["seg", "bal"])
    twice = scd.scd2_apply(once, _updates(spark), ["k"], ["seg", "bal"])
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b


def test_scd2_point_in_time(spark):
    out = scd.scd2_apply(_dim(spark), _updates(spark), ["k"], ["seg", "bal"])
    at = scd.scd2_point_in_time(out, F.lit("2024-02-20").cast("timestamp"))
    got = {r.k: r.seg for r in at.collect()}
    # k=1 is on its A2 version, k=2/k=3 on base, k=4 not yet born.
    assert got == {1: "A2", 2: "B", 3: "C"}


def test_scd2_same_timestamp_ties_are_deterministic(spark):
    """Two updates for one key at the SAME change_ts: the chain must be
    rebuilt identically on every run/partitioning — ties order by the
    tracked-attribute tuple, so the tuple-greatest update survives as
    the open version and the other becomes a zero-duration version."""
    dim = _dim(spark)
    ties = spark.createDataFrame(
        [
            (1, "Z1", 1.0, _ts("2024-06-01")),
            (1, "Z2", 2.0, _ts("2024-06-01")),
        ],
        "k int, seg string, bal double, change_ts timestamp",
    )
    expected = None
    for nparts in (1, 3, 7):
        out = scd.scd2_apply(
            dim, ties.repartition(nparts), ["k"], ["seg", "bal"]
        )
        rows = sorted(map(tuple, out.collect()))
        if expected is None:
            expected = rows
        else:
            assert rows == expected
    open_k1 = [
        r
        for r in out.collect()
        if r.k == 1 and r.is_current
    ]
    assert len(open_k1) == 1 and open_k1[0].seg == "Z2"
    # the tied-out update is a closed zero-duration version
    z1 = [r for r in out.collect() if r.k == 1 and r.seg == "Z1"]
    assert len(z1) == 1 and z1[0].effective_to == _ts("2024-06-01")


def test_scd2_single_shuffle(spark):
    """The merge's version-chain rebuild adds exactly one exchange on
    the key (the second window reuses the first's partitioning)."""
    df = scd.scd2_apply(_dim(spark), _updates(spark), ["k"], ["seg", "bal"])
    jvm = df.sparkSession._jvm
    plan = df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    # History side contributes no exchange (filter-only); the chain
    # side needs one hashpartitioning exchange for its windows.
    exchanges = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert len(exchanges) == 1 and "hashpartitioning" in exchanges[0], (
        exchanges
    )

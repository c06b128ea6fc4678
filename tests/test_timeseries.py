"""Financial time-series operators: invariants the oracle can't see.

Oracle parity (test_oracle_parity) checks every registered finance
query against DuckDB; here we pin down (a) the EMA implementations
agreeing with each other (pandas scale path ≡ pure-JVM HOF twin), and
(b) hand-computable values on a tiny deterministic series.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from financial_data_pipeline_optimization_spark.operators import timeseries

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def ticks(spark):
    rows = [
        # entity A: rises then crashes: 100, 110, 121, 60.5
        ("A", 1, 100.0), ("A", 2, 110.0), ("A", 3, 121.0), ("A", 4, 60.5),
        # entity B: constant
        ("B", 1, 50.0), ("B", 2, 50.0), ("B", 3, 50.0),
    ]
    return spark.createDataFrame(rows, "entity string, seq long, price double")


def test_returns_values(ticks):
    out = (
        timeseries.with_returns(ticks, "entity", ["seq"], "price")
        .filter(F.col("entity") == "A")
        .orderBy("seq")
        .collect()
    )
    assert out[0].simple_return is None and out[0].log_return is None
    assert out[1].simple_return == pytest.approx(0.10)
    assert out[1].log_return == pytest.approx(math.log(1.1))
    assert out[3].simple_return == pytest.approx(60.5 / 121.0 - 1)


def test_max_drawdown_values(ticks):
    out = {
        r.entity: r.max_drawdown
        for r in timeseries.max_drawdown(
            ticks, "entity", ["seq"], "price"
        ).collect()
    }
    # A peaks at 121 then falls to 60.5 → -50%; B never draws down.
    assert out["A"] == pytest.approx(-0.5)
    assert out["B"] == 0.0


def test_rsi_pinned_edges(ticks):
    out = {
        (r.entity, r.seq): r.rsi
        for r in timeseries.with_rsi(
            ticks, "entity", ["seq"], "price", n=14
        ).collect()
    }
    assert out[("A", 1)] is None  # warm-up: no prior change
    assert out[("A", 3)] == 100.0  # gains only
    assert out[("B", 3)] == 50.0  # flat series
    # A@4: gains 10+11, loss 60.5 → RS=(21/3)/(60.5/3)
    expected = 100.0 - 100.0 / (1.0 + 21.0 / 60.5)
    assert out[("A", 4)] == pytest.approx(expected)


def test_ema_methods_agree(spark):
    from financial_data_pipeline_optimization_spark.sources import load_table

    events = load_table(spark, SF_SMOKE, "events")
    kw = dict(
        entity_col="user_id",
        order_cols=["ts", "event_id"],
        price_col="value",
        alpha=0.3,
    )
    a = timeseries.with_ema(events, method="pandas", **kw).select(
        "event_id", F.round("ema", 9).alias("ema")
    )
    b = timeseries.with_ema(events, method="hof", **kw).select(
        "event_id", F.round("ema", 9).alias("ema")
    )
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_ema_seeds_with_first_price(ticks):
    out = (
        timeseries.with_ema(ticks, "entity", ["seq"], "price", alpha=0.5)
        .filter(F.col("entity") == "A")
        .orderBy("seq")
        .collect()
    )
    assert out[0].ema == pytest.approx(100.0)
    assert out[1].ema == pytest.approx(105.0)
    assert out[2].ema == pytest.approx(113.0)


def test_ohlc_bars_deterministic_open_close(spark):
    from financial_data_pipeline_optimization_spark.sources import load_table

    events = load_table(spark, SF_SMOKE, "events")
    bars = timeseries.ohlc_bars(
        events, "user_id", "ts", "value", "event_id", bar="1 day"
    )
    row = bars.orderBy("user_id", "bar_start").first()
    assert row.high >= max(row.open, row.close)
    assert row.low <= min(row.open, row.close)
    assert row.n_ticks >= 1


def test_bollinger_band_ordering(ticks):
    out = timeseries.with_bollinger(
        ticks, "entity", ["seq"], "price", n=3
    ).filter(F.col("bb_upper").isNotNull())
    bad = out.filter(
        (F.col("bb_upper") < F.col("bb_mid"))
        | (F.col("bb_lower") > F.col("bb_mid"))
    )
    assert bad.isEmpty()


def test_forward_fill_values_and_leading_nulls(spark):
    rows = [
        ("A", 1, None), ("A", 2, 10.0), ("A", 3, None), ("A", 4, None),
        ("A", 5, 20.0),
        ("B", 1, 5.0), ("B", 2, None),
    ]
    df = spark.createDataFrame(rows, "entity string, seq long, v double")

    out = {
        (r.entity, r.seq): r.v
        for r in timeseries.forward_fill(
            df, "entity", ["seq"], ["v"]
        ).collect()
    }
    assert out[("A", 1)] is None          # leading null stays null
    assert out[("A", 3)] == 10.0          # carried forward
    assert out[("A", 4)] == 10.0          # across consecutive gaps
    assert out[("A", 5)] == 20.0          # real value untouched
    assert out[("B", 2)] == 5.0           # per-entity isolation

    back = {
        (r.entity, r.seq): r.v
        for r in timeseries.forward_fill(
            df, "entity", ["seq"], ["v"], backfill_leading=True
        ).collect()
    }
    assert back[("A", 1)] == 10.0         # leading null backfilled
    assert back[("A", 4)] == 10.0         # forward fill still wins

"""Financial time-series analytics (split from the original queries.py; registration
order preserved — modules import in the original definition order)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from financial_data_pipeline_optimization_spark.functions import explode_nonempty, portable_id
from financial_data_pipeline_optimization_spark.operators import (
    clean,
    dedup,
    joins,
    scd,
    sketch,
    temporal,
    timeseries,
)
from financial_data_pipeline_optimization_spark.sources import load_table

from financial_data_pipeline_optimization_spark.queries._registry import (
    QuerySpec,
    _REGISTRY,
    _r2,
    _r4,
    _register,
    _t,
)



# ===========================================================================
# Financial time-series analytics (operators/timeseries.py) — the query
# layer the reference's warehouse serves (README.md:19), over the events
# table read as a tick series (user_id = instrument, ts = time,
# value = price).
# ===========================================================================

_TS_W = "PARTITION BY user_id ORDER BY ts, event_id"


@_register(
    "finance_returns",
    f"""
    SELECT user_id, event_id,
           floor((value / lag(value) OVER w - 1)*10000 + 0.5000005)/10000
             AS simple_return,
           floor(ln(value / lag(value) OVER w)*10000 + 0.5000005)/10000
             AS log_return
    FROM events WINDOW w AS ({_TS_W})
    """,
    doc="Per-entity simple and log returns vs the previous tick (lag "
    "window; first row of each entity is null).",
)
def q_finance_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = timeseries.with_returns(
        _t(spark, sf_dir, "events"), "user_id", ["ts", "event_id"], "value"
    )
    return out.select(
        "user_id",
        "event_id",
        _r4(F.col("simple_return")).alias("simple_return"),
        _r4(F.col("log_return")).alias("log_return"),
    )


@_register(
    "finance_ohlc_bars",
    """
    WITH t AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS bar_date, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('day', ts)
                                ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('day', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events)
    SELECT user_id, bar_date,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high, MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_ticks
    FROM t GROUP BY user_id, bar_date
    """,
    doc="OHLC daily bars from ticks — the reference's warehouse row "
    "shape (loading.py:47-64) produced by resampling; open/close via "
    "min_by/max_by on (ts, event_id), one shuffle on (entity, day).",
)
def q_finance_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = timeseries.ohlc_bars(
        _t(spark, sf_dir, "events"), "user_id", "ts", "value", "event_id",
        bar="1 day",
    )
    return bars.select(
        "user_id",
        F.col("bar_start").cast("date").alias("bar_date"),
        "open", "high", "low", "close", "n_ticks",
    )


@_register(
    "finance_sma_bollinger",
    f"""
    SELECT user_id, event_id,
           floor(avg(value) OVER w *10000 + 0.5000005)/10000 AS bb_mid,
           floor((avg(value) OVER w + 2.0*stddev_samp(value) OVER w)
                 *10000 + 0.5000005)/10000 AS bb_upper,
           floor((avg(value) OVER w - 2.0*stddev_samp(value) OVER w)
                 *10000 + 0.5000005)/10000 AS bb_lower
    FROM events
    WINDOW w AS ({_TS_W} ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    """,
    doc="Bollinger bands: trailing-20 SMA ± 2 sample stddevs per "
    "entity (row-count frame).",
)
def q_finance_sma_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = timeseries.with_bollinger(
        _t(spark, sf_dir, "events"), "user_id", ["ts", "event_id"], "value",
        n=20, k=2.0,
    )
    return out.select(
        "user_id",
        "event_id",
        _r4(F.col("bb_mid")).alias("bb_mid"),
        _r4(F.col("bb_upper")).alias("bb_upper"),
        _r4(F.col("bb_lower")).alias("bb_lower"),
    )


@_register(
    "finance_rolling_volatility",
    f"""
    WITH r AS (
      SELECT user_id, event_id, ts,
             ln(value / lag(value) OVER ({_TS_W})) AS lr
      FROM events)
    SELECT user_id, event_id,
           floor(stddev_samp(lr) OVER ({_TS_W}
                 ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
                 *10000 + 0.5000005)/10000 AS volatility
    FROM r
    """,
    doc="Trailing-10 realized volatility: sample stddev of log "
    "returns per entity.",
)
def q_finance_rolling_volatility(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    out = timeseries.with_rolling_volatility(
        _t(spark, sf_dir, "events"), "user_id", ["ts", "event_id"], "value",
        n=10,
    )
    return out.select(
        "user_id", "event_id", _r4(F.col("volatility")).alias("volatility")
    )


@_register(
    "finance_rsi",
    f"""
    WITH ch AS (
      SELECT user_id, event_id, ts,
             value - lag(value) OVER ({_TS_W}) AS chg
      FROM events),
    g AS (
      SELECT user_id, event_id, ts,
             CASE WHEN chg > 0 THEN chg
                  WHEN chg IS NOT NULL THEN 0.0 END AS gain,
             CASE WHEN chg < 0 THEN -chg
                  WHEN chg IS NOT NULL THEN 0.0 END AS loss
      FROM ch),
    a AS (
      SELECT user_id, event_id,
             avg(gain) OVER w AS ag, avg(loss) OVER w AS al
      FROM g
      WINDOW w AS ({_TS_W} ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
    SELECT user_id, event_id,
           floor((CASE WHEN ag IS NULL OR al IS NULL THEN NULL
                       WHEN ag = 0 AND al = 0 THEN 50.0
                       WHEN al = 0 THEN 100.0
                       WHEN ag = 0 THEN 0.0
                       ELSE 100.0 - 100.0/(1.0 + ag/al) END)
                 *10000 + 0.5000005)/10000 AS rsi
    FROM a
    """,
    doc="Cutler's RSI (simple-average form, window-expressible) over "
    "the trailing 14 price changes; degenerate cases pinned so both "
    "engines agree.",
)
def q_finance_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = timeseries.with_rsi(
        _t(spark, sf_dir, "events"), "user_id", ["ts", "event_id"], "value",
        n=14,
    )
    return out.select("user_id", "event_id", _r4(F.col("rsi")).alias("rsi"))


@_register(
    "finance_max_drawdown",
    f"""
    WITH dd AS (
      SELECT user_id,
             (value - max(value) OVER w) / max(value) OVER w AS d
      FROM events
      WINDOW w AS ({_TS_W} ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW))
    SELECT user_id, floor(min(d)*10000 + 0.5000005)/10000 AS max_drawdown
    FROM dd GROUP BY user_id
    """,
    doc="Maximum drawdown per entity: most negative excursion from the "
    "running peak (running-max window + group-min, both shuffling on "
    "the same entity key).",
)
def q_finance_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = timeseries.max_drawdown(
        _t(spark, sf_dir, "events"), "user_id", ["ts", "event_id"], "value"
    )
    return out.select(
        "user_id", _r4(F.col("max_drawdown")).alias("max_drawdown")
    )


@_register(
    "finance_vwap",
    """
    SELECT l_partkey, CAST(year(l_shipdate) AS INT) AS ship_year,
           floor(SUM(l_extendedprice)/SUM(l_quantity)*10000 + 0.5000005)
             /10000 AS vwap,
           floor(SUM(l_quantity)*100 + 0.50005)/100 AS total_qty
    FROM lineitem GROUP BY l_partkey, ship_year
    """,
    doc="Volume-weighted average price per part and ship year: "
    "sum(notional)/sum(quantity), map-side partial agg.",
)
def q_finance_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "ship_year", F.year("l_shipdate").cast("int")
    )
    out = timeseries.vwap(
        li, ["l_partkey", "ship_year"], "l_extendedprice", "l_quantity"
    )
    return out.select(
        "l_partkey",
        "ship_year",
        _r4(F.col("vwap")).alias("vwap"),
        _r2(F.col("total_qty")).alias("total_qty"),
    )


@_register(
    "finance_zscore",
    f"""
    SELECT user_id, event_id,
           floor((CASE WHEN stddev_samp(value) OVER w > 0
                       THEN (value - avg(value) OVER w)
                            / stddev_samp(value) OVER w END)
                 *10000 + 0.5000005)/10000 AS zscore
    FROM events
    WINDOW w AS ({_TS_W} ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    """,
    doc="Rolling z-score of price vs its trailing-20 window — the "
    "standard anomaly score; null while the window stddev is "
    "null/zero.",
)
def q_finance_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = timeseries.with_zscore(
        _t(spark, sf_dir, "events"), "user_id", ["ts", "event_id"], "value",
        n=20,
    )
    return out.select(
        "user_id", "event_id", _r4(F.col("zscore")).alias("zscore")
    )


@_register(
    "finance_ema",
    """
    WITH o AS (
      SELECT user_id, event_id,
             list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS pfx
      FROM events)
    SELECT user_id, event_id,
           floor(list_reduce(pfx, (acc, x) -> acc*0.7 + x*0.3)
                 *10000 + 0.5000005)/10000 AS ema
    FROM o
    """,
    doc="Exponential moving average (alpha=0.3, seeded with the first "
    "tick). The recurrence is not window-expressible: Spark side is a "
    "linear Arrow-batched applyInPandas per entity (the 100 TB path); "
    "the oracle folds a windowed prefix list (O(n^2), fine for the "
    "checker). See operators/timeseries.py:with_ema.",
)
def q_finance_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Project to the needed columns BEFORE the pandas boundary: the
    # applyInPandas round-trips its full input schema through Arrow, so
    # unused wide columns (props JSON) would be serialized both ways.
    ticks = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    out = timeseries.with_ema(
        ticks, "user_id", ["ts", "event_id"], "value",
        alpha=0.3, method="pandas",
    )
    return out.select("user_id", "event_id", _r4(F.col("ema")).alias("ema"))



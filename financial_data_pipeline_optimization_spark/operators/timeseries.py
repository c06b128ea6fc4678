"""Financial time-series analytics (the query layer the reference's
warehouse exists to serve).

The reference pipeline lands daily per-ticker OHLCV rows in a warehouse
"to serve financial insights" (``README.md:19``) but computes none of
them itself (SURVEY.md §2.8: no aggregation or window function exists
in the reference). This module supplies that layer as idiomatic Spark
window compositions over a generic ``(entity, time, price)`` series —
the same shape as the reference's ``(Ticker, Date, Close)``
(``loading.py:47-64``).

Design rules:

- every operator is a lazy DataFrame→DataFrame function;
- ordering is always ``(time, tiebreak)`` with an explicit unique
  tiebreaker column, so outputs are deterministic under any partition
  layout;
- per-entity windows mean ONE hash-shuffle on the entity key, then all
  frames evaluate partition-locally — the 100 TB cost is that single
  exchange (entities are the natural parallelism unit; a skewed entity
  is bounded by its own history length, ~10^4 rows for daily bars);
- everything is built-in ``F`` expressions except :func:`with_ema`,
  whose recurrence is not window-expressible — see its docstring for
  the two implementations and their cost envelopes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _w(entity_col: str, order_cols: Sequence[str]):
    return Window.partitionBy(entity_col).orderBy(*order_cols)


def with_returns(
    df: DataFrame,
    entity_col: str,
    order_cols: Sequence[str],
    price_col: str,
    simple_col: str = "simple_return",
    log_col: str = "log_return",
) -> DataFrame:
    """Per-entity simple and log returns vs the previous observation.

    ``r_t = p_t/p_{t-1} - 1`` and ``ln(p_t/p_{t-1})``; the first row of
    each entity has no predecessor → null (standard convention).
    """
    prev = F.lag(price_col).over(_w(entity_col, order_cols))
    p = F.col(price_col)
    return df.withColumns(
        {
            simple_col: p / prev - 1,
            log_col: F.log(p / prev),
        }
    )


def with_sma(
    df: DataFrame,
    entity_col: str,
    order_cols: Sequence[str],
    price_col: str,
    n: int = 20,
    out_col: str = "sma",
) -> DataFrame:
    """Trailing ``n``-row simple moving average (row-count frame; the
    window is partial during warm-up — avg over however many rows
    exist, matching SQL AVG OVER semantics)."""
    w = _w(entity_col, order_cols).rowsBetween(-(n - 1), 0)
    return df.withColumn(out_col, F.avg(price_col).over(w))


def with_bollinger(
    df: DataFrame,
    entity_col: str,
    order_cols: Sequence[str],
    price_col: str,
    n: int = 20,
    k: float = 2.0,
    mid_col: str = "bb_mid",
    upper_col: str = "bb_upper",
    lower_col: str = "bb_lower",
) -> DataFrame:
    """Bollinger bands: trailing-``n`` SMA ± ``k`` sample standard
    deviations. Bands are null during the first row of each entity
    (stddev_samp of one row is null) — both engines agree."""
    w = _w(entity_col, order_cols).rowsBetween(-(n - 1), 0)
    mid = F.avg(price_col).over(w)
    sd = F.stddev_samp(price_col).over(w)
    return df.withColumns(
        {
            mid_col: mid,
            upper_col: mid + k * sd,
            lower_col: mid - k * sd,
        }
    )


def with_rolling_volatility(
    df: DataFrame,
    entity_col: str,
    order_cols: Sequence[str],
    price_col: str,
    n: int = 10,
    out_col: str = "volatility",
    return_col: str = "__r",
) -> DataFrame:
    """Trailing-``n`` realized volatility: sample stddev of log
    returns. Null until two returns exist in the frame."""
    out = with_returns(
        df, entity_col, order_cols, price_col,
        simple_col="__s_drop", log_col=return_col,
    )
    w = _w(entity_col, order_cols).rowsBetween(-(n - 1), 0)
    return (
        out.withColumn(out_col, F.stddev_samp(return_col).over(w))
        .drop("__s_drop", return_col)
    )


def with_running_max_drawdown(
    df: DataFrame,
    entity_col: str,
    order_cols: Sequence[str],
    price_col: str,
    drawdown_col: str = "drawdown",
) -> DataFrame:
    """Per-row drawdown from the running peak:
    ``(p - cummax(p)) / cummax(p)`` (≤ 0, 0 at new highs)."""
    w = _w(entity_col, order_cols).rowsBetween(
        Window.unboundedPreceding, 0
    )
    peak = F.max(price_col).over(w)
    return df.withColumn(
        drawdown_col, (F.col(price_col) - peak) / peak
    )


def max_drawdown(
    df: DataFrame,
    entity_col: str,
    order_cols: Sequence[str],
    price_col: str,
    out_col: str = "max_drawdown",
) -> DataFrame:
    """Per-entity maximum drawdown (the most negative running
    drawdown). One window pass + one group-agg — both shuffle on the
    same entity key, so the exchange is reused."""
    dd = with_running_max_drawdown(
        df, entity_col, order_cols, price_col, drawdown_col="__dd"
    )
    return dd.groupBy(entity_col).agg(F.min("__dd").alias(out_col))


def with_rsi(
    df: DataFrame,
    entity_col: str,
    order_cols: Sequence[str],
    price_col: str,
    n: int = 14,
    out_col: str = "rsi",
) -> DataFrame:
    """Cutler's RSI (simple-moving-average variant): ``100 - 100/(1 +
    avg_gain/avg_loss)`` over the trailing ``n`` price changes. The SMA
    form is window-expressible and ANSI-SQL-checkable, unlike Wilder's
    original recursive smoothing (which would need :func:`with_ema`'s
    machinery). Edge cases pinned explicitly so engines agree: no
    losses → 100, no gains → 0, no change at all → 50, warm-up row
    (no prior change) → null."""
    w1 = _w(entity_col, order_cols)
    change = F.col(price_col) - F.lag(price_col).over(w1)
    tagged = df.withColumns(
        {
            "__gain": F.when(change > 0, change).otherwise(
                F.when(change.isNotNull(), F.lit(0.0))
            ),
            "__loss": F.when(change < 0, -change).otherwise(
                F.when(change.isNotNull(), F.lit(0.0))
            ),
        }
    )
    wn = _w(entity_col, order_cols).rowsBetween(-(n - 1), 0)
    avg_gain = F.avg("__gain").over(wn)
    avg_loss = F.avg("__loss").over(wn)
    rsi = (
        F.when(avg_gain.isNull() | avg_loss.isNull(), F.lit(None))
        .when((avg_gain == 0) & (avg_loss == 0), F.lit(50.0))
        .when(avg_loss == 0, F.lit(100.0))
        .when(avg_gain == 0, F.lit(0.0))
        .otherwise(100.0 - 100.0 / (1.0 + avg_gain / avg_loss))
    )
    return tagged.withColumn(out_col, rsi).drop("__gain", "__loss")


def ohlc_bars(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    price_col: str,
    tiebreak_col: str,
    bar: str = "1 day",
) -> DataFrame:
    """Resample a tick series into OHLC(+count) bars — the reference's
    daily-bar shape (`loading.py:47-64`) produced from raw ticks.

    open/close are ``min_by``/``max_by`` on ``(ts, tiebreak)`` (exact
    argmin/argmax, deterministic under ties); high/low/volume are plain
    aggregates. One shuffle on ``(entity, bar_start)``.
    """
    key = F.struct(F.col(ts_col), F.col(tiebreak_col))
    return (
        df.withColumn("__bar", F.window(ts_col, bar))
        .groupBy(
            F.col(entity_col),
            F.col("__bar.start").alias("bar_start"),
        )
        .agg(
            F.min_by(price_col, key).alias("open"),
            F.max(price_col).alias("high"),
            F.min(price_col).alias("low"),
            F.max_by(price_col, key).alias("close"),
            F.count("*").alias("n_ticks"),
        )
    )


def vwap(
    df: DataFrame,
    group_cols: Sequence[str],
    notional_col: str,
    quantity_col: str,
    out_col: str = "vwap",
) -> DataFrame:
    """Volume-weighted average price per group:
    ``sum(notional) / sum(quantity)`` (when the input carries notional
    = price×qty directly, e.g. ``l_extendedprice``, no multiply is
    needed). Map-side partial aggregation makes this one light shuffle
    of two doubles per group."""
    return df.groupBy(*group_cols).agg(
        (F.sum(notional_col) / F.sum(quantity_col)).alias(out_col),
        F.sum(quantity_col).alias("total_qty"),
    )


def with_zscore(
    df: DataFrame,
    entity_col: str,
    order_cols: Sequence[str],
    price_col: str,
    n: int = 20,
    out_col: str = "zscore",
) -> DataFrame:
    """Rolling z-score of the price vs its trailing-``n`` window —
    the standard anomaly/outlier flag. Null while stddev is null or
    zero (constant window)."""
    w = _w(entity_col, order_cols).rowsBetween(-(n - 1), 0)
    mu = F.avg(price_col).over(w)
    sd = F.stddev_samp(price_col).over(w)
    return df.withColumn(
        out_col,
        F.when(sd > 0, (F.col(price_col) - mu) / sd),
    )


# ---------------------------------------------------------------------------
# EMA — the one genuinely recursive operator
# ---------------------------------------------------------------------------


def with_ema(
    df: DataFrame,
    entity_col: str,
    order_cols: Sequence[str],
    price_col: str,
    alpha: float = 0.3,
    out_col: str = "ema",
    method: str = "pandas",
) -> DataFrame:
    """Exponential moving average, seeded with the first observation:
    ``ema_0 = p_0``; ``ema_t = (1-α)·ema_{t-1} + α·p_t``.

    The recurrence is not expressible as a SQL window frame, so two
    implementations with different cost envelopes:

    - ``method='pandas'`` (default, the scale path): one shuffle on the
      entity key, then a **linear** sequential scan per entity inside an
      Arrow-batched ``applyInPandas`` (``pandas.Series.ewm(alpha,
      adjust=False)`` is exactly the recurrence above). O(n) per
      entity; Python boundary cost is amortized by Arrow batches.
    - ``method='hof'`` (pure-JVM, oracle-twin): per-row prefix
      ``collect_list`` + ``aggregate`` fold. No Python, ANSI-equivalent
      (DuckDB ``list_reduce``), but O(n²) per entity — fine for daily
      bars (10^4 rows/entity), wrong for tick data. Kept as the
      cross-checkable reference implementation.

    Both orders rows by ``order_cols`` (must be unique per entity for
    determinism).
    """
    if method == "hof":
        w = (
            _w(entity_col, order_cols)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        prefix = F.collect_list(F.col(price_col).cast("double")).over(w)
        fold = (
            f"aggregate(slice(__prefix, 2, size(__prefix) - 1), "
            f"element_at(__prefix, 1), "
            f"(acc, x) -> acc * {1.0 - alpha!r}D + x * {alpha!r}D)"
        )
        return (
            df.withColumn("__prefix", prefix)
            .withColumn(out_col, F.expr(fold))
            .drop("__prefix")
        )
    if method != "pandas":
        raise ValueError(f"unknown EMA method: {method!r}")

    import pandas as pd

    out_fields = list(df.schema.fields) + [
        T.StructField(out_col, T.DoubleType())
    ]
    schema = T.StructType(out_fields)
    order = list(order_cols)

    def _ema(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort")
        pdf[out_col] = (
            pdf[price_col]
            .astype("float64")
            .ewm(alpha=alpha, adjust=False)
            .mean()
        )
        return pdf

    # Pin the pre-pandas exchange to full parallelism: the explicit
    # partition count satisfies the groupBy's distribution requirement
    # (no second exchange) and AQE does not coalesce user-specified
    # repartitions — without this, a small input coalesces to 1-2
    # partitions and the Python stage runs nearly serial.
    sc = df.sparkSession.sparkContext
    df = df.repartition(sc.defaultParallelism, entity_col)
    return df.groupBy(entity_col).applyInPandas(_ema, schema)


def forward_fill(
    df: DataFrame,
    entity_col: str,
    order_cols: Sequence[str],
    cols: Sequence[str],
    backfill_leading: bool = False,
) -> DataFrame:
    """Per-entity forward fill: replace each null in ``cols`` with the
    most recent non-null value in ``order_cols`` order (the sparse→
    dense gap-filling step sensor/market series need before windowed
    math; pandas ``ffill`` at DataFrame scale).

    ``last(ignorenulls) OVER (... ROWS UNBOUNDED PRECEDING)`` evaluates
    partition-locally after the one hash-shuffle on ``entity_col`` —
    the same single-exchange cost envelope as every window op in this
    module. Leading nulls (no prior observation) stay null unless
    ``backfill_leading``, which adds the mirrored first-following
    window (a second sort, no second shuffle — same partitioning).
    """
    w_back = _w(entity_col, order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = df.withColumns(
        {c: F.last(c, ignorenulls=True).over(w_back) for c in cols}
    )
    if backfill_leading:
        w_fwd = (
            Window.partitionBy(entity_col)
            .orderBy(*[F.col(c).desc() for c in order_cols])
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = out.withColumns(
            {
                c: F.coalesce(
                    F.col(c), F.last(c, ignorenulls=True).over(w_fwd)
                )
                for c in cols
            }
        )
    return out


def with_rolling_median(
    df: DataFrame,
    entity_col: str,
    order_cols: Sequence[str],
    value_col: str,
    window: int = 5,
    out_col: str = "rolling_median",
) -> DataFrame:
    """Rolling exact median over the trailing ``window`` rows per
    entity — the robust-smoothing twin of :func:`with_sma` (a median
    ignores the spike outliers that drag a mean; standard for sensor
    despiking and tick cleaning). Exact ``percentile`` with continuous
    interpolation evaluates partition-locally inside the one
    entity-keyed exchange; per-row cost is O(window log window) on a
    bounded frame, so no state concern at scale.
    """
    w = _w(entity_col, order_cols).rowsBetween(-(window - 1), 0)
    return df.withColumn(
        out_col, F.expr(f"percentile({value_col}, 0.5)").over(w)
    )

"""Slowly-changing-dimension maintenance (type 2).

The reference maintains its dimension-ish tables by full overwrite
(``loading.py:110-127`` rewrites the processed table every run), which
destroys history. A warehouse at scale needs the standard SCD2 shape
instead: every attribute change closes the open version row
(``effective_to`` stamped, ``is_current`` flipped) and opens a new one,
so point-in-time joins (`asof_join` on ``effective_from``) reconstruct
any past state.

Design notes (100 TB posture):

- The merge is ONE shuffle on the natural key: current rows and the
  update batch are unioned and the version chain is rebuilt with two
  window passes over the same partitioning (Catalyst reuses the
  exchange; the second window adds at most a sort, no new shuffle).
- Closed history rows are never touched. A production layout would
  partition the dimension by ``is_current`` (or bucket by key) so the
  rewrite only rewrites the open partition — see
  ``sources/bucketing.py`` for the bucketed variant of that layout.
- Replay-idempotent: consecutive versions with identical tracked
  attributes are compressed away (null-safe comparison), so re-applying
  the same update batch is a no-op — same guarantee the streaming
  ``foreach_batch_upsert`` gives the fact path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_snapshot(
    df: DataFrame,
    keys: Sequence[str],
    tracked: Sequence[str],
    as_of: Column,
    from_col: str = "effective_from",
    to_col: str = "effective_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Bootstrap an SCD2 dimension from a plain snapshot: every row
    becomes the open version, effective since ``as_of``."""
    return df.select(
        *keys,
        *tracked,
        as_of.cast("timestamp").alias(from_col),
        F.lit(None).cast("timestamp").alias(to_col),
        F.lit(True).alias(current_col),
    )


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    tracked: Sequence[str],
    ts_col: str = "change_ts",
    from_col: str = "effective_from",
    to_col: str = "effective_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Apply an update batch to an SCD2 dimension.

    ``dim`` carries ``keys + tracked + from/to/current`` columns;
    ``updates`` carries ``keys + tracked + ts_col``. For every key the
    open version row and the batch's updates are merged into a version
    chain ordered by timestamp; runs of identical tracked attributes
    (null-safe) collapse to their first row, every non-final version is
    closed with the successor's timestamp, and the final version stays
    open. Closed history passes through untouched.

    A batch may contain several updates for one key — they chain in
    timestamp order in a single pass (no per-update loop). Updates
    timestamped at or before the open row's ``effective_from`` are
    stale (their effect is already recorded, or they would rewrite
    closed history) and are dropped — which is what makes re-applying
    an already-applied batch a no-op.
    """
    keys = list(keys)
    tracked = list(tracked)
    out_cols = [*keys, *tracked, from_col, to_col, current_col]

    history = dim.filter(~F.col(current_col)).select(*out_cols)
    open_rows = dim.filter(F.col(current_col)).select(
        *keys, *tracked, F.col(from_col)
    )
    batch = updates.select(
        *keys, *tracked, F.col(ts_col).cast("timestamp").alias(from_col)
    )

    tagged = open_rows.withColumn("__side", F.lit(0)).unionByName(
        batch.withColumn("__side", F.lit(1))
    )
    # Stale-update gate: one unordered window over the same key
    # partitioning (no extra exchange) finds the open version's start;
    # update rows at or before it are dropped. Keys with no open row
    # (first sight) keep all their updates.
    wk = Window.partitionBy(*keys).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    merged = (
        tagged.withColumn(
            "__open_from",
            F.max(
                F.when(F.col("__side") == 0, F.col(from_col))
            ).over(wk),
        )
        .filter(
            (F.col("__side") == 0)
            | F.col("__open_from").isNull()
            | (F.col(from_col) > F.col("__open_from"))
        )
        .drop("__side", "__open_from")
    )
    # Secondary ordering by the tracked-attribute tuple makes the chain
    # deterministic when a batch carries several updates for one key at
    # the SAME timestamp: without it lag/lead tie order is whatever the
    # shuffle delivered, and two runs could disagree on which version
    # "wins" the instant. With it the attribute-tuple-greatest update of
    # an instant deterministically becomes the surviving version (the
    # earlier ties become zero-duration versions closed at their own
    # timestamp), on every run and any partitioning.
    w = Window.partitionBy(*keys).orderBy(
        F.col(from_col), F.struct(*[F.col(c) for c in tracked])
    )
    prev = F.lag(F.struct(*[F.col(c) for c in tracked])).over(w)
    cur = F.struct(*[F.col(c) for c in tracked])
    # Keep the first version of each run of identical attributes
    # (null-safe struct compare; lag NULL marks the chain head).
    chain = merged.withColumn(
        "__keep", prev.isNull() | ~cur.eqNullSafe(prev)
    ).filter(F.col("__keep")).drop("__keep")
    # Same partitioning → no second exchange; lead() closes each
    # non-final version with its successor's start.
    rebuilt = (
        chain.withColumn(to_col, F.lead(from_col).over(w))
        .withColumn(current_col, F.col(to_col).isNull())
        .select(*out_cols)
    )
    return history.unionByName(rebuilt)


def scd2_point_in_time(
    dim: DataFrame,
    at: Column,
    from_col: str = "effective_from",
    to_col: str = "effective_to",
) -> DataFrame:
    """The dimension as of timestamp ``at``: rows whose validity
    interval covers it (open rows have null ``effective_to``).
    A plain filter — partition pruning applies when the dimension is
    stored partitioned on ``is_current``/date."""
    return dim.filter(
        (F.col(from_col) <= at)
        & (F.col(to_col).isNull() | (F.col(to_col) > at))
    )

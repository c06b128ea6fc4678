"""Incremental aggregate maintenance (materialized-view pattern).

The reference reprocesses its FULL history every incremental run
(``extraction.py:103-116`` rewrites the whole CSV; SURVEY.md §4.2.5) —
O(history) work to add ≤20 rows. The scalable shape is the opposite:
keep per-key PARTIAL aggregate state (counts, sums, min/max — the
mergeable semigroup), fold each new batch into it with one
state-sized join, and derive the presentation metrics (averages,
ratios) from the state at read time. Cost per batch is
O(batch + touched keys), independent of history length.

Only decomposable aggregates can be maintained this way — exactly the
ones Spark itself computes with map-side partials (SURVEY §4.3). A
non-decomposable metric (exact median) needs its own sketch or a
recompute; refusing it here is deliberate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: State columns maintained per (keys, measure): all mergeable.
_STATE_SUFFIXES = ("count", "sum", "min", "max")


def aggregate_state(
    batch: DataFrame, keys: Sequence[str], measures: Sequence[str]
) -> DataFrame:
    """Per-key partial-aggregate state of one batch: count, sum, min,
    max for every measure (count is per-measure — nulls don't count)."""
    aggs = []
    for m in measures:
        aggs += [
            F.count(m).alias(f"{m}__count"),
            F.sum(m).alias(f"{m}__sum"),
            F.min(m).alias(f"{m}__min"),
            F.max(m).alias(f"{m}__max"),
        ]
    return batch.groupBy(*keys).agg(*aggs)


def merge_aggregate_state(
    state: DataFrame | None,
    batch: DataFrame,
    keys: Sequence[str],
    measures: Sequence[str],
) -> DataFrame:
    """Fold a new batch into existing state (``None`` state = first
    batch). One outer join on the key — never touches historical raw
    rows. Associative and commutative: any batch order, any batching,
    same state."""
    delta = aggregate_state(batch, keys, measures)
    if state is None:
        return delta
    s = state.alias("s")
    d = delta.alias("d")
    cond = [F.col(f"s.{k}").eqNullSafe(F.col(f"d.{k}")) for k in keys]
    merged = s.join(d, cond, "full_outer")
    out_cols = [
        F.coalesce(F.col(f"s.{k}"), F.col(f"d.{k}")).alias(k) for k in keys
    ]
    for m in measures:
        for suf, combine in (
            ("count", lambda a, b: a + b),
            ("sum", lambda a, b: a + b),
            ("min", F.least),
            ("max", F.greatest),
        ):
            c = f"{m}__{suf}"
            a = F.coalesce(F.col(f"s.{c}"), F.lit(None))
            b = F.coalesce(F.col(f"d.{c}"), F.lit(None))
            out_cols.append(
                F.when(F.col(f"s.{c}").isNull(), F.col(f"d.{c}"))
                .when(F.col(f"d.{c}").isNull(), F.col(f"s.{c}"))
                .otherwise(combine(F.col(f"s.{c}"), F.col(f"d.{c}")))
                .alias(c)
            )
    return merged.select(*out_cols)


def finalize_metrics(
    state: DataFrame, keys: Sequence[str], measures: Sequence[str]
) -> DataFrame:
    """Presentation view over the state: derive avg from sum/count
    alongside the mergeable metrics."""
    cols = list(keys)
    for m in measures:
        cols += [
            F.col(f"{m}__count").alias(f"{m}_count"),
            F.col(f"{m}__sum").alias(f"{m}_sum"),
            (F.col(f"{m}__sum") / F.col(f"{m}__count")).alias(f"{m}_avg"),
            F.col(f"{m}__min").alias(f"{m}_min"),
            F.col(f"{m}__max").alias(f"{m}_max"),
        ]
    return state.select(*cols)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Row-level diff between two snapshots of a keyed table: one full
    outer join on the key, each row classified ``added`` / ``removed``
    / ``changed`` / ``unchanged`` (changed = any compare column
    differs, null-safely). This is the load-audit primitive behind
    CDC validation, SCD backfills, and "what did this rerun change" —
    one key-partitioned shuffle each side, no collect. Returns
    ``(*keys, change_type)``; callers aggregate or filter."""
    o = old.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(True).alias("__in_new"),
    )
    j = o.join(n, keys, "full_outer")
    same = None
    for c in compare_cols:
        eq = F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
        same = eq if same is None else (same & eq)
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(*keys, change.alias("change_type"))

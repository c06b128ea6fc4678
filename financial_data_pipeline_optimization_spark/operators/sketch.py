"""Mergeable sketch pre-aggregation (Apache DataSketches HLL via Spark
built-ins).

Why this exists at 100 TB: an exact ``COUNT(DISTINCT user)`` over a
petabyte fact table shuffles every distinct value on every query. The
sketch pattern splits that into (1) a one-time (or per-partition,
incrementally maintained) *build* that reduces each partition to a
KB-sized binary sketch, and (2) interactive *rollups* that only union
sketches — re-aggregable to any coarser grouping without touching raw
data, the same contract as `operators.incremental` for algebraic aggs
but extended to the (non-algebraic) distinct count.

Everything is JVM-side built-ins (``hll_sketch_agg`` / ``hll_union_agg``
/ ``hll_sketch_estimate`` — Spark 3.5+, DataSketches-compatible binary
format, so sketches interoperate with Druid/Hive/DuckDB DataSketches
builds). No UDFs, no driver-side state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_distinct_sketches(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lg_k: int = 12,
    sketch_col: str | None = None,
) -> DataFrame:
    """Reduce ``df`` to one HLL sketch of ``value_col`` per group — the
    partial-aggregate table a scheduled job would maintain per
    ingest partition (e.g. per day). Map-side partial aggregation
    applies: each task emits one sketch per local group, so shuffle
    volume is O(groups × 2^lg_k bytes), independent of row count.

    ``lg_k=12`` ⇒ ~2 KB sketches, ~1.6% relative standard error."""
    out = sketch_col or f"{value_col}_hll"
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias(out)
    )


def rollup_distinct_sketches(
    sketches: DataFrame,
    rollup_cols: Sequence[str],
    sketch_col: str,
) -> DataFrame:
    """Re-aggregate partial sketches to a coarser grouping by sketch
    union — the interactive-query half: touches only the sketch table,
    never the raw facts, and unions are associative so any rollup level
    is reachable from any finer one."""
    return sketches.groupBy(*rollup_cols).agg(
        F.hll_union_agg(sketch_col).alias(sketch_col)
    )


def estimate_distinct(
    df: DataFrame, sketch_col: str, out_col: str = "approx_distinct"
) -> DataFrame:
    """Decode sketches to cardinality estimates (bigint)."""
    return df.withColumn(
        out_col, F.hll_sketch_estimate(sketch_col)
    ).drop(sketch_col)

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


def misra_gries_candidates(
    df: DataFrame, value_col: str, k: int = 64
) -> DataFrame:
    """Heavy-hitter candidates via per-partition Misra–Gries summaries.

    Each partition keeps at most ``k`` counters (one Arrow-batched pass,
    state = a dict of size ``k``); per-partition survivors are merged by
    a normal keyed sum. The union of per-partition survivors is a
    SUPERSET of every value with global frequency > n/k: if a value is
    globally that frequent, by pigeonhole it exceeds n_p/k in at least
    one partition p, and Misra–Gries never evicts a value whose
    partition frequency exceeds n_p/k (each decrement step consumes k
    occurrences of distinct values). ``mg_count`` is a lower bound on
    the partition-local frequency, undercounting by at most n_p/k.

    100 TB posture: the full pass never shuffles raw values — each
    partition emits ≤ k rows, so the merge shuffles O(k × partitions)
    tiny rows. Follow with an exact recount restricted to the candidate
    set (a broadcast semi-join) when exact top-k counts are needed: two
    linear scans instead of a full-cardinality groupBy shuffle.
    """
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("value", StringType(), True),
            StructField("mg_count", LongType(), True),
        ]
    )

    def summarize(batches):
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            for v in pdf[value_col]:
                if v is None:
                    continue
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    # Decrement-all step: drop zeroed counters.
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        if counters:
            yield pd.DataFrame(
                {
                    "value": list(counters.keys()),
                    "mg_count": list(counters.values()),
                }
            )

    summaries = df.select(F.col(value_col).cast("string").alias(value_col))
    return (
        summaries.mapInPandas(summarize, out_schema)
        .groupBy("value")
        .agg(F.sum("mg_count").cast("long").alias("mg_count"))
    )


def histogram_counts(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    width: float,
) -> DataFrame:
    """Mergeable equi-width histogram: integer bucket counts per group.

    ``bucket = floor(value / width)`` — deterministic integer state, so
    partial histograms from different ingest partitions merge by plain
    addition (same contract as the HLL sketches above, but for rank
    queries). Map-side partial aggregation bounds shuffle volume at
    O(groups × occupied buckets), independent of row count.
    """
    return (
        df.withColumn(
            "bucket", F.floor(F.col(value_col) / F.lit(width)).cast("long")
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.count("*").cast("long").alias("bucket_count"))
    )


def histogram_quantile(
    hist: DataFrame,
    group_cols: Sequence[str],
    q: float,
    width: float,
    out_col: str = "est_quantile",
) -> DataFrame:
    """Estimate the q-quantile per group from bucket counts.

    Picks the first bucket where the cumulative count reaches
    ``ceil(q × n)`` and returns its midpoint — deterministic arithmetic
    on integer counts, so the estimate is bit-identical across engines
    and within ``width`` of the exact quantile (the exact value lies in
    the selected bucket or an adjacent one for even-n midpoint
    interpolation). The window runs over the bucket table (≤ occupied
    buckets per group), never the raw data.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy("bucket")
    cum = hist.withColumn("cum", F.sum("bucket_count").over(w)).withColumn(
        "n", F.sum("bucket_count").over(Window.partitionBy(*group_cols))
    )
    target = F.ceil(F.lit(q) * F.col("n"))
    hit = cum.filter(F.col("cum") >= target)
    first = (
        hit.groupBy(*group_cols)
        .agg(F.min("bucket").alias("bucket"))
        .withColumn(
            out_col,
            (F.col("bucket") * F.lit(width) + F.lit(width / 2.0)).cast(
                "double"
            ),
        )
        .drop("bucket")
    )
    return first


def cm_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    hex_digits: int = 3,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan, J.Alg 2005) built
    RELATIONALLY: ``depth`` independent hash rows × 16^hex_digits
    buckets, where bucket ``i`` of a key is an md5 hex prefix of
    ``'{i}:{key}'`` (md5 so a DuckDB oracle reproduces every bucket
    bit-for-bit). Returns the MERGEABLE sketch table
    ``(d, bucket, c)`` — at most depth × width rows regardless of
    input size; partial aggregation does the heavy lifting map-side,
    and sketches of different partitions/days merge by keyed sum.
    """
    key = F.col(key_col).cast("string")
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("d"),
                        F.substring(
                            F.md5(F.concat(F.lit(f"{i}:"), key)),
                            1,
                            hex_digits,
                        ).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("x")
    ).select("x.d", "x.bucket")
    return rows.groupBy("d", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )


def cm_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    hex_digits: int = 3,
) -> DataFrame:
    """Frequency estimates from a :func:`cm_sketch` table: for each
    query key, min over the depth rows of its bucket counters — the
    CM guarantee is ``estimate >= true count`` always (no hash can
    undercount) with overestimate bounded by N/width in expectation.
    The join touches ``depth`` sketch rows per key; the sketch side
    is bounded so it broadcasts."""
    key = F.col(key_col).cast("string")
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("d"),
                        F.substring(
                            F.md5(F.concat(F.lit(f"{i}:"), key)),
                            1,
                            hex_digits,
                        ).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("x"),
    ).select(key_col, "x.d", "x.bucket")
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cm_estimate"))
    )

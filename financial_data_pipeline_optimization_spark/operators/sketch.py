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


def _bloom_bucket(key_col: str, i: int, hex_digits: int):
    """Hex-prefix bucket of hash row ``i`` for a key — md5-based so a
    DuckDB oracle rebuilds every bucket bit-for-bit (same convention
    as :func:`cm_sketch`)."""
    return F.substring(
        F.md5(F.concat(F.lit(f"{i}:"), F.col(key_col).cast("string"))),
        1,
        hex_digits,
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    hex_digits: int = 3,
) -> DataFrame:
    """Partitioned Bloom filter (Bloom, CACM 1970) built RELATIONALLY:
    ``depth`` independent hash rows x ``16^hex_digits`` buckets each; a
    key sets one bucket per row. Returns the MERGEABLE occupied-bucket
    table ``(d, bucket)`` — at most ``depth * 16^hex_digits`` rows no
    matter the input size (the distinct does its heavy lifting
    map-side), and filters over different partitions/days merge by
    plain ``UNION``/distinct. Membership contract: a key that was
    inserted ALWAYS tests present (no false negatives); an absent key
    tests present with probability ``(1 - e^(-n/m))^depth``.

    Why this exists at 100 TB: Spark's runtime bloom-filter join
    pruning (``spark.sql.optimizer.runtime.bloomFilter.enabled``) is
    per-query and ephemeral; this table is the PERSISTABLE variant — a
    nightly job can maintain the bucket set for a huge dimension's
    keys and every downstream query prunes its fact-side scan with
    :func:`bloom_prefilter` before paying the join shuffle.
    """
    rows = df.where(F.col(key_col).isNotNull()).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("d"),
                        _bloom_bucket(key_col, i, hex_digits).alias(
                            "bucket"
                        ),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("x")
    ).select("x.d", "x.bucket")
    return rows.distinct()


def bloom_probe(
    bloom: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    hex_digits: int = 3,
) -> DataFrame:
    """Membership test against a :func:`bloom_build` table: a probe is
    ``maybe_present`` iff ALL ``depth`` of its buckets are occupied.
    Returns ``probes`` with a ``maybe_present`` boolean appended. The
    bloom side is bounded by construction so it broadcasts; the probe
    keys are tested via a keyed count — relational (oracle-checkable)
    rather than bit-packed, so use :func:`bloom_prefilter` on the
    hot fact-table path instead."""
    keys = probes.select(key_col).where(
        F.col(key_col).isNotNull()
    ).distinct()
    exploded = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("d"),
                        _bloom_bucket(key_col, i, hex_digits).alias(
                            "bucket"
                        ),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("x"),
    ).select(key_col, "x.d", "x.bucket")
    flags = (
        exploded.join(
            F.broadcast(bloom.withColumn("__hit", F.lit(1))),
            ["d", "bucket"],
            "left",
        )
        .groupBy(key_col)
        .agg(
            (F.count("__hit") == F.lit(depth)).alias("maybe_present")
        )
    )
    return probes.join(flags, [key_col], "left").withColumn(
        "maybe_present", F.coalesce("maybe_present", F.lit(False))
    )


def bloom_prefilter(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    depth: int = 4,
    hex_digits: int = 3,
) -> DataFrame:
    """Prune a huge fact table against a :func:`bloom_build` table with
    PURE COLUMN EXPRESSIONS — no join, no shuffle, no Python in the
    row path. The bounded bucket table (``<= depth * 16^hex_digits``
    rows by construction) is collected once and packed driver-side
    into 32-bit words; each fact row then evaluates ``depth`` bit
    tests (md5 -> conv -> element_at -> bitwiseAND) inside whole-stage
    codegen. Rows with a NULL key are dropped (same as the inner join
    this guards). No false negatives: the filtered frame joined to the
    dimension equals the unfiltered join exactly; false positives just
    ride along to the join that kills them.

    This is the 100 TB shape: the fact side's scan->filter stays
    narrow, and only the (tiny) surviving fraction pays the join
    shuffle. ``hex_digits`` is capped at 5 so the driver-side collect
    stays bounded (``depth * 2^20`` worst case)."""
    if not 1 <= hex_digits <= 5:
        raise ValueError(
            f"hex_digits must be in [1, 5], got {hex_digits}"
        )
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    n_bits = 16**hex_digits
    n_words = (n_bits + 31) // 32
    words = [[0] * n_words for _ in range(depth)]
    for row in bloom.select("d", "bucket").collect():  # bounded above
        idx = int(row["bucket"], 16)
        words[row["d"]][idx // 32] |= 1 << (idx % 32)

    def _test(i: int):
        idx = F.conv(
            _bloom_bucket(key_col, i, hex_digits), 16, 10
        ).cast("long")
        word = F.element_at(
            F.lit(words[i]), (F.shiftright(idx, 5) + 1).cast("int")
        )
        # shiftleft takes a literal shift amount, so dynamic bit
        # masks come from a 32-entry literal lookup instead
        mask = F.element_at(
            F.lit([1 << b for b in range(32)]),
            (idx % 32).cast("int") + 1,
        )
        return word.bitwiseAND(mask) != F.lit(0)

    cond = F.col(key_col).isNotNull()
    for i in range(depth):
        cond = cond & _test(i)
    return df.where(cond)

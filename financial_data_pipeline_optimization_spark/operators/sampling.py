"""Deterministic sampling / splitting (training-data pipeline ops).

``df.sample()`` is seed-dependent on partition layout, so two runs (or
the same run after a repartition) disagree — useless for reproducible
corpus construction. These operators derive membership from a HASH OF
THE ROW KEY: stable under any partitioning, any cluster size, any
rerun, and the split of a given key never changes when the corpus
grows (the property that keeps train/test contamination impossible
across dataset versions).

Two hash paths:

- ``xxhash64`` — JVM-codegen'd, the fast path for production;
- ``md5`` hex-prefix — bit-identical in every engine (the DuckDB
  oracle replays it verbatim), used by the registered queries. A
  fraction f maps to a hex-string threshold: md5 hex chars are
  uniform, so ``substr(md5(key), 1, 8) < hex(f·16^8)`` keeps an
  f-fraction with 1/16^8 granularity; lexicographic compare on
  lowercase hex is identical in Java and RE2 collations (plain ASCII).

All are narrow per-row filters — no shuffle, no sort, no sample()
nondeterminism.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HEX_DIGITS = 8


def hex_threshold(fraction: float, digits: int = _HEX_DIGITS) -> str:
    """Lowercase hex string t such that a uniform ``digits``-char hex
    prefix is < t with probability ``fraction``.

    CAUTION: ``fraction=1.0`` renders one digit WIDER ('100000000'),
    which lexicographically compares BELOW any prefix not starting
    with '0' — callers must special-case keep-everything (see
    :func:`hex_threshold_str`, or the short-circuit in
    :func:`hash_sample`)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return format(int(round(fraction * 16**digits)), f"0{digits}x")


def hex_threshold_str(fraction: float, digits: int = _HEX_DIGITS) -> str:
    """Like :func:`hex_threshold` but safe at the keep-everything
    boundary: returns ``'g'`` (lexicographically above every hex
    prefix) for ``fraction >= 1.0``."""
    if fraction >= 1.0:
        return "g"
    return hex_threshold(fraction, digits)


def _key_hash_hex(key_cols: Sequence[str], seed: str = "") -> Column:
    parts = [F.col(c).cast("string") for c in key_cols]
    if seed:
        parts = [F.lit(seed), *parts]
    return F.substring(F.md5(F.concat_ws("\x1f", *parts)), 1, _HEX_DIGITS)


def hash_sample(
    df: DataFrame,
    key_cols: Sequence[str],
    fraction: float,
    seed: str = "",
    method: str = "md5",
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows, selected by key hash.

    ``seed`` namespaces the hash so independent samples of the same
    corpus don't select the same keys. ``method='xxhash64'`` is the
    faster JVM path; ``'md5'`` is engine-portable (oracle-checkable).
    """
    if fraction >= 1.0:
        # boundary: hex_threshold(1.0) is 16^digits, which renders one
        # hex digit WIDER and lexicographically below most prefixes —
        # short-circuit instead of comparing
        return df
    if fraction <= 0.0:
        return df.filter(F.lit(False))
    if method == "md5":
        return df.filter(
            _key_hash_hex(key_cols, seed) < hex_threshold(fraction)
        )
    if method == "xxhash64":
        mod = 1 << 30
        cols = [F.col(c) for c in key_cols]
        if seed:
            cols = [F.lit(seed), *cols]
        bucket = F.pmod(F.xxhash64(*cols), F.lit(mod))
        return df.filter(bucket < int(round(fraction * mod)))
    raise ValueError(f"unknown hash_sample method: {method!r}")


def with_split(
    df: DataFrame,
    key_cols: Sequence[str],
    weights: Mapping[str, float],
    seed: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split (e.g. train/val/test) by key
    hash. Weights must sum to 1; boundaries are cumulative hex
    thresholds, so a key's split never changes as the corpus grows."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    h = _key_hash_hex(key_cols, seed)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        cond = h < hex_threshold_str(cum)
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    expr = (
        F.lit(names[-1])
        if expr is None
        else expr.otherwise(F.lit(names[-1]))
    )
    return df.withColumn(out_col, expr)


def stratified_topn(
    df: DataFrame,
    strata_cols: Sequence[str],
    order_cols: Sequence[str],
    n: int,
    descending: bool = True,
) -> DataFrame:
    """Exactly ``n`` rows per stratum, chosen by a deterministic
    ordering (ties must be broken by a unique column in
    ``order_cols``). One shuffle on the strata key — the exact-quota
    alternative to ``sampleBy``'s probabilistic strata."""
    ordering = [
        F.col(c).desc() if descending else F.col(c).asc()
        for c in order_cols
    ]
    w = Window.partitionBy(*strata_cols).orderBy(*ordering)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def weighted_sample(
    df: DataFrame,
    key_cols: Sequence[str],
    weight: Column,
    seed: str = "",
) -> DataFrame:
    """Bernoulli sample where each row's keep-probability is its
    ``weight`` (clamped to [0, 1]) — quality-proportional corpus
    downsampling (keep high-quality documents with high probability,
    boilerplate with low), deterministic per key like every sampler
    here.

    A row is kept iff its uniform md5 hex prefix is below the hex
    threshold ``floor(weight * 16^8)`` — the same comparison the
    DuckDB oracle replays verbatim, so the exact kept-set is
    engine-checkable. Rows with ``weight >= 1.0`` are kept
    unconditionally (the hex threshold saturates at ``16^8 - 1``, which
    would wrongly drop the 1-in-16^8 keys hashing to ``ffffffff``).
    Narrow per-row filter; no shuffle.
    """
    w = F.least(F.greatest(weight, F.lit(0.0)), F.lit(1.0))
    bound = F.least(
        F.floor(w * F.lit(float(16**_HEX_DIGITS))),
        F.lit(16**_HEX_DIGITS - 1),
    ).cast("long")
    thresh = F.lower(F.lpad(F.hex(bound), _HEX_DIGITS, "0"))
    return df.filter(
        (weight >= F.lit(1.0)) | (_key_hash_hex(key_cols, seed) < thresh)
    )


def hash_topn(
    df: DataFrame,
    key_cols: Sequence[str],
    n: int,
    seed: str = "",
) -> DataFrame:
    """Deterministic pseudo-random exactly-``n`` subset: order by the
    engine-portable key hash (ties broken by the key itself) and take
    ``n`` — fixed-size eval-set carving that is stable under corpus
    growth of UNSELECTED keys and any partitioning.

    Plans as ``TakeOrderedAndProject``: each partition keeps its local
    top-n, the driver merges partition heads — no global sort, no full
    shuffle; scale cost is O(partitions · n).
    """
    h = _key_hash_hex(key_cols, seed)
    return (
        df.withColumn("__h", h)
        .orderBy("__h", *key_cols)
        .limit(n)
        .drop("__h")
    )


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    key_cols: Sequence[str],
    default_fraction: float = 1.0,
    seed: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling — corpus rebalancing (e.g.
    downweight an over-represented language) with an exact,
    reproducible kept-set, unlike ``df.sampleBy``'s seed-and-layout-
    dependent draw.

    Each stratum value gets its own hash threshold; unlisted strata
    keep ``default_fraction``. Same md5 hex-prefix uniform as
    :func:`hash_sample`, so the DuckDB oracle replays the exact CASE.
    Narrow per-row filter; no shuffle.
    """
    h = _key_hash_hex(key_cols, seed)
    thresh = None
    for value, frac in sorted(fractions.items()):
        cond = F.col(strata_col) == value
        t = F.lit(hex_threshold_str(frac))
        thresh = (
            F.when(cond, t) if thresh is None else thresh.when(cond, t)
        )
    thresh = (
        F.lit(hex_threshold_str(default_fraction))
        if thresh is None
        else thresh.otherwise(F.lit(hex_threshold_str(default_fraction)))
    )
    return df.filter(h < thresh)

"""Data-quality checks (the engine-side replacement for the reference's
guard-and-fail sites).

The reference's only correctness mechanism is 14 runtime
``raise AirflowFailException`` guards (SURVEY.md §5.1) — fetch failed,
file missing, input empty. A warehouse at scale needs *data*-level
checks too: key uniqueness, referential integrity, null/distinct
profiles. All are single-pass aggregations or anti joins; run them as
assertions between pipeline stages or as monitoring queries.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_profile(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Per-column profile in one scan: row count, null count, exact
    distinct count. Returns long-format
    ``(column_name, n_rows, n_nulls, n_distinct)`` — one row per
    column, computed in a single aggregate (multiple DISTINCT
    aggregates expand the plan; for profiling-only use at extreme
    widths, swap ``approx_count_distinct``)."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            F.countDistinct(c).alias(f"__nd_{c}"),
        ]
    row = df.agg(*aggs)
    entries = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col(f"__nn_{c}")).alias("n_nulls"),
            F.col(f"__nd_{c}").alias("n_distinct"),
        )
        for c in columns
    ]
    return row.select(F.inline(F.array(*entries)))


def duplicate_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Key tuples violating uniqueness, with their multiplicities.
    Empty result = the key is unique. One shuffle on the key."""
    return (
        df.groupBy(*keys)
        .agg(F.count("*").alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def referential_orphans(
    child: DataFrame,
    parent: DataFrame,
    fk: Sequence[str] | str,
    pk: Sequence[str] | str,
) -> DataFrame:
    """Child rows whose foreign key has no parent — a left-anti join
    (the same plan shape as the reference's NOT-EXISTS merge,
    ``loading.py:166-168``, pointed at integrity instead of dedup)."""
    fks = [fk] if isinstance(fk, str) else list(fk)
    pks = [pk] if isinstance(pk, str) else list(pk)
    cond = [
        child[f].eqNullSafe(parent[p]) for f, p in zip(fks, pks, strict=True)
    ]
    return child.join(parent, cond, "left_anti")


def assert_unique(df: DataFrame, keys: Sequence[str]) -> None:
    """Raise if ``keys`` is not a unique key (fail-fast pipeline guard)."""
    dupes = duplicate_keys(df, keys).limit(5).collect()
    if dupes:
        raise ValueError(
            f"uniqueness violated for key {list(keys)}; "
            f"first offenders: {[tuple(r)[:-1] for r in dupes]}"
        )


def observed_quality(
    df: DataFrame,
    name: str = "quality",
    *,
    not_null: Sequence[str] = (),
    non_negative: Sequence[str] = (),
):
    """Attach ZERO-COST data-quality metrics to a DataFrame via Spark's
    ``Observation`` API: row count, per-column null counts, per-column
    negative counts — accumulated DURING whatever action the caller
    runs next, with no second scan. This is the scale-correct form of
    the reference's post-hoc guard queries: at 100 TB a separate
    ``count()``/``filter().count()`` validation pass re-reads the
    input, while observed metrics ride the write for free.

    Returns ``(df_with_observation, observation)``; read
    ``observation.get`` AFTER an action. Metrics keys:
    ``n_rows``, ``nulls_<col>``, ``neg_<col>``.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in not_null:
        metrics.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(
                f"nulls_{c}"
            )
        )
    for c in non_negative:
        metrics.append(
            F.sum(F.when(F.col(c) < 0, 1).otherwise(0)).alias(f"neg_{c}")
        )
    return df.observe(obs, *metrics), obs


def expectations_report(
    df: DataFrame,
    rules: Sequence[tuple[str, "F.Column"]],
) -> DataFrame:
    """Declarative expectation suite (the dbt-test / Great-Expectations
    shape): each rule is ``(name, boolean Column)``; a row VIOLATES a
    rule when the predicate is false or NULL (three-valued logic made
    strict — an unknown is a failure, never a silent pass).

    All rules evaluate in ONE aggregate pass over the table — a
    100-rule suite still costs a single scan with map-side partial
    aggregation, where one-query-per-rule tooling scans the table once
    per rule. Returns long-format ``(rule, n_rows, n_violations,
    passed)``, one row per rule in input order. An EMPTY input reports
    ``n_violations = 0`` / ``passed = true`` explicitly (``sum`` over
    zero rows is NULL; a gate consuming ``passed`` must never see
    NULL and misread it as failure or drop the row).
    """
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.coalesce(
            F.sum((~F.coalesce(cond, F.lit(False))).cast("long")),
            F.lit(0),
        ).alias(f"__v_{i}")
        for i, (_, cond) in enumerate(rules)
    ]
    row = df.agg(*aggs)
    entries = [
        F.struct(
            F.lit(name).alias("rule"),
            F.col("__n").alias("n_rows"),
            F.col(f"__v_{i}").alias("n_violations"),
            (F.col(f"__v_{i}") == 0).alias("passed"),
        )
        for i, (name, _) in enumerate(rules)
    ]
    return row.select(F.inline(F.array(*entries)))

"""Scalar-function surface (SURVEY.md §2.4) plus engine additions.

The reference's entire scalar surface is calendar derivation F1-F5
(``transformation.py:70-74``), a dict lookup F6 (``extraction.py:85-94``,
handled as a broadcast join in ``operators.joins``), synthetic ids F7
(``transformation.py:92``) and date literals F8. Everything here is a
built-in-``F`` composition — JVM-side, whole-stage-codegen'd, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def weekday_name(col: Column | str) -> Column:
    """F5: full weekday name, ``date_format(c, 'EEEE')``
    (``transformation.py:74``). Locale-stable under the engine's UTC
    session; DuckDB oracle equivalent is ``dayname()`` / ``strftime('%A')``."""
    return F.date_format(col, "EEEE")


def null_safe_key(*key_cols: Column | str, sep: str = "\x1f") -> Column:
    """Injective string encoding of a multi-column natural key.

    Each part is prefixed with a null-flag byte — ``\\x00`` for NULL,
    ``\\x01`` followed by the string cast otherwise — then joined with
    ``sep``. Plain ``concat_ws`` silently SKIPS null parts, so
    ``('a', NULL)`` and ``('a', '')`` would encode identically and two
    distinct natural keys would collide (a merge keyed on the hash
    would then drop a legitimate row). The flag byte keeps NULL,
    empty-string, and absent distinguishable. ``F.concat`` (not
    ``concat_ws``) is safe here because the ``when`` makes every part
    non-null.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in key_cols]
    parts: list[Column] = []
    for i, c in enumerate(cols):
        if i:
            parts.append(F.lit(sep))
        s = c.cast("string")
        parts.append(
            F.when(s.isNull(), F.lit("\x00")).otherwise(
                F.concat(F.lit("\x01"), s)
            )
        )
    return F.concat(*parts)


def stable_id(*key_cols: Column | str, sep: str = "\x1f") -> Column:
    """F7 replacement: deterministic 64-bit id from the natural key.

    The reference keys the warehouse on ``monotonically_increasing_id()``
    (``transformation.py:92``), which is partition-layout-dependent and
    unstable across runs — it breaks the NOT-EXISTS dedup it feeds
    (SURVEY.md §4.2.6). ``xxhash64`` over the :func:`null_safe_key`
    encoding is stable under any partitioning, shuffle, or rerun, and
    distinct natural keys differing only by NULL-vs-empty stay distinct.
    """
    return F.xxhash64(null_safe_key(*key_cols, sep=sep))


def portable_id(*key_cols: Column | str, sep: str = "\x1f") -> Column:
    """Like :func:`stable_id` but md5-based, so an ANSI-SQL oracle
    (DuckDB ``md5``) can reproduce it bit-for-bit for correctness
    checks — the oracle twin of each part is
    ``CASE WHEN c IS NULL THEN chr(0) ELSE chr(1) || CAST(c AS VARCHAR)
    END`` joined with ``chr(31)``. Hex string, 128-bit."""
    return F.md5(null_safe_key(*key_cols, sep=sep))


def calendar_columns(date_col: Column | str) -> dict[str, Column]:
    """F1-F5 as one column map (``transformation.py:70-74``): pass to
    ``df.withColumns`` for a single projection instead of the
    reference's chained ``withColumn`` loop (SURVEY.md §4.1)."""
    c = F.col(date_col) if isinstance(date_col, str) else date_col
    return {
        "Year": F.year(c),
        "Month": F.month(c),
        "Day": F.dayofmonth(c),
        "Quarter": F.quarter(c),
        "Weekday": weekday_name(c),
    }


def explode_nonempty(col: Column | str) -> Column:
    """``explode`` for array expressions that are NON-EMPTY BY
    CONSTRUCTION (``tokens()`` ≥ ``['']``, ``with_shingles`` ≥ 1,
    ``transform(sequence(1, greatest(.., 1)))``, …).

    Implemented as ``explode_outer``, because for plain ``explode``
    Catalyst infers a ``size(<array expr>) > 0`` filter and pushes it
    below the Generate — substituting the FULL array expression into
    the filter, which then re-evaluates the whole (often
    HOF-interpreted) array construction a second time per row, and,
    once pushed through an Exchange, on the PRE-shuffle partitioning
    (a single-file corpus = one core doing all the work twice:
    measured 10 s vs 0.5 s on the sf0.1 shingle table). For a
    non-empty array the inferred filter can never drop a row, so
    ``explode_outer`` — which infers nothing — is semantically
    identical and skips both re-evaluations.

    Precondition: the array is also non-NULL for rows that must
    survive — on a NULL array ``explode`` drops the row while
    ``explode_outer`` emits one null row. Do NOT use over arrays that
    can legitimately be empty (e.g. ``F.filter(...)`` results).
    """
    return F.explode_outer(col)

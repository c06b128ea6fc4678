"""Cleaning operators: rename / cast / fillna / projection (SURVEY.md §2.3, §2.9).

Covers P1-P8 and N1. The reference does these as a chain of per-column
``withColumn`` calls plus a dtype-dispatched fillna loop
(``transformation.py:57-94``); the engine expresses each as a single
projection so Catalyst sees one ``Project`` node.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SNAKE_TRANS = str.maketrans({" ": "_", "-": "_", ".": "_"})


def normalize_column_names(df: DataFrame) -> DataFrame:
    """P3 generalized: normalize all column names to snake_case in one
    pass (the reference renames one column, ``withColumnRenamed("Stock
    Splits", "stock_splits")`` at ``transformation.py:58``)."""
    mapping = {c: c.strip().translate(_SNAKE_TRANS).lower() for c in df.columns}
    return df.withColumnsRenamed({c: n for c, n in mapping.items() if c != n})


def cast_columns(df: DataFrame, casts: Mapping[str, str]) -> DataFrame:
    """P4-P6: cast named columns to target types in a single projection
    (the reference chains six ``withColumn(cast)`` calls,
    ``transformation.py:59-66``)."""
    return df.withColumns({c: F.col(c).cast(t) for c, t in casts.items()})


def project(df: DataFrame, columns: Iterable[str | Column]) -> DataFrame:
    """P1/P2: explicit projection + reorder (``extraction.py:82``,
    ``transformation.py:93-94``)."""
    return df.select(*columns)


def fill_nulls(
    df: DataFrame,
    numeric: float = 0.0,
    integer: int = 0,
    string: str = "Unknown",
    date: str | None = None,
) -> DataFrame:
    """N1: type-dispatched null fill (``transformation.py:81-89``) as one
    schema-driven pass.

    The reference loops over ``df.dtypes`` filling double→0.0, int→0,
    string→'Unknown', date→'1970-01-01'. Spark's ``fillna`` silently
    ignores date columns given a string, so the reference's date branch
    is a no-op in practice (SURVEY.md §2.9); here date filling is done
    explicitly with ``coalesce`` when ``date`` is given.
    """
    fill_map: dict[str, float | int | str] = {}
    date_cols: list[str] = []
    for name, dtype in df.dtypes:
        if dtype in ("double", "float"):
            fill_map[name] = numeric
        elif dtype in ("int", "bigint", "smallint", "tinyint"):
            fill_map[name] = integer
        elif dtype == "string":
            fill_map[name] = string
        elif dtype == "date":
            date_cols.append(name)
    out = df.fillna(fill_map) if fill_map else df
    if date is not None and date_cols:
        out = out.withColumns(
            {c: F.coalesce(F.col(c), F.lit(date).cast("date")) for c in date_cols}
        )
    return out


def tag_lit(df: DataFrame, name: str, value) -> DataFrame:
    """P8: attach a constant lineage/tag column
    (``ticker_data['Ticker'] = ticker``, ``extraction.py:63``)."""
    return df.withColumn(name, F.lit(value))

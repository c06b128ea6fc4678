"""Temporal derivation operators (SURVEY.md §2.4 F1-F5, F8).

The reference derives Year/Month/Day/Quarter/Weekday from the date
column with five chained ``withColumn`` calls
(``transformation.py:69-78``); the engine emits them in one
``withColumns`` projection. All JVM built-ins — codegen'd, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from financial_data_pipeline_optimization_spark.functions import calendar_columns


def derive_calendar(
    df: DataFrame, date_col: str = "Date", lowercase: bool = False
) -> DataFrame:
    """Add Year / Month / Day / Quarter / Weekday derived from
    ``date_col`` (``transformation.py:70-74``). ``lowercase=True`` emits
    snake_case names for star-schema queries."""
    cols = calendar_columns(F.col(date_col).cast("date"))
    if lowercase:
        cols = {k.lower(): v for k, v in cols.items()}
    return df.withColumns(cols)

"""Explicit StructType registry — the engine's schema contract.

The reference infers CSV schemas and then defensively re-casts column
by column (``transformation.py:49,57-66``); per SURVEY.md §1.4 the
engine replaces that with one declared schema per table. Inference is
allowed only in the exploratory ``read_csv`` helper.

Two groups:

- ``FINANCE_*``: the reference pipeline's own data shapes
  (``extraction.py:82,94``; DDL at ``loading.py:47-64``).
- ``TESTDATA``: the driver's deterministic star schema + events /
  documents / embeddings (verified against
  ``/root/testdata/sf0.001/*.parquet``; FIXTURES.md §B).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Reference pipeline schemas (SURVEY.md §1)
# ---------------------------------------------------------------------------

#: Extractor output / transformer input (extraction.py:82 + Company at :94).
FINANCE_RAW_PRICES = T.StructType(
    [
        T.StructField("Date", T.DateType(), True),
        T.StructField("Open", T.DoubleType(), True),
        T.StructField("High", T.DoubleType(), True),
        T.StructField("Low", T.DoubleType(), True),
        T.StructField("Close", T.DoubleType(), True),
        T.StructField("Volume", T.LongType(), True),
        T.StructField("Dividends", T.DoubleType(), True),
        T.StructField("Stock Splits", T.DoubleType(), True),
        T.StructField("Ticker", T.StringType(), True),
        T.StructField("Company", T.StringType(), True),
    ]
)

#: Warehouse table (authoritative DDL loading.py:47-64). Engine keeps the
#: 16-column order of transformation.py:93-94.
FINANCE_WAREHOUSE = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("Date", T.DateType(), True),
        T.StructField("Year", T.IntegerType(), True),
        T.StructField("Month", T.IntegerType(), True),
        T.StructField("Day", T.IntegerType(), True),
        T.StructField("Quarter", T.IntegerType(), True),
        T.StructField("Weekday", T.StringType(), True),
        T.StructField("Ticker", T.StringType(), True),
        T.StructField("Company", T.StringType(), True),
        T.StructField("Open", T.DoubleType(), True),
        T.StructField("High", T.DoubleType(), True),
        T.StructField("Low", T.DoubleType(), True),
        T.StructField("Close", T.DoubleType(), True),
        T.StructField("Volume", T.LongType(), True),
        T.StructField("Dividends", T.DoubleType(), True),
        T.StructField("stock_splits", T.DoubleType(), True),
    ]
)

#: Ticker → company dimension (the dict at extraction.py:85-94, re-expressed
#: as a broadcastable dim table per SURVEY.md F6/J2).
FINANCE_COMPANY_DIM = T.StructType(
    [
        T.StructField("Ticker", T.StringType(), False),
        T.StructField("Company", T.StringType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Driver test tables (FIXTURES.md §B)
# ---------------------------------------------------------------------------

TESTDATA: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType(), True),
            T.StructField("r_name", T.StringType(), True),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType(), True),
            T.StructField("n_name", T.StringType(), True),
            T.StructField("n_regionkey", T.IntegerType(), True),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType(), True),
            T.StructField("c_name", T.StringType(), True),
            T.StructField("c_nationkey", T.IntegerType(), True),
            T.StructField("c_acctbal", T.DoubleType(), True),
            T.StructField("c_mktsegment", T.StringType(), True),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType(), True),
            T.StructField("s_name", T.StringType(), True),
            T.StructField("s_nationkey", T.IntegerType(), True),
            T.StructField("s_acctbal", T.DoubleType(), True),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType(), True),
            T.StructField("p_name", T.StringType(), True),
            T.StructField("p_brand", T.StringType(), True),
            T.StructField("p_type", T.StringType(), True),
            T.StructField("p_size", T.IntegerType(), True),
            T.StructField("p_retailprice", T.DoubleType(), True),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType(), True),
            T.StructField("o_custkey", T.LongType(), True),
            T.StructField("o_orderstatus", T.StringType(), True),
            T.StructField("o_totalprice", T.DoubleType(), True),
            T.StructField("o_orderdate", T.TimestampType(), True),
            T.StructField("o_orderpriority", T.StringType(), True),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType(), True),
            T.StructField("l_partkey", T.LongType(), True),
            T.StructField("l_suppkey", T.LongType(), True),
            T.StructField("l_linenumber", T.IntegerType(), True),
            T.StructField("l_quantity", T.DoubleType(), True),
            T.StructField("l_extendedprice", T.DoubleType(), True),
            T.StructField("l_discount", T.DoubleType(), True),
            T.StructField("l_tax", T.DoubleType(), True),
            T.StructField("l_returnflag", T.StringType(), True),
            T.StructField("l_linestatus", T.StringType(), True),
            T.StructField("l_shipdate", T.TimestampType(), True),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
            T.StructField("source", T.StringType(), True),
            T.StructField("n_chars", T.LongType(), True),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType(), True),
            T.StructField("embedding", T.ArrayType(T.FloatType()), True),
            T.StructField("label", T.IntegerType(), True),
        ]
    ),
}

#: Schema of the JSON ``events.props`` payload (observed ``{"k": <int>}``).
EVENT_PROPS = T.StructType([T.StructField("k", T.IntegerType(), True)])

#: Small dimensions that are always safe to broadcast in joins
#: (bounded cardinality regardless of scale factor).
BROADCASTABLE_DIMS = frozenset({"region", "nation"})

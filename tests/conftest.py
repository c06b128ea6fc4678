"""Shared fixtures: one SparkSession per test session, DuckDB oracle."""

from __future__ import annotations

import os
import sys
from pathlib import Path

import duckdb
import pytest

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

from financial_data_pipeline_optimization_spark import get_spark  # noqa: E402

TESTDATA_ROOT = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMOKE = f"{TESTDATA_ROOT}/sf0.001"
SF_CORRECTNESS = f"{TESTDATA_ROOT}/sf0.01"

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="fdpo-tests")
    yield spark


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the driver tables registered as views at
    sf0.01 — mirrors the driver's oracle setup (__spark_entry__ docs)."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_CORRECTNESS}/{t}.parquet')"
        )
    yield con
    con.close()

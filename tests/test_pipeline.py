"""Finance-pipeline parity tests (SURVEY.md §2-§3 semantics):
initial vs incremental modes, keep-latest dedup, merge idempotency,
warehouse schema."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from financial_data_pipeline_optimization_spark import plans, schemas


@pytest.fixture()
def warehouse_dir():
    d = tempfile.mkdtemp(prefix="warehouse_")
    shutil.rmtree(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_initial_load_schema_and_counts(spark, warehouse_dir):
    batch = plans.synthetic_prices(spark, days=30)
    plans.run_pipeline(batch, warehouse_dir, mode="initial")
    wh = spark.read.parquet(warehouse_dir)
    # 16 warehouse columns with the declared types (partitionBy(Year)
    # makes Year read back — still present, type preserved)
    got = {f.name: f.dataType.simpleString() for f in wh.schema.fields}
    want = {
        f.name: f.dataType.simpleString()
        for f in schemas.FINANCE_WAREHOUSE.fields
    }
    assert got == want
    assert wh.count() == 20 * 30
    # company enrichment joined, not mapped
    assert wh.filter(F.col("Company") == "Apple Inc.").count() == 30


def test_incremental_merge_is_idempotent(spark, warehouse_dir):
    initial = plans.synthetic_prices(spark, days=30)
    plans.run_pipeline(initial, warehouse_dir, mode="initial")
    n0 = spark.read.parquet(warehouse_dir).count()

    # a new day of data (day 30), plus a full overlap of day 29
    increment = plans.synthetic_prices(spark, days=31, batch_id=0).filter(
        F.col("Date")
        >= F.date_add(F.lit("2023-01-02").cast("date"), (29 // 5) * 7 + 29 % 5)
    )
    plans.run_pipeline(increment, warehouse_dir, mode="incremental")
    n1 = spark.read.parquet(warehouse_dir).count()
    assert n1 == n0 + 20  # only the genuinely-new day inserted

    # replaying the same increment inserts 0 rows (loading.py:159-169
    # rerun-safety, README.md:79)
    plans.run_pipeline(increment, warehouse_dir, mode="incremental")
    assert spark.read.parquet(warehouse_dir).count() == n1


def test_keep_latest_newest_batch_wins(spark):
    """D1 semantics: on (Ticker, Date) collision the new batch's row
    wins (extraction.py:104-105 appends new below old, keep='last')."""
    old = plans.synthetic_prices(spark, days=5, batch_id=0)
    new = plans.synthetic_prices(spark, days=5, batch_id=1)  # same keys
    merged = plans.extract_prices(new, history=old)
    assert merged.count() == new.count()
    # every surviving row carries batch-1 prices
    joined = merged.alias("m").join(
        new.alias("n"), on=["Ticker", "Date"]
    )
    assert (
        joined.filter(F.col("m.Close") != F.col("n.Close")).count() == 0
    )


def test_stable_ids_stable_across_runs(spark):
    """The engine's id fix (SURVEY §4.2.6): identical rows get identical
    ids across independent runs — monotonically_increasing_id does not."""
    a = plans.transform_prices(
        plans.extract_prices(plans.synthetic_prices(spark, days=3))
    )
    b = plans.transform_prices(
        plans.extract_prices(
            plans.synthetic_prices(spark, days=3).repartition(7)
        )
    )
    ids_a = {r.id for r in a.select("id").collect()}
    ids_b = {r.id for r in b.select("id").collect()}
    assert ids_a == ids_b


def test_unknown_ticker_company_null_then_filled(spark):
    """F6 .map semantics: unknown ticker → null company (NaN in pandas),
    then N1 fillna turns it into 'Unknown'."""
    batch = plans.synthetic_prices(spark, tickers=["ZZZZ"], days=2)
    curated = plans.transform_prices(plans.extract_prices(batch))
    assert (
        curated.filter(F.col("Company") == "Unknown").count() == 2
    )


def test_expectations_report_single_scan_and_null_strictness(spark):
    """All rules run in ONE aggregate pass (exactly one HashAggregate
    pair, no per-rule scan) and a NULL predicate counts as a
    violation, never a silent pass."""
    from financial_data_pipeline_optimization_spark.operators.checks import (
        expectations_report,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, -1.0)], "id long, v double"
    )
    rows = {
        r.rule: (r.n_violations, r.passed)
        for r in expectations_report(
            df,
            [
                ("v_positive", F.col("v") > 0),  # NULL row must violate
                ("id_positive", F.col("id") > 0),
            ],
        ).collect()
    }
    assert rows["v_positive"] == (2, False)  # NULL and -1.0
    assert rows["id_positive"] == (0, True)
    out = expectations_report(df, [("p", F.col("id") > 0)])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") <= 1


def test_expectations_report_empty_input_passes_explicitly(spark):
    """sum over zero rows is NULL — the report must coalesce it so an
    empty table reads as 0 violations / passed=true, not NULL rows a
    downstream gate drops or misreads as failure."""
    from financial_data_pipeline_optimization_spark.operators.checks import (
        expectations_report,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame([], "id long, v double")
    rows = expectations_report(
        df, [("v_positive", F.col("v") > 0), ("id_positive", F.col("id") > 0)]
    ).collect()
    assert len(rows) == 2
    for r in rows:
        assert r.n_rows == 0
        assert r.n_violations == 0
        assert r.passed is True


def test_session_long_run_block_hygiene_confs(spark):
    """The session factory pins the ContextCleaner safety-net GC to
    5min (default 30min). The engine's iterative operators truncate
    lineage with localCheckpoint and rely on the cleaner to release
    superseded blocks; the BlockManager holds them strongly until a
    driver GC processes their weak refs, so the default cadence lets a
    many-query session accumulate dropped blocks for half an hour —
    measured fatal on the 100x replicated corpus (48g heap OOM after
    13 queries / 19 minutes). See session.py and SCALING.md."""
    core_conf = spark.sparkContext.getConf()
    assert core_conf.get("spark.cleaner.periodicGC.interval") == "5min"
    # The block-producing checkpoints these confs exist for:
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"

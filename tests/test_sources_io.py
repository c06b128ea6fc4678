"""JSON source/sink round-trip (interchange formats beyond CSV/parquet)."""

from __future__ import annotations

from pyspark.sql import types as T

from financial_data_pipeline_optimization_spark.sources import (
    read_json,
    write_json,
)


def test_json_round_trip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None)],
        "id long, name string, score double",
    )
    path = str(tmp_path / "out_json")
    write_json(df, path)
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    back = read_json(spark, path, schema=schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    # explicit schema means no inference pass and stable types
    assert back.schema == schema


def test_csv_round_trip_explicit_schema(spark, tmp_path):
    from financial_data_pipeline_optimization_spark.sources import read_csv, write_csv

    df = spark.createDataFrame(
        [(1, "x", 2.5), (2, "y", 0.5)], "id long, name string, v double"
    )
    path = str(tmp_path / "out_csv")
    write_csv(df, path)
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("v", T.DoubleType()),
        ]
    )
    back = read_csv(spark, path, schema=schema)
    assert back.schema == schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_partitioned_parquet_write_prunes_partitions(spark, tmp_path):
    from financial_data_pipeline_optimization_spark.sources import (
        load_table,
        write_parquet,
    )

    from .conftest import SF_SMOKE

    from pyspark.sql import functions as F

    orders = load_table(spark, SF_SMOKE, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_part")
    write_parquet(orders, path, partition_by=["order_year"])
    back = spark.read.parquet(path).filter("order_year = 1996")
    plan = back._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # the year predicate must prune directories, not filter rows
    assert "PartitionFilters: [isnotnull(order_year" in plan
    assert back.count() == orders.filter("order_year = 1996").count()


def test_empty_batch_guard_and_tag_lit(spark, tmp_path):
    import pytest as _pytest

    from financial_data_pipeline_optimization_spark.operators.clean import tag_lit
    from financial_data_pipeline_optimization_spark.plans.finance import (
        EmptyBatchError,
        run_pipeline,
    )

    tagged = tag_lit(
        spark.createDataFrame([(1,)], "id long"), "Ticker", "TST"
    )
    assert tagged.first().Ticker == "TST"

    empty = spark.createDataFrame(
        [], "Date date, Open double, High double, Low double, Close double,"
        " Volume long, Dividends double, stock_splits double, Ticker string"
    )
    with _pytest.raises(EmptyBatchError):
        run_pipeline(empty, str(tmp_path / "wh"))


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    from financial_data_pipeline_optimization_spark.sources import load_table
    from financial_data_pipeline_optimization_spark.sources.maintenance import (
        compact_parquet,
        parquet_file_count,
    )

    from .conftest import SF_SMOKE

    src = str(tmp_path / "fragmented")
    orders = load_table(spark, SF_SMOKE, "orders")
    orders.repartition(40).write.parquet(src)  # simulate drip appends
    assert parquet_file_count(spark, src) == 40
    n_rows = orders.count()

    # in-place swap
    n_parts = compact_parquet(spark, src, target_partition_bytes=1 << 30)
    assert n_parts == 1
    assert parquet_file_count(spark, src) == 1
    assert spark.read.parquet(src).count() == n_rows

    # safe-flip variant leaves the source alone
    out = str(tmp_path / "compacted")
    compact_parquet(spark, src, target_partition_bytes=1 << 30, out_path=out)
    assert parquet_file_count(spark, src) == 1
    assert spark.read.parquet(out).count() == n_rows


def test_jdbc_sink_roundtrip_embedded_derby(spark, tmp_path):
    """End-to-end exercise of the JDBC sink/source (K3/K4 — the
    reference's load stage writes Postgres via JDBC, loading.py:129-151)
    against the Derby embedded database bundled with Spark: overwrite
    creates the table, append adds only the new batch, and the read
    path returns exactly what was written."""
    from financial_data_pipeline_optimization_spark.sources import read_jdbc, write_jdbc

    url = f"jdbc:derby:{tmp_path}/jdbc_wh;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    t0 = spark.createDataFrame(
        [(1, "AAPL", 190.5), (2, "MSFT", 410.25)],
        "id long, ticker string, close double",
    )
    write_jdbc(t0, url, "prices", mode="overwrite", properties=props,
               num_partitions=2, batch_size=500)
    t1 = spark.createDataFrame(
        [(3, "NVDA", 120.75)], "id long, ticker string, close double"
    )
    write_jdbc(t1, url, "prices", mode="append", properties=props)
    back = read_jdbc(spark, url, "prices", properties=props)
    assert sorted(tuple(r) for r in back.collect()) == [
        (1, "AAPL", 190.5),
        (2, "MSFT", 410.25),
        (3, "NVDA", 120.75),
    ]


def test_jdbc_partitioned_read_embedded_derby(spark, tmp_path):
    """Partitioned JDBC *read* (T1's read twin — the reference only
    parallelizes the write side via repartition(4), loading.py:116).
    With partitionColumn/bounds the scan issues one range query per
    partition instead of a single connection; results must be the
    union of the ranges with nothing dropped or duplicated, including
    rows outside [lowerBound, upperBound) which JDBC assigns to the
    edge partitions."""
    from financial_data_pipeline_optimization_spark.sources import read_jdbc, write_jdbc

    url = f"jdbc:derby:{tmp_path}/jdbc_part;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    rows = [(i, f"t{i % 7}", float(i) / 4) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, ticker string, v double")
    write_jdbc(df, url, "ticks", mode="overwrite", properties=props)

    back = read_jdbc(
        spark,
        url,
        "ticks",
        properties=props,
        partition_column="id",
        num_partitions=4,
        lower_bound=10,  # deliberately inside the data range: edge
        upper_bound=90,  # partitions must still pick up 0-9 and 90-99
    )
    assert back.rdd.getNumPartitions() == 4
    assert sorted(tuple(r) for r in back.collect()) == sorted(rows)


def test_orc_round_trip_with_partition_pruning(spark, tmp_path):
    from financial_data_pipeline_optimization_spark.sources import (
        load_table,
        read_orc,
        write_orc,
    )

    from .conftest import SF_SMOKE

    from pyspark.sql import functions as F

    orders = load_table(spark, SF_SMOKE, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_orc")
    write_orc(orders, path, partition_by=["order_year"])
    back = read_orc(spark, path).filter("order_year = 1996")
    plan = back._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # same pruning contract as parquet: directory-level, not row filter
    assert "PartitionFilters: [isnotnull(order_year" in plan
    assert back.count() == orders.filter("order_year = 1996").count()
    # values survive the round trip
    a = sorted(map(tuple, orders.select("o_orderkey", "o_totalprice").collect()))
    b = sorted(map(tuple, read_orc(spark, path, ["o_orderkey", "o_totalprice"]).collect()))
    assert a == b


def test_observed_quality_rides_the_action(spark, tmp_path):
    """observed_quality's metrics must be collected by the WRITE itself
    (no second scan): after one parquet write action, the observation
    holds row/null/negative counts."""
    from financial_data_pipeline_optimization_spark.operators import checks

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, -4.0)], "id long, v double"
    )
    observed, obs = checks.observed_quality(
        df, not_null=["v"], non_negative=["v"]
    )
    observed.write.mode("overwrite").parquet(str(tmp_path / "out"))
    got = obs.get
    assert got["n_rows"] == 3
    assert got["nulls_v"] == 1
    assert got["neg_v"] == 1


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Schema evolution across parquet batches: a later batch adds a
    column; mergeSchema reads the union schema with nulls for the old
    batch — the append-only ingestion contract at scale (schema grows,
    old files never rewritten)."""
    p = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a")], "id long, v string"
    ).write.parquet(p + "/batch=1")
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, v string, score double"
    ).write.parquet(p + "/batch=2")
    df = spark.read.option("mergeSchema", "true").parquet(p)
    rows = {r.id: (r.v, r.score) for r in df.collect()}
    assert rows == {1: ("a", None), 2: ("b", 9.5)}
    assert set(df.columns) >= {"id", "v", "score"}


def test_write_parquet_zstd_and_file_capping(spark, tmp_path):
    """The parquet sink defaults to zstd (measurably smaller than
    snappy on repetitive data) and maxRecordsPerFile bounds the
    largest file a single task can emit."""
    import glob

    from financial_data_pipeline_optimization_spark.sources.sinks import write_parquet

    df = spark.range(20000).selectExpr(
        "id", "repeat('abcdef', 50) AS payload"
    ).coalesce(1)
    p_z = str(tmp_path / "zstd")
    p_s = str(tmp_path / "snappy")
    write_parquet(df, p_z)
    write_parquet(df, p_s, compression="snappy")
    size = lambda p: sum(  # noqa: E731
        __import__("os").path.getsize(f)
        for f in glob.glob(p + "/*.parquet")
    )
    assert size(p_z) < size(p_s)
    back = spark.read.parquet(p_z)
    assert back.count() == 20000

    p_cap = str(tmp_path / "capped")
    write_parquet(df, p_cap, max_records_per_file=5000)
    files = glob.glob(p_cap + "/*.parquet")
    assert len(files) >= 4  # 20k rows / 5k cap from one task
    assert spark.read.parquet(p_cap).count() == 20000

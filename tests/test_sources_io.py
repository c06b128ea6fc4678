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

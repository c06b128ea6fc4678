"""Replicate the driver testdata k× with disjoint key spaces.

The driver ships sf0.001/sf0.01/sf0.1; every wall-time measurement at
those sizes is overhead-dominated (SCALING.md). This tool builds a
COMPUTE-dominated corpus by unioning k offset copies of a base scale
factor, preserving the join graph and the per-replica duplicate/
similarity structure:

- Every id space (custkey, orderkey, partkey, suppkey, event_id,
  user_id, doc_id, vec_id) is offset by ``replica * (max_id + 1)``,
  consistently across the tables that reference it, so FK joins hit
  exactly as they do in the base data — cardinality scales k×, join
  fan-out per key does NOT.
- ``documents.text`` gets every word suffixed with ``x<replica>`` (the
  base replica 0 stays verbatim), so shingle/token/minhash structure is
  IDENTICAL within each replica but vocabularies are disjoint across
  replicas: near-dup pair counts and LSH bucket sizes scale ~k, not k².
  ``n_chars`` is recomputed to stay consistent with the new text.
- ``embeddings.embedding`` gets per-(row, dim) deterministic jitter on
  replicas > 0 so cosine structure is preserved per replica without
  creating k exact copies of every vector.
- ``region``/``nation`` stay fixed — they are bounded dims at any SF.

Single Spark pass per table: a broadcast crossJoin against the replica
range fans each row out k ways JVM-side (no Python in the path).

Usage: python tools/gen_replicated_sf.py <base_sf_dir> <k> <out_dir>
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, functions as F

from financial_data_pipeline_optimization_spark import get_spark
from financial_data_pipeline_optimization_spark.sources import load_table

#: id-space → [(table, column), ...] that must offset together.
ID_SPACES = {
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "event_id": [("events", "event_id")],
    "user_id": [("events", "user_id")],
    "doc_id": [("documents", "doc_id")],
    "vec_id": [("embeddings", "vec_id")],
}

REPLICATED = (
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
FIXED_DIMS = ("region", "nation")


def _strides(spark, sf_dir: str) -> dict[str, int]:
    """max_id + 1 per id space, computed once from the base tables."""
    out = {}
    for space, cols in ID_SPACES.items():
        table, col = cols[0]
        mx = (
            load_table(spark, sf_dir, table)
            .agg(F.max(col).cast("long"))
            .collect()[0][0]
        )
        out[space] = int(mx) + 1
    return out


def _offsets_for(table: str) -> dict[str, str]:
    """column → id-space for one table."""
    return {
        col: space
        for space, cols in ID_SPACES.items()
        for t, col in cols
        if t == table
    }


def replicate_table(
    df: DataFrame, table: str, k: int, strides: dict[str, int]
) -> DataFrame:
    spark = df.sparkSession
    reps = F.broadcast(
        spark.range(k).select(F.col("id").cast("int").alias("__r"))
    )
    out = df.crossJoin(reps)
    for col, space in _offsets_for(table).items():
        out = out.withColumn(
            col,
            (
                F.col(col).cast("long")
                + F.col("__r").cast("long") * F.lit(strides[space])
            ),
        )
    if table == "documents":
        # Replica 0 keeps the base text verbatim; replicas > 0 suffix
        # every word with x<r>, giving each replica a disjoint
        # vocabulary with identical internal token structure. ($1xN is
        # an unambiguous Java replacement: group 1 + literal "xN".)
        out = out.withColumn(
            "text",
            F.when(F.col("__r") == 0, F.col("text")).otherwise(
                F.regexp_replace(
                    F.col("text"),
                    F.lit("([A-Za-z0-9_]+)"),
                    F.concat(F.lit("$1x"), F.col("__r").cast("string")),
                )
            ),
        ).withColumn("n_chars", F.length("text").cast("long"))
    if table == "embeddings":
        # Deterministic per-(vec_id, dim) jitter (~1e-3 scale) on
        # replicas > 0: preserves per-replica cosine structure without
        # writing k exact copies of every vector.
        out = out.withColumn(
            "embedding",
            F.when(F.col("__r") == 0, F.col("embedding")).otherwise(
                F.transform(
                    "embedding",
                    lambda x, i: (
                        x
                        + (
                            F.pmod(
                                F.xxhash64(F.col("vec_id"), i), F.lit(997)
                            ).cast("double")
                            / F.lit(1.0e6)
                        ).cast("float")
                    ),
                )
            ),
        )
    return out.drop("__r")


def main() -> None:
    base, k, out_dir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    spark = get_spark(app_name="fdpo-gen-replicated")
    strides = _strides(spark, base)
    print("strides:", strides)
    Path(out_dir).mkdir(parents=True, exist_ok=True)
    for table in FIXED_DIMS:
        load_table(spark, base, table).write.mode("overwrite").parquet(
            f"{out_dir}/{table}.parquet"
        )
    for table in REPLICATED:
        df = load_table(spark, base, table)
        rep = replicate_table(df, table, k, strides)
        # Spread the fan-out across the cluster before writing; the
        # broadcast crossJoin preserves the (tiny) input partitioning.
        n_parts = min(64, max(4, k))
        rep.repartition(n_parts).write.mode("overwrite").parquet(
            f"{out_dir}/{table}.parquet"
        )
        print("wrote", table, "x", k)


if __name__ == "__main__":
    main()

"""Skewed-join mitigation, measured: straggler vs AQE skew-join vs salt.

The 100 TB story says "skewed keys hurt; AQE's runtime skew-join or a
deterministic salt fixes them" — this harness puts numbers on it. A
deliberately skewed fact table (the ×10/×100 replicated lineitem with
30% of rows funneled onto ONE join key) sort-merge-joins a 100k-row
dim (broadcast disabled so the join actually shuffles — at 100 TB the
dim that fits in memory is the exception), under three plans:

- ``skew_straggler``  — AQE skew-join OFF: the hot key lands on one
  reducer; the stage is as slow as that single task;
- ``aqe_skew_join``   — AQE skew-join ON (the session default): the
  runtime splits the oversized partition into per-split joins;
- ``salted_join``     — the engine's deterministic salt
  (`operators.joins.salted_join`, salt_factor=32 — sized to the core
  count so the split hot key levels with normal reducer load; the
  operator's default 8 only divides the hot key by 8): the manual fix
  for non-AQE shapes (skewed aggregations, older engines).

Methodology: noop sink, one warm session, WORSE of REPS=2 runs per
cell (bench_scaled.py's conservative convention — with two samples
the upper one bounds the cost; not a median); per-variant confs are
runtime-settable so all three share one JVM. Writes
``SKEW_BENCH.json`` and prints one JSON line. Run quiet:
``SPARK_DRIVER_MEMORY=48g python tools/bench_skew.py``.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from financial_data_pipeline_optimization_spark import get_spark  # noqa: E402
from financial_data_pipeline_optimization_spark.operators import joins  # noqa: E402

DATASETS = [
    ("x10", "/tmp/sfx10"),
    ("x100", "/tmp/sfx100"),
]
REPS = 2
HOT_FRACTION_MOD = 10  # 3 of 10 -> 30% of fact rows on one key
N_DIM = 100_000


def _skewed_fact(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    # Deterministic 30% hot key 0; the rest spread over N_DIM keys.
    h = F.xxhash64("l_orderkey", "l_linenumber")
    return li.select(
        F.when(F.pmod(h, F.lit(HOT_FRACTION_MOD)) < 3, F.lit(0))
        .otherwise(F.pmod(F.abs(h), F.lit(N_DIM)))
        .cast("long")
        .alias("k"),
        "l_extendedprice",
    )


def _dim(spark):
    return spark.range(N_DIM).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("grp")
    )


def _timed(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def _agg(joined):
    return joined.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_extendedprice").alias("s")
    )


def main() -> None:
    from tools.ab import QuietSession

    spark = get_spark(app_name="fdpo-bench-skew")
    out: dict[str, dict[str, float]] = {}
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    qs = QuietSession().__enter__()
    try:
        for label, sf_dir in DATASETS:
            if not Path(sf_dir).exists():
                continue
            fact = _skewed_fact(spark, sf_dir).localCheckpoint()
            dim = _dim(spark)
            row: dict[str, float] = {}

            def worse_of(build) -> float:
                # Conservative: max of REPS=2 (upper bound, not median).
                samples = []
                build().limit(1).collect()  # warm codegen
                for _ in range(REPS):
                    spark._jvm.System.gc()
                    samples.append(_timed(build()))
                return round(max(samples), 2)

            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
            row["skew_straggler"] = worse_of(
                lambda: _agg(fact.join(dim, "k"))
            )
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
            row["aqe_skew_join"] = worse_of(
                lambda: _agg(fact.join(dim, "k"))
            )
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
            row["salted_join"] = worse_of(
                lambda: _agg(
                    joins.salted_join(fact, dim, ["k"], salt_factor=32)
                )
            )
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
            out[label] = row
            print(f"{label}: {row}", file=sys.stderr)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        qs.__exit__()
    result = {
        "metric": "skewed_join_mitigation_sec",
        "hot_key_fraction": 0.3,
        "datasets": out,
        **qs.stamp(),
    }
    (Path(__file__).resolve().parents[1] / "SKEW_BENCH.json").write_text(
        json.dumps(result, indent=1) + "\n"
    )
    print(json.dumps(result, separators=(",", ":")))


if __name__ == "__main__":
    main()

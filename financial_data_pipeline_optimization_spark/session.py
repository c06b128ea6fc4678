"""SparkSession factory with scale-appropriate defaults.

The reference builds ad-hoc sessions per stage with a legacy time parser
(``transformation.py:14-17``, ``loading.py:80-84``). The engine
centralizes session construction with modern Spark >= 3 semantics:
UTC session timezone (deterministic date math, DuckDB-oracle
comparable), AQE enabled (runtime skew-join + partition coalescing),
Arrow transfers on (fast Pandas-UDF boundary).

On a real cluster the same builder works unchanged — only ``master``
and memory change; shuffle partitioning is sized from
``SPARK_GRAFT_CPUS`` locally and should be ~2-3x total cores on a
cluster (AQE coalesces the excess).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "fdpo-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    Local mode is a single JVM; ``spark.driver.memory`` is the only
    memory knob that matters there and must be set before JVM launch,
    so we only set it when no session exists yet.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Session-wide by design (mirrors sources.load_table): the driver
        # test data writes events.ts as parquet TIMESTAMP(NANOS), which
        # Spark otherwise refuses to read. Only TIMESTAMP(NANOS) files
        # are affected; they surface as bigint nanos and readers convert.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # Parquet scans: larger row-group-aligned splits; at cluster scale
        # this bounds per-task memory for 100 TB inputs.
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # Long-session block hygiene. The engine truncates iterative /
        # reused lineage with localCheckpoint; the BlockManager holds
        # those blocks STRONGLY until ContextCleaner processes the
        # RDDs' weak references, which only happens after a driver GC.
        # Spark's safety-net GC fires every 30min by default — a
        # many-query session on a big corpus can OOM the heap on
        # superseded checkpoint blocks long before that (observed on
        # the 100x replicated corpus: 19 minutes of queries filled a
        # 48g heap with dropped blocks and died in a 5-word
        # allocation). 5min keeps reclamation ahead of accumulation;
        # one periodic driver GC per 5min is noise even at bench
        # granularity.
        .config("spark.cleaner.periodicGC.interval", "5min")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

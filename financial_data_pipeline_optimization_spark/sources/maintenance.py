"""Table maintenance: small-file compaction.

Incremental and streaming sinks (``foreach_batch_upsert``, per-trigger
appends) accumulate many small parquet files; at scale that murders
scan performance — each file costs a task, footer reads dominate, and
the driver's file listing grows unbounded. Compaction rewrites a
directory into ~``target_partition_bytes``-sized files (sized from the
ACTUAL on-disk bytes, not a guessed partition count).

Raw parquet directories have no transaction log, so the in-place swap
is delete-then-rename: NOT atomic — concurrent readers can observe the
gap. That is a storage-format limitation (table formats solve it with
snapshot metadata); for pipelines on raw parquet, compact between
batch windows or write to ``out_path`` and flip the consumer.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession


def _hadoop_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, p


def directory_bytes(spark: SparkSession, path: str) -> int:
    """Total on-disk bytes under ``path`` (Hadoop FS content summary)."""
    fs, p = _hadoop_path(spark, path)
    return fs.getContentSummary(p).getLength()


def parquet_file_count(spark: SparkSession, path: str) -> int:
    """Number of data files under ``path``."""
    fs, p = _hadoop_path(spark, path)
    it = fs.listFiles(p, True)
    n = 0
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if not name.startswith(("_", ".")):
            n += 1
    return n


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_partition_bytes: int = 128 << 20,
    out_path: str | None = None,
) -> int:
    """Rewrite the parquet directory at ``path`` into
    ``ceil(actual_bytes / target_partition_bytes)`` files. Returns the
    output file-partition count.

    With ``out_path`` the original is left untouched (safe flip);
    without it the directory is swapped in place (delete + rename —
    see module docstring for the atomicity caveat).
    """
    total = directory_bytes(spark, path)
    n = max(1, math.ceil(total / target_partition_bytes))
    df = spark.read.parquet(path)
    dest = out_path or path + "__compacting"
    # round-robin repartition: compaction wants even file sizes, not a
    # key layout (use bucketing/partitionBy writes for layout)
    df.repartition(n).write.mode("overwrite").parquet(dest)
    if out_path is None:
        fs, src = _hadoop_path(spark, path)
        _, tmp = _hadoop_path(spark, dest)
        fs.delete(src, True)
        fs.rename(tmp, src)
    return n

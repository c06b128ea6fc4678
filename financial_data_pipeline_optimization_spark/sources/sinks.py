"""Sinks (SURVEY.md §2.2).

Covers K1 (CSV export, ``extraction.py:116-117``), K2 (parquet
overwrite, ``transformation.py:98``) and K3/K4 (batched JDBC writes,
``loading.py:129-151``). The staging-table + NOT-EXISTS merge K5
(``loading.py:159-178``) is internalized engine-side as a left-anti
join (``operators.joins.anti_join_upsert``), so the external sink is a
dumb append. Flag-file / delete-after-processing sinks (K7/K8) are
eliminated — jobs are idempotent re-runs instead of consume-and-delete.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Iterable[str] | None = None,
    compression: str = "zstd",
    max_records_per_file: int | None = None,
) -> None:
    """Parquet sink (K2). ``partition_by`` enables static + dynamic
    partition pruning on later reads — at 100 TB, curated tables should
    be partitioned by a date-derived column and clustered by key
    (SURVEY.md §4.4).

    ``compression='zstd'`` by default: at warehouse scale zstd's
    ~15-30% size win over snappy (similar decode speed in modern
    Spark) is petabytes; pass ``'snappy'`` for CPU-bound writers.
    ``max_records_per_file`` caps file size so one giant task can't
    emit a multi-GB file that later readers can't split across
    row-group boundaries efficiently."""
    writer = df.write.mode(mode).option("compression", compression)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV export sink (K1). Export-only; the canonical landing format
    is parquet."""
    df.write.mode(mode).option("header", "true").csv(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Iterable[str] | None = None,
) -> None:
    """ORC sink: same columnar/predicate-pushdown story as parquet
    (built into Spark, no extra packages) for ORC-standardized
    lakehouses. Same partitioning contract as :func:`write_parquet`."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    properties: dict[str, str] | None = None,
    num_partitions: int = 4,
    batch_size: int = 1000,
) -> None:
    """JDBC sink (K3/K4): ``num_partitions`` parallel connections ×
    ``batch_size``-row batched inserts, the reference's tuning
    (``loading.py:116,130-131``) exposed as parameters. ``coalesce``
    (not ``repartition``) avoids the reference's round-robin shuffle
    when reducing to the connection count."""
    out = df
    if num_partitions is not None:
        # Unconditional coalesce: it caps the connection count without a
        # shuffle and is a no-op when the plan already has fewer
        # partitions (writing with fewer connections than the cap is
        # fine). Probing df.rdd.getNumPartitions() to decide would
        # instantiate the RDD lineage just to read a number — the exact
        # RDD-round-trip style SURVEY.md §4.2.2 flags. Callers that
        # need to FAN OUT a too-narrow plan should repartition upstream,
        # where the shuffle cost is an explicit choice.
        out = df.coalesce(num_partitions)
    writer = (
        out.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .option("rewriteBatchedStatements", "true")
        .mode(mode)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()


def write_json(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Iterable[str] | None = None,
) -> None:
    """JSON-lines export sink. Interchange-only (row-oriented text,
    ~5-10x parquet's footprint): never the canonical storage format."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.json(path)

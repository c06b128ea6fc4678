"""Bucketed tables: co-located joins and aggregations without a shuffle.

The reference's only physical-layout decision is ``repartition(4)``
before its JDBC write (``loading.py:116``). At 100 TB the analogous —
and far more consequential — decision is *bucketing* the curated
tables on their join/aggregation keys: ``df.write.bucketBy(N, key)``
hash-partitions data into a fixed number of files per partition, and
Spark records the layout in the catalog. Any later equi-join or
group-by on the bucket key between tables with the same bucket count
reads both sides pre-partitioned: the Exchange disappears from the
plan entirely. For a fact-to-fact join (orders ⋈ lineitem on orderkey)
that is the difference between re-shuffling 100 TB per query and
reading co-located files.

Guidance encoded here:

- bucket count is fixed at write time — size it so one bucket of the
  LARGEST table fits an executor task (~128-256 MB compressed);
- both join sides must share bucket count and key for full exchange
  elimination (Spark can also avoid one side when counts are integer
  multiples);
- ``sortBy`` within buckets additionally removes the Sort under a
  sort-merge join;
- bucket pruning applies equality filters on the bucket key to skip
  whole files.

Idempotence contract (learned the hard way in round 10): with the
default in-memory catalog, a MANAGED ``saveAsTable(mode="overwrite")``
is only idempotent *within* one session. A fresh session's catalog has
no entry to overwrite, but the files under ``spark.sql.warehouse.dir``
persist — so the create throws ``LOCATION_ALREADY_EXISTS`` on every
rerun after the first. ``write_bucketed_table`` therefore always
``DROP TABLE IF EXISTS`` first and, for managed tables, deletes an
orphaned warehouse location via the Hadoop FS API before writing.
External (``path=``) tables don't have the failure mode — overwrite
rewrites the files regardless of catalog state — but get the DROP too
so a stale catalog entry pointing elsewhere can't shadow the write.
Single-writer assumption: two sessions overwriting the SAME table name
concurrently can still race (one's cleanup deletes the other's
in-flight write) — callers that need concurrent builds should key the
table name per application, the way the query-layer caches key their
entries per applicationId.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally in-bucket sorted)
    catalog table. ``path`` makes it an external table (parquet files
    at ``path``, metadata in the session catalog).

    Idempotent across sessions (see module docstring): drops any
    existing catalog entry, and for managed tables removes an orphaned
    warehouse location left by an earlier session before writing.
    """
    spark = df.sparkSession
    if mode == "overwrite":
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        if path is None:
            _delete_orphaned_managed_location(spark, table)
    writer = df.write.format("parquet").mode(mode).bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def _delete_orphaned_managed_location(
    spark: SparkSession, table: str
) -> None:
    """Remove the warehouse directory a managed ``table`` would occupy
    if (and only if) the catalog no longer knows the table — i.e. a
    prior session wrote it and died, leaving files without metadata.
    A table the CURRENT catalog tracks was already dropped (DROP TABLE
    on a managed table deletes its data), so this only ever touches
    orphans.

    Guards (a wrong delete here is live-data loss, so every ambiguous
    case no-ops):

    - db-qualified names skip cleanup entirely — their managed
      location is ``warehouse/<db>.db/<name>``, NOT
      ``warehouse/<name>``, so deleting the bare-name path would hit a
      DIFFERENT (default-db) table's directory;
    - a non-default current database skips for the same reason (a bare
      name resolves into ``warehouse/<db>.db/`` there);
    - if the current catalog still tracks a default-db table with this
      bare name, its directory is ALIVE, not an orphan — skip.

    Residual ambiguity is inherent: files left by ANOTHER session's
    table of the same name are indistinguishable from an orphan of
    this one. Engine callers all write unqualified default-db names,
    where rebuild-over-orphan is the wanted semantics."""
    if "." in table:
        return
    if spark.catalog.currentDatabase() != "default":
        return
    name = table.lower()
    if spark.catalog.tableExists(name):
        return
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    )
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(warehouse, name)
    fs = hpath.getFileSystem(
        spark._jsc.hadoopConfiguration()
    )
    if fs.exists(hpath):
        fs.delete(hpath, True)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Join two catalog tables. If both are bucketed on the join key
    with matching bucket counts, the plan contains no Exchange — that
    property is asserted by tests/test_bucketing.py, which is the
    contract this helper exists to document."""
    keys = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(
        spark.table(right_table), on=keys, how=how
    )

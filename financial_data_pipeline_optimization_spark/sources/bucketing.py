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

import json
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

#: Sidecar manifest filename written into the table location. The
#: leading underscore keeps it invisible to Spark's file-source
#: listing (same convention as ``_SUCCESS``), so data readers never
#: see it; a FRESH session's in-memory catalog — which forgot the
#: table — reads it to decide whether the on-disk layout can be
#: trusted and re-registered instead of rebuilt
#: (:func:`trust_bucketed_table`).
MANIFEST_NAME = "_fdpo_manifest.json"


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
    properties: dict[str, str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally in-bucket sorted)
    catalog table. ``path`` makes it an external table (parquet files
    at ``path``, metadata in the session catalog).

    Idempotent across sessions (see module docstring): drops any
    existing catalog entry, and for managed tables removes an orphaned
    warehouse location left by an earlier session before writing.

    ``properties`` (content-addressing stamps such as a source-data
    fingerprint) are recorded twice: as catalog TBLPROPERTIES for the
    current session, and in a ``_fdpo_manifest.json`` sidecar inside
    the table location — together with the schema DDL and the full
    bucket spec — so a LATER session can verify the stamp and adopt
    the layout without rebuilding it. Write order makes trust
    crash-safe: the manifest is written strictly AFTER the data, so a
    write that dies mid-flight leaves files without a manifest, which
    the trust check refuses and the next build's orphan cleanup
    removes.
    """
    spark = df.sparkSession
    split = _split_db(spark, table)
    if split is not None and split[0] != "default":
        # a db-qualified write into a database this session's
        # in-memory catalog has forgotten must re-create it first
        # (same derived location, see _managed_location) — both the
        # DROP below and saveAsTable need the database to resolve
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {split[0]}")
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
    props = dict(properties or {})
    if props:
        kv = ", ".join(
            f"'{_q(k)}'='{_q(v)}'" for k, v in sorted(props.items())
        )
        spark.sql(f"ALTER TABLE {table} SET TBLPROPERTIES ({kv})")
    manifest = {
        "table": table.lower(),
        "schema_ddl": df._jdf.schema().toDDL(),
        "bucket_cols": list(bucket_cols),
        "num_buckets": int(num_buckets),
        "sort_cols": list(sort_cols or []),
        "properties": props,
    }
    location = path
    if location is None:
        location = _managed_location(spark, table)
    if location is not None:
        _write_text(
            spark, f"{location}/{MANIFEST_NAME}", json.dumps(manifest)
        )


def _q(s: str) -> str:
    """Escape single quotes for embedding in SQL string literals."""
    return str(s).replace("'", "''")


def _split_db(spark: SparkSession, table: str) -> tuple[str, str] | None:
    """``(db, name)`` for a bare or db-qualified table name, resolving
    bare names against the CURRENT database; None for three-part
    (catalog-qualified) names, which this layer does not own."""
    parts = table.lower().split(".")
    if len(parts) == 1:
        return spark.catalog.currentDatabase().lower(), parts[0]
    if len(parts) == 2:
        return parts[0], parts[1]
    return None


def _managed_location(spark: SparkSession, table: str) -> str | None:
    """Qualified location a managed ``table`` (bare or db-qualified)
    occupies, or None for three-part names — trust and orphan cleanup
    must agree on which directories they own.

    The default database's location IS the warehouse root, so its
    tables live at ``warehouse/<name>``; every other database's tables
    live under the database location (``warehouse/<db>.db`` unless
    created with an explicit LOCATION). When the current (in-memory)
    catalog still knows the database, its recorded ``locationUri``
    wins; a FRESH session that has forgotten a non-default database
    falls back to the derived ``warehouse/<db>.db`` — exactly where
    ``CREATE DATABASE`` without LOCATION would put it back, so trust's
    re-registration and the original write resolve the same path."""
    split = _split_db(spark, table)
    if split is None:
        return None
    db, name = split
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    )
    if db == "default":
        dbloc = warehouse
    else:
        try:
            dbloc = spark.catalog.getDatabase(db).locationUri
        except Exception:
            dbloc = str(
                jvm.org.apache.hadoop.fs.Path(warehouse, f"{db}.db")
            )
    hpath = jvm.org.apache.hadoop.fs.Path(dbloc, name)
    fs = hpath.getFileSystem(conf)
    return str(fs.makeQualified(hpath).toString())


def _write_text(spark: SparkSession, path: str, text: str) -> None:
    """Write a small text file via the Hadoop FS API (works on any
    Spark-reachable filesystem, not just local disk)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(text, "utf-8"))
    finally:
        out.close()


def _read_text(spark: SparkSession, path: str) -> str | None:
    """Read a small text file via the Hadoop FS API; None if absent."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return None
    stream = fs.open(hpath)
    try:
        return str(
            jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
        )
    finally:
        stream.close()


def trust_bucketed_table(
    spark: SparkSession,
    table: str,
    properties: dict[str, str],
) -> bool:
    """Adopt an existing bucketed ``table`` iff its recorded stamp
    matches ``properties`` — the trust-but-verify half of the
    "rebuilt, never trusted" contract. Returns True with the table
    queryable in the current catalog, or False meaning the caller must
    build (and the build path's DROP + orphan cleanup handles whatever
    was there).

    Two cases:

    - the CURRENT catalog tracks the table: compare its
      TBLPROPERTIES; a match means this session (or a shared
      metastore) already built the current layout.
    - fresh session, files on disk only: read the sidecar manifest;
      if every expected property matches, re-register the layout as
      an external bucketed table over the existing location (schema,
      bucket spec, and sort spec come from the manifest — written by
      the same code that wrote the files). No data is read or
      written; at 100 TB this is what makes the one-time layout cost
      actually one-time instead of once-per-session.

    Every ambiguous case returns False (same philosophy as the orphan
    cleanup: a wrong trust serves stale data, so only the exact
    stamped match passes): three-part catalog-qualified names, missing
    manifest, any property mismatch. Db-qualified two-part names are
    first-class: the managed location resolves per-database
    (:func:`_managed_location`), and adopting a table of a database
    the fresh session has forgotten recreates the database first
    (``CREATE DATABASE IF NOT EXISTS`` — same derived location the
    original write used, see ``_managed_location``).
    """
    split = _split_db(spark, table)
    if split is None:
        return False
    db = split[0]
    name = table.lower()
    if spark.catalog.tableExists(name):
        got = {
            r["key"]: r["value"]
            for r in spark.sql(f"SHOW TBLPROPERTIES {name}").collect()
        }
        return all(got.get(k) == v for k, v in properties.items())
    location = _managed_location(spark, name)
    if location is None:
        return False
    raw = _read_text(spark, f"{location}/{MANIFEST_NAME}")
    if raw is None:
        return False
    try:
        manifest = json.loads(raw)
    except ValueError:
        return False
    stamped = manifest.get("properties", {})
    if not all(stamped.get(k) == v for k, v in properties.items()):
        return False
    if not (
        manifest.get("schema_ddl")
        and manifest.get("bucket_cols")
        and manifest.get("num_buckets")
    ):
        return False
    cluster = ", ".join(manifest["bucket_cols"])
    sort = (
        "SORTED BY (" + ", ".join(manifest["sort_cols"]) + ") "
        if manifest.get("sort_cols")
        else ""
    )
    kv = ", ".join(
        f"'{_q(k)}'='{_q(v)}'" for k, v in sorted(stamped.items())
    )
    props_clause = f" TBLPROPERTIES ({kv})" if kv else ""
    if db != "default":
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    spark.sql(
        f"CREATE TABLE {name} ({manifest['schema_ddl']}) USING PARQUET "
        f"CLUSTERED BY ({cluster}) {sort}"
        f"INTO {int(manifest['num_buckets'])} BUCKETS "
        f"LOCATION '{_q(location)}'{props_clause}"
    )
    return True


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

    - three-part catalog-qualified names skip cleanup entirely (this
      layer does not own external-catalog locations);
    - the location is resolved PER-DATABASE (``_managed_location``):
      a db-qualified ``db.name`` deletes ``<db location>/<name>``,
      never the bare ``warehouse/<name>`` path of a different
      (default-db) table, and a bare name under a non-default current
      database resolves into that database's directory — the two
      cases that forced the pre-r13 blanket refusals;
    - if the current catalog still tracks the (resolved) table, its
      directory is ALIVE, not an orphan — skip.

    Residual ambiguity is inherent: files left by ANOTHER session's
    table of the same name are indistinguishable from an orphan of
    this one; rebuild-over-orphan is the wanted semantics for engine
    callers."""
    name = table.lower()
    if spark.catalog.tableExists(name):
        return
    location = _managed_location(spark, name)
    if location is None:
        return
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(location)
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

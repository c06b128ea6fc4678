"""Bucketed co-located joins: the shuffle really disappears.

Writes orders and lineitem bucketed on the order key, then asserts the
physical join plan contains NO Exchange on either side — the property
that makes fact-to-fact joins viable at 100 TB — and that results match
the unbucketed join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from financial_data_pipeline_optimization_spark.sources import load_table
from financial_data_pipeline_optimization_spark.sources.bucketing import (
    bucketed_join,
    write_bucketed_table,
)

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    write_bucketed_table(
        load_table(spark, SF_SMOKE, "orders"),
        "orders_b",
        ["o_orderkey"],
        8,
        sort_cols=["o_orderkey"],
        path=str(base / "orders_b"),
    )
    write_bucketed_table(
        load_table(spark, SF_SMOKE, "lineitem"),
        "lineitem_b",
        ["l_orderkey"],
        8,
        sort_cols=["l_orderkey"],
        path=str(base / "lineitem_b"),
    )
    yield "orders_b", "lineitem_b"
    for t in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _simple_plan(df) -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    orders_b, lineitem_b = bucketed_tables
    # force the non-broadcast path so the assertion is about bucketing,
    # not about the tiny test tables fitting a broadcast
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table(lineitem_b)
            .withColumnRenamed("l_orderkey", "o_orderkey")
            .join(spark.table(orders_b), "o_orderkey")
        )
        plan = _simple_plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    orders_b, _ = bucketed_tables
    agg = (
        spark.table(orders_b)
        .groupBy("o_orderkey")
        .agg(F.sum("o_totalprice").alias("s"))
    )
    assert "Exchange" not in _simple_plan(agg)


def test_bucketed_join_matches_unbucketed(spark, bucketed_tables):
    orders_b, lineitem_b = bucketed_tables
    bucketed = (
        spark.table(lineitem_b)
        .join(
            spark.table(orders_b),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("rev"),
        )
    )
    plain = (
        load_table(spark, SF_SMOKE, "lineitem")
        .join(
            load_table(spark, SF_SMOKE, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("rev"),
        )
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_bucket_pruning_on_key_equality(spark, bucketed_tables):
    orders_b, _ = bucketed_tables
    # autoBucketedScan turns bucketed reading off when no operator
    # needs the distribution — which also skips bucket pruning; pin it
    # so the filter-only scan still prunes to 1 bucket of 8
    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
    )
    try:
        df = spark.table(orders_b).filter(F.col("o_orderkey") == 42)
        plan = df._jdf.queryExecution().explainString(
            df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")


def _count_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan()
    if "AdaptiveSparkPlan" in plan.nodeName():
        plan = plan.initialPlan()

    def walk(node):
        yield node
        ch = node.children()
        for i in range(ch.length()):
            yield from walk(ch.apply(i))

    return sum(
        1 for n in walk(plan) if "Exchange" in n.nodeName()
    )


def test_bucketed_pagerank_drops_edge_shuffles(spark, tmp_path_factory):
    """Layout-aware iterative PageRank: with the edge relation bucketed
    by src, the per-iteration join reads edges pre-partitioned — the
    full plan must contain strictly fewer Exchanges than the plain-
    DataFrame run, and identical ranks. This is the iterative-graph
    version of the fact-to-fact bucketing win: the edge side (the 100TB
    side) never re-shuffles across iterations, only rank rows move."""
    from financial_data_pipeline_optimization_spark.operators.graph import pagerank_on

    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    cs = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = cs.union(
        cs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )

    base = tmp_path_factory.mktemp("pr_edges")
    write_bucketed_table(
        edges, "pr_edges_b", ["src"], 8, path=str(base / "pr_edges_b")
    )
    try:
        bucketed = pagerank_on(
            spark.table("pr_edges_b"), iters=2, checkpoint_edges=False
        )
        plain = pagerank_on(edges, iters=2)

        # Plan probe: per-round localCheckpoint truncates the visible
        # plan, so inspect an un-truncated 2-iteration chain.
        n_b = _count_exchanges(
            pagerank_on(
                spark.table("pr_edges_b"),
                iters=2,
                checkpoint_edges=False,
                checkpoint_ranks=False,
            )
        )
        n_p = _count_exchanges(
            pagerank_on(edges, iters=2, checkpoint_ranks=False)
        )
        assert n_b < n_p, (n_b, n_p)

        got = {
            r["node"]: round(r["rank"], 12) for r in bucketed.collect()
        }
        want = {
            r["node"]: round(r["rank"], 12) for r in plain.collect()
        }
        assert got == want and len(got) > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS pr_edges_b")


def test_bucketed_kcore_has_zero_shuffle_exchanges(
    spark, tmp_path_factory
):
    """Layout-aware k-core: over a src-bucketed edge table with
    broadcast keep lists (kcore_peel(broadcast_keeps=True,
    checkpoint_rounds=False)), the ENTIRE 3-round peel plan contains
    ZERO shuffle exchanges — every per-round degree aggregation rides
    the bucketed scan's distribution and both semi-joins broadcast the
    node-sized keep list. The plain run shuffles every round. Results
    must be identical."""
    from financial_data_pipeline_optimization_spark.operators.graph import kcore_peel

    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    cs = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = cs.union(
        cs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    base = tmp_path_factory.mktemp("kcore_edges")
    write_bucketed_table(
        edges, "kcore_edges_b", ["src"], 8,
        path=str(base / "kcore_edges_b"),
    )
    try:
        bucketed = kcore_peel(
            spark.table("kcore_edges_b"), k=4, rounds=3,
            broadcast_keeps=True, checkpoint_rounds=False,
        )
        plain = kcore_peel(edges, k=4, rounds=3)

        def _shuffles(df) -> int:
            plan = df._jdf.queryExecution().executedPlan()
            if "AdaptiveSparkPlan" in plan.nodeName():
                plan = plan.initialPlan()

            def walk(node):
                yield node
                ch = node.children()
                for i in range(ch.length()):
                    yield from walk(ch.apply(i))

            # ShuffleExchangeExec prints as "Exchange";
            # BroadcastExchangeExec as "BroadcastExchange" — only the
            # former moves data-sized rows.
            return sum(
                1
                for n in walk(plan)
                if "Exchange" in n.nodeName()
                and "Broadcast" not in n.nodeName()
            )

        assert _shuffles(bucketed) == 0, "bucketed peel must not shuffle"
        assert _shuffles(plain) > 0

        got = sorted(map(tuple, bucketed.collect()))
        want = sorted(map(tuple, plain.collect()))
        assert got == want and len(got) > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS kcore_edges_b")


def test_minhash_store_bucketed_join_moves_only_new_batch(
    spark, tmp_path_factory
):
    """The continuous-ingestion claim of dedup.minhash_store: with the
    stored LSH index bucketed on its join key (band, band_hash), the
    incremental candidate join re-shuffles ONLY the new batch's bands
    — the stored side reads co-located files with no Exchange above
    its scan. At 100 TB that is the difference between re-shuffling
    the whole index per ingest and touching it in place."""
    from financial_data_pipeline_optimization_spark.operators import dedup

    base = tmp_path_factory.mktemp("mh_store")
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    ob, _ = dedup.minhash_store(
        docs.where(F.col("doc_id") % 2 == 0), "doc_id", "text",
        shingle_n=2,
    )
    write_bucketed_table(
        ob,
        "mh_bands_store",
        ["band", "band_hash"],
        8,
        sort_cols=["band", "band_hash"],
        path=str(base / "bands"),
    )
    try:
        nb, _ = dedup.minhash_store(
            docs.where(F.col("doc_id") % 2 == 1), "doc_id", "text",
            shingle_n=2,
        )
        stored = spark.table("mh_bands_store")
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            cand = (
                nb.alias("n")
                .join(
                    stored.alias("o"),
                    (F.col("n.band") == F.col("o.band"))
                    & (F.col("n.band_hash") == F.col("o.band_hash")),
                )
                .select(
                    F.col("n.id").alias("new_id"),
                    F.col("o.id").alias("old_id"),
                )
            )
            plan = _simple_plan(cand)
            assert "SortMergeJoin" in plan, plan
            assert "Bucketed: true" in plan, plan

            # Structural check on the join children: the stored side's
            # subtree must contain the bucketed scan and ZERO
            # exchanges; the new side shuffles on the join key. (The
            # new side also carries minhash_store's deliberate _spread
            # repartition, so a flat plan-wide Exchange count proves
            # nothing.)
            def _walk(node):
                yield node
                children = node.children()
                for i in range(children.length()):
                    yield from _walk(children.apply(i))

            plan_tree = cand._jdf.queryExecution().executedPlan()
            if "AdaptiveSparkPlan" in plan_tree.nodeName():
                plan_tree = plan_tree.initialPlan()
            smj = [
                n
                for n in _walk(plan_tree)
                if "SortMergeJoin" in n.nodeName()
            ]
            assert smj, "expected a sort-merge join"
            sides = [
                smj[0].children().apply(0),
                smj[0].children().apply(1),
            ]
            per_side = [
                (
                    any(
                        "mh_bands_store" in n.toString()
                        for n in _walk(s)
                        if "Scan" in n.nodeName()
                    ),
                    sum(
                        1
                        for n in _walk(s)
                        if "Exchange" in n.nodeName()
                    ),
                )
                for s in sides
            ]
            stored_sides = [p for p in per_side if p[0]]
            new_sides = [p for p in per_side if not p[0]]
            assert len(stored_sides) == 1, per_side
            assert stored_sides[0][1] == 0, (
                "bucketed store side must not re-shuffle",
                per_side,
            )
            assert new_sides[0][1] >= 1, per_side
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS mh_bands_store")


def test_managed_write_survives_orphaned_location(spark):
    """The round-10 regression, pinned: a MANAGED bucketed table whose
    warehouse directory was left behind by a DEAD session (files on
    disk, no catalog entry — the in-memory catalog forgets everything
    at session end) must be rewritable, not LOCATION_ALREADY_EXISTS.
    Reproduces the orphan state directly: plant files at the location
    a managed table would occupy while the catalog has no entry, then
    write — write_bucketed_table must clear the orphan and succeed."""
    import os

    table = "orphan_idempotence_probe"
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    loc = os.path.join(warehouse.removeprefix("file:"), table)
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    try:
        # The orphan: a prior session's files, no catalog entry.
        assert not spark.catalog.tableExists(table)
        os.makedirs(loc, exist_ok=True)
        with open(os.path.join(loc, "part-stale.parquet"), "wb") as fh:
            fh.write(b"stale")

        write_bucketed_table(df, table, ["k"], 4)  # no path= → managed
        assert spark.table(table).count() == 100

        # And within-session rerun (catalog entry present) still works.
        write_bucketed_table(df, table, ["k"], 4)
        assert spark.table(table).count() == 100
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        import shutil

        shutil.rmtree(loc, ignore_errors=True)


def test_orphan_cleanup_never_touches_live_or_qualified_tables(spark):
    """The cleanup helper's guards: a managed table the CURRENT
    catalog tracks is alive (its directory must survive a cleanup call
    with its name), and a db-qualified name resolves to the DATABASE's
    directory (warehouse/<db>.db/<name>) — never the bare-name path of
    a different default-db table, even when the bare parts collide."""
    import os

    from financial_data_pipeline_optimization_spark.sources.bucketing import (
        _delete_orphaned_managed_location,
    )

    table = "live_guard_probe"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        spark.range(10).write.saveAsTable(table)
        loc = os.path.join(
            spark.conf.get("spark.sql.warehouse.dir").removeprefix(
                "file:"
            ),
            table,
        )
        assert os.path.isdir(loc)
        # Live table: guard must refuse to delete its directory.
        _delete_orphaned_managed_location(spark, table)
        assert os.path.isdir(loc)
        assert spark.table(table).count() == 10
        # Qualified name whose bare part collides with the live
        # table: resolves to warehouse/otherdb.db/<name> (absent →
        # no-op), never deletes warehouse/<bare-name>.
        _delete_orphaned_managed_location(spark, f"otherdb.{table}")
        assert os.path.isdir(loc)
        assert spark.table(table).count() == 10
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_registered_bucketed_pagerank_matches_plain(spark):
    """q_pagerank_3iter_bucketed is the same function of the input
    tables as q_pagerank_3iter — only the edge layout differs. Pin
    value equality of the full registered outputs (top-15 rows,
    rounded ranks) and that the bucketed variant's edge scan reads a
    catalog table (the bucketed store, not a re-derived join).
    Cleans up the managed table + cache entry afterwards so a test run
    can never seed stale warehouse state for a later bench/driver
    session (the r10 poisoning vector)."""
    from financial_data_pipeline_optimization_spark.queries.ranking import (
        SPECS,
        _PR_EDGE_TABLES,
    )

    key = (spark.sparkContext.applicationId, SF_SMOKE)
    try:
        plain = SPECS["pagerank_3iter"].spark(spark, SF_SMOKE).collect()
        bucketed = (
            SPECS["pagerank_3iter_bucketed"]
            .spark(spark, SF_SMOKE)
            .collect()
        )
        assert [tuple(r) for r in plain] == [tuple(r) for r in bucketed]
        assert len(plain) == 15
        # The store cache is keyed per (app, sf_dir), table exists.
        assert key in _PR_EDGE_TABLES
        assert spark.catalog.tableExists(_PR_EDGE_TABLES[key])
    finally:
        table = _PR_EDGE_TABLES.pop(key, None)
        if table is not None:
            # DROP on a managed table also deletes its warehouse dir.
            spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_trust_bucketed_table_adopts_stamped_layout(spark):
    """trust_bucketed_table's fresh-session path, without a fresh
    session: build a stamped managed table, then clone its directory
    (part files + sidecar manifest) to a name the catalog has never
    seen — exactly what a new process finds on disk. Trust must
    (a) refuse when the expected stamp mismatches, (b) adopt on match
    by re-registering an external bucketed table over the files with
    no data write, (c) serve identical rows, and (d) preserve the
    bucketing metadata (catalog reports the bucket spec, so bucket-key
    operations stay exchange-free)."""
    import shutil

    from financial_data_pipeline_optimization_spark.sources.bucketing import (
        trust_bucketed_table,
    )

    src_table = "trust_probe_src"
    clone = "trust_probe_clone"
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix(
        "file:"
    )
    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    stamp = {"fdpo.source.fingerprint": "abc123"}
    try:
        write_bucketed_table(df, src_table, ["k"], 4, properties=stamp)
        # In-catalog branch: match trusts, mismatch refuses.
        assert trust_bucketed_table(spark, src_table, stamp)
        assert not trust_bucketed_table(
            spark, src_table, {"fdpo.source.fingerprint": "other"}
        )
        shutil.copytree(f"{warehouse}/{src_table}", f"{warehouse}/{clone}")
        assert not spark.catalog.tableExists(clone)
        # Fresh-catalog branch: wrong stamp refuses and registers
        # nothing; right stamp adopts without writing.
        assert not trust_bucketed_table(
            spark, clone, {"fdpo.source.fingerprint": "other"}
        )
        assert not spark.catalog.tableExists(clone)
        assert trust_bucketed_table(spark, clone, stamp)
        got = spark.table(clone)
        assert got.count() == 1000
        assert sorted(
            tuple(r) for r in got.collect()
        ) == sorted(tuple(r) for r in spark.table(src_table).collect())
        # Bucket spec survived re-registration: a groupBy on the
        # bucket key over the adopted table plans without an Exchange.
        plan = (
            got.groupBy("k")
            .agg(F.sum("v").alias("s"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan, plan
        # Qualified names and missing manifests always refuse.
        assert not trust_bucketed_table(spark, "db.qualified", stamp)
        assert not trust_bucketed_table(spark, "never_written", stamp)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {src_table}")
        # clone is EXTERNAL: drop leaves files; remove them explicitly.
        spark.sql(f"DROP TABLE IF EXISTS {clone}")
        shutil.rmtree(f"{warehouse}/{clone}", ignore_errors=True)


def test_trust_bucketed_table_adopts_db_qualified_layout(spark):
    """r13: db-qualified two-part names are first-class in the trust
    path. Clone a stamped table's directory into a database directory
    the catalog has NEVER seen (warehouse/<db>.db/<name> — where a
    dead session's managed write would have left it): trust must
    recreate the database, register the external bucketed table over
    the files with zero data writes, serve identical rows, and keep
    bucket-key aggregation exchange-free. The managed write path must
    also be idempotent over a db-qualified orphan (the r10 bug class,
    previously default-db-only)."""
    import os
    import shutil

    from financial_data_pipeline_optimization_spark.sources.bucketing import (
        trust_bucketed_table,
    )

    db = "fdpo_trust_qdb"
    qname = f"{db}.trust_probe_q"
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix(
        "file:"
    )
    src_table = "trust_probe_qsrc"
    df = spark.range(900).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("v")
    )
    stamp = {"fdpo.source.fingerprint": "qualified-777"}
    try:
        write_bucketed_table(df, src_table, ["k"], 4, properties=stamp)
        # Plant the fresh-session state: files at the db's derived
        # location, no database or table in the catalog.
        shutil.copytree(
            f"{warehouse}/{src_table}",
            f"{warehouse}/{db}.db/trust_probe_q",
        )
        assert db not in [d.name for d in spark.catalog.listDatabases()]
        # Wrong stamp refuses and registers nothing.
        assert not trust_bucketed_table(
            spark, qname, {"fdpo.source.fingerprint": "other"}
        )
        assert not spark.catalog.tableExists(qname)
        # Right stamp adopts: database recreated, no data write.
        before = sorted(
            os.listdir(f"{warehouse}/{db}.db/trust_probe_q")
        )
        assert trust_bucketed_table(spark, qname, stamp)
        got = spark.table(qname)
        assert got.count() == 900
        assert sorted(
            os.listdir(f"{warehouse}/{db}.db/trust_probe_q")
        ) == before
        plan = (
            got.groupBy("k")
            .agg(F.sum("v").alias("s"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan, plan
        # Idempotent managed write over a db-qualified ORPHAN: drop
        # only the catalog entries (external table — files survive),
        # then write managed into the same qualified name.
        spark.sql(f"DROP TABLE {qname}")
        spark.sql(f"DROP DATABASE {db}")
        write_bucketed_table(df, qname, ["k"], 4, properties=stamp)
        assert spark.table(qname).count() == 900
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {qname}")
        spark.sql(f"DROP DATABASE IF EXISTS {db}")
        spark.sql(f"DROP TABLE IF EXISTS {src_table}")
        shutil.rmtree(f"{warehouse}/{db}.db", ignore_errors=True)

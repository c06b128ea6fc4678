"""Ranking, graph-iteration and attribution driver checks (peeled from
``warehouse.py`` — VERDICT r7/r8 hygiene item — with the same
position-preserving SPECS pattern as ``vector_checks``/``media``:
REGISTRATION ORDER IS LOAD-BEARING for these pre-split names, so this
module only collects ``QuerySpec``s into ``SPECS`` and ``warehouse.py``
appends them into ``_REGISTRY`` at their original positions)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from financial_data_pipeline_optimization_spark.functions import explode_nonempty
from financial_data_pipeline_optimization_spark.operators import joins
from financial_data_pipeline_optimization_spark.queries._registry import (
    QuerySpec,
    _r4,
    _t,
)
from financial_data_pipeline_optimization_spark.queries.breadth import (
    _ORACLE_TOKENS_D,
)

SPECS: dict[str, QuerySpec] = {}


def _register(name: str, oracle: str | None, doc: str = ""):
    """Module-local twin of ``_registry._register``: collects into
    ``SPECS`` instead of appending to the global registry (see module
    docstring)."""

    def deco(fn):
        SPECS[name] = QuerySpec(name, fn, oracle, doc)
        return fn

    return deco


@_register(
    "bm25_topk_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_ORACLE_TOKENS_D}) AS token FROM documents
    ),
    per_doc AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS dl,
             CAST(sum(CASE WHEN token = 'hash' THEN 1 ELSE 0 END)
                  AS BIGINT) AS tf_hash,
             CAST(sum(CASE WHEN token = 'join' THEN 1 ELSE 0 END)
                  AS BIGINT) AS tf_join,
             CAST(sum(CASE WHEN token = 'scan' THEN 1 ELSE 0 END)
                  AS BIGINT) AS tf_scan
      FROM toks WHERE token <> '' GROUP BY doc_id
    ),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl,
             CAST(sum(CASE WHEN tf_hash > 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS df_hash,
             CAST(sum(CASE WHEN tf_join > 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS df_join,
             CAST(sum(CASE WHEN tf_scan > 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS df_scan
      FROM per_doc
    )
    SELECT doc_id,
           CAST((CASE WHEN tf_hash > 0 THEN 1 ELSE 0 END)
                + (CASE WHEN tf_join > 0 THEN 1 ELSE 0 END)
                + (CASE WHEN tf_scan > 0 THEN 1 ELSE 0 END)
                AS INT) AS n_query_terms,
           floor((
               ln(1 + (n_docs - df_hash + 0.5) / (df_hash + 0.5))
                 * (tf_hash * 2.2)
                 / (tf_hash + 1.2 * (0.25 + 0.75 * dl / avgdl))
             + ln(1 + (n_docs - df_join + 0.5) / (df_join + 0.5))
                 * (tf_join * 2.2)
                 / (tf_join + 1.2 * (0.25 + 0.75 * dl / avgdl))
             + ln(1 + (n_docs - df_scan + 0.5) / (df_scan + 0.5))
                 * (tf_scan * 2.2)
                 / (tf_scan + 1.2 * (0.25 + 0.75 * dl / avgdl))
           ) * 10000 + 0.5000005) / 10000 AS bm25_score
    FROM per_doc, stats
    ORDER BY bm25_score DESC, doc_id LIMIT 20
    """,
    doc="BM25 top-k retrieval (Robertson/Sparck Jones probabilistic "
    "weighting, the Lucene idf variant ln(1+(N-df+0.5)/(df+0.5)), "
    "k1=1.2, b=0.75) for a fixed 3-term query over the documents "
    "table. Plan shape is the scale story: ONE token explode feeding "
    "ONE partial-agg groupBy(doc_id) computes dl and every per-term tf "
    "as conditional aggregates (no per-term joins, no inverted index "
    "materialization for a fixed query), corpus stats (N, avgdl, df) "
    "reduce to a single broadcast row, scoring is a row-local "
    "projection, and the top-k is TakeOrdered — documents shuffle "
    "once, as aggregate rows. Ordering on the ROUNDED score keeps the "
    "k-boundary identical across engines.",
)
def q_bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import text as text_ops

    terms = ["hash", "join", "scan"]
    k1, b = 1.2, 0.75
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", explode_nonempty(text_ops.tokens("text")).alias("token")
    ).filter(F.col("token") != "")
    per_doc = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("dl"),
        *[
            F.sum(F.when(F.col("token") == t_, 1).otherwise(0))
            .cast("long")
            .alias(f"tf_{t_}")
            for t_ in terms
        ],
    ).localCheckpoint(eager=False)  # reused by stats AND scoring
    stats = per_doc.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{t_}") > 0).cast("int"))
            .cast("long")
            .alias(f"df_{t_}")
            for t_ in terms
        ],
    )
    scored = per_doc.crossJoin(F.broadcast(stats))
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    score = None
    present = None
    for t_ in terms:
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{t_}") + F.lit(0.5))
            / (F.col(f"df_{t_}") + F.lit(0.5))
        )
        tf = F.col(f"tf_{t_}").cast("double")
        part = idf * (tf * F.lit(k1 + 1.0)) / (tf + norm)
        score = part if score is None else score + part
        p = (F.col(f"tf_{t_}") > 0).cast("int")
        present = p if present is None else present + p
    out = scored.select(
        "doc_id",
        present.cast("int").alias("n_query_terms"),
        _r4(score).alias("bm25_score"),
    )
    return out.orderBy(F.col("bm25_score").desc(), "doc_id").limit(20)


#: Shared by the plain and bucketed PageRank registrations: both
#: compute the SAME function of the input tables (the bucketed variant
#: only changes the physical layout), so they share one oracle text.
_PAGERANK_ORACLE = """
    WITH cs AS (
      SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    edges AS (SELECT src, dst FROM cs
              UNION ALL SELECT dst AS src, src AS dst FROM cs),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
            FROM edges GROUP BY src),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg),
    r0 AS (SELECT src AS node, 1.0 / (SELECT n_nodes FROM n) AS rank
           FROM deg),
    r1 AS (
      SELECT d.src AS node,
             0.15 / (SELECT n_nodes FROM n)
               + 0.85 * COALESCE(m.m, 0) AS rank
      FROM deg d LEFT JOIN (
        SELECT e.dst, sum(r.rank / g.deg) AS m
        FROM edges e JOIN r0 r ON e.src = r.node
        JOIN deg g ON e.src = g.src
        GROUP BY e.dst) m ON d.src = m.dst
    ),
    r2 AS (
      SELECT d.src AS node,
             0.15 / (SELECT n_nodes FROM n)
               + 0.85 * COALESCE(m.m, 0) AS rank
      FROM deg d LEFT JOIN (
        SELECT e.dst, sum(r.rank / g.deg) AS m
        FROM edges e JOIN r1 r ON e.src = r.node
        JOIN deg g ON e.src = g.src
        GROUP BY e.dst) m ON d.src = m.dst
    ),
    r3 AS (
      SELECT d.src AS node,
             0.15 / (SELECT n_nodes FROM n)
               + 0.85 * COALESCE(m.m, 0) AS rank
      FROM deg d LEFT JOIN (
        SELECT e.dst, sum(r.rank / g.deg) AS m
        FROM edges e JOIN r2 r ON e.src = r.node
        JOIN deg g ON e.src = g.src
        GROUP BY e.dst) m ON d.src = m.dst
    )
    SELECT node,
           CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
             AS node_type,
           floor(rank * 10000000 + 0.50000005) / 10000000 AS pagerank
    FROM r3 ORDER BY pagerank DESC, node LIMIT 15
    """


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric bipartite customer-supplier trade edges (node ids
    disjoint by parity: customers even, suppliers odd)."""
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    cs = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    return cs.union(
        cs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def _pagerank_top15(ranks: DataFrame) -> DataFrame:
    out = ranks.select(
        "node",
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        (
            F.floor(F.col("rank") * 10000000 + F.lit(0.50000005)) / 10000000
        ).alias("pagerank"),
    )
    return out.orderBy(F.col("pagerank").desc(), "node").limit(15)


@_register(
    "pagerank_3iter",
    _PAGERANK_ORACLE,
    doc="PageRank, 3 fixed power iterations (damping 0.85, uniform "
    "init) over the bipartite customer-supplier trade graph "
    "(orders x lineitem, both directions so no dangling mass), top-15 "
    "nodes. The iterative-algorithm pattern done Spark-right: each "
    "iteration is ONE lazy plan (edges join ranks join degrees, one "
    "keyed aggregation) with localCheckpoint truncating lineage so "
    "iteration k's plan does not nest k copies of the upstream graph "
    "build; the node count rides as a broadcast scalar, never a "
    "driver-side collect. Oracle unrolls the same 3 iterations as "
    "chained CTEs. Ordering on the ROUNDED rank keeps the k-boundary "
    "engine-stable.",
)
def q_pagerank_3iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # graph build runs once, not 3x
    edges = _trade_edges(spark, sf_dir).localCheckpoint(eager=False)
    # Iteration lives in operators.graph.pagerank_on: degree rides ON
    # the checkpointed edge list so each round is exactly one join +
    # one keyed aggregation, and the symmetric edge set guarantees
    # every node receives mass (no node-list left join, no dangling
    # redistribution). Feed pagerank_on a src-bucketed TABLE with
    # checkpoint_edges=False to additionally drop the per-round edge
    # shuffles (see tests/test_bucketing.py and
    # q_pagerank_3iter_bucketed below).
    from financial_data_pipeline_optimization_spark.operators.graph import pagerank_on

    ranks = pagerank_on(edges, iters=3, reset=0.15)
    return _pagerank_top15(ranks)


#: One bucketed edge table per (app-id, sf_dir), same discipline as
#: the ANN index caches in queries.documents: the layout build (write
#: the symmetric edge set bucketed by src) is one-time index cost, the
#: registered query re-runs only the iteration over the bucketed
#: table. Keyed by app id; a table left by an earlier session is
#: adopted only when its content-addressed stamp (source-file
#: fingerprint, sources.bucketing.trust_bucketed_table) matches —
#: otherwise rebuilt. At 100 TB a rebuild-per-session of a ~100 TB
#: layout is not amortizable; the stamp is what makes "one-time" true
#: across sessions while staying crash-safe (a half-written table has
#: no manifest and is never trusted).
_PR_EDGE_TABLES: dict = {}


def _source_file_fingerprint(
    spark: SparkSession, sf_dir: str, tables: tuple = ("orders", "lineitem")
) -> str:
    """Content address of the edge build's INPUTS: (name, length,
    mtime) of every data file of every source table, hashed. A
    manifest/metadata read — never touches row data, so it costs
    microseconds at any scale. Any rewrite of a source file changes
    the fingerprint and forces a rebuild."""
    import hashlib

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    parts = []
    for t in tables:
        p = jvm.org.apache.hadoop.fs.Path(f"{sf_dir}/{t}.parquet")
        fs = p.getFileSystem(conf)
        statuses = (
            [
                s
                for s in fs.listStatus(p)
                if not s.getPath().getName().startswith(("_", "."))
            ]
            if fs.isDirectory(p)
            else [fs.getFileStatus(p)]
        )
        for s in statuses:
            parts.append(
                f"{t}/{s.getPath().getName()}:{s.getLen()}"
                f":{s.getModificationTime()}"
            )
    return hashlib.md5("|".join(sorted(parts)).encode()).hexdigest()


def _bucketed_trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math
    import re

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _PR_EDGE_TABLES:
        from financial_data_pipeline_optimization_spark.sources.bucketing import (
            trust_bucketed_table,
            write_bucketed_table,
        )

        table = "pr_edges_by_src_" + re.sub(
            r"\W+", "_", sf_dir
        ).strip("_")
        stamp = {
            "fdpo.source.fingerprint": _source_file_fingerprint(
                spark, sf_dir
            )
        }
        if trust_bucketed_table(spark, table, stamp):
            _PR_EDGE_TABLES[key] = table
            return spark.table(table)
        # localCheckpoint so the sizing count() and the bucketed write
        # share ONE materialization of the join+distinct+union graph
        # build instead of computing it twice.
        edges = _trade_edges(spark, sf_dir).localCheckpoint()
        # Size buckets from the data (the write-time decision bucketing
        # demands): ~2M edge rows (~32 MB) per bucket, so one bucket is
        # one healthy task at any scale — 8 at the driver SFs, ~60 at
        # the x100 replicated corpus, ~1000 toward the 100 TB point.
        n_edges = edges.count()
        n_buckets = max(8, min(1024, math.ceil(n_edges / 2_000_000)))
        write_bucketed_table(
            edges,
            table,
            ["src"],
            n_buckets,
            properties={**stamp, "fdpo.n_edges": str(n_edges)},
        )
        _PR_EDGE_TABLES[key] = table
    return spark.table(_PR_EDGE_TABLES[key])


@_register(
    "pagerank_3iter_bucketed",
    _PAGERANK_ORACLE,
    doc="pagerank_3iter over a src-BUCKETED edge table — the layout "
    "that survives 100 TB. The plain variant re-shuffles the full "
    "edge relation (the data-sized side) once per iteration; here the "
    "edge set is materialized once via write_bucketed_table (bucket "
    "count sized from the edge count, ~2M rows/bucket) and "
    "pagerank_on(checkpoint_edges=False) reads it pre-partitioned, so "
    "every iteration's edges-x-ranks join moves only the node-sized "
    "rank table. Same function of the inputs, same oracle text as "
    "pagerank_3iter; the layout build is one-time index cost (cached "
    "per session, the ANN-store discipline). "
    "tests/test_bucketing.py pins the exchange elimination and "
    "rank equality.",
)
def q_pagerank_3iter_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators.graph import pagerank_on

    edges = _bucketed_trade_edges(spark, sf_dir)
    ranks = pagerank_on(
        edges, iters=3, reset=0.15, checkpoint_edges=False
    )
    return _pagerank_top15(ranks)


@_register(
    "bigram_interp_logprob",
    f"""
    WITH filt AS (
      SELECT doc_id, list_filter({_ORACLE_TOKENS_D}, x -> x <> '') AS t
      FROM documents
    ),
    uc AS (
      SELECT w, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(t) AS w FROM filt) GROUP BY w
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM uc),
    bi AS (
      SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
      FROM filt, unnest(range(1, len(t))) AS u(i)
      WHERE len(t) >= 2
    ),
    bc AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
      FROM bi GROUP BY 1, 2
    ),
    scored AS (
      SELECT b.doc_id,
             0.7 * bc.c12 / u1.c
               + 0.3 * u2.c / (SELECT total FROM tot) AS p
      FROM bi b
      JOIN bc ON b.w1 = bc.w1 AND b.w2 = bc.w2
      JOIN uc u1 ON b.w1 = u1.w
      JOIN uc u2 ON b.w2 = u2.w
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           floor(avg(-ln(p)) * 10000 + 0.5000005) / 10000
             AS mean_neg_logprob
    FROM scored GROUP BY doc_id
    """,
    doc="Interpolated bigram LM scoring (the KenLM-style quality "
    "signal one rung above unigram_logprob_score): corpus-trained "
    "P(w2|w1) = 0.7*c(w1,w2)/c(w1) + 0.3*c(w2)/T, per-doc mean "
    "negative log-prob over its bigrams. ONE tokenize+explode corpus "
    "pass (arrays_zip null-padding — the pmi_bigram_phrases "
    "restructure at positional grain) materializes hashed "
    "(doc_id, h1, h2-or-null) rows that serve the unigram counts, "
    "bigram counts, corpus total, AND the scoring stream; every join "
    "shuffles 8-byte keys. Bigram construction stays row-local (no "
    "adjacency shuffle). Docs with fewer than 2 tokens drop out on "
    "both engines.",
)
def q_bigram_interp_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE corpus tokenize+explode pass (the pmi_bigram_phrases
    # restructure, kept at POSITIONAL grain because the score is a
    # per-document mean over bigram positions): each token emits
    # exactly one (h1, next-token-hash-or-null) row via arrays_zip
    # null-padding, so the same materialized table yields the unigram
    # counts (every token appears once as h1), the bigram counts, the
    # corpus total, and the per-position scoring stream. The old
    # shape re-ran the tokenize for every consumer (uc, bc, scored) —
    # measured 180 s at the ×100 corpus vs ~30 s per tokenize
    # evaluation (SCALING.md). Tokens become 8-byte xxhash64 longs at
    # the scan (the unigram_logprob_score trade, collisions ~1e-10):
    # the checkpoint holds 24-byte rows, not word pairs, and every
    # join shuffles fixed-width keys. Oracle unchanged.
    from financial_data_pipeline_optimization_spark.operators import text as text_ops

    docs = _t(spark, sf_dir, "documents")
    toks = F.filter(text_ops.tokens("text"), lambda x: x != F.lit(""))
    t = F.col("t")
    pc = (
        docs.select("doc_id", toks.alias("t"))
        .select(
            "doc_id",
            explode_nonempty(
                F.arrays_zip(
                    t.alias("w1"),
                    F.slice(
                        t, 2, F.greatest(F.size(t) - 1, F.lit(0))
                    ).alias("w2"),
                )
            ).alias("p"),
        )
        # The zipped array is NOT non-empty by construction here — the
        # x != '' filter empties a punct-only doc's [''] to [], and
        # NULL text yields a NULL array — so explode_nonempty (an
        # explode_outer) emits a p=NULL phantom row for each. Left
        # unfiltered, xxhash64(p.w1) hashes NULL to a non-null
        # constant, minting a phantom unigram that inflates uc and
        # tot and shifts every doc's interpolated log-prob vs the
        # oracle (which unnests and contributes nothing). The guard
        # reads only the generated attribute, so it cannot be pushed
        # below the Generate and never re-evaluates the tokenize.
        .where(F.col("p.w1").isNotNull())
        .select(
            "doc_id",
            F.xxhash64("p.w1").alias("h1"),
            # xxhash64(NULL) is NOT null (it hashes zero inputs), so
            # the null-successor marker must be kept explicitly.
            F.when(
                F.col("p.w2").isNotNull(), F.xxhash64("p.w2")
            ).alias("h2"),
        )
        .localCheckpoint(eager=False)  # four consumers, one scan
    )
    uc = (
        pc.groupBy(F.col("h1").alias("h"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)  # reused for w1, w2 AND total
    )
    tot = uc.agg(F.sum("c").cast("long").alias("total"))
    bi = pc.where(F.col("h2").isNotNull())
    bc = bi.groupBy("h1", "h2").agg(
        F.count(F.lit(1)).cast("long").alias("c12")
    )
    # MEASURED NEGATIVE (r15): the unigram_logprob_score vocab
    # broadcast gate (joins.broadcast_if_small on uc) was wired here
    # and REVERTED on a 3-way fresh-JVM A/B at zx100 — gated ~19-23 s
    # per evaluation vs ~13-14 s plain. Two mechanisms, both specific
    # to THIS query's shape: (a) the gate's count action forces the
    # corpus-sized pc checkpoint to materialize as a STANDALONE job
    # (no overlap with downstream partial aggregation — in unigram the
    # analogous checkpoint is only vocab-sized, so its count is nearly
    # free); (b) the hint buys nothing — AQE already upgrades both uc
    # scoring joins to broadcast at every measured SF (the executed
    # plan carries 2 BroadcastHashJoin with the hint OFF), because
    # uc's materialized LogicalRDD stats are exact where unigram's
    # un-checkpointed count table's are conservative.
    scored = (
        bi.join(bc, ["h1", "h2"])
        .join(uc.select(F.col("h").alias("h1"), F.col("c").alias("c1")), "h1")
        .join(uc.select(F.col("h").alias("h2"), F.col("c").alias("c2")), "h2")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            (
                F.lit(0.7) * F.col("c12") / F.col("c1")
                + F.lit(0.3) * F.col("c2") / F.col("total")
            ).alias("p"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        _r4(F.avg(-F.log("p"))).alias("mean_neg_logprob"),
    )


@_register(
    "triangle_count_order_bursts",
    """
    WITH e AS (
      SELECT x.o_orderkey AS a, y.o_orderkey AS b
      FROM orders x JOIN orders y
        ON x.o_custkey = y.o_custkey
       AND x.o_orderkey < y.o_orderkey
       AND abs(date_diff('day', x.o_orderdate, y.o_orderdate)) <= 7
    ),
    deg AS (
      SELECT n, CAST(count(*) AS BIGINT) AS d
      FROM (SELECT a AS n FROM e UNION ALL SELECT b AS n FROM e)
      GROUP BY n
    ),
    tri AS (
      SELECT CAST(count(*) AS BIGINT) AS n_triangles
      FROM e e1
      JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
      JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
           (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
           (SELECT CAST(sum(d * (d - 1) / 2) AS BIGINT) FROM deg)
             AS n_wedges,
           (SELECT n_triangles FROM tri) AS n_triangles,
           CASE WHEN (SELECT sum(d * (d - 1) / 2) FROM deg) > 0 THEN
             floor(3.0 * (SELECT n_triangles FROM tri)
                   / (SELECT sum(d * (d - 1) / 2) FROM deg)
                   * 10000 + 0.5000005) / 10000
           END AS transitivity
    """,
    doc="Triangle counting + global transitivity over the order-burst "
    "graph: orders by the SAME customer within 7 days are adjacent, so "
    "triangles are 3-order purchase bursts (pairwise within a week). "
    "The graph is NATURALLY SPARSE with per-node degree bounded by one "
    "customer's orders in a +-7-day window — the property that keeps "
    "the canonical id-ordered triple join (wedges e1xe2 closed by an "
    "e3 probe; wedge TOTAL from degrees, never enumerated) linear-ish "
    "at any corpus size. A first cut of this query used the "
    "supplier-co-occurrence graph instead, which is COMPLETE on this "
    "data (every supplier pair shares an order) — a reminder that "
    "triple-join triangle counting is O(sum deg^2) and graph choice, "
    "then low-degree->high-degree orientation (Suri/Vassilvitskii "
    "WWW'11), is what makes it survive scale.",
)
def q_triangle_count_order_bursts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    e = (
        orders.alias("x")
        .join(
            orders.alias("y"),
            (F.col("x.o_custkey") == F.col("y.o_custkey"))
            & (F.col("x.o_orderkey") < F.col("y.o_orderkey"))
            & (
                F.abs(
                    F.datediff(
                        F.col("x.o_orderdate"), F.col("y.o_orderdate")
                    )
                )
                <= 7
            ),
        )
        .select(
            F.col("x.o_orderkey").alias("a"),
            F.col("y.o_orderkey").alias("b"),
        )
        .localCheckpoint(eager=False)  # reused by deg + 3 join legs
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    node_stats = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long").alias(
            "n_wedges"
        ),
    )
    edge_stats = e.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    tri = (
        e.alias("e1")
        .join(
            e.alias("e2"),
            (F.col("e2.a") == F.col("e1.a"))
            & (F.col("e2.b") > F.col("e1.b")),
        )
        .join(
            e.alias("e3"),
            (F.col("e3.a") == F.col("e1.b"))
            & (F.col("e3.b") == F.col("e2.b")),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    return (
        F.broadcast(node_stats)
        .crossJoin(F.broadcast(edge_stats))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            # Wedge-free graph (tiny/degenerate corpus): transitivity
            # is undefined — NULL, not an ANSI divide-by-zero crash
            # (r16: the sf0.001 smoke graph has no degree-2 node).
            F.when(
                F.col("n_wedges") > 0,
                _r4(
                    F.lit(3.0) * F.col("n_triangles")
                    / F.col("n_wedges")
                ),
            ).alias("transitivity"),
        )
    )


@_register(
    "last_touch_attribution",
    """
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch
      FROM events
    ),
    attributed AS (
      SELECT COALESCE(touch, 'none') AS touch_type
      FROM ordered WHERE event_type = 'purchase'
    )
    SELECT touch_type, CAST(count(*) AS BIGINT) AS n_purchases,
           floor(count(*) * 10000.0
                 / (SELECT count(*) FROM attributed)
                 + 0.5000005) / 10000 AS share
    FROM attributed GROUP BY touch_type
    """,
    doc="Last-touch marketing attribution: every purchase event is "
    "credited to the user's most recent PRECEDING non-purchase event "
    "(ignore-nulls last_value over a rows-preceding frame — no "
    "self-join, no per-user collect), purchases with no prior touch "
    "credit 'none'. One exchange on user_id for the window, then a "
    "tiny enum-sized aggregate; the share denominator derives from "
    "the aggregate itself, not a second event scan.",
)
def q_last_touch_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    attributed = (
        ev.withColumn("touch", touch)
        .filter(F.col("event_type") == "purchase")
        .select(F.coalesce(F.col("touch"), F.lit("none")).alias("touch_type"))
        .localCheckpoint(eager=False)  # reused for the denominator
    )
    total = attributed.agg(
        F.count(F.lit(1)).cast("long").alias("n_total")
    )
    return (
        attributed.groupBy("touch_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_purchases"))
        .crossJoin(F.broadcast(total))
        .select(
            "touch_type",
            "n_purchases",
            _r4(
                F.col("n_purchases") / F.col("n_total").cast("double")
            ).alias("share"),
        )
    )




# New-in-r10 name, appended here rather than via @_register so it
# joins the rotation as a FRESH name. Note this append executes
# mid-registration (warehouse.py imports ranking at its top, so later
# modules register after it) — that is fine: the relative order of
# previously-registered names is preserved, and registry() sorts
# fresh/never-green names to the front of the driver window anyway.
from financial_data_pipeline_optimization_spark.queries._registry import _REGISTRY  # noqa: E402

_REGISTRY.append(SPECS["pagerank_3iter_bucketed"])

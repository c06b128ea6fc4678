"""Dataset QA: drift, agreement, anomaly monitoring (split from the original queries.py; registration
order preserved — modules import in the original definition order)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from financial_data_pipeline_optimization_spark.functions import explode_nonempty, portable_id
from financial_data_pipeline_optimization_spark.operators import (
    clean,
    dedup,
    joins,
    scd,
    sketch,
    temporal,
    timeseries,
)
from financial_data_pipeline_optimization_spark.sources import load_table

from financial_data_pipeline_optimization_spark.queries._registry import (
    QuerySpec,
    _REGISTRY,
    _r2,
    _r4,
    _register,
    _t,
)

from financial_data_pipeline_optimization_spark.queries.documents import (
    _ORACLE_TOKENS,
    _lang_id_oracle,
)


# ===========================================================================
# Dataset QA: distribution drift and label agreement (r5b).
# ===========================================================================


@_register(
    "psi_drift_by_priority",
    """
    WITH ref AS (
      SELECT o_orderpriority AS pri, o_totalprice AS p FROM orders
      WHERE o_orderdate < TIMESTAMP '1998-01-01'
    ),
    cur AS (
      SELECT o_orderpriority AS pri, o_totalprice AS p FROM orders
      WHERE o_orderdate >= TIMESTAMP '1998-01-01'
    ),
    edges AS (
      SELECT pri,
             quantile_cont(p, [0.25, 0.5, 0.75]) AS qs
      FROM ref GROUP BY 1
    ),
    rb AS (
      SELECT r.pri,
             len(list_filter(e.qs, q -> q <= r.p)) AS bin
      FROM ref r JOIN edges e ON r.pri = e.pri
    ),
    cb AS (
      SELECT c.pri,
             len(list_filter(e.qs, q -> q <= c.p)) AS bin
      FROM cur c JOIN edges e ON c.pri = e.pri
    ),
    rc AS (
      SELECT pri, bin, CAST(count(*) AS DOUBLE) AS n FROM rb
      GROUP BY 1, 2
    ),
    cc AS (
      SELECT pri, bin, CAST(count(*) AS DOUBLE) AS n FROM cb
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT rc.pri, rc.bin,
             rc.n / sum(rc.n) OVER (PARTITION BY rc.pri) AS pr,
             cc.n / sum(cc.n) OVER (PARTITION BY cc.pri) AS pc,
             rc.n AS nr, cc.n AS nc
      FROM rc JOIN cc ON rc.pri = cc.pri AND rc.bin = cc.bin
    )
    SELECT pri AS o_orderpriority,
           CAST(sum(nr) AS BIGINT) AS n_ref,
           CAST(sum(nc) AS BIGINT) AS n_cur,
           floor(sum((pc - pr) * ln(pc / pr)) * 10000 + 0.5000005)
             / 10000 AS psi
    FROM tot GROUP BY 1 ORDER BY 1
    """,
    doc="Population-stability-index drift monitor: quartile bin edges "
    "are fit on the REFERENCE period (pre-1994) per priority class, "
    "both periods are binned against those frozen edges, and "
    "PSI = Σ(p_cur−p_ref)·ln(p_cur/p_ref) flags the classes whose "
    "price distribution moved (>0.1 investigate, >0.25 act — the "
    "standard monitoring rule). The production gate that catches "
    "upstream data changes before a model retrain ingests them. "
    "Scale shape: edges are a per-group percentile aggregate "
    "(bounded: groups × 3 doubles) broadcast back; binning is a "
    "row-local array filter; everything after is arithmetic on the "
    "4-bins-per-group count table. Two corpus scans, no corpus "
    "shuffle beyond the two partial-aggregated counts.",
)
def q_psi_drift_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    split = F.lit("1998-01-01").cast("timestamp")
    base = orders.select(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_totalprice").alias("p"),
        (F.col("o_orderdate") < split).alias("is_ref"),
    )
    edges = (
        base.where("is_ref")
        .groupBy("pri")
        .agg(
            F.expr(
                "percentile(p, array(0.25D, 0.5D, 0.75D))"
            ).alias("qs")
        )
    )
    binned = base.join(F.broadcast(edges), "pri").select(
        "pri",
        "is_ref",
        F.size(
            F.filter("qs", lambda qv: qv <= F.col("p"))
        ).alias("bin"),
    )
    cnt = binned.groupBy("pri", "bin").agg(
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0))
        .cast("double")
        .alias("nr"),
        F.sum(F.when(F.col("is_ref"), 0).otherwise(1))
        .cast("double")
        .alias("nc"),
    )
    wpri = Window.partitionBy("pri")
    # One-sided-bin convention, shared with the oracle's inner join:
    # a (pri, bin) empty in either period is dropped BEFORE the
    # per-priority renormalization, so both engines normalize over the
    # matched bins only (keeping it would zero one proportion, NULL
    # the log term, and silently diverge n_ref/n_cur on degenerate or
    # tiny inputs where a quartile bin can be empty on one side).
    both = cnt.filter((F.col("nr") > 0) & (F.col("nc") > 0))
    prop = both.select(
        "pri",
        "nr",
        "nc",
        (F.col("nr") / F.sum("nr").over(wpri)).alias("pr"),
        (F.col("nc") / F.sum("nc").over(wpri)).alias("pc"),
    )
    return (
        prop.groupBy(F.col("pri").alias("o_orderpriority"))
        .agg(
            F.sum("nr").cast("long").alias("n_ref"),
            F.sum("nc").cast("long").alias("n_cur"),
            _r4(
                F.sum(
                    (F.col("pc") - F.col("pr"))
                    * F.log(F.col("pc") / F.col("pr"))
                )
            ).alias("psi"),
        )
        .orderBy("o_orderpriority")
    )


def _kappa_oracle() -> str:
    pred_cte = _lang_id_oracle().strip().rstrip()
    # Reuse the lang-id oracle verbatim as a subquery so the agreement
    # numbers can never drift from the lang_id_heuristic contract.
    return f"""
    WITH pred AS ({pred_cte}),
    j AS (
      SELECT d.lang AS truth, p.lang_pred AS guess
      FROM documents d JOIN pred p ON d.doc_id = p.doc_id
    ),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM j),
    po AS (
      SELECT sum(CASE WHEN truth = guess THEN 1.0 ELSE 0.0 END)
             / (SELECT n FROM n) AS po
      FROM j
    ),
    tm AS (SELECT truth AS k, count(*) AS c FROM j GROUP BY 1),
    gm AS (SELECT guess AS k, count(*) AS c FROM j GROUP BY 1),
    pe AS (
      SELECT sum(CAST(tm.c AS DOUBLE) * gm.c)
             / ((SELECT n FROM n) * (SELECT n FROM n)) AS pe
      FROM tm JOIN gm ON tm.k = gm.k
    )
    SELECT CAST((SELECT n FROM n) AS BIGINT) AS n_docs,
           floor(po.po * 10000 + 0.5000005) / 10000 AS po,
           floor(pe.pe * 10000 + 0.5000005) / 10000 AS pe,
           floor((po.po - pe.pe) / (1 - pe.pe) * 10000 + 0.5000005)
             / 10000 AS kappa
    FROM po, pe
    """


@_register(
    "lang_agreement_kappa",
    None,  # patched below: the oracle embeds _lang_id_oracle()
    doc="Cohen's κ between the stored language label and the stopword "
    "lang-id heuristic — the chance-corrected agreement score used "
    "to audit noisy labels and weak annotators before training on "
    "them (κ≈0 means the cheap signal is guessing; κ>0.6 means the "
    "label column is learnable from text alone). Computed from the "
    "bounded class×class confusion table: one corpus pass builds "
    "per-doc predictions (row-local marker intersection), one "
    "aggregate reduces to ≤6×6 joint counts, and κ's marginals are "
    "arithmetic on that tiny table — agreement at 100 TB costs one "
    "scan + one 36-row shuffle.",
)
def q_lang_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import text as text_ops

    docs = _t(spark, sf_dir, "documents")
    j = text_ops.with_lang_id(docs, "text").select(
        F.col("lang").alias("truth"), F.col("lang_pred").alias("guess")
    )
    cm = (
        j.groupBy("truth", "guess")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .localCheckpoint(eager=False)  # n, po, and both marginals
    )
    n = cm.agg(F.sum("c").alias("n"))
    po = cm.crossJoin(F.broadcast(n)).agg(
        (
            F.sum(F.when(F.col("truth") == F.col("guess"), F.col("c")))
            / F.first("n")
        ).alias("po"),
        F.first("n").alias("n"),
    )
    tm = cm.groupBy("truth").agg(F.sum("c").alias("tc"))
    gm = cm.groupBy("guess").agg(F.sum("c").alias("gc"))
    pe = (
        tm.join(gm, tm["truth"] == gm["guess"])
        .agg(F.sum(F.col("tc") * F.col("gc")).alias("s"))
        .crossJoin(F.broadcast(n))
        .select((F.col("s") / (F.col("n") * F.col("n"))).alias("pe"))
    )
    return po.crossJoin(F.broadcast(pe)).select(
        F.col("n").cast("long").alias("n_docs"),
        _r4(F.col("po")).alias("po"),
        _r4(F.col("pe")).alias("pe"),
        _r4(
            (F.col("po") - F.col("pe")) / (F.lit(1.0) - F.col("pe"))
        ).alias("kappa"),
    )


for _i, _s in enumerate(_REGISTRY):
    if _s.name == "lang_agreement_kappa" and _s.oracle is None:
        _REGISTRY[_i] = QuerySpec(_s.name, _s.spark, _kappa_oracle(), _s.doc)


@_register(
    "shingle_novelty_score",
    f"""
    WITH t AS (SELECT doc_id, {_ORACLE_TOKENS} AS tk FROM documents),
    g AS (SELECT DISTINCT doc_id, array_to_string(tk[i+1:i+5], ' ') AS s
          FROM t, UNNEST(range(greatest(len(tk) - 4, 1))) AS u(i)),
    fs AS (SELECT s, min(doc_id) AS first_doc FROM g GROUP BY 1)
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN fs.first_doc < g.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_seen_before,
           floor((1 - sum(CASE WHEN fs.first_doc < g.doc_id
                              THEN 1 ELSE 0 END)::DOUBLE / count(*))
                 * 10000 + 0.5000005)/10000 AS novelty_frac
    FROM g JOIN fs USING (s)
    GROUP BY 1
    """,
    doc="Per-document shingle novelty vs the strictly-earlier corpus "
    "(operators.dedup.shingle_novelty): fraction of a doc's distinct "
    "5-gram shingles first seen in THIS doc — the incremental-crawl "
    "mirror/SEO-spam down-weighting signal. One min-per-shingle "
    "partial agg + same-key join back; every shuffled row is a "
    "16-byte md5 and an id, documents never move. The oracle "
    "recomputes first sightings over raw shingle strings, so the "
    "hashed plan is verified against the unhashed semantics.",
)
def q_shingle_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import dedup as dedup_ops

    docs = _t(spark, sf_dir, "documents")
    return dedup_ops.shingle_novelty(docs, "doc_id", "text", n=5).select(
        "doc_id",
        "n_shingles",
        "n_seen_before",
        _r4(F.col("novelty_frac")).alias("novelty_frac"),
    )


@_register(
    "relative_length_filter",
    f"""
    WITH c AS (SELECT doc_id, lang,
                      CAST(len({_ORACLE_TOKENS}) AS INT) AS n_tokens
               FROM documents),
    h AS (SELECT lang, n_tokens, count(*) AS n FROM c GROUP BY 1, 2),
    f AS (SELECT lang, n_tokens, n,
                 sum(n) OVER (PARTITION BY lang ORDER BY n_tokens) AS cum,
                 sum(n) OVER (PARTITION BY lang) AS tot
          FROM h)
    SELECT c.doc_id, c.lang, c.n_tokens,
           (f.cum * 100 > 5 * f.tot
            AND (f.cum - f.n) * 100 < 98 * f.tot) AS keep
    FROM c JOIN f USING (lang, n_tokens)
    """,
    doc="CCNet-style RELATIVE length gate (operators.text."
    "relative_length_flags): keep a doc iff its token count sits in "
    "its own language's central mass (5th..98th percentile by doc "
    "mass) — absolute length cuts bias multilingual corpora. The "
    "distribution is the (lang, count)->n aggregate, so the "
    "cumulative window runs over a TINY table and the verdict joins "
    "back broadcast; all comparisons are exact BIGINT arithmetic "
    "(cum*100 > pct*tot), bit-identical across engines.",
)
def q_relative_length_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import text as text_ops

    docs = _t(spark, sf_dir, "documents")
    return text_ops.relative_length_flags(docs, "doc_id", "lang", "text")


@_register(
    "template_prefix_flags",
    f"""
    WITH p AS (SELECT doc_id, source,
                      array_to_string(({_ORACLE_TOKENS})[1:5], ' ') AS pre
               FROM documents),
    g AS (SELECT source, pre, count(DISTINCT doc_id) AS nd
          FROM p GROUP BY 1, 2)
    SELECT p.doc_id, p.source, (g.nd >= 2) AS is_template
    FROM p JOIN g USING (source, pre)
    """,
    doc="Shared-head template detection (operators.text."
    "template_prefix_flags): a doc is templated iff >=2 docs of its "
    "source open with the identical first-5-token prefix — the cheap "
    "mail-merge/mirrored-listing pre-filter before any pairwise "
    "near-dup join. One (source, md5(prefix)) distinct-count partial "
    "agg + same-key join back; the oracle groups raw prefixes, "
    "verifying the hashed plan against unhashed semantics.",
)
def q_template_prefix_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import text as text_ops

    docs = _t(spark, sf_dir, "documents")
    return text_ops.template_prefix_flags(
        docs, "doc_id", "source", "text", k=5, min_docs=2
    )


#: 3-round k=16 peel unrolled as chained CTEs — shared by the plain
#: and bucketed k-core registrations (same function of the inputs,
#: different physical layout).
_KCORE_ORACLE = """
    WITH cs AS (
      SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    e0 AS (SELECT src, dst FROM cs UNION ALL SELECT dst, src FROM cs),
    d0 AS (SELECT src, count(*) AS deg FROM e0 GROUP BY 1),
    k0 AS (SELECT src FROM d0 WHERE deg >= 16),
    e1 AS (SELECT e.src, e.dst FROM e0 e
           JOIN k0 a ON e.src = a.src JOIN k0 b ON e.dst = b.src),
    d1 AS (SELECT src, count(*) AS deg FROM e1 GROUP BY 1),
    k1 AS (SELECT src FROM d1 WHERE deg >= 16),
    e2 AS (SELECT e.src, e.dst FROM e1 e
           JOIN k1 a ON e.src = a.src JOIN k1 b ON e.dst = b.src),
    d2 AS (SELECT src, count(*) AS deg FROM e2 GROUP BY 1)
    SELECT src AS node,
           CASE WHEN src % 2 = 0 THEN 'customer' ELSE 'supplier' END
             AS node_type,
           CAST(deg AS BIGINT) AS degree
    FROM d2 WHERE deg >= 16
    """


def _kcore_report(core: DataFrame) -> DataFrame:
    return core.select(
        "node",
        F.when(F.col("node") % 2 == 0, "customer")
        .otherwise("supplier")
        .alias("node_type"),
        "degree",
    )


@_register(
    "kcore_trade_graph",
    _KCORE_ORACLE,
    doc="Fixed-round k-core peel (operators.graph.kcore_peel, k=16, "
    "3 rounds) over the bipartite customer-supplier trade graph — "
    "the iterative-PEEL graph shape (degree agg + two node-keyed "
    "semi-joins per round, edge set only shrinks, zero driver "
    "actions: the whole peel is ONE lazy plan, unlike the "
    "convergence-probed CC loop). Web-graph pipelines run this as "
    "the spam-farm/low-engagement scrub. The oracle unrolls the "
    "same three rounds as chained CTEs.",
)
def q_kcore_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import graph as graph_ops

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
    edges = cs.union(
        cs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)  # graph build runs once, not per round
    core = graph_ops.kcore_peel(edges, k=16, rounds=3)
    return _kcore_report(core)


@_register(
    "kcore_trade_graph_bucketed",
    _KCORE_ORACLE,
    doc="kcore_trade_graph over the SAME src-bucketed edge table the "
    "bucketed PageRank reads (queries.ranking._bucketed_trade_edges — "
    "one layout build amortizes across every iterative algorithm on "
    "the graph): kcore_peel(broadcast_keeps=True, "
    "checkpoint_rounds=False) broadcasts the node-sized keep lists so "
    "both per-round semi-joins are broadcast joins, the edge side "
    "keeps the bucketed scan's distribution through every round, and "
    "every round's degree aggregation runs with ZERO exchanges — the "
    "edge relation (the 100 TB side) never shuffles at all. Same "
    "function of the inputs and same oracle text as kcore_trade_graph; "
    "exchange elimination + value equality pinned in "
    "tests/test_bucketing.py.",
)
def q_kcore_trade_graph_bucketed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import graph as graph_ops
    from financial_data_pipeline_optimization_spark.queries.ranking import (
        _bucketed_trade_edges,
    )

    edges = _bucketed_trade_edges(spark, sf_dir)
    core = graph_ops.kcore_peel(
        edges, k=16, rounds=3, broadcast_keeps=True,
        checkpoint_rounds=False,
    )
    return _kcore_report(core)


@_register(
    "incremental_ingest_report",
    f"""
    WITH fp AS (SELECT doc_id, (doc_id % 5 = 0) AS is_new,
                       md5(array_to_string({_ORACLE_TOKENS}, ' ')) AS f
                FROM documents),
    oldfp AS (SELECT DISTINCT f FROM fp WHERE NOT is_new),
    exacts AS (SELECT doc_id FROM fp
               WHERE is_new AND f IN (SELECT f FROM oldfp)),
    surv AS (SELECT doc_id FROM fp
             WHERE is_new AND f NOT IN (SELECT f FROM oldfp)),
    t AS (SELECT doc_id, {_ORACLE_TOKENS} AS tk FROM documents),
    sh AS (SELECT DISTINCT doc_id, array_to_string(tk[i+1:i+2], ' ') AS s
           FROM t, UNNEST(range(greatest(len(tk)-1, 1))) AS u(i)),
    sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
    inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
              FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
              GROUP BY 1, 2),
    pairs AS (SELECT a, b FROM inter
              JOIN sz sa ON a = sa.doc_id JOIN sz sb ON b = sb.doc_id
              WHERE CAST(i AS DOUBLE)/(sa.sz + sb.sz - i) >= 0.8),
    near AS (SELECT DISTINCT n FROM (
               SELECT b AS n, a AS o FROM pairs
               UNION ALL SELECT a AS n, b AS o FROM pairs)
             WHERE n IN (SELECT doc_id FROM surv) AND o % 5 != 0)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM fp WHERE NOT is_new)
             AS n_old,
           (SELECT CAST(count(*) AS BIGINT) FROM fp WHERE is_new)
             AS n_new,
           (SELECT CAST(count(*) AS BIGINT) FROM exacts) AS n_exact_dup,
           (SELECT CAST(count(*) AS BIGINT) FROM near) AS n_near_dup,
           (SELECT CAST(count(*) AS BIGINT) FROM surv)
             - (SELECT CAST(count(*) AS BIGINT) FROM near) AS n_accepted
    """,
    doc="Continuous-ingestion gate end-to-end (plans.corpus."
    "incremental_ingest): split the corpus into an existing 80% and a "
    "new 20% batch (doc_id % 5), then accept only new docs that are "
    "neither exact-fingerprint nor >=0.8-bigram-Jaccard near-dups of "
    "the EXISTING corpus — rejections counted at the first stage that "
    "catches them, so n_new = n_exact_dup + n_near_dup + n_accepted "
    "by construction. The production pair source is the persisted "
    "MinHash band store (only the new batch's band rows shuffle "
    "against the index; equivalence pinned in tests/test_dedup.py); "
    "the driver-checked path runs the exact-Jaccard twin so the "
    "oracle can recompute every stage in SQL.",
)
def q_incremental_ingest_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.plans import corpus as corpus_plan

    docs = _t(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    _accepted, report = corpus_plan.incremental_ingest(
        old, new, shingle_n=2, min_jaccard=0.8, pair_source="exact"
    )
    return report


@_register(
    "quality_expectations_report",
    """
    WITH agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN NOT coalesce(o_totalprice > 0, FALSE)
                           THEN 1 ELSE 0 END) AS BIGINT) AS v0,
             CAST(sum(CASE WHEN NOT coalesce(o_orderdate IS NOT NULL, FALSE)
                           THEN 1 ELSE 0 END) AS BIGINT) AS v1,
             CAST(sum(CASE WHEN NOT coalesce(o_orderstatus IN ('O','F','P'),
                                             FALSE)
                           THEN 1 ELSE 0 END) AS BIGINT) AS v2,
             CAST(sum(CASE WHEN NOT coalesce(
                             o_orderpriority LIKE '_-%', FALSE)
                           THEN 1 ELSE 0 END) AS BIGINT) AS v3,
             CAST(sum(CASE WHEN NOT coalesce(o_custkey > 0, FALSE)
                           THEN 1 ELSE 0 END) AS BIGINT) AS v4
      FROM orders
    )
    SELECT r.rule, agg.n AS n_rows, r.v AS n_violations,
           (r.v = 0) AS passed
    FROM agg, LATERAL (VALUES
      ('positive_totalprice', v0),
      ('orderdate_not_null', v1),
      ('status_in_domain', v2),
      ('priority_shape', v3),
      ('positive_custkey', v4)) AS r(rule, v)
    """,
    doc="Declarative expectation suite (operators.checks."
    "expectations_report): five rules over orders — positivity, "
    "non-null, domain membership, format shape — ALL evaluated in one "
    "aggregate pass (a 100-rule suite still costs one scan; "
    "per-rule-query tooling costs one scan per rule). NULL predicate "
    "= violation, never a silent pass. The oracle replays the strict "
    "three-valued-logic counts per rule.",
)
def q_quality_expectations_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import checks

    orders = _t(spark, sf_dir, "orders")
    return checks.expectations_report(
        orders,
        [
            ("positive_totalprice", F.col("o_totalprice") > 0),
            ("orderdate_not_null", F.col("o_orderdate").isNotNull()),
            (
                "status_in_domain",
                F.col("o_orderstatus").isin("O", "F", "P"),
            ),
            (
                "priority_shape",
                F.col("o_orderpriority").like("_-%"),
            ),
            ("positive_custkey", F.col("o_custkey") > 0),
        ],
    )


@_register(
    "lateral_topn_per_customer",
    """
    SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey,
           floor(t.o_totalprice * 100 + 0.50005)/100 AS total
    FROM customer c,
    LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 3
    ) t
    WHERE c.c_custkey % 10 = 1
    """,
    doc="SQL-surface parity: correlated LATERAL derived table (top-3 "
    "orders per customer) executed VERBATIM by spark.sql — Catalyst "
    "decorrelates the per-row LIMIT into a row_number window over one "
    "customer-keyed exchange plus a broadcast join (verified in the "
    "executed plan), i.e. the same physical shape as the explicit "
    "stratified_topn_orders query — the nested re-scan the SQL "
    "surface suggests never runs. Both engines execute "
    "near-identical SQL text.",
)
def q_lateral_topn_per_customer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from financial_data_pipeline_optimization_spark.sources import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey,
               floor(t.o_totalprice * 100 + 0.50005)/100 AS total
        FROM customer c,
        LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 3
        ) t
        WHERE c.c_custkey % 10 = 1
        """
    )


@_register(
    "containment_pairs_report",
    f"""
    WITH t AS (SELECT doc_id, {_ORACLE_TOKENS} AS tk FROM documents),
    sh AS (SELECT DISTINCT doc_id, array_to_string(tk[i+1:i+2], ' ') AS s
           FROM t, UNNEST(range(greatest(len(tk)-1, 1))) AS u(i)),
    sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz
           FROM sh GROUP BY 1),
    inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
              FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id != y.doc_id
              GROUP BY 1, 2)
    SELECT a, b,
           floor(CAST(i AS DOUBLE)/sa.sz * 10000 + 0.5000005)/10000
             AS containment
    FROM inter JOIN sz sa ON a = sa.doc_id
    WHERE CAST(i AS DOUBLE)/sa.sz >= 0.9
    """,
    doc="Asymmetric containment dedup (operators.dedup."
    "containment_pairs): ordered pairs where >=90% of a's distinct "
    "bigram shingles appear in b — the sub-document duplication "
    "(excerpt farms, article+wrapper pages) symmetric Jaccard "
    "structurally misses. Prefix filter applies on the CONTAINED "
    "side only (if |A∩B| >= ceil(t|A|), A's smallest "
    "|A|-ceil(t|A|)+1 hashes must hit B), so A explodes a prefix and "
    "B the full shingle index; exact set-intersect verify. The "
    "oracle recomputes every ordered pair from raw shingles with no "
    "prefix filter — proving the pruned plan loses nothing.",
)
def q_containment_pairs_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return dedup.containment_pairs(
        docs, "doc_id", "text", n=2, min_containment=0.9
    ).select("a", "b", _r4(F.col("containment")).alias("containment"))


# ===========================================================================
# Persistable Bloom filter: membership contract + fact-scan pruning (r9).
# ===========================================================================


@_register(
    "bloom_membership_check",
    """
    WITH ins AS (
      SELECT DISTINCT o_custkey AS k FROM orders
      WHERE o_custkey IS NOT NULL
    ),
    hs AS (SELECT unnest(range(4)) AS d),
    bloom AS (
      SELECT DISTINCT hs.d,
             substring(md5(CAST(hs.d AS VARCHAR) || ':'
                           || CAST(ins.k AS VARCHAR)), 1, 3) AS bucket
      FROM ins, hs
    ),
    pkeys AS (
      SELECT c_custkey AS k FROM customer
      UNION ALL
      SELECT c_custkey + 10000000 FROM customer
    ),
    probe AS (
      SELECT p.k, hs.d,
             substring(md5(CAST(hs.d AS VARCHAR) || ':'
                           || CAST(p.k AS VARCHAR)), 1, 3) AS bucket
      FROM pkeys p, hs
    ),
    flags AS (
      SELECT p.k, (count(b.bucket) = 4) AS maybe_present
      FROM probe p
      LEFT JOIN bloom b ON p.d = b.d AND p.bucket = b.bucket
      GROUP BY p.k
    ),
    lab AS (
      SELECT f.maybe_present, (ins.k IS NOT NULL) AS inserted
      FROM flags f LEFT JOIN ins ON f.k = ins.k
    )
    SELECT
      CAST(sum(CASE WHEN inserted THEN 1 ELSE 0 END) AS BIGINT)
        AS n_inserted,
      (sum(CASE WHEN inserted AND NOT maybe_present THEN 1 ELSE 0 END)
        = 0) AS no_false_negatives,
      CAST(sum(CASE WHEN NOT inserted THEN 1 ELSE 0 END) AS BIGINT)
        AS n_absent,
      CAST(sum(CASE WHEN NOT inserted AND maybe_present THEN 1 ELSE 0
               END) AS BIGINT) AS n_absent_present,
      floor(CAST(sum(CASE WHEN NOT inserted AND maybe_present THEN 1
                     ELSE 0 END) AS DOUBLE)
            / sum(CASE WHEN NOT inserted THEN 1 ELSE 0 END)
            * 10000 + 0.5000005) / 10000 AS fp_rate,
      (CAST(sum(CASE WHEN NOT inserted AND maybe_present THEN 1 ELSE 0
                END) AS DOUBLE)
       / sum(CASE WHEN NOT inserted THEN 1 ELSE 0 END)
       <= 1.5 * pow(1 - exp(-CAST(sum(CASE WHEN inserted THEN 1 ELSE 0
                                   END) AS DOUBLE) / 4096), 4))
        AS fp_within_bound
    FROM lab
    """,
    doc="Bloom-filter membership contract (operators.sketch."
    "bloom_build/bloom_probe): filter built over every custkey with "
    "orders (depth=4, 16^3 buckets per hash row), probed with every "
    "customer key plus a shifted never-inserted twin per customer "
    "(custkey+10M — at sf0.01 every customer has orders, so absent "
    "probes must be synthesized). Pins the two Bloom guarantees: "
    "zero false negatives "
    "(every inserted key tests present), and the false-positive rate "
    "among never-inserted keys within 1.5x the (1-e^(-n/m))^k bound. "
    "md5-bucketed so DuckDB rebuilds the filter bit-for-bit — a hash "
    "match proves the bucket construction AND the probe semantics, "
    "not just the counters.",
)
def q_bloom_membership_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    bloom = sketch.bloom_build(
        orders, "o_custkey", depth=4, hex_digits=3
    )
    probes = customer.select("c_custkey").unionAll(
        customer.select(
            (F.col("c_custkey") + F.lit(10_000_000)).alias("c_custkey")
        )
    )
    flagged = sketch.bloom_probe(
        bloom, probes, "c_custkey", depth=4, hex_digits=3
    )
    inserted = (
        orders.where(F.col("o_custkey").isNotNull())
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .withColumn("inserted", F.lit(True))
    )
    lab = flagged.join(inserted, "c_custkey", "left").select(
        "maybe_present",
        F.coalesce("inserted", F.lit(False)).alias("inserted"),
    )
    n_ins = F.sum(F.when(F.col("inserted"), 1).otherwise(0))
    n_abs = F.sum(F.when(~F.col("inserted"), 1).otherwise(0))
    n_fp = F.sum(
        F.when(~F.col("inserted") & F.col("maybe_present"), 1)
        .otherwise(0)
    )
    n_fn = F.sum(
        F.when(F.col("inserted") & ~F.col("maybe_present"), 1)
        .otherwise(0)
    )
    return lab.agg(
        n_ins.cast("long").alias("n_inserted"),
        (n_fn == 0).alias("no_false_negatives"),
        n_abs.cast("long").alias("n_absent"),
        n_fp.cast("long").alias("n_absent_present"),
        _r4(n_fp.cast("double") / n_abs).alias("fp_rate"),
        (
            n_fp.cast("double") / n_abs
            <= 1.5
            * F.pow(
                1 - F.exp(-n_ins.cast("double") / F.lit(4096.0)), 4
            )
        ).alias("fp_within_bound"),
    )


@_register(
    "bloom_prefilter_prune",
    """
    WITH dim AS (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    ),
    hs AS (SELECT unnest(range(4)) AS d),
    bloom AS (
      SELECT DISTINCT hs.d,
             substring(md5(CAST(hs.d AS VARCHAR) || ':'
                           || CAST(dim.c_custkey AS VARCHAR)), 1, 3)
               AS bucket
      FROM dim, hs
    ),
    keys AS (
      SELECT DISTINCT o_custkey AS k FROM orders
      WHERE o_custkey IS NOT NULL
    ),
    pk AS (
      SELECT keys.k, hs.d,
             substring(md5(CAST(hs.d AS VARCHAR) || ':'
                           || CAST(keys.k AS VARCHAR)), 1, 3) AS bucket
      FROM keys, hs
    ),
    present AS (
      SELECT pk.k
      FROM pk LEFT JOIN bloom b ON pk.d = b.d AND pk.bucket = b.bucket
      GROUP BY pk.k HAVING count(b.bucket) = 4
    )
    SELECT
      (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_orders,
      (SELECT CAST(count(*) AS BIGINT) FROM orders o
         JOIN present p ON o.o_custkey = p.k) AS n_kept,
      (SELECT CAST(count(*) AS BIGINT) FROM orders o
         JOIN dim d ON o.o_custkey = d.c_custkey) AS n_match,
      ((SELECT count(*) FROM orders o
          JOIN dim d ON o.o_custkey = d.c_custkey)
       = (SELECT count(*) FROM orders o
            JOIN present p ON o.o_custkey = p.k
            JOIN dim d ON o.o_custkey = d.c_custkey))
        AS no_false_negatives,
      floor((1 - (SELECT count(*) FROM orders o
                    JOIN present p ON o.o_custkey = p.k)
                 / CAST((SELECT count(*) FROM orders) AS DOUBLE))
            * 10000 + 0.5000005) / 10000 AS prune_rate
    """,
    doc="Bloom fact-scan pruning (operators.sketch.bloom_prefilter): "
    "filter built from the BUILDING-segment customers only, then the "
    "orders fact pruned with pure column expressions (md5 -> conv -> "
    "bit test inside whole-stage codegen — no join, no shuffle, no "
    "Python) before any join would run. Pins the 100 TB contract: "
    "every order whose customer IS in the segment survives the "
    "prefilter (no false negatives => prefilter-then-join == join), "
    "and the prune rate is reported. The oracle rebuilds the bucket "
    "table and the per-key 4-of-4 test relationally from md5.",
)
def q_bloom_prefilter_prune(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    dim = customer.where(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    bloom = sketch.bloom_build(dim, "c_custkey", depth=4, hex_digits=3)
    kept = sketch.bloom_prefilter(
        orders, "o_custkey", bloom, depth=4, hex_digits=3
    )
    dim_k = F.broadcast(
        dim.select(F.col("c_custkey").alias("o_custkey"))
    )
    total = orders.agg(F.count("*").cast("long").alias("n_orders"))
    keptc = kept.agg(F.count("*").cast("long").alias("n_kept"))
    matchc = orders.join(dim_k, "o_custkey").agg(
        F.count("*").cast("long").alias("n_match")
    )
    kept_matchc = kept.join(dim_k, "o_custkey").agg(
        F.count("*").cast("long").alias("n_kept_match")
    )
    return (
        total.crossJoin(keptc)
        .crossJoin(matchc)
        .crossJoin(kept_matchc)
        .select(
            "n_orders",
            "n_kept",
            "n_match",
            (F.col("n_kept_match") == F.col("n_match")).alias(
                "no_false_negatives"
            ),
            _r4(
                1
                - F.col("n_kept").cast("double")
                / F.col("n_orders")
            ).alias("prune_rate"),
        )
    )

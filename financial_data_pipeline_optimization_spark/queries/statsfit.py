"""Statistical-fit and supervised-prep driver checks (peeled from
``queries/analytics.py`` — continuing the VERDICT r7/r8 hygiene item —
with the same position-preserving SPECS pattern as
``vector_checks``/``media``/``ranking``/``behavior``: REGISTRATION
ORDER IS LOAD-BEARING for these pre-split names, so this module only
collects ``QuerySpec``s into ``SPECS`` and ``analytics.py`` appends
them into ``_REGISTRY`` at their original positions.

Covers the model-side feature/fit family: RFM segmentation, closed-form
OLS, correlation matrices, leakage-safe train/val/test splitting, BPE
merge training, and Zipf-law fitting over the token distribution."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from financial_data_pipeline_optimization_spark.functions import explode_nonempty
from financial_data_pipeline_optimization_spark.operators import dedup
from financial_data_pipeline_optimization_spark.queries._registry import (
    QuerySpec,
    _r2,
    _r4,
    _t,
)
from financial_data_pipeline_optimization_spark.queries.documents import (
    _ORACLE_TOKENS,
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
    "customer_rfm_segments",
    """
    WITH rfm AS (
      SELECT o_custkey,
             CAST(max(o_orderdate) AS DATE) AS last_order,
             CAST(count(*) AS BIGINT) AS frequency,
             CAST(sum(o_totalprice) AS DOUBLE) AS monetary
      FROM orders GROUP BY 1
    ),
    cut AS (
      SELECT quantile_cont(frequency, 0.5) AS f_med,
             quantile_cont(monetary, 0.5) AS m_med,
             quantile_cont(CAST(last_order - DATE '1992-01-01' AS DOUBLE),
                           0.5) AS r_med
      FROM rfm
    )
    SELECT
      CASE WHEN CAST(last_order - DATE '1992-01-01' AS DOUBLE) > r_med
           THEN 'recent' ELSE 'stale' END AS recency_band,
      CASE WHEN frequency > f_med THEN 'frequent' ELSE 'occasional' END
        AS frequency_band,
      CASE WHEN monetary > m_med THEN 'high_value' ELSE 'low_value' END
        AS monetary_band,
      CAST(count(*) AS BIGINT) AS n_customers,
      floor(avg(monetary) * 100 + 0.50005) / 100 AS avg_monetary
    FROM rfm CROSS JOIN cut
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
    doc="RFM customer segmentation: one customer-keyed aggregate "
    "builds (recency, frequency, monetary), the three median cutoffs "
    "ride as ONE broadcast scalar row (exact percentile via "
    "quantile_cont on the customer-sized aggregate — never a global "
    "ntile window, which would funnel the corpus through one "
    "partition), and banding is a row-local CASE. Recency is banded "
    "on integer days-since-epoch so the median compare is "
    "engine-exact; the only float output is rounded. The "
    "aggregate-then-broadcast-cutoffs shape is how every quantile "
    "segmentation should run at 100 TB.",
)
def q_customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    rfm = (
        orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum("o_totalprice").cast("double").alias("monetary"),
        )
        .select(
            "o_custkey",
            F.datediff(F.col("last_order"), F.lit("1992-01-01"))
            .cast("double")
            .alias("r_days"),
            "frequency",
            "monetary",
        )
        .localCheckpoint(eager=False)  # feeds the cutoffs AND the bands
    )
    cut = rfm.agg(
        F.expr("percentile(frequency, 0.5)").alias("f_med"),
        F.expr("percentile(monetary, 0.5)").alias("m_med"),
        F.expr("percentile(r_days, 0.5)").alias("r_med"),
    )
    return (
        rfm.crossJoin(F.broadcast(cut))
        .select(
            F.when(F.col("r_days") > F.col("r_med"), "recent")
            .otherwise("stale")
            .alias("recency_band"),
            F.when(F.col("frequency") > F.col("f_med"), "frequent")
            .otherwise("occasional")
            .alias("frequency_band"),
            F.when(F.col("monetary") > F.col("m_med"), "high_value")
            .otherwise("low_value")
            .alias("monetary_band"),
            "monetary",
        )
        .groupBy("recency_band", "frequency_band", "monetary_band")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _r2(F.avg("monetary")).alias("avg_monetary"),
        )
        .orderBy("recency_band", "frequency_band", "monetary_band")
    )


@_register(
    "price_quantity_ols",
    """
    WITH s AS (
      SELECT l_returnflag,
             CAST(count(*) AS DOUBLE) AS n,
             sum(CAST(l_quantity AS DOUBLE)) AS sx,
             sum(CAST(l_extendedprice AS DOUBLE)) AS sy,
             sum(CAST(l_quantity AS DOUBLE)
                 * CAST(l_extendedprice AS DOUBLE)) AS sxy,
             sum(CAST(l_quantity AS DOUBLE)
                 * CAST(l_quantity AS DOUBLE)) AS sxx
      FROM lineitem GROUP BY 1
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n_rows,
           floor((n * sxy - sx * sy) / (n * sxx - sx * sx) * 10000
                 + 0.5000005) / 10000 AS slope,
           floor((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                 / n * 100 + 0.50005) / 100 AS intercept
    FROM s ORDER BY l_returnflag
    """,
    doc="Grouped least-squares regression (extendedprice ~ quantity "
    "per return flag) as a PURE AGGREGATION: slope and intercept "
    "derive from the five classic sufficient statistics (n, Σx, Σy, "
    "Σxy, Σx²), so the whole fit is one partial-aggregated groupBy — "
    "the map-side combine does almost all the work and only five "
    "doubles per group cross the wire. This sufficient-statistics "
    "shape is how ANY moment-based model (OLS, variance, covariance, "
    "Naive Bayes counts) trains at 100 TB; there is no iterative "
    "pass and no driver math beyond the final expression.",
)
def q_price_quantity_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("double")
    y = F.col("l_extendedprice").cast("double")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    return s.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n_rows"),
        _r4(slope).alias("slope"),
        _r2(intercept).alias("intercept"),
    ).orderBy("l_returnflag")


@_register(
    "lineitem_corr_matrix",
    """
    SELECT
      floor(corr(CAST(l_quantity AS DOUBLE),
                 CAST(l_extendedprice AS DOUBLE)) * 10000
            + 0.5000005) / 10000 AS qty_price,
      floor(corr(CAST(l_quantity AS DOUBLE),
                 CAST(l_discount AS DOUBLE)) * 10000
            + 0.5000005) / 10000 AS qty_discount,
      floor(corr(CAST(l_extendedprice AS DOUBLE),
                 CAST(l_tax AS DOUBLE)) * 10000
            + 0.5000005) / 10000 AS price_tax
    FROM lineitem
    """,
    doc="Pairwise correlation matrix over fact measures in ONE scan: "
    "each corr is a five-statistic streaming aggregate "
    "(map-side-combined), all pairs share the scan, and the result "
    "is a single row — the feature-correlation screening step before "
    "any model training, at pure aggregation cost. Rounded at 1e-4: "
    "correlation divides large near-cancelling sums, where "
    "cross-engine reduction order costs ~1e-12 relative.",
)
def q_lineitem_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    qd = F.col("l_quantity").cast("double")
    pd_ = F.col("l_extendedprice").cast("double")
    dd = F.col("l_discount").cast("double")
    td = F.col("l_tax").cast("double")
    return li.agg(
        _r4(F.corr(qd, pd_)).alias("qty_price"),
        _r4(F.corr(qd, dd)).alias("qty_discount"),
        _r4(F.corr(pd_, td)).alias("price_tax"),
    )


def _leakage_safe_split_sql() -> str:
    from financial_data_pipeline_optimization_spark.operators.sampling import hex_threshold

    t_train = hex_threshold(0.8)
    t_val = hex_threshold(0.9)
    return f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, {_ORACLE_TOKENS} AS t FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(t[i+1:i+2], ' ') AS s
      FROM toks, UNNEST(range(greatest(len(t)-1, 1))) AS u(i)
    ),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz
              FROM sh GROUP BY 1),
    inter AS (
      SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
      FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a, b FROM inter
      JOIN sizes sa ON a = sa.doc_id JOIN sizes sb ON b = sb.doc_id
      WHERE CAST(i AS DOUBLE)/(sa.sz + sb.sz - i) >= 0.8
    ),
    sym AS (SELECT a AS s, b AS d FROM pairs
            UNION SELECT b AS s, a AS d FROM pairs),
    reach AS (
      SELECT s, d FROM sym
      UNION
      SELECT r.s, y.d FROM reach r JOIN sym y ON r.d = y.s
    ),
    labels AS (
      SELECT doc.doc_id,
             CAST(COALESCE(l.component, doc.doc_id) AS BIGINT)
               AS cluster_id
      FROM documents doc
      LEFT JOIN (SELECT s AS node, least(s, min(d)) AS component
                 FROM reach GROUP BY s) l
        ON doc.doc_id = l.node
    ),
    assigned AS (
      SELECT doc_id, cluster_id,
             CASE WHEN substring(md5(CAST(cluster_id AS VARCHAR)), 1, 8)
                       < '{t_train}' THEN 'train'
                  WHEN substring(md5(CAST(cluster_id AS VARCHAR)), 1, 8)
                       < '{t_val}' THEN 'val'
                  ELSE 'test' END AS split
      FROM labels
    )
    SELECT split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
           (SELECT count(DISTINCT cluster_id) FROM assigned)
             = (SELECT sum(nc) FROM (
                  SELECT count(DISTINCT cluster_id) AS nc
                  FROM assigned GROUP BY split))
             AS no_cluster_spans_splits
    FROM assigned GROUP BY split ORDER BY split
    """


@_register(
    "leakage_safe_split",
    _leakage_safe_split_sql(),
    doc="Leakage-safe train/val/test assignment: the split key is the "
    "near-dup CLUSTER id, not the document id — a document and its "
    "near-duplicates always land in the same split, so eval can never "
    "score a paraphrase of a training document (the cross-split "
    "contamination mode that per-doc hashing CANNOT prevent). "
    "Composition: near_dup_clusters → md5 hex-threshold split on "
    "cluster_id (operators.sampling.with_split, engine-portable) → "
    "per-split counts plus the in-plan invariant that the distinct "
    "cluster total equals the per-split sum (a cluster never spans "
    "splits — true by construction since split is a function of "
    "cluster_id, verified anyway). The oracle recomputes clusters "
    "with a recursive CTE and the same md5 thresholds. "
    "Exact-closure-sensitive (r16): the clustering runs with "
    "on_budget_exceeded='error', so past the exact fan-out budget "
    "this query raises instead of silently splitting on the FINER "
    "LSH clustering (which could place a doc and its paraphrase in "
    "different splits); at that scale callers opt into LSH "
    "explicitly. Not fully lazy: the auto gate's fan-out probe and "
    "the component loop run bounded actions at construction.",
)
def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import sampling

    docs = _t(spark, sf_dir, "documents")
    # Exact-closure-sensitive: the split key IS the cluster id, so a
    # silent flip to finer LSH clusters would quietly weaken the
    # leakage guarantee (near-dup pairs split apart). Past the exact
    # fan-out budget this raises ExactFanoutBudgetExceeded; callers
    # at that scale must choose pair_source='lsh' knowingly.
    cl = dedup.near_dup_clusters(
        docs, "doc_id", "text", n=2, min_jaccard=0.8,
        on_budget_exceeded="error",
    )  # label table arrives materialized; feeds per-split agg + total
    assigned = sampling.with_split(
        cl, ["cluster_id"], {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    per = assigned.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("cluster_id").alias("n_clusters"),
    )
    total = cl.agg(
        F.countDistinct("cluster_id").alias("__total_clusters")
    )
    return (
        per.crossJoin(F.broadcast(total))
        .withColumn(
            "__sum_nc",
            F.sum("n_clusters").over(Window.partitionBy()),
        )
        .select(
            "split",
            "n_docs",
            "n_clusters",
            (F.col("__total_clusters") == F.col("__sum_nc")).alias(
                "no_cluster_spans_splits"
            ),
        )
        .orderBy("split")
    )


def _bpe_oracle_sql(rounds: int = 3) -> str:
    """Unrolled DuckDB twin of operators.text.bpe_train_merges: per
    round, count adjacent symbol pairs over the vocab (weighted by
    word frequency), take the (count desc, pair lexico) argmax, then
    apply the GREEDY left-to-right merge relationally — match
    positions, gaps-and-islands run grouping, keep even offsets
    within each run (exactly what the engine's left fold does on
    'aaa' → [aa, a]), rebuild each word's symbol list with merged
    tokens substituted and right-halves dropped."""
    blocks = []
    for r in range(1, rounds + 1):
        blocks.append(f"""
    p{r} AS (
      SELECT word, freq, u.i AS p, syms[u.i+1] AS a, syms[u.i+2] AS b
      FROM v{r}, UNNEST(range(len(syms)-1)) AS u(i)
      WHERE len(syms) >= 2
    ),
    pc{r} AS (SELECT a, b, CAST(sum(freq) AS BIGINT) AS c
              FROM p{r} GROUP BY 1, 2),
    top{r} AS (SELECT a, b, c FROM pc{r} ORDER BY c DESC, a, b LIMIT 1),
    m{r} AS (SELECT p.word, p.p FROM p{r} p, top{r} t
             WHERE p.a = t.a AND p.b = t.b),
    sel{r} AS (
      SELECT word, p FROM (
        SELECT word, p, p - min(p) OVER (PARTITION BY word, grp) AS off
        FROM (SELECT word, p,
                     p - ROW_NUMBER() OVER (PARTITION BY word ORDER BY p)
                       AS grp
              FROM m{r}))
      WHERE off % 2 = 0
    ),
    allpos{r} AS (
      SELECT word, freq, u.i AS p, syms[u.i+1] AS s
      FROM v{r}, UNNEST(range(len(syms))) AS u(i)
    ),
    v{r+1} AS (
      SELECT a.word, any_value(a.freq) AS freq,
             list(CASE WHEN sp.p IS NOT NULL
                       THEN (SELECT t.a || t.b FROM top{r} t)
                       ELSE a.s END ORDER BY a.p) AS syms
      FROM allpos{r} a
      LEFT JOIN sel{r} sp ON a.word = sp.word AND a.p = sp.p
      LEFT JOIN sel{r} sm ON a.word = sm.word AND a.p = sm.p + 1
      WHERE sm.p IS NULL
      GROUP BY a.word
    )""")
    finals = "\n    UNION ALL\n".join(
        f"""    SELECT CAST({r} AS INT) AS round, a AS sym_a, b AS sym_b,
           a || b AS merged, c AS pair_count FROM top{r}"""
        for r in range(1, rounds + 1)
    )
    return f"""
    WITH words AS (
      SELECT w AS word, CAST(count(*) AS BIGINT) AS freq
      FROM (SELECT unnest({_ORACLE_TOKENS}) AS w FROM documents)
      WHERE w <> '' GROUP BY 1
    ),
    v1 AS (
      SELECT word, freq,
             list_transform(range(1, length(word) + 1),
                            i -> word[i]) AS syms
      FROM words
    ),{','.join(blocks)}
{finals}
    ORDER BY round
    """


@_register(
    "bpe_merge_rounds",
    _bpe_oracle_sql(3),
    doc="Distributed BPE tokenizer training, 3 merge rounds "
    "(operators.text.bpe_train_merges; Sennrich et al. ACL 2016): "
    "returns the learned merge table (round, pair, merged token, "
    "pair count). The only corpus-scale work is the initial "
    "word-frequency aggregate; every round then runs on the "
    "VOCABULARY table — pair counts are a row-local transform "
    "weighted by word freq, the argmax is one bounded 1-row driver "
    "action (the IVF-centroid pattern), and the greedy merge is a "
    "row-local (out, pending) fold. The oracle replays training "
    "relationally: same counts, same (count desc, lexico) tiebreak, "
    "and the greedy merge expressed as gaps-and-islands even-offset "
    "selection over match positions — proving the fold's semantics, "
    "not just its outputs. At 100 TB rounds cost O(vocab), not "
    "O(corpus).",
)
def q_bpe_merge_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import text as text_ops

    docs = _t(spark, sf_dir, "documents")
    return text_ops.bpe_train_merges(docs, "text", rounds=3)




@_register(
    "zipf_fit_tokens",
    f"""
    WITH uc AS (
      SELECT w, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest({_ORACLE_TOKENS}) AS w FROM documents) t
      WHERE w <> '' GROUP BY 1
    ),
    ranked AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, w) AS r
      FROM uc
    ),
    pts AS (
      SELECT ln(CAST(r AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y
      FROM ranked WHERE r <= 500
    ),
    s AS (
      SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM pts
    )
    SELECT CAST(n AS BIGINT) AS n_points,
           floor((n * sxy - sx * sy) / (n * sxx - sx * sx) * 10000
                 + 0.5000005) / 10000 AS zipf_slope,
           floor((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                 / n * 10000 + 0.5000005) / 10000 AS zipf_intercept
    FROM s
    """,
    doc="Zipf-law fit over the token frequency distribution: OLS of "
    "ln(freq) on ln(rank) for the top-500 vocabulary (natural text "
    "slopes near -1; synthetic/templated or boilerplate-heavy corpora "
    "deviate hard — a one-number corpus-health diagnostic). One "
    "vocab-keyed count, a window over the VOCAB table only (never "
    "the corpus), and the same five-sufficient-statistics regression "
    "as price_quantity_ols folded to a single row. Ranks and counts "
    "are integers, so the log points are bit-identical across "
    "engines; the fit is rounded at 1e-4.",
)
def q_zipf_fit_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import text as text_ops

    docs = _t(spark, sf_dir, "documents")
    uc = (
        docs.select(explode_nonempty(text_ops.tokens("text")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # Top-500 FIRST as a TakeOrderedAndProject (scale-safe partial
    # top-k — never a global single-partition rank window over the
    # whole vocabulary), then the rank window runs over 500 rows.
    top = uc.orderBy(F.col("c").desc(), "w").limit(500)
    w = Window.orderBy(F.col("c").desc(), "w")
    pts = top.select(
        "c", F.row_number().over(w).alias("r")
    ).select(
        F.log(F.col("r").cast("double")).alias("x"),
        F.log(F.col("c").cast("double")).alias("y"),
    )
    s = pts.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    return s.select(
        F.col("n").cast("long").alias("n_points"),
        _r4(slope).alias("zipf_slope"),
        _r4(intercept).alias("zipf_intercept"),
    )



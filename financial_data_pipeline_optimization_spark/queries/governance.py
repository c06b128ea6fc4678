"""Interval analytics, learned quality scoring, governance, spectral stats (split from the original queries.py; registration
order preserved — modules import in the original definition order)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from financial_data_pipeline_optimization_spark.queries._registry import (
    QuerySpec,
    _REGISTRY,
    _r2,
    _r4,
    _register,
    _t,
)



# ===========================================================================
# Interval analytics: overlap joins and concurrency without inequality
# cross joins (r5b).
# ===========================================================================


@_register(
    "interval_overlap_weekly",
    """
    WITH a AS (
      SELECT date_diff('day', DATE '1992-01-01',
                       CAST(o_orderdate AS DATE)) AS sd,
             o_totalprice AS p
      FROM orders WHERE o_orderpriority = '1-URGENT'
    ),
    b AS (
      SELECT date_diff('day', DATE '1992-01-01',
                       CAST(o_orderdate AS DATE)) AS sd,
             o_totalprice AS p
      FROM orders WHERE o_orderpriority = '2-HIGH'
    ),
    j AS (
      SELECT a.sd AS asd, a.p AS ap, b.p AS bp
      FROM a JOIN b
        ON a.sd <= b.sd + 3 AND b.sd <= a.sd + 3
    )
    SELECT CAST(floor(asd / 7.0) AS BIGINT) AS wk_bucket,
           count(*) AS n_pairs,
           floor(sum(ap + bp) * 100 + 0.50005) / 100 AS paired_value
    FROM j GROUP BY 1 ORDER BY 1
    """,
    doc="Interval×interval OVERLAP aggregate with NO equi-key — the "
    "shape that naively demands an inequality cross join (quadratic "
    "in orders-per-day, measured 151 s on the ×100 corpus as a pair "
    "enumeration). Because the query only wants per-week COUNT and "
    "SUM over the pairs, the pair set factors exactly over day "
    "grain: with per-day aggregates (n_d, s_d=Σprice), a day pair "
    "(d, e), |d−e| ≤ 3, contributes n_d·n_e pairs and "
    "n_d·s_e + n_e·s_d to Σ(ap+bp). Two day-keyed aggregations "
    "(shuffling day keys, CONSTANT-size output ~2.4k rows regardless "
    "of corpus size), a 7-offset explode, and a broadcast hash join "
    "replace the pair stream entirely — O(scan + days), not "
    "O(pairs); ×100 drops to scan cost. The oracle runs the naive "
    "inequality pair join, pinning that the factorization loses "
    "nothing. Consumers that need the PAIRS themselves (not an "
    "algebraic aggregate of them) use "
    "operators.joins.interval_overlap_join — the grid-bucketed "
    "O(pairs-per-cell) join, property-tested against the naive join "
    "in tests/test_properties.py.",
)
def q_interval_overlap_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")

    def day_agg(pri: str, pre: str) -> DataFrame:
        return (
            orders.where(F.col("o_orderpriority") == pri)
            .select(
                F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01"))
                .cast("long")
                .alias(f"{pre}sd"),
                F.col("o_totalprice").alias("p"),
            )
            .groupBy(f"{pre}sd")
            .agg(
                F.count(F.lit(1)).alias(f"{pre}n"),
                F.sum("p").alias(f"{pre}s"),
            )
        )

    a_day = day_agg("1-URGENT", "a")
    b_day = day_agg("2-HIGH", "b")
    # |asd - bsd| <= 3 as an EQUI-join: each a-day fans out to its 7
    # admissible b-days; the day tables are bounded by the calendar
    # (not the corpus), so the b side broadcasts at any scale.
    day_pairs = (
        a_day.withColumn(
            "bsd",
            F.explode(F.sequence(F.col("asd") - 3, F.col("asd") + 3)),
        )
        .join(F.broadcast(b_day), "bsd")
    )
    return (
        day_pairs.groupBy(
            F.floor(F.col("asd") / 7).cast("long").alias("wk_bucket")
        )
        .agg(
            F.sum(F.col("an") * F.col("bn")).alias("n_pairs"),
            _r2(
                F.sum(
                    F.col("an") * F.col("bs") + F.col("bn") * F.col("as")
                )
            ).alias("paired_value"),
        )
        .orderBy("wk_bucket")
    )


@_register(
    "order_window_concurrency",
    """
    WITH st AS (
      SELECT o_custkey,
             date_diff('day', DATE '1992-01-01',
                       CAST(o_orderdate AS DATE)) AS d
      FROM orders
    ),
    c AS (
      SELECT o_custkey,
             CAST(count(*) OVER (
               PARTITION BY o_custkey ORDER BY d
               RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cc
      FROM st
    ),
    m AS (
      SELECT o_custkey, max(cc) AS peak FROM c GROUP BY 1
    )
    SELECT peak AS concurrent_orders,
           count(*) AS n_customers
    FROM m GROUP BY 1 ORDER BY 1
    """,
    doc="Peak interval CONCURRENCY per customer (max simultaneously "
    "open 7-day order windows), reduced to a histogram. The "
    "sweep-line +1/-1 event trick is unnecessary for FIXED-LENGTH "
    "intervals: concurrency at a start equals the count of starts "
    "in the trailing window, i.e. one RANGE-frame window count — "
    "concurrency only changes at starts, so evaluating there "
    "captures every peak. One customer-keyed exchange (the natural "
    "entity key, bounded per-partition), one window, one tiny "
    "histogram aggregate; no self-join, no event doubling.",
)
def q_order_window_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    st = orders.select(
        "o_custkey",
        F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01"))
        .cast("long")
        .alias("d"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("d")
        .rangeBetween(-6, 0)
    )
    peaks = (
        st.withColumn("cc", F.count(F.lit(1)).over(w))
        .groupBy("o_custkey")
        .agg(F.max("cc").alias("peak"))
    )
    return (
        peaks.groupBy(F.col("peak").alias("concurrent_orders"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("concurrent_orders")
    )


# ===========================================================================
# Learned quality scoring, governance, and spectral statistics (r5b).
# ===========================================================================


def _logistic_oracle() -> str:
    feats = """
      SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
             ln(1.0 + n_chars) / 10 AS x1,
             CAST(length(text) - length(replace(text, ' ', ''))
                  AS DOUBLE) / length(text) AS x2
      FROM documents
    """
    # Unrolled gradient steps: step k aggregates Σ(y−σ(w·x))·x over the
    # feature CTE crossed with the previous 1-row weight CTE.
    return f"""
    WITH f AS ({feats}),
    g1 AS (
      SELECT sum(y - 0.5) AS d0, sum((y - 0.5) * x1) AS d1,
             sum((y - 0.5) * x2) AS d2, CAST(count(*) AS DOUBLE) AS n
      FROM f
    ),
    w1 AS (
      SELECT 2.0 * d0 / n AS w0, 2.0 * d1 / n AS w1,
             2.0 * d2 / n AS w2, n FROM g1
    ),
    g2 AS (
      SELECT w0, w1, w2, n,
             sum(y - 1.0 / (1.0 + exp(-(w0 + w1 * x1 + w2 * x2)))) AS d0,
             sum((y - 1.0 / (1.0 + exp(-(w0 + w1 * x1 + w2 * x2)))) * x1)
               AS d1,
             sum((y - 1.0 / (1.0 + exp(-(w0 + w1 * x1 + w2 * x2)))) * x2)
               AS d2
      FROM f, w1 GROUP BY w0, w1, w2, n
    ),
    w2s AS (
      SELECT w0 + 2.0 * d0 / n AS w0, w1 + 2.0 * d1 / n AS w1,
             w2 + 2.0 * d2 / n AS w2, n FROM g2
    ),
    g3 AS (
      SELECT w0, w1, w2, n,
             sum(y - 1.0 / (1.0 + exp(-(w0 + w1 * x1 + w2 * x2)))) AS d0,
             sum((y - 1.0 / (1.0 + exp(-(w0 + w1 * x1 + w2 * x2)))) * x1)
               AS d1,
             sum((y - 1.0 / (1.0 + exp(-(w0 + w1 * x1 + w2 * x2)))) * x2)
               AS d2
      FROM f, w2s GROUP BY w0, w1, w2, n
    ),
    w3 AS (
      SELECT w0 + 2.0 * d0 / n AS w0, w1 + 2.0 * d1 / n AS w1,
             w2 + 2.0 * d2 / n AS w2, n FROM g3
    )
    SELECT CAST(n AS BIGINT) AS n_docs,
           floor(w0 * 10000 + 0.5000005) / 10000 AS w_bias,
           floor(w1 * 10000 + 0.5000005) / 10000 AS w_len,
           floor(w2 * 10000 + 0.5000005) / 10000 AS w_space,
           floor((SELECT sum(CASE WHEN (CASE WHEN
                      w3.w0 + w3.w1 * f.x1 + w3.w2 * f.x2 > 0
                      THEN 1.0 ELSE 0.0 END) = f.y
                    THEN 1.0 ELSE 0.0 END) FROM f) / n * 10000
                 + 0.5000005) / 10000 AS train_acc
    FROM w3
    """


@_register(
    "logistic_quality_steps",
    _logistic_oracle(),
    doc="Distributed logistic-regression training (3 full-batch "
    "gradient steps on an is-English quality label) expressed "
    "ENTIRELY as dataflow: each step is one map-side-combined "
    "aggregate producing the 3-number gradient, and the next step "
    "broadcast-crosses that 1-row weight table back over the "
    "features — the model crosses the wire, never the data, and "
    "nothing is collected (no eager driver loop; the whole 3-step "
    "train + accuracy eval is ONE lazy plan over a checkpointed "
    "feature projection scanned once per step). This is the "
    "sufficient-statistic OLS pattern generalized to an iterative "
    "model — how a fastText-style quality classifier trains at "
    "100 TB. Oracle: the same 3 steps unrolled as SQL CTEs.",
)
def q_logistic_quality_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    lr = 2.0
    feats = docs.select(
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
        (F.log(F.lit(1.0) + F.col("n_chars")) / 10).alias("x1"),
        (
            (
                F.length("text")
                - F.length(F.regexp_replace("text", " ", ""))
            ).cast("double")
            / F.length("text")
        ).alias("x2"),
    ).localCheckpoint(eager=False)  # scanned by every step + the eval

    w: DataFrame | None = None
    for _ in range(3):
        if w is None:
            resid = F.col("y") - F.lit(0.5)
            src = feats
        else:
            z = (
                F.col("w0")
                + F.col("w1") * F.col("x1")
                + F.col("w2") * F.col("x2")
            )
            resid = F.col("y") - F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
            src = feats.crossJoin(F.broadcast(w))
        # Global aggregate, never a groupBy on the weight columns: the
        # broadcast weight row is constant per step, so ``first`` re-
        # attaches it and the only exchange is the SinglePartition
        # partial-aggregate merge (machine-gated in test_plan_quality).
        aggs = [
            F.sum(resid).alias("d0"),
            F.sum(resid * F.col("x1")).alias("d1"),
            F.sum(resid * F.col("x2")).alias("d2"),
            F.count(F.lit(1)).cast("double").alias("n"),
        ]
        if w is not None:
            aggs += [
                F.first("w0").alias("w0"),
                F.first("w1").alias("w1"),
                F.first("w2").alias("w2"),
            ]
        g = src.agg(*aggs)
        base0 = F.lit(0.0) if w is None else F.col("w0")
        base1 = F.lit(0.0) if w is None else F.col("w1")
        base2 = F.lit(0.0) if w is None else F.col("w2")
        w = g.select(
            (base0 + lr * F.col("d0") / F.col("n")).alias("w0"),
            (base1 + lr * F.col("d1") / F.col("n")).alias("w1"),
            (base2 + lr * F.col("d2") / F.col("n")).alias("w2"),
            F.col("n"),
        )

    z = (
        F.col("w0")
        + F.col("w1") * F.col("x1")
        + F.col("w2") * F.col("x2")
    )
    hit = F.when(
        F.when(z > 0, 1.0).otherwise(0.0) == F.col("y"), 1.0
    ).otherwise(0.0)
    return (
        feats.crossJoin(F.broadcast(w))
        .agg(
            F.sum(hit).alias("hits"),
            F.first("w0").alias("w0"),
            F.first("w1").alias("w1"),
            F.first("w2").alias("w2"),
            F.first("n").alias("n"),
        )
        .select(
            F.col("n").cast("long").alias("n_docs"),
            _r4(F.col("w0")).alias("w_bias"),
            _r4(F.col("w1")).alias("w_len"),
            _r4(F.col("w2")).alias("w_space"),
            _r4(F.col("hits") / F.col("n")).alias("train_acc"),
        )
    )


@_register(
    "entropy_quality_filter",
    """
    WITH c AS (
      SELECT doc_id,
             CAST(length(text) AS DOUBLE) AS n,
             CAST(length(text)
                  - length(regexp_replace(text, '[A-Za-z]', '', 'g'))
                  AS DOUBLE) AS letters,
             CAST(length(text)
                  - length(regexp_replace(text, '[0-9]', '', 'g'))
                  AS DOUBLE) AS digits,
             CAST(length(text) - length(replace(text, ' ', ''))
                  AS DOUBLE) AS spaces
      FROM documents
    ),
    e AS (
      SELECT doc_id, n, letters, digits, spaces,
             n - letters - digits - spaces AS other
      FROM c WHERE n > 0
    ),
    h AS (
      SELECT doc_id,
             (CASE WHEN letters > 0
                   THEN -(letters / n) * ln(letters / n) ELSE 0 END)
             + (CASE WHEN digits > 0
                     THEN -(digits / n) * ln(digits / n) ELSE 0 END)
             + (CASE WHEN spaces > 0
                     THEN -(spaces / n) * ln(spaces / n) ELSE 0 END)
             + (CASE WHEN other > 0
                     THEN -(other / n) * ln(other / n) ELSE 0 END)
               AS ent
      FROM e
    )
    SELECT doc_id,
           floor(ent * 10000 + 0.5000005) / 10000 AS char_entropy,
           ent >= 0.5 AS keep
    FROM h ORDER BY doc_id
    """,
    doc="Character-CLASS entropy quality signal: the Shannon entropy "
    "of each document's {letter, digit, space, other} distribution. "
    "Near-natural prose lands ~0.7–0.9 nats; boilerplate (digit "
    "dumps, non-Latin text scored by a Latin tokenizer, markup) "
    "collapses toward one class and low entropy — a classic "
    "cheap pretraining gate. Computed from FOUR regexp-length "
    "expressions per row: pure projection, zero exchanges, runs at "
    "scan speed inside WholeStageCodegen (a histogram-free entropy "
    "— no char explode, so text never enters a shuffle).",
)
def q_entropy_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    n = F.length("text").cast("double")
    letters = (
        F.length("text")
        - F.length(F.regexp_replace("text", "[A-Za-z]", ""))
    ).cast("double")
    digits = (
        F.length("text")
        - F.length(F.regexp_replace("text", "[0-9]", ""))
    ).cast("double")
    spaces = (
        F.length("text") - F.length(F.regexp_replace("text", " ", ""))
    ).cast("double")

    def term(c):
        return F.when(c > 0, -(c / n) * F.log(c / n)).otherwise(0.0)

    other = n - letters - digits - spaces
    ent = term(letters) + term(digits) + term(spaces) + term(other)
    return (
        docs.where(n > 0)
        .select(
            "doc_id",
            _r4(ent).alias("char_entropy"),
            (ent >= 0.5).alias("keep"),
        )
        .orderBy("doc_id")
    )


@_register(
    "k_anonymity_report",
    """
    WITH g AS (
      SELECT c_mktsegment, c_nationkey, count(*) AS cnt
      FROM customer GROUP BY 1, 2
    )
    SELECT CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(CASE WHEN cnt < 6 THEN 1 ELSE 0 END) AS BIGINT)
             AS unsafe_groups,
           CAST(sum(CASE WHEN cnt < 6 THEN cnt ELSE 0 END) AS BIGINT)
             AS suppressed_rows,
           CAST(min(cnt) AS BIGINT) AS min_group_size,
           CAST(max(cnt) AS BIGINT) AS max_group_size,
           CAST(sum(cnt) AS BIGINT) AS n_rows
    FROM g
    """,
    doc="k-anonymity audit over quasi-identifiers (market segment × "
    "nation): how many identifier combinations have fewer than k=6 "
    "members, and how many rows a suppression pass would drop — the "
    "release-gate check before publishing user-derived training "
    "data. Two cascaded aggregations, the second over the (bounded) "
    "GROUP table; the quasi-identifier count shuffles one long per "
    "group and the report is a single row. min_group_size IS the "
    "dataset's anonymity level k.",
)
def q_k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    g = cust.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    unsafe = F.when(F.col("cnt") < 6, 1).otherwise(0)
    supp = F.when(F.col("cnt") < 6, F.col("cnt")).otherwise(F.lit(0))
    return g.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(unsafe).cast("long").alias("unsafe_groups"),
        F.sum(supp).cast("long").alias("suppressed_rows"),
        F.min("cnt").alias("min_group_size"),
        F.max("cnt").alias("max_group_size"),
        F.sum("cnt").cast("long").alias("n_rows"),
    )


@_register(
    "pca_top_component",
    """
    WITH el AS (
      SELECT vec_id, CAST(u.i AS INTEGER) AS i,
             CAST(embedding[u.i] AS DOUBLE) AS x
      FROM embeddings,
           unnest(range(1, len(embedding) + 1)) AS u(i)
    ),
    g AS (
      SELECT a.i AS i, b.i AS j, sum(a.x * b.x) AS gv
      FROM el a JOIN el b ON a.vec_id = b.vec_id
      GROUP BY 1, 2
    ),
    m1 AS (SELECT i, sum(gv) / sqrt(64.0) AS mv FROM g GROUP BY 1),
    n1 AS (SELECT sqrt(sum(mv * mv)) AS nm FROM m1),
    v1 AS (SELECT i AS vi, mv / nm AS val FROM m1, n1),
    m2 AS (
      SELECT g.i, sum(g.gv * v1.val) AS mv
      FROM g JOIN v1 ON g.j = v1.vi GROUP BY 1
    ),
    n2 AS (SELECT sqrt(sum(mv * mv)) AS nm FROM m2),
    v2 AS (SELECT i AS vi, mv / nm AS val FROM m2, n2),
    m3 AS (
      SELECT g.i, sum(g.gv * v2.val) AS mv
      FROM g JOIN v2 ON g.j = v2.vi GROUP BY 1
    ),
    n3 AS (SELECT sqrt(sum(mv * mv)) AS nm FROM m3),
    v3 AS (SELECT i AS vi, mv / nm AS val FROM m3, n3)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM v3) AS n_dims,
           floor(n3.nm * 10000 + 0.5000005) / 10000 AS lambda1,
           (SELECT floor(sum(abs(val)) * 10000 + 0.5000005) / 10000
            FROM v3) AS v_l1,
           (SELECT floor(abs(val) * 10000 + 0.5000005) / 10000
            FROM v3 WHERE vi = 1) AS v_abs_1,
           (SELECT floor(abs(val) * 10000 + 0.5000005) / 10000
            FROM v3 WHERE vi = 2) AS v_abs_2,
           (SELECT floor(abs(val) * 10000 + 0.5000005) / 10000
            FROM v3 WHERE vi = 3) AS v_abs_3
    FROM n3
    """,
    doc="Top principal direction of the embedding corpus via "
    "distributed Gram + lazy power iteration: ONE Arrow-matmul scan "
    "reduces the corpus to a d×d sufficient statistic "
    "(vector.gram_matrix — partitions·d² doubles shuffled, the "
    "matrix-valued OLS shape), then 3 power-iteration rounds run as "
    "broadcast joins over d- and d²-row tables — no driver math, no "
    "collect, model-side cost independent of corpus size. λ₁ and "
    "the component magnitudes feed whitening, anisotropy "
    "diagnostics (a rogue dominant direction = embedding collapse), "
    "and SemDeDup-style preprocessing. Oracle replays the identical "
    "iteration as SQL CTEs over an unnested element table.",
)
def q_pca_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import vector

    emb = _t(spark, sf_dir, "embeddings")
    dim = 64
    g = vector.gram_matrix(emb, "embedding")
    v, lam = vector.power_iteration_top_component(g, dim, iters=3)
    stats = v.agg(
        F.count(F.lit(1)).alias("n_dims"),
        _r4(F.sum(F.abs(F.col("val")))).alias("v_l1"),
        _r4(
            F.max(F.when(F.col("vi") == 1, F.abs(F.col("val"))))
        ).alias("v_abs_1"),
        _r4(
            F.max(F.when(F.col("vi") == 2, F.abs(F.col("val"))))
        ).alias("v_abs_2"),
        _r4(
            F.max(F.when(F.col("vi") == 3, F.abs(F.col("val"))))
        ).alias("v_abs_3"),
    )
    return stats.crossJoin(F.broadcast(lam)).select(
        F.col("n_dims").cast("long").alias("n_dims"),
        _r4(F.col("nm")).alias("lambda1"),
        "v_l1",
        "v_abs_1",
        "v_abs_2",
        "v_abs_3",
    )



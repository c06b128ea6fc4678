"""TPC-H completion queries (split from the original queries.py; registration
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



# ===========================================================================
# TPC-H completion: the nine queries whose canonical form needs columns
# the testdata lacks (partsupp, l_shipmode, l_commitdate/l_receiptdate,
# c_phone, p_container — see TESTDATA.md). Each is adapted to the
# available schema while preserving the canonical PLAN SHAPE — the
# correlated/scalar subqueries, EXISTS/NOT EXISTS anti-joins, nested
# aggregations and conditional aggregates that make each query a
# distinct optimizer exercise. Adaptations are noted per query.
# ===========================================================================


@_register(
    "tpch_q2_min_cost_supplier",
    """
    WITH supplies AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ),
    cand AS (
      SELECT p.p_partkey, p.p_type, s.s_suppkey, s.s_name, s.s_acctbal,
             n.n_name
      FROM part p
      JOIN supplies ps ON ps.l_partkey = p.p_partkey
      JOIN supplier s ON s.s_suppkey = ps.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
        AND p.p_type = 'STANDARD'
        AND p.p_size <= 15
    )
    SELECT c.s_acctbal, c.s_name, c.n_name, c.p_partkey, c.p_type
    FROM cand c
    JOIN (SELECT p_partkey, MAX(s_acctbal) AS best
          FROM cand GROUP BY p_partkey) m
      ON m.p_partkey = c.p_partkey AND c.s_acctbal = m.best
    ORDER BY c.s_acctbal DESC, c.n_name, c.s_name, c.p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 adapted (no partsupp: distinct lineitem "
    "(partkey,suppkey) is the supplies relation; best supplier = max "
    "s_acctbal standing in for min ps_supplycost). Preserves the "
    "correlated per-part extremum subquery joined back on the part "
    "key, the 4-dim join stack, and the top-100 sort.",
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplies = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 15)
    )
    s = _t(spark, sf_dir, "supplier")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(
        _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    )
    cand = (
        supplies.join(
            F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")
        )
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("p_partkey", "p_type", "s_name", "s_acctbal", "n_name")
    )
    best = cand.groupBy(F.col("p_partkey").alias("b_partkey")).agg(
        F.max("s_acctbal").alias("best")
    )
    return (
        cand.join(
            best,
            (F.col("p_partkey") == F.col("b_partkey"))
            & (F.col("s_acctbal") == F.col("best")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type")
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@_register(
    "tpch_q4_order_priority",
    """
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o.o_orderpriority
    """,
    doc="TPC-H Q4 adapted (no l_commitdate/l_receiptdate: 'late' = "
    "shipped >60 days after the order date). Preserves the correlated "
    "EXISTS → left-semi decorrelation and the per-priority count.",
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@_register(
    "tpch_q9_product_profit",
    """
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INT) AS o_year,
           floor(SUM(l.l_extendedprice * (1 - l.l_discount)
                     - 0.1 * p.p_retailprice * l.l_quantity)*100
                 + 0.50005)/100 AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
    doc="TPC-H Q9 adapted (no ps_supplycost: unit cost modeled as "
    "10% of p_retailprice). Preserves the 5-table profit join with a "
    "name-substring part filter and nation×year aggregation.",
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = F.broadcast(
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.1 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(_r2(F.sum(profit)).alias("sum_profit"))
    )


@_register(
    "tpch_q11_important_stock",
    """
    WITH value_by_part AS (
      SELECT l.l_partkey,
             SUM(l.l_extendedprice * (1 - l.l_discount)) AS val
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_7'
      GROUP BY l.l_partkey
    )
    SELECT l_partkey, floor(val*100 + 0.50005)/100 AS part_value
    FROM value_by_part
    WHERE val > (SELECT AVG(val) * 1.2 FROM value_by_part)
    """,
    doc="TPC-H Q11 adapted (no partsupp: per-part value = revenue "
    "through one nation's suppliers instead of supplycost×availqty). "
    "Preserves the HAVING-vs-scalar-subquery-over-the-same-aggregate "
    "shape; the total is computed once and broadcast. The threshold "
    "is 1.2× the MEAN share rather than TPC-H's fixed fraction: a "
    "fixed fraction empties as the part count grows with SF (and "
    "did, at every tested SF — a vacuous 0≡0 check), while "
    "above-mean is scale-free and always selects the heavy parts.",
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = F.broadcast(
        _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    )
    value_by_part = (
        li.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("val")
        )
    )
    total = value_by_part.agg(
        (F.avg("val") * 1.2).alias("threshold")
    )
    return (
        value_by_part.crossJoin(F.broadcast(total))
        .filter(F.col("val") > F.col("threshold"))
        .select("l_partkey", _r2(F.col("val")).alias("part_value"))
    )


@_register(
    "tpch_q12_ship_delay_priority",
    """
    SELECT CASE WHEN l.l_shipdate >= o.o_orderdate + INTERVAL 30 DAY
                THEN 'SLOW' ELSE 'FAST' END AS ship_bucket,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN
                         ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
    doc="TPC-H Q12 adapted (no l_shipmode: lines bucketed by ship "
    "delay instead). Preserves the orders⋈lineitem join with "
    "conditional (CASE-sum) aggregation split by order priority.",
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .withColumn(
            "ship_bucket",
            F.when(
                F.col("l_shipdate")
                >= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"),
                "SLOW",
            ).otherwise("FAST"),
        )
        .groupBy("ship_bucket")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@_register(
    "tpch_q16_supplier_part_counts",
    """
    WITH supplies AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    )
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM supplies ps
    JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND ps.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q16 adapted (no partsupp: distinct lineitem pairs; "
    "'complaint' suppliers = negative account balance). Preserves the "
    "negated-brand/type/size-list filters, the NOT IN → anti-join, "
    "and the distinct-count per part descriptor.",
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplies = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = F.broadcast(
        _t(spark, sf_dir, "part").filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
        )
    )
    bad = F.broadcast(
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        supplies.join(
            bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
        )
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@_register(
    "tpch_q20_dominant_suppliers",
    """
    WITH shipped AS (
      SELECT l.l_partkey, l.l_suppkey, SUM(l.l_quantity) AS qty
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE 'small%'
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT l_partkey, SUM(qty) AS total_qty FROM shipped GROUP BY 1
    ),
    dominant AS (
      SELECT DISTINCT sh.l_suppkey
      FROM shipped sh JOIN tot t ON t.l_partkey = sh.l_partkey
      WHERE sh.qty > 0.5 * t.total_qty
    )
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM dominant)
      AND s.s_nationkey IN
          (SELECT n.n_nationkey FROM nation n
           JOIN region r ON r.r_regionkey = n.n_regionkey
           WHERE r.r_name = 'ASIA')
    """,
    doc="TPC-H Q20 adapted (no ps_availqty: a supplier qualifies by "
    "shipping >50% of a filtered part's one-year volume). Preserves "
    "the nested aggregate-over-aggregate threshold, the name-prefix "
    "part filter, and the IN → semi-join chain into supplier/nation.",
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = F.broadcast(
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    shipped = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    tot = shipped.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("qty").alias("total_qty")
    )
    dominant = (
        shipped.join(tot, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("qty") > 0.5 * F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
    )
    asia_nations = F.broadcast(
        _t(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "region").filter(
                    F.col("r_name") == "ASIA"
                )
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey")
    )
    return (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(dominant),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .join(
            asia_nations,
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .select("s_name", "s_acctbal")
    )


@_register(
    "tpch_q21_waiting_suppliers",
    """
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 45 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate >
                            o.o_orderdate + INTERVAL 45 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
    doc="TPC-H Q21 adapted (no l_receiptdate/l_commitdate: 'late' = "
    "shipped >45 days after the order date). Preserves the "
    "EXISTS/NOT-EXISTS pair — the sole late supplier in a "
    "multi-supplier order — as collect_set windows over l_orderkey. "
    "A/B-VALIDATED r15 (tools/ab_q21.py, SCALING.md 'tpch_q21 A/B'): "
    "this window plan beat or tied the r14 two-hash-aggregation "
    "rewrite at x1/x10/x100 — the window's sort requirement is "
    "satisfied nearly for free by the lineitem-orders SMJ's existing "
    "l_orderkey sort order, so the fact table crosses the wire ONCE, "
    "while the aggregation plan re-exchanged it twice ((l_orderkey, "
    "l_suppkey) grain, then l_orderkey grain) and a repartition "
    "hybrid (one exchange, no sort) still didn't win. The r14 sf0.1 "
    "regression that motivated the rewrite was host drift.",
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lines = li.join(
        o.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).withColumn(
        "is_late",
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS"),
    )
    w = Window.partitionBy("l_orderkey")
    lines = lines.withColumn(
        "all_supps", F.collect_set("l_suppkey").over(w)
    ).withColumn(
        "late_supps",
        F.collect_set(
            F.when(F.col("is_late"), F.col("l_suppkey"))
        ).over(w),
    )
    waiting = lines.filter(
        F.col("is_late")
        & (F.size("all_supps") > 1)
        & (
            F.size(F.array_remove("late_supps", F.col("l_suppkey")))
            == 0
        )
    )
    s = F.broadcast(
        _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    )
    return (
        waiting.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


@_register(
    "tpch_q22_global_sales_opportunity",
    """
    WITH eligible AS (
      SELECT c_custkey, c_nationkey, c_acctbal FROM customer
      WHERE c_nationkey IN (3, 5, 8, 13, 17, 21, 24)
    ),
    avg_bal AS (
      SELECT AVG(c_acctbal) AS a FROM eligible WHERE c_acctbal > 0.0
    )
    SELECT e.c_nationkey AS cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           floor(SUM(e.c_acctbal)*100 + 0.50005)/100 AS totacctbal
    FROM eligible e, avg_bal
    WHERE e.c_acctbal > avg_bal.a
      AND NOT EXISTS
          (SELECT 1 FROM orders o WHERE o.o_custkey = e.c_custkey
             AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY 1
    """,
    doc="TPC-H Q22 adapted (no c_phone: c_nationkey stands in for the "
    "phone country code). Preserves the scalar-subquery average "
    "threshold, the NOT EXISTS anti-join against orders, and the "
    "per-code count/sum of rich inactive customers. 'Inactive' is "
    "no order in the RECENT window (spec Q22's 7-year window in "
    "spirit): the unwindowed version was vacuous here because every "
    "customer has lifetime orders.",
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    eligible = _t(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(3, 5, 8, 13, 17, 21, 24)
    )
    avg_bal = eligible.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("a")
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate")
            >= F.lit("2000-01-01").cast("timestamp")
        )
        .select("o_custkey")
    )
    return (
        eligible.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _r2(F.sum("c_acctbal")).alias("totacctbal"),
        )
    )



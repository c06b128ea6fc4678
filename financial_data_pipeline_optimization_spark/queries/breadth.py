"""Scalar function families, subqueries, grouping, window completeness (split from the original queries.py; registration
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
)


# ===========================================================================
# Query-layer breadth: scalar function families, subqueries, grouping
# sets (SQL API), stats aggregates, unpivot, date arithmetic
# (SURVEY.md §7.3 — all Catalyst built-ins; work is surface + oracles)
# ===========================================================================


@_register(
    "string_functions",
    """
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           substring(p_name, 1, 5) AS name_prefix,
           replace(p_type, 'ECONOMY', 'ECO') AS type_short,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           string_split(p_name, ' ')[1] AS first_word,
           CAST(length(p_name) AS INT) AS name_len,
           CAST(strpos(p_name, 'widget') AS INT) AS widget_pos,
           concat(p_brand, ':', p_type) AS brand_type
    FROM part
    """,
    doc="String function family: case, substring, replace, pad, split, "
    "length, search, concat.",
)
def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.replace(
            F.col("p_type"), F.lit("ECONOMY"), F.lit("ECO")
        ).alias("type_short"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.split(F.col("p_name"), " ")[0].alias("first_word"),
        F.length("p_name").alias("name_len"),
        F.instr(F.col("p_name"), "widget").alias("widget_pos"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
    )


@_register(
    "math_functions",
    """
    SELECT l_orderkey, l_linenumber,
           abs(l_extendedprice - l_quantity) AS diff_abs,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           floor(sqrt(l_extendedprice)*10000 + 0.5000005)/10000 AS price_sqrt,
           floor(ln(l_extendedprice + 1)*10000 + 0.5000005)/10000 AS price_ln,
           floor(log10(l_extendedprice + 1)*10000 + 0.5000005)/10000
             AS price_log10,
           floor(pow(l_discount, 2)*10000 + 0.5000005)/10000 AS disc_sq,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign
    FROM lineitem
    """,
    doc="Math function family: abs/ceil/floor/sqrt/ln/log10/pow/mod/sign.",
)
def q_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - F.col("l_quantity")).alias("diff_abs"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.floor("l_extendedprice").alias("price_floor"),
        _r4(F.sqrt("l_extendedprice")).alias("price_sqrt"),
        _r4(F.log(F.col("l_extendedprice") + 1)).alias("price_ln"),
        _r4(F.log10(F.col("l_extendedprice") + 1)).alias("price_log10"),
        _r4(F.pow("l_discount", F.lit(2))).alias("disc_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
    )


@_register(
    "conditional_functions",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000 THEN 'high'
                WHEN o_totalprice >= 100000 THEN 'mid'
                ELSE 'low' END AS price_tier,
           nullif(o_orderstatus, 'F') AS status_or_null,
           coalesce(nullif(o_orderstatus, 'F'), 'finished') AS status_label,
           least(o_totalprice, 250000.0) AS price_capped,
           greatest(o_totalprice, 50000.0) AS price_floored,
           CAST(o_totalprice IS NULL AS BOOLEAN) AS price_missing,
           (o_orderstatus = 'O' AND o_totalprice > 200000) AS big_open
    FROM orders
    """,
    doc="Conditional family: CASE/when, nullif, coalesce, least/greatest, "
    "boolean expressions.",
)
def q_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
        .alias("price_tier"),
        F.nullif(F.col("o_orderstatus"), F.lit("F")).alias("status_or_null"),
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("F")), F.lit("finished")
        ).alias("status_label"),
        F.least(F.col("o_totalprice"), F.lit(250000.0)).alias("price_capped"),
        F.greatest(F.col("o_totalprice"), F.lit(50000.0)).alias(
            "price_floored"
        ),
        F.col("o_totalprice").isNull().alias("price_missing"),
        ((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 200000))
        .alias("big_open"),
    )


@_register(
    "array_functions",
    """
    WITH t AS (SELECT p_partkey, p_name, string_split(p_name, ' ') AS words
               FROM part)
    SELECT p_partkey,
           CAST(len(words) AS INT) AS n_words,
           words[1] AS first_word,
           words[-1] AS last_word,
           list_contains(words, 'widget') AS has_widget,
           array_to_string(list_sort(words), '|') AS sorted_words,
           array_to_string(list_transform(words, w -> upper(w)), '|')
             AS upper_words
    FROM t
    """,
    doc="Array/HOF family: size, indexing, contains, sort, transform "
    "(F.transform is JVM-side codegen, not a UDF).",
)
def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    words = F.split(F.col("p_name"), " ")
    return part.select(
        "p_partkey",
        F.size(words).alias("n_words"),
        words[0].alias("first_word"),
        F.element_at(words, -1).alias("last_word"),
        F.array_contains(words, "widget").alias("has_widget"),
        F.array_join(F.sort_array(words), "|").alias("sorted_words"),
        F.array_join(
            F.transform(words, lambda w: F.upper(w)), "|"
        ).alias("upper_words"),
    )


@_register(
    "full_outer_join",
    """
    SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
           CAST(c.c_custkey IS NOT NULL AS BOOLEAN) AS has_customer,
           CAST(o.o_orderkey IS NOT NULL AS BOOLEAN) AS has_order,
           o.o_orderkey
    FROM customer c
    FULL OUTER JOIN orders o ON c.c_custkey = o.o_custkey
    """,
    doc="Full outer join with both-side existence indicators.",
)
def q_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    j = c.join(o, c.c_custkey == o.o_custkey, "full_outer")
    return j.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        F.col("c_custkey").isNotNull().alias("has_customer"),
        F.col("o_orderkey").isNotNull().alias("has_order"),
        "o_orderkey",
    )


@_register(
    "cross_join_dims",
    """
    SELECT r.r_name, s.o_orderstatus
    FROM region r CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    """,
    doc="Explicit cross join of bounded dims (the only sane cross join).",
)
def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region")
    statuses = _t(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return region.crossJoin(statuses).select("r_name", "o_orderstatus")


@_register(
    "sql_grouping_sets",
    """
    SELECT r.r_name, n.n_name,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY GROUPING SETS ((r.r_name), (n.n_name), ())
    """,
    doc="GROUPING SETS via the engine's SQL API (spark.sql over temp "
    "views — same Catalyst plan as the DataFrame API).",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    _t(spark, sf_dir, "nation").createOrReplaceTempView("v_nation")
    _t(spark, sf_dir, "region").createOrReplaceTempView("v_region")
    return spark.sql(
        """
        SELECT r.r_name, n.n_name, COUNT(*) AS n_customers
        FROM v_customer c
        JOIN v_nation n ON c.c_nationkey = n.n_nationkey
        JOIN v_region r ON n.n_regionkey = r.r_regionkey
        GROUP BY GROUPING SETS ((r.r_name), (n.n_name), ())
        """
    )


@_register(
    "sql_correlated_exists",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1997-01-01')
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey
                        AND o2.o_orderstatus = 'P')
    """,
    doc="Correlated EXISTS / NOT EXISTS via SQL API — Catalyst "
    "decorrelates to semi/anti joins (the K5 NOT-EXISTS shape, "
    "loading.py:166-168, handled natively).",
)
def q_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM v_customer c
        WHERE EXISTS (SELECT 1 FROM v_orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1997-01-01')
          AND NOT EXISTS (SELECT 1 FROM v_orders o2
                          WHERE o2.o_custkey = c.c_custkey
                            AND o2.o_orderstatus = 'P')
        """
    )


@_register(
    "in_subquery",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer
                        WHERE c_mktsegment = 'BUILDING')
    """,
    doc="IN subquery (planned as left-semi).",
)
def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM v_orders
        WHERE o_custkey IN (SELECT c_custkey FROM v_customer
                            WHERE c_mktsegment = 'BUILDING')
        """
    )


@_register(
    "stats_aggregates",
    """
    SELECT l_returnflag,
           floor(stddev_samp(l_extendedprice)*100 + 0.50005)/100
             AS price_stddev,
           floor(var_samp(l_quantity)*10000 + 0.5000005)/10000 AS qty_var,
           floor(corr(l_quantity, l_extendedprice)*10000 + 0.5000005)/10000
             AS qty_price_corr,
           floor(covar_samp(l_discount, l_tax)*1000000 + 0.50000005)/1000000
             AS disc_tax_covar
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Statistical aggregates: stddev/variance/correlation/covariance.",
)
def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        _r2(F.stddev_samp("l_extendedprice")).alias("price_stddev"),
        _r4(F.var_samp("l_quantity")).alias("qty_var"),
        _r4(F.corr("l_quantity", "l_extendedprice")).alias("qty_price_corr"),
        (F.floor(F.covar_samp("l_discount", "l_tax") * 1000000
                 + F.lit(0.50000005)) / 1000000).alias("disc_tax_covar"),
    )


@_register(
    "collect_sorted_list",
    """
    SELECT o_custkey,
           array_to_string(list_sort(list(o_orderstatus)), ',')
             AS statuses,
           array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',')
             AS priorities
    FROM orders GROUP BY o_custkey
    """,
    doc="collect_list/collect_set with explicit sort (unordered "
    "collection is nondeterministic — always sort before comparing).",
)
def q_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.array_join(
            F.sort_array(F.collect_list("o_orderstatus")), ","
        ).alias("statuses"),
        F.array_join(
            F.sort_array(F.collect_set("o_orderpriority")), ","
        ).alias("priorities"),
    )


@_register(
    "unpivot_metrics",
    """
    SELECT l_orderkey, l_linenumber, 'quantity' AS metric,
           l_quantity AS value FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'price', l_extendedprice FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
    """,
    doc="Unpivot (stack): wide metrics to long rows.",
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.selectExpr(
        "l_orderkey",
        "l_linenumber",
        "stack(3, 'quantity', l_quantity, 'price', l_extendedprice, "
        "'discount', l_discount) AS (metric, value)",
    )


@_register(
    "date_arithmetic",
    """
    WITH t AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d FROM orders)
    SELECT o_orderkey,
           d + 30 AS plus_30d,
           d - 7 AS minus_7d,
           CAST(date_diff('day', d, DATE '1998-01-01') AS INT) AS days_to_ref,
           last_day(d) AS month_end,
           CAST(date_trunc('month', d) AS DATE) AS month_start,
           CAST(date_trunc('quarter', d) AS DATE) AS quarter_start,
           CAST(d + INTERVAL 2 MONTH AS DATE) AS plus_2mo
    FROM t
    """,
    doc="Date arithmetic family: add/sub days, datediff, last_day, "
    "trunc to month/quarter, add_months.",
)
def q_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("d")
    )
    return o.select(
        "o_orderkey",
        F.date_add("d", 30).alias("plus_30d"),
        F.date_sub("d", 7).alias("minus_7d"),
        F.datediff(F.lit("1998-01-01").cast("date"), F.col("d")).alias(
            "days_to_ref"
        ),
        F.last_day("d").alias("month_end"),
        F.trunc("d", "month").alias("month_start"),
        F.trunc("d", "quarter").alias("quarter_start"),
        F.add_months("d", 2).alias("plus_2mo"),
    )


@_register(
    "histogram_buckets",
    """
    SELECT CAST(floor(o_totalprice / 50000) AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           floor(MIN(o_totalprice)*100 + 0.50005)/100 AS bucket_min,
           floor(MAX(o_totalprice)*100 + 0.50005)/100 AS bucket_max
    FROM orders GROUP BY 1
    """,
    doc="Equi-width histogram by bucketed value.",
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy(
        F.floor(F.col("o_totalprice") / 50000).cast("int").alias("bucket")
    ).agg(
        F.count("*").alias("n_orders"),
        _r2(F.min("o_totalprice")).alias("bucket_min"),
        _r2(F.max("o_totalprice")).alias("bucket_max"),
    )


@_register(
    "tpch_q3_shipping_priority",
    """
    SELECT l.l_orderkey,
           floor(SUM(l.l_extendedprice * (1 - l.l_discount))*100
                 + 0.50005)/100 AS revenue,
           CAST(o.o_orderdate AS DATE) AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: selective filters on both fact sides + 3-way "
    "join + agg + top-k (TakeOrderedAndProject).",
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            _r2(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# ===========================================================================
# Window-function completeness, HAVING, scalar subqueries, exact
# percentiles, corpus-level text statistics
# ===========================================================================


@_register(
    "window_analytics",
    """
    SELECT o_custkey, o_orderkey,
           LEAD(o_orderkey) OVER w AS next_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_orderkey,
           LAST_VALUE(o_orderkey) OVER w AS latest_so_far,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_orderkey
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="Analytic window family: lead, first/last/nth_value (default "
    "running frame, deterministic unique ordering).",
)
def q_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.first("o_orderkey").over(w).alias("first_orderkey"),
        F.last("o_orderkey").over(w).alias("latest_so_far"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_orderkey"),
    )


@_register(
    "window_distribution",
    """
    SELECT o_orderkey, o_orderstatus,
           CAST(NTILE(4) OVER w AS INT) AS price_quartile,
           floor(PERCENT_RANK() OVER w * 10000 + 0.5000005)/10000
             AS price_pct_rank,
           floor(CUME_DIST() OVER w * 10000 + 0.5000005)/10000
             AS price_cume_dist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice, o_orderkey)
    """,
    doc="Distribution windows: ntile / percent_rank / cume_dist.",
)
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_orderstatus").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.ntile(4).over(w).alias("price_quartile"),
        _r4(F.percent_rank().over(w)).alias("price_pct_rank"),
        _r4(F.cume_dist().over(w)).alias("price_cume_dist"),
    )


@_register(
    "window_range_frame",
    """
    WITH t AS (SELECT o_custkey, o_orderkey,  o_totalprice,
                      CAST(date_diff('day', DATE '1995-01-01',
                                     CAST(o_orderdate AS DATE)) AS INT) AS d
               FROM orders)
    SELECT o_custkey, o_orderkey,
           floor(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY d
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)*100 + 0.50005)/100
             AS spend_30d
    FROM t
    """,
    doc="RANGE-frame window: trailing-30-day spend per customer (value-"
    "based frame over a day offset, not a row count).",
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        ).alias("d"),
    )
    w = Window.partitionBy("o_custkey").orderBy("d").rangeBetween(-30, 0)
    return t.select(
        "o_custkey",
        "o_orderkey",
        _r2(F.sum("o_totalprice").over(w)).alias("spend_30d"),
    )


@_register(
    "having_filter",
    """
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
           floor(SUM(o_totalprice)*100 + 0.50005)/100 AS total_spend
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 8 AND SUM(o_totalprice) > 500000
    """,
    doc="Aggregate + HAVING (post-aggregation filter).",
)
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("o_totalprice").alias("__spend"),
        )
        .filter((F.col("n_orders") >= 8) & (F.col("__spend") > 500000))
        .select("o_custkey", "n_orders", _r2(F.col("__spend")).alias("total_spend"))
    )


@_register(
    "scalar_subquery_ratio",
    """
    SELECT o_orderkey,
           floor(o_totalprice / (SELECT AVG(o_totalprice) FROM orders)
                 *10000 + 0.5000005)/10000 AS price_vs_avg
    FROM orders
    """,
    doc="Scalar subquery: each order's price relative to the global "
    "average (one extra scan, broadcast scalar).",
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT o_orderkey,
               floor(o_totalprice / (SELECT AVG(o_totalprice) FROM v_orders)
                     *10000 + 0.5000005)/10000 AS price_vs_avg
        FROM v_orders
        """
    )


@_register(
    "exact_percentiles",
    """
    SELECT o_orderstatus,
           floor(quantile_cont(o_totalprice, 0.5)*100 + 0.50005)/100
             AS median_price,
           floor(quantile_cont(o_totalprice, 0.9)*100 + 0.50005)/100
             AS p90_price,
           floor(MIN(o_totalprice)*100 + 0.50005)/100 AS min_price,
           floor(MAX(o_totalprice)*100 + 0.50005)/100 AS max_price
    FROM orders GROUP BY o_orderstatus
    """,
    doc="Exact percentiles (linear interpolation — Spark percentile() "
    "and DuckDB quantile_cont agree).",
)
def q_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            _r2(F.expr("percentile(o_totalprice, 0.5)")).alias("median_price"),
            _r2(F.expr("percentile(o_totalprice, 0.9)")).alias("p90_price"),
            _r2(F.min("o_totalprice")).alias("min_price"),
            _r2(F.max("o_totalprice")).alias("max_price"),
        )
    )


@_register(
    "conditional_aggregates",
    """
    SELECT l_returnflag,
           CAST(COUNT(*) FILTER (l_discount > 0.05) AS BIGINT)
             AS n_discounted,
           bool_and(l_quantity > 0) AS all_positive_qty,
           bool_or(l_tax > 0.07) AS any_high_tax,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Conditional aggregates: count_if / bool_and / bool_or / "
    "distinct count.",
)
def q_conditional_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive_qty"),
        F.bool_or(F.col("l_tax") > 0.07).alias("any_high_tax"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
    )


_ORACLE_TOKENS_D = _ORACLE_TOKENS  # alias for readability below


@_register(
    "corpus_top_bigrams",
    f"""
    WITH toks AS (SELECT doc_id, {_ORACLE_TOKENS_D} AS t FROM documents),
    sh AS (
      SELECT doc_id, array_to_string(t[i+1:i+2], ' ') AS bigram
      FROM toks, UNNEST(range(greatest(len(t)-1, 1))) AS u(i)
    )
    SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM sh GROUP BY bigram
    ORDER BY n_occurrences DESC, bigram
    LIMIT 20
    """,
    doc="Corpus-level n-gram frequency: explode bigrams, count global "
    "occurrences + document frequency, top-20.",
)
def q_corpus_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    sh = dedup.with_shingles(
        docs.select("doc_id", "text"), "text", n=2, out_col="sh",
        distinct=False,
    ).select("doc_id", explode_nonempty(F.col("sh")).alias("bigram"))
    return (
        sh.groupBy("bigram")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("bigram"))
        .limit(20)
    )


@_register(
    "tfidf_top_terms",
    f"""
    WITH toks AS (SELECT doc_id, unnest({_ORACLE_TOKENS_D}) AS token
                  FROM documents),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.token,
             tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)) AS score
      FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
    )
    SELECT doc_id, token,
           CAST(rn AS INT) AS term_rank,
           floor(score*10000 + 0.5000005)/10000 AS tfidf
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                       ORDER BY score DESC, token) AS rn
          FROM scored)
    WHERE rn <= 3
    """,
    doc="TF-IDF top-3 terms per document: term frequencies, document "
    "frequencies, corpus size as a broadcast scalar — all shuffles on "
    "(token) / (doc_id, token) keys, never on documents.",
)
def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import text as text_ops

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", explode_nonempty(text_ops.tokens(F.col("text"))).alias("token")
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df_ = toks.groupBy("token").agg(
        F.countDistinct("doc_id").alias("df")
    )
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            (
                F.col("tf")
                * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("token")
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= 3)
        .select("doc_id", "token", "term_rank", _r4(F.col("score")).alias("tfidf"))
    )



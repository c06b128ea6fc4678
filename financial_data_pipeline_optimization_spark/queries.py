"""Query registry: the engine's operator surface as runnable queries.

One entry per operator from SURVEY.md §2 (reference core), §7.3 (query
layer) and §7.5 (LLM-data-pipeline extensions). Each entry pairs a
Spark implementation ``(spark, sf_dir) -> DataFrame`` with an ANSI-SQL
oracle string that DuckDB runs over the same parquet tables; the driver
compares row count + schema + order-insensitive value hash.

Conventions that keep the comparison exact:

- every computed column is aliased identically on both sides;
- float aggregates are rounded to a fixed precision on both sides
  (double summation order differs between engines at ~1e-12 relative);
- integer-typed expressions are cast so Spark and DuckDB widths agree
  (DuckDB ``year()``/``rank()`` return BIGINT, ``sum(BIGINT)`` returns
  HUGEINT);
- ties are always broken by a unique key so top-k / window outputs are
  deterministic.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

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


@dataclass(frozen=True)
class QuerySpec:
    """A registered query: Spark impl + optional DuckDB oracle SQL."""

    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


_REGISTRY: list[QuerySpec] = []


def _register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        _REGISTRY.append(QuerySpec(name, fn, oracle, doc))
        return fn

    return deco


# Driver-check history, parsed from the CORRECTNESS_r*.json artifacts
# the driver writes to the repo root each round. Every green row
# (rows+schema+hash match, no err) records "this name was verified in
# round N"; the registry() ordering below rotates the driver's bounded
# 50-name window onto (1) names with no row yet, then (2) names whose
# plan changed since their last row, then (3) everything else,
# oldest-verified first — so every query gets re-proven on a bounded
# cadence without hand-maintaining per-round name lists.

def _driver_check_history() -> dict[str, int]:
    """name -> most recent round with a fully-green driver row."""
    import json
    import re as _re
    from pathlib import Path

    root = Path(__file__).resolve().parents[1]
    hist: dict[str, int] = {}
    for f in sorted(root.glob("CORRECTNESS_r*.json")):
        m = _re.search(r"r(\d+)", f.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.loads(f.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            ):
                hist[name] = max(hist.get(name, 0), rnd)
    return hist


# Queries whose implementation or oracle changed after (or whose driver
# row was red in) their last driver check — they need a fresh row,
# right after the never-checked group. Each entry is
# ``(name, round_changed)``: once the name earns a green driver row in
# ``round_changed`` or later, it falls back into the oldest-first pool
# automatically (no per-round pruning of this list needed — stale
# entries are inert). PRIORITY-ORDERED within the still-pending set:
# when fresh + changed exceed the driver's 50-name window, earlier
# entries win the remaining slots.
#
# r05 batch: the exact-Jaccard pair path moved its candidate dedup
# after the verify filter (ngram_jaccard_pairs + cluster consumer);
# five formerly-VACUOUS checks rewritten to return non-empty results;
# oracle whitespace classes rewritten from RE2 `\s` to the explicit
# Java set [ \t\n\x0b\f\r] (text batch — Spark sides untouched, but
# the oracle text changed so re-prove).
_CHANGED_SINCE_CHECK: tuple[tuple[str, int], ...] = (
    ("ngram_jaccard_pairs", 5),
    ("near_dup_clusters", 5),
    ("anti_join_new_keys", 5),
    ("set_except", 5),
    ("referential_orphans", 5),
    ("tpch_q11_important_stock", 5),
    ("tpch_q22_global_sales_opportunity", 5),
    ("minhash_recall_check", 5),
    ("corpus_curation_funnel", 5),
    ("text_stats", 5),
    ("token_count_bpe_ish", 5),
    ("doc_fingerprint", 5),
    ("quality_filter", 5),
    ("text_clean_redact", 5),
    ("key_skew_profile", 5),
    ("mixture_budget_plan", 5),
    ("gopher_quality_flags", 5),
    ("event_rate_anomalies", 5),
    # r06 batch: psi one-sided-bin convention now shared with the
    # oracle (matched-bins renormalization); PQ query-side collect
    # bounded by the QueryBatchTooLarge probe.
    ("psi_drift_by_priority", 6),
    ("knn_pq_recall_check", 6),
)


def registry() -> list[QuerySpec]:
    """All registered queries, never-driver-checked names first, then
    changed-since-last-check names, then the already-checked tail
    ordered OLDEST-VERIFIED FIRST (stable by definition order within
    each group).

    The driver's correctness sweep takes a 50-name prefix, so this
    ordering rotates its window onto the queries with no current row,
    then the ones whose last green row is the most rounds of
    refactoring old — every query gets re-proven on a bounded cadence
    instead of coasting on a stale row. History comes straight from
    the driver's own CORRECTNESS artifacts, so the rotation needs no
    per-round maintenance (and degrades to definition order when the
    artifacts are absent).
    """
    hist = _driver_check_history()
    # Still-pending changed names: changed in a round their last green
    # row predates. A name re-proven at or after its change round is
    # no longer "changed" and rejoins the oldest-first pool.
    pending = {
        name: i
        for i, (name, rnd) in enumerate(_CHANGED_SINCE_CHECK)
        if hist.get(name, -1) < rnd
    }
    fresh = [s for s in _REGISTRY if s.name not in hist]
    changed = sorted(
        (s for s in _REGISTRY if s.name in hist and s.name in pending),
        key=lambda s: pending[s.name],
    )
    rest = sorted(
        (
            s
            for s in _REGISTRY
            if s.name in hist and s.name not in pending
        ),
        key=lambda s: hist[s.name],
    )
    return fresh + changed + rest


def _r2(c):
    """Engine-portable cents rounding.

    Spark's ``round`` is HALF_UP while DuckDB's rounds half-to-even, and
    the test data is decimal-exact to 4 places, so exact ``.xx5`` ties
    are common and the two engines disagree on them. ``floor(x*100 +
    0.5 + 5e-5)`` resolves every decimal-exact tie upward in both
    engines (the 5e-5 nudge is far above cross-engine float-summation
    noise and far below the 1e-4 value granularity). Oracle SQL twin:
    ``floor(x*100 + 0.50005)/100``.
    """
    return F.floor(c * 100 + F.lit(0.50005)) / 100


def _r4(c):
    """4-decimal variant of :func:`_r2`; SQL twin
    ``floor(x*10000 + 0.5000005)/10000``."""
    return F.floor(c * 10000 + F.lit(0.5000005)) / 10000


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ===========================================================================
# Flagship (SURVEY.md §7.2): the reference-core surface in one query —
# scan, cast, calendar derivation (F1-F5), join, group-agg, window rank.
# ===========================================================================


@_register(
    "flagship_monthly_segment_revenue",
    """
    WITH enriched AS (
      SELECT c.c_mktsegment,
             CAST(year(o.o_orderdate) AS INT) AS order_year,
             CAST(month(o.o_orderdate) AS INT) AS order_month,
             l.l_extendedprice * (1 - l.l_discount) AS rev,
             l.l_orderkey
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    agg AS (
      SELECT c_mktsegment, order_year, order_month,
             floor(SUM(rev)*100 + 0.50005)/100 AS revenue,
             CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
      FROM enriched
      GROUP BY 1, 2, 3
    )
    SELECT c_mktsegment, order_year, order_month, revenue, n_orders,
           CAST(RANK() OVER (
             PARTITION BY order_year, order_month
             ORDER BY revenue DESC, c_mktsegment) AS INT) AS revenue_rank
    FROM agg
    """,
    doc="Monthly revenue per market segment with in-month rank "
    "(scan+join+agg+window; reference core F1-F5/P/§2.8 in one plan).",
)
def q_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    enriched = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            "c_mktsegment",
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
            "l_orderkey",
        )
    )
    agg = enriched.groupBy("c_mktsegment", "order_year", "order_month").agg(
        _r2(F.sum("rev")).alias("revenue"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )
    w = Window.partitionBy("order_year", "order_month").orderBy(
        F.col("revenue").desc(), F.col("c_mktsegment")
    )
    return agg.withColumn("revenue_rank", F.rank().over(w))


# ===========================================================================
# Reference core operators (SURVEY.md §2) over the star schema
# ===========================================================================


@_register(
    "temporal_derive",
    """
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS order_date,
           CAST(year(o_orderdate) AS INT) AS "Year",
           CAST(month(o_orderdate) AS INT) AS "Month",
           CAST(day(o_orderdate) AS INT) AS "Day",
           CAST(quarter(o_orderdate) AS INT) AS "Quarter",
           dayname(o_orderdate) AS "Weekday"
    FROM orders
    """,
    doc="F1-F5 calendar derivations (transformation.py:70-74) on o_orderdate.",
)
def q_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").withColumn(
        "order_date", F.col("o_orderdate").cast("date")
    )
    return temporal.derive_calendar(orders, "order_date").select(
        "o_orderkey", "order_date", "Year", "Month", "Day", "Quarter", "Weekday"
    )


@_register(
    "cast_project",
    """
    SELECT l_orderkey,
           CAST(l_linenumber AS BIGINT) AS line_no,
           floor(l_extendedprice * (1 + l_tax)*100 + 0.50005)/100 AS gross_price,
           lower(l_returnflag) AS flag,
           CAST(floor(l_quantity) AS BIGINT) AS qty_floor
    FROM lineitem
    """,
    doc="P1-P6: projection, rename, numeric/string casts (transformation.py:57-66).",
)
def q_cast_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return clean.project(
        li,
        [
            F.col("l_orderkey"),
            F.col("l_linenumber").cast("long").alias("line_no"),
            _r2(F.col("l_extendedprice") * (1 + F.col("l_tax"))).alias(
                "gross_price"
            ),
            F.lower("l_returnflag").alias("flag"),
            F.floor("l_quantity").cast("long").alias("qty_floor"),
        ],
    )


@_register(
    "fillna_outer_join",
    """
    SELECT c.c_custkey,
           COALESCE(o.o_orderkey, 0) AS o_orderkey,
           COALESCE(o.o_totalprice, 0.0) AS o_totalprice,
           COALESCE(o.o_orderstatus, 'Unknown') AS o_orderstatus
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    """,
    doc="N1 type-dispatched fillna (transformation.py:81-89) over the "
    "nulls produced by an outer join.",
)
def q_fillna(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    joined = customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left"
    ).select("c_custkey", "o_orderkey", "o_totalprice", "o_orderstatus")
    return clean.fill_nulls(joined)


@_register(
    "dedup_keep_latest",
    """
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(o_orderdate AS DATE) AS o_date
    FROM orders
    QUALIFY ROW_NUMBER() OVER (
      PARTITION BY o_custkey
      ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
    """,
    doc="D1 keep-latest dedup (extraction.py:105, keep='last') — latest "
    "order per customer via explicit row_number ordering.",
)
def q_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return dedup.keep_latest(
        orders, ["o_custkey"], ["o_orderdate", "o_orderkey"]
    ).select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.col("o_orderdate").cast("date").alias("o_date"),
    )


@_register(
    "anti_join_new_keys",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2001-01-01')
    """,
    doc="J1/K5: the NOT EXISTS dedup insert (loading.py:159-169) as a "
    "Spark left-anti join — customers with no orders in the current "
    "period (churn candidates). The period filter keeps the check "
    "NON-VACUOUS: every customer has some order in the synthetic "
    "data, so the unfiltered anti join verified nothing (0≡0); the "
    "filter is pushed to the orders scan before the anti join.",
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    return customer.join(
        orders.select(F.col("o_custkey").alias("c_custkey")),
        "c_custkey",
        "left_anti",
    ).select("c_custkey", "c_name")


@_register(
    "upsert_merge",
    """
    WITH target AS (SELECT * FROM orders WHERE o_orderkey % 3 <> 0),
         staged AS (SELECT * FROM orders WHERE o_orderkey % 2 = 0),
         fresh AS (
           SELECT s.* FROM staged s
           WHERE NOT EXISTS (SELECT 1 FROM target t
                             WHERE t.o_orderkey = s.o_orderkey)
         )
    SELECT o_orderkey, o_custkey, o_totalprice FROM target
    UNION ALL
    SELECT o_orderkey, o_custkey, o_totalprice FROM fresh
    """,
    doc="I2: full staging→target upsert (loading.py:127-178) engine-side: "
    "left-anti + unionByName on simulated key splits of orders.",
)
def q_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    target = orders.filter(F.col("o_orderkey") % 3 != 0)
    staged = orders.filter(F.col("o_orderkey") % 2 == 0)
    merged = joins.anti_join_upsert(target, staged, ["o_orderkey"])
    return merged.select("o_orderkey", "o_custkey", "o_totalprice")


@_register(
    "lookup_join_dim",
    """
    SELECT n.n_nationkey, n.n_name, r.r_name
    FROM nation n LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    doc="J2/F6: broadcast dim lookup (the ticker→company dict map, "
    "extraction.py:85-94) — nation enriched with region name.",
)
def q_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return joins.broadcast_lookup(
        nation, region, nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name", "r_name")


@_register(
    "union_sort",
    """
    SELECT * FROM (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderstatus = 'F'
      UNION ALL
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderstatus <> 'F'
    ) ORDER BY o_orderkey
    """,
    doc="U1/U2 unions (extraction.py:79,104) + O1 multi-key sort "
    "(extraction.py:112).",
)
def q_union_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    f_part = orders.filter(F.col("o_orderstatus") == "F")
    rest = orders.filter(F.col("o_orderstatus") != "F")
    return f_part.unionByName(rest).orderBy("o_orderkey")


@_register(
    "stable_id",
    """
    SELECT o_orderkey,
           md5(concat(
             CASE WHEN o_orderkey IS NULL THEN chr(0)
                  ELSE chr(1) || CAST(o_orderkey AS VARCHAR) END,
             chr(31),
             CASE WHEN o_custkey IS NULL THEN chr(0)
                  ELSE chr(1) || CAST(o_custkey AS VARCHAR) END
           )) AS row_id
    FROM orders
    """,
    doc="F7 replacement (SURVEY §7.4): deterministic content-derived row "
    "id instead of monotonically_increasing_id (transformation.py:92).",
)
def q_stable_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey", portable_id("o_orderkey", "o_custkey").alias("row_id")
    )


# ===========================================================================
# Query layer (SURVEY.md §7.3): aggregations, windows, set ops, top-k
# ===========================================================================


@_register(
    "group_agg_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           floor(SUM(l_quantity)*100 + 0.50005)/100 AS sum_qty,
           floor(SUM(l_extendedprice)*100 + 0.50005)/100 AS sum_base_price,
           floor(SUM(l_extendedprice * (1 - l_discount))*100 + 0.50005)/100
             AS sum_disc_price,
           floor(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax))*100
                 + 0.50005)/100 AS sum_charge,
           floor(AVG(l_quantity)*100 + 0.50005)/100 AS avg_qty,
           floor(AVG(l_extendedprice)*100 + 0.50005)/100 AS avg_price,
           floor(AVG(l_discount)*10000 + 0.5000005)/10000 AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-shaped pricing summary: filter + groupBy + 8 aggregates "
    "(the §2.8 aggregation layer the reference lacks).",
)
def q_group_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").cast("date") <= F.lit("1998-09-02").cast("date")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _r2(F.sum("l_quantity")).alias("sum_qty"),
        _r2(F.sum("l_extendedprice")).alias("sum_base_price"),
        _r2(F.sum(disc_price)).alias("sum_disc_price"),
        _r2(F.sum(disc_price * (1 + F.col("l_tax")))).alias("sum_charge"),
        _r2(F.avg("l_quantity")).alias("avg_qty"),
        _r2(F.avg("l_extendedprice")).alias("avg_price"),
        _r4(F.avg("l_discount")).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@_register(
    "topk_orders",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    doc="Top-k: orderBy + limit; Catalyst plans TakeOrderedAndProject "
    "(no full sort at scale).",
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@_register(
    "window_rank_in_nation",
    """
    SELECT c_custkey, c_nationkey, c_acctbal,
           CAST(DENSE_RANK() OVER (
             PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS INT)
             AS bal_rank
    FROM customer
    """,
    doc="Ranking window: dense_rank of customers by balance within nation.",
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    return (
        _t(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey", "c_acctbal")
        .withColumn("bal_rank", F.dense_rank().over(w))
    )


@_register(
    "window_moving_avg",
    """
    SELECT o_custkey, o_orderkey,
           floor(AVG(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)*100 + 0.50005)/100
             AS moving_avg_price
    FROM orders
    """,
    doc="Frame-spec window: 3-row moving average of order value per "
    "customer (the per-ticker moving-average shape, SURVEY §2.8).",
)
def q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 0)
    )
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        _r2(F.avg("o_totalprice").over(w)).alias("moving_avg_price"),
    )


@_register(
    "window_lag_returns",
    """
    SELECT o_custkey, o_orderkey,
           floor((o_totalprice - LAG(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))*100
             + 0.50005)/100 AS price_delta
    FROM orders
    """,
    doc="lag() analytic window — the day-over-day return/delta shape.",
)
def q_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        _r2(
            F.col("o_totalprice") - F.lag("o_totalprice").over(w)
        ).alias("price_delta"),
    )


@_register(
    "rollup_region_nation",
    """
    SELECT r.r_name, n.n_name,
           CAST(COUNT(c.c_custkey) AS BIGINT) AS n_customers,
           floor(SUM(c.c_acctbal)*100 + 0.50005)/100 AS total_balance
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
    doc="Hierarchical rollup: region → nation → grand total.",
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    joined = customer.join(
        nation, customer.c_nationkey == nation.n_nationkey
    ).join(region, nation.n_regionkey == region.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(
        F.count("c_custkey").alias("n_customers"),
        _r2(F.sum("c_acctbal")).alias("total_balance"),
    )


@_register(
    "cube_status_priority",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           floor(SUM(o_totalprice)*100 + 0.50005)/100 AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="Cube over order status × priority.",
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            _r2(F.sum("o_totalprice")).alias("total_price"),
        )
    )


@_register(
    "set_intersect",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    doc="INTERSECT: customers with both fulfilled and open orders.",
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    f_cust = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o_cust = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f_cust.intersect(o_cust)


@_register(
    "set_except",
    """
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    WHERE o_totalprice > 400000
    """,
    doc="EXCEPT: the anti-join shape as a set operation — customers "
    "who never placed a large order. (The big-order filter keeps the "
    "difference non-empty; the unfiltered version was vacuous since "
    "every customer has orders.)",
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer").select("c_custkey")
    ordered = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return customer.exceptAll(ordered).distinct()


@_register(
    "semi_join_big_spenders",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 200000)
    """,
    doc="Left-semi join (EXISTS): customers with at least one large order.",
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    big = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 200000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return customer.join(big, "c_custkey", "left_semi").select(
        "c_custkey", "c_name"
    )


@_register(
    "distinct_agg",
    """
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
    doc="Distinct aggregate per group (Catalyst expand + two-phase agg).",
)
def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
        )
    )


@_register(
    "pivot_status_by_priority",
    """
    SELECT o_orderpriority,
           floor(COALESCE(SUM(o_totalprice) FILTER (o_orderstatus = 'F'), 0)
                 *100 + 0.50005)/100 AS "F",
           floor(COALESCE(SUM(o_totalprice) FILTER (o_orderstatus = 'O'), 0)
                 *100 + 0.50005)/100 AS "O",
           floor(COALESCE(SUM(o_totalprice) FILTER (o_orderstatus = 'P'), 0)
                 *100 + 0.50005)/100 AS "P"
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Pivot: order value by priority × status (explicit value list — "
    "no driver-side distinct scan).",
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    pivoted = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .sum("o_totalprice")
    )
    return pivoted.select(
        "o_orderpriority",
        *[_r2(F.coalesce(F.col(s), F.lit(0.0))).alias(s)
          for s in ("F", "O", "P")],
    )


@_register(
    "star_join_revenue_by_region",
    """
    SELECT r.r_name,
           floor(SUM(l.l_extendedprice * (1 - l.l_discount))*100 + 0.50005)/100
             AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    doc="4-way star join with broadcast dims (TPC-H Q5 shape).",
)
def q_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            _r2(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
    )


# ===========================================================================
# Events: JSON, temporal windows, as-of / range joins, sessionization
# (SURVEY.md §7.3 scalar extensions + §7.5 streaming batch-twins)
# ===========================================================================


@_register(
    "json_extract_agg",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           floor(SUM(value)*100 + 0.50005)/100 AS total_value
    FROM events
    GROUP BY 1
    """,
    doc="JSON prop extraction (from_json / get_json_object on "
    "events.props) + aggregation.",
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return (
        events.withColumn(
            "k_bucket",
            (F.get_json_object("props", "$.k").cast("int") % 10),
        )
        .groupBy("k_bucket")
        .agg(
            F.count("*").alias("n_events"),
            _r2(F.sum("value")).alias("total_value"),
        )
    )


@_register(
    "tumbling_window_agg",
    """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           floor(SUM(value)*100 + 0.50005)/100 AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling 1-hour window aggregate over events.ts — the batch "
    "twin of the streaming groupBy(window(...)) (SURVEY §7.4).",
)
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "1 hour").getField("start").alias("window_start"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            _r2(F.sum("value")).alias("total_value"),
        )
    )


@_register(
    "sliding_window_agg",
    """
    WITH assigned AS (
      SELECT e.value,
             unnest([time_bucket(INTERVAL '30 minutes', e.ts),
                     time_bucket(INTERVAL '30 minutes', e.ts)
                       - INTERVAL '30 minutes']) AS window_start
      FROM events e
    )
    SELECT window_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           floor(SUM(value)*100 + 0.50005)/100 AS total_value
    FROM assigned
    GROUP BY 1
    """,
    doc="Sliding window (1 h length, 30 min slide): each event lands in "
    "2 windows; oracle assigns the two covering starts explicitly.",
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "1 hour", "30 minutes")
            .getField("start")
            .alias("window_start")
        )
        .agg(
            F.count("*").alias("n_events"),
            _r2(F.sum("value")).alias("total_value"),
        )
    )


@_register(
    "session_window_agg",
    """
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM gaps
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
    doc="Sessionization (30-min inactivity gap) via lag + cumulative "
    "sum — the batch twin of session_window(ts, '30 minutes').",
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    lag_ts = F.lag("ts").over(w)
    new_sess = F.when(
        lag_ts.isNull()
        | (F.unix_micros(F.col("ts")) - F.unix_micros(lag_ts) > 1_800_000_000),
        1,
    ).otherwise(0)
    return (
        events.withColumn("new_sess", new_sess)
        .withColumn("session_id", F.sum("new_sess").over(cum))
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .select(
            "user_id", "session_id", "session_start", "session_end", "n_events"
        )
    )


@_register(
    "asof_join_last_view",
    """
    WITH clicks AS (SELECT * FROM events WHERE event_type = 'click'),
         views AS (
           SELECT user_id, ts, value FROM events
           WHERE event_type = 'view'
           QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                      ORDER BY event_id DESC) = 1
         )
    SELECT l.event_id, l.user_id, l.ts,
           r.ts AS ts_right, r.value AS value_right
    FROM clicks l ASOF LEFT JOIN views r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    doc="As-of join (operators.joins.asof_join: union+window, one "
    "shuffle): each click matched to the user's latest view at-or-before "
    "it; DuckDB's native ASOF JOIN is the oracle.",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = dedup.keep_latest(
        events.filter(F.col("event_type") == "view").select(
            "user_id", "ts", "value", "event_id"
        ),
        ["user_id", "ts"],
        ["event_id"],
    ).drop("event_id")
    return joins.asof_join(
        clicks, views, on=["user_id"], left_ts="ts", right_ts="ts"
    ).withColumnRenamed("value", "value_right")


@_register(
    "range_join_followers",
    """
    SELECT a.event_id, CAST(COUNT(*) AS BIGINT) AS n_follow
    FROM events a
    JOIN events b ON a.user_id = b.user_id
      AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL '1 hour'
    GROUP BY a.event_id
    """,
    doc="Range join (operators.joins.range_join: bucketized equi-join, "
    "no nested loop): events of the same user within the hour after "
    "each event.",
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    left = events.select("event_id", "user_id", "ts")
    right = (
        events.select("event_id", "user_id", "ts")
        .withColumn("range_start", F.col("ts"))
        .withColumn("range_end", F.col("ts") + F.expr("interval 1 hour"))
    )
    paired = joins.range_join(
        left,
        right,
        left_ts="ts",
        range_start="range_start",
        range_end="range_end",
        on=["user_id"],
        bucket="1 hour",
    )
    return (
        paired.filter(F.col("ts") > F.col("ts_right"))
        .groupBy(F.col("event_id_right").alias("event_id"))
        .agg(F.count("*").alias("n_follow"))
    )


# ===========================================================================
# Text analysis (extension surface; operators.text)
# ===========================================================================

_ORACLE_TOKENS = (
    "string_split_regex(trim(regexp_replace(lower(text), "
    "'[^a-z0-9 \\t\\n\\x0b\\f\\r]', ' ', 'g')), '[ \\t\\n\\x0b\\f\\r]+')"
)


@_register(
    "text_stats",
    f"""
    WITH toks AS (SELECT doc_id, text, {_ORACLE_TOKENS} AS t FROM documents)
    SELECT doc_id,
           CAST(length(text) AS INT) AS n_chars_text,
           CAST(len(t) AS INT) AS n_tokens,
           CAST(len(list_distinct(t)) AS INT) AS n_distinct_tokens,
           CAST(len(regexp_extract_all(text, '[^\\w \\t\\n\\x0b\\f\\r]')) AS INT) AS n_punct,
           floor(length(array_to_string(t, ''))/len(t)*10000
                 + 0.5000005)/10000 AS mean_token_len
    FROM toks
    """,
    doc="Text quality statistics (operators.text.with_text_stats).",
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import text as text_ops

    docs = _t(spark, sf_dir, "documents")
    return text_ops.with_text_stats(docs, "text").select(
        "doc_id",
        "n_chars_text",
        "n_tokens",
        "n_distinct_tokens",
        "n_punct",
        "mean_token_len",
    )


@_register(
    "token_count_bpe_ish",
    """
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
                '[A-Za-z]+|[0-9]|[^A-Za-z0-9 \\t\\n\\x0b\\f\\r]')) AS INT)
             AS n_bpe_ish_tokens
    FROM documents
    """,
    doc="BPE-ish regex token counting (operators.text.with_token_count).",
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import text as text_ops

    docs = _t(spark, sf_dir, "documents")
    return text_ops.with_token_count(docs, "text").select(
        "doc_id", "n_bpe_ish_tokens"
    )


@_register(
    "lang_id_heuristic",
    None,  # set below after LANG_MARKERS import to build the SQL
    doc="Stopword-overlap language ID (operators.text.with_lang_id).",
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import text as text_ops

    docs = _t(spark, sf_dir, "documents")
    return text_ops.with_lang_id(docs, "text").select("doc_id", "lang_pred")


def _lang_id_oracle() -> str:
    from financial_data_pipeline_optimization_spark.operators.text import LANG_MARKERS

    unions = []
    for lang in sorted(LANG_MARKERS):
        markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
        unions.append(
            f"SELECT doc_id, '{lang}' AS lang, "
            f"len(list_intersect(ts, [{markers}])) AS sc FROM toks"
        )
    union_sql = "\n      UNION ALL ".join(unions)
    return f"""
    WITH toks AS (
      SELECT doc_id, list_distinct({_ORACLE_TOKENS}) AS ts FROM documents
    ),
    scores AS (
      {union_sql}
    ),
    best AS (
      SELECT doc_id, lang, sc,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY sc DESC, lang) AS rn
      FROM scores
    )
    SELECT doc_id,
           CASE WHEN sc > 0 THEN lang ELSE 'und' END AS lang_pred
    FROM best WHERE rn = 1
    """


# patch the registered spec with the generated oracle
for _i, _s in enumerate(_REGISTRY):
    if _s.name == "lang_id_heuristic":
        _REGISTRY[_i] = QuerySpec(_s.name, _s.spark, _lang_id_oracle(), _s.doc)


@_register(
    "doc_fingerprint",
    f"""
    SELECT doc_id,
           md5(array_to_string({_ORACLE_TOKENS}, ' ')) AS fingerprint
    FROM documents
    """,
    doc="Canonicalizing document fingerprint (operators.text.with_fingerprint).",
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import text as text_ops

    docs = _t(spark, sf_dir, "documents")
    return text_ops.with_fingerprint(docs, "text").select(
        "doc_id", "fingerprint"
    )


@_register(
    "quality_filter",
    f"""
    WITH stats AS (
      SELECT doc_id, text, lang, source, n_chars,
             length(text) AS nc,
             len({_ORACLE_TOKENS}) AS nt,
             len(list_distinct({_ORACLE_TOKENS})) AS nd,
             len(regexp_extract_all(text, '[^\\w \\t\\n\\x0b\\f\\r]')) AS np
      FROM documents
    )
    SELECT doc_id, text, lang, source, n_chars FROM stats
    WHERE nt >= 20 AND CAST(np AS DOUBLE)/nc <= 0.3
      AND CAST(nd AS DOUBLE)/nt >= 0.1
    """,
    doc="Composite corpus-quality filter (operators.text.quality_filter).",
)
def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import text as text_ops

    docs = _t(spark, sf_dir, "documents")
    return text_ops.quality_filter(docs, "text")


# ===========================================================================
# Deduplication extensions (operators.dedup) on documents
# ===========================================================================


@_register(
    "exact_dedup_docs",
    """
    SELECT doc_id, n_chars FROM (
      SELECT doc_id, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY md5(lower(trim(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'))))
               ORDER BY doc_id) AS rn
      FROM documents
    ) WHERE rn = 1
    """,
    doc="Exact content dedup by normalized md5 (operators.dedup.exact_dedup).",
)
def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return dedup.exact_dedup(docs, ["text"], "doc_id").select(
        "doc_id", "n_chars"
    )


@_register(
    "gopher_repetition_filter",
    f"""
    WITH toks AS (SELECT doc_id, {_ORACLE_TOKENS} AS t FROM documents),
    tok AS (SELECT doc_id, unnest(t) AS tok FROM toks),
    per_tok AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
    tagg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                    count(*) AS nd, max(c) AS top FROM per_tok GROUP BY 1),
    bg AS (SELECT doc_id, array_to_string(t[i+1:i+2], ' ') AS b
           FROM toks, UNNEST(range(greatest(len(t)-1, 1))) AS u(i)),
    per_bg AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
    bagg AS (SELECT doc_id, sum(c) AS nbg, count(*) AS ndbg
             FROM per_bg GROUP BY 1)
    SELECT t.doc_id, t.n_tokens,
           floor(nd / CAST(t.n_tokens AS DOUBLE) * 10000
                 + 0.5000005) / 10000 AS distinct_token_frac,
           floor(top / CAST(t.n_tokens AS DOUBLE) * 10000
                 + 0.5000005) / 10000 AS top_token_frac,
           floor((1 - ndbg / CAST(nbg AS DOUBLE)) * 10000
                 + 0.5000005) / 10000 AS dup_bigram_frac,
           (top / CAST(t.n_tokens AS DOUBLE) <= 0.12
            AND (1 - ndbg / CAST(nbg AS DOUBLE)) <= 0.05) AS keep
    FROM tagg t JOIN bagg USING (doc_id)
    """,
    doc="Gopher-style repetition filter (operators.text.repetition_stats): "
    "top-token fraction, duplicate-bigram fraction, distinct-token ratio "
    "per document plus the keep verdict at the 0.12/0.05 thresholds.",
)
def q_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import text

    docs = _t(spark, sf_dir, "documents")
    stats = text.repetition_stats(docs, "doc_id", "text")
    return stats.select(
        "doc_id",
        "n_tokens",
        _r4(F.col("distinct_token_frac")).alias("distinct_token_frac"),
        _r4(F.col("top_token_frac")).alias("top_token_frac"),
        _r4(F.col("dup_bigram_frac")).alias("dup_bigram_frac"),
        (
            (F.col("top_token_frac") <= 0.12)
            & (F.col("dup_bigram_frac") <= 0.05)
        ).alias("keep"),
    )


@_register(
    "decontaminate_vs_benchmark",
    f"""
    WITH toks AS (SELECT doc_id, source, {_ORACLE_TOKENS} AS t
                  FROM documents),
    sh AS (SELECT doc_id, source, array_to_string(t[i+1:i+5], ' ') AS s
           FROM toks, UNNEST(range(greatest(len(t)-4, 1))) AS u(i)),
    bench AS (SELECT DISTINCT s FROM sh WHERE source = 'src0'),
    contam AS (SELECT DISTINCT doc_id FROM sh
               WHERE source <> 'src0' AND s IN (SELECT s FROM bench))
    SELECT doc_id, source, lang, n_chars FROM documents
    WHERE source <> 'src0'
      AND doc_id NOT IN (SELECT doc_id FROM contam)
    """,
    doc="Benchmark decontamination (operators.dedup.decontaminate): drop "
    "corpus documents sharing any 5-gram with the src0 'benchmark' slice "
    "— the eval-leakage scrub of LLM pretraining pipelines.",
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("source") == "src0")
    corpus = docs.filter(F.col("source") != "src0")
    return dedup.decontaminate(corpus, bench, "doc_id", "text", n=5).select(
        "doc_id", "source", "lang", "n_chars"
    )


@_register(
    "line_dedup_docs",
    """
    SELECT doc_id, text FROM (
      SELECT doc_id, text,
             ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
      FROM documents
    ) WHERE rn = 1
    """,
    doc="Corpus-wide line dedup (operators.text.line_dedup): keep each "
    "line's first (doc_id, position) occurrence, reassemble documents. "
    "The driver fixture has single-line documents, so here it reduces to "
    "whole-text dedup (the oracle above); the multiline reassembly path "
    "is exercised in tests/test_text_vector_extras.py.",
)
def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import text

    docs = _t(spark, sf_dir, "documents")
    return text.line_dedup(docs, "doc_id", "text")


@_register(
    "ngram_jaccard_pairs",
    f"""
    WITH toks AS (
      SELECT doc_id, {_ORACLE_TOKENS} AS t FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(t[i+1:i+2], ' ') AS s
      FROM toks, UNNEST(range(greatest(len(t)-1, 1))) AS u(i)
    ),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY 1),
    pairs AS (
      SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
      FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
      GROUP BY 1, 2
    )
    SELECT a, b,
           CAST(inter AS DOUBLE)/(sa.sz + sb.sz - inter) AS jaccard_sim
    FROM pairs JOIN sizes sa ON a = sa.doc_id JOIN sizes sb ON b = sb.doc_id
    WHERE CAST(inter AS DOUBLE)/(sa.sz + sb.sz - inter) >= 0.8
    """,
    doc="Exact bigram-Jaccard near-dup pairs via inverted index "
    "(operators.dedup.ngram_jaccard_pairs) — the exact oracle for the "
    "MinHash/SimHash approximate paths.",
)
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=2, min_jaccard=0.8
    )


# MinHash+LSH / SimHash / ANN / multimodal raw-pair queries are NOT
# registered: their outputs depend on engine-side hash functions
# (xxhash64) with no DuckDB twin, so a driver row could only ever be
# rows-only. Each path is instead driver-verified through an
# oracle-paired contract query below (`minhash_recall_check`,
# `simhash_planted_check`, `knn_lsh_recall_check`,
# `knn_ivf_recall_check`, `embedding_near_dup_check`,
# `multimodal_features_check`) that recomputes the ground truth in
# SQL, plus pytest invariants (tests/test_dedup.py,
# tests/test_vector.py, tests/test_multimodal.py). This keeps the
# registry 100% oracle-paired. `q_minhash_pairs` stays callable for
# bench.py's LSH-path headliner timing.
def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", shingle_n=2, min_jaccard=0.8
    )


def q_near_dup_clusters_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench-only twin of the `near_dup_clusters` headliner with the
    LSH pair source — the 100 TB edge generator (banded bucket join)
    instead of the exact inverted index, so the scale path's timing
    trends round-over-round next to the exact path's. Deterministic
    but xxhash64-based, hence no SQL oracle; cluster-refinement
    equivalence vs the exact path is pinned in tests/test_graph.py /
    tests/test_dedup.py."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.near_dup_clusters(
        docs, "doc_id", "text", n=2, min_jaccard=0.8, pair_source="lsh"
    )


# ===========================================================================
# Similarity search (operators.vector) on embeddings
# ===========================================================================


@_register(
    "knn_brute_force",
    """
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
               FROM embeddings WHERE vec_id < 8),
         c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS ce
               FROM embeddings),
         scored AS (
           SELECT query_id, neighbor_id,
                  list_cosine_similarity(ce, qe) AS sim
           FROM c, q WHERE neighbor_id <> query_id)
    SELECT query_id, neighbor_id, CAST(rn AS INT) AS knn_rank,
           floor(sim*10000 + 0.5000005)/10000 AS cosine_sim
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY sim DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= 5
    """,
    doc="Exact cosine top-k over embeddings (operators.vector."
    "brute_force_topk): broadcast query batch, one corpus scan.",
)
def q_knn_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import vector

    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 8)
    out = vector.brute_force_topk(emb, queries_df, k=5)
    return out.select(
        "query_id",
        "neighbor_id",
        F.col("rank").alias("knn_rank"),
        _r4(F.col("cosine_sim")).alias("cosine_sim"),
    )


@_register(
    "approx_aggregates",
    """
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
           TRUE AS approx_customers_ok,
           TRUE AS approx_median_ok
    FROM orders GROUP BY 1
    """,
    doc="approx_count_distinct + percentile_approx graded in-plan: the "
    "sketch estimates are compared against the exact aggregates computed "
    "in the same query, and only the within-tolerance booleans (plus the "
    "exact distinct count) are emitted — so the DuckDB oracle can "
    "hash-check that every sketch stayed inside its error bound.",
)
def q_approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("exact_customers"),
        F.approx_count_distinct("o_custkey").alias("__approx_cd"),
        F.expr("percentile(o_totalprice, 0.5)").alias("__exact_med"),
        F.percentile_approx("o_totalprice", 0.5).alias("__approx_med"),
    )
    return agg.select(
        "o_orderstatus",
        F.col("exact_customers").cast("long").alias("exact_customers"),
        (
            F.abs(F.col("__approx_cd") - F.col("exact_customers"))
            / F.col("exact_customers")
            < 0.1
        ).alias("approx_customers_ok"),
        (
            F.abs(F.col("__approx_med") - F.col("__exact_med"))
            / F.col("__exact_med")
            < 0.1
        ).alias("approx_median_ok"),
    )


# ===========================================================================
# Multimodal plumbing (operators.multimodal) — binary columns + features
# ===========================================================================


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


# ===========================================================================
# Financial time-series analytics (operators/timeseries.py) — the query
# layer the reference's warehouse serves (README.md:19), over the events
# table read as a tick series (user_id = instrument, ts = time,
# value = price).
# ===========================================================================

_TS_W = "PARTITION BY user_id ORDER BY ts, event_id"


@_register(
    "finance_returns",
    f"""
    SELECT user_id, event_id,
           floor((value / lag(value) OVER w - 1)*10000 + 0.5000005)/10000
             AS simple_return,
           floor(ln(value / lag(value) OVER w)*10000 + 0.5000005)/10000
             AS log_return
    FROM events WINDOW w AS ({_TS_W})
    """,
    doc="Per-entity simple and log returns vs the previous tick (lag "
    "window; first row of each entity is null).",
)
def q_finance_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = timeseries.with_returns(
        _t(spark, sf_dir, "events"), "user_id", ["ts", "event_id"], "value"
    )
    return out.select(
        "user_id",
        "event_id",
        _r4(F.col("simple_return")).alias("simple_return"),
        _r4(F.col("log_return")).alias("log_return"),
    )


@_register(
    "finance_ohlc_bars",
    """
    WITH t AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS bar_date, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('day', ts)
                                ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('day', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events)
    SELECT user_id, bar_date,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high, MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_ticks
    FROM t GROUP BY user_id, bar_date
    """,
    doc="OHLC daily bars from ticks — the reference's warehouse row "
    "shape (loading.py:47-64) produced by resampling; open/close via "
    "min_by/max_by on (ts, event_id), one shuffle on (entity, day).",
)
def q_finance_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = timeseries.ohlc_bars(
        _t(spark, sf_dir, "events"), "user_id", "ts", "value", "event_id",
        bar="1 day",
    )
    return bars.select(
        "user_id",
        F.col("bar_start").cast("date").alias("bar_date"),
        "open", "high", "low", "close", "n_ticks",
    )


@_register(
    "finance_sma_bollinger",
    f"""
    SELECT user_id, event_id,
           floor(avg(value) OVER w *10000 + 0.5000005)/10000 AS bb_mid,
           floor((avg(value) OVER w + 2.0*stddev_samp(value) OVER w)
                 *10000 + 0.5000005)/10000 AS bb_upper,
           floor((avg(value) OVER w - 2.0*stddev_samp(value) OVER w)
                 *10000 + 0.5000005)/10000 AS bb_lower
    FROM events
    WINDOW w AS ({_TS_W} ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    """,
    doc="Bollinger bands: trailing-20 SMA ± 2 sample stddevs per "
    "entity (row-count frame).",
)
def q_finance_sma_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = timeseries.with_bollinger(
        _t(spark, sf_dir, "events"), "user_id", ["ts", "event_id"], "value",
        n=20, k=2.0,
    )
    return out.select(
        "user_id",
        "event_id",
        _r4(F.col("bb_mid")).alias("bb_mid"),
        _r4(F.col("bb_upper")).alias("bb_upper"),
        _r4(F.col("bb_lower")).alias("bb_lower"),
    )


@_register(
    "finance_rolling_volatility",
    f"""
    WITH r AS (
      SELECT user_id, event_id, ts,
             ln(value / lag(value) OVER ({_TS_W})) AS lr
      FROM events)
    SELECT user_id, event_id,
           floor(stddev_samp(lr) OVER ({_TS_W}
                 ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
                 *10000 + 0.5000005)/10000 AS volatility
    FROM r
    """,
    doc="Trailing-10 realized volatility: sample stddev of log "
    "returns per entity.",
)
def q_finance_rolling_volatility(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    out = timeseries.with_rolling_volatility(
        _t(spark, sf_dir, "events"), "user_id", ["ts", "event_id"], "value",
        n=10,
    )
    return out.select(
        "user_id", "event_id", _r4(F.col("volatility")).alias("volatility")
    )


@_register(
    "finance_rsi",
    f"""
    WITH ch AS (
      SELECT user_id, event_id, ts,
             value - lag(value) OVER ({_TS_W}) AS chg
      FROM events),
    g AS (
      SELECT user_id, event_id, ts,
             CASE WHEN chg > 0 THEN chg
                  WHEN chg IS NOT NULL THEN 0.0 END AS gain,
             CASE WHEN chg < 0 THEN -chg
                  WHEN chg IS NOT NULL THEN 0.0 END AS loss
      FROM ch),
    a AS (
      SELECT user_id, event_id,
             avg(gain) OVER w AS ag, avg(loss) OVER w AS al
      FROM g
      WINDOW w AS ({_TS_W} ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
    SELECT user_id, event_id,
           floor((CASE WHEN ag IS NULL OR al IS NULL THEN NULL
                       WHEN ag = 0 AND al = 0 THEN 50.0
                       WHEN al = 0 THEN 100.0
                       WHEN ag = 0 THEN 0.0
                       ELSE 100.0 - 100.0/(1.0 + ag/al) END)
                 *10000 + 0.5000005)/10000 AS rsi
    FROM a
    """,
    doc="Cutler's RSI (simple-average form, window-expressible) over "
    "the trailing 14 price changes; degenerate cases pinned so both "
    "engines agree.",
)
def q_finance_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = timeseries.with_rsi(
        _t(spark, sf_dir, "events"), "user_id", ["ts", "event_id"], "value",
        n=14,
    )
    return out.select("user_id", "event_id", _r4(F.col("rsi")).alias("rsi"))


@_register(
    "finance_max_drawdown",
    f"""
    WITH dd AS (
      SELECT user_id,
             (value - max(value) OVER w) / max(value) OVER w AS d
      FROM events
      WINDOW w AS ({_TS_W} ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW))
    SELECT user_id, floor(min(d)*10000 + 0.5000005)/10000 AS max_drawdown
    FROM dd GROUP BY user_id
    """,
    doc="Maximum drawdown per entity: most negative excursion from the "
    "running peak (running-max window + group-min, both shuffling on "
    "the same entity key).",
)
def q_finance_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = timeseries.max_drawdown(
        _t(spark, sf_dir, "events"), "user_id", ["ts", "event_id"], "value"
    )
    return out.select(
        "user_id", _r4(F.col("max_drawdown")).alias("max_drawdown")
    )


@_register(
    "finance_vwap",
    """
    SELECT l_partkey, CAST(year(l_shipdate) AS INT) AS ship_year,
           floor(SUM(l_extendedprice)/SUM(l_quantity)*10000 + 0.5000005)
             /10000 AS vwap,
           floor(SUM(l_quantity)*100 + 0.50005)/100 AS total_qty
    FROM lineitem GROUP BY l_partkey, ship_year
    """,
    doc="Volume-weighted average price per part and ship year: "
    "sum(notional)/sum(quantity), map-side partial agg.",
)
def q_finance_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "ship_year", F.year("l_shipdate").cast("int")
    )
    out = timeseries.vwap(
        li, ["l_partkey", "ship_year"], "l_extendedprice", "l_quantity"
    )
    return out.select(
        "l_partkey",
        "ship_year",
        _r4(F.col("vwap")).alias("vwap"),
        _r2(F.col("total_qty")).alias("total_qty"),
    )


@_register(
    "finance_zscore",
    f"""
    SELECT user_id, event_id,
           floor((CASE WHEN stddev_samp(value) OVER w > 0
                       THEN (value - avg(value) OVER w)
                            / stddev_samp(value) OVER w END)
                 *10000 + 0.5000005)/10000 AS zscore
    FROM events
    WINDOW w AS ({_TS_W} ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    """,
    doc="Rolling z-score of price vs its trailing-20 window — the "
    "standard anomaly score; null while the window stddev is "
    "null/zero.",
)
def q_finance_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = timeseries.with_zscore(
        _t(spark, sf_dir, "events"), "user_id", ["ts", "event_id"], "value",
        n=20,
    )
    return out.select(
        "user_id", "event_id", _r4(F.col("zscore")).alias("zscore")
    )


@_register(
    "finance_ema",
    """
    WITH o AS (
      SELECT user_id, event_id,
             list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS pfx
      FROM events)
    SELECT user_id, event_id,
           floor(list_reduce(pfx, (acc, x) -> acc*0.7 + x*0.3)
                 *10000 + 0.5000005)/10000 AS ema
    FROM o
    """,
    doc="Exponential moving average (alpha=0.3, seeded with the first "
    "tick). The recurrence is not window-expressible: Spark side is a "
    "linear Arrow-batched applyInPandas per entity (the 100 TB path); "
    "the oracle folds a windowed prefix list (O(n^2), fine for the "
    "checker). See operators/timeseries.py:with_ema.",
)
def q_finance_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Project to the needed columns BEFORE the pandas boundary: the
    # applyInPandas round-trips its full input schema through Arrow, so
    # unused wide columns (props JSON) would be serialized both ways.
    ticks = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    out = timeseries.with_ema(
        ticks, "user_id", ["ts", "event_id"], "value",
        alpha=0.3, method="pandas",
    )
    return out.select("user_id", "event_id", _r4(F.col("ema")).alias("ema"))


# ===========================================================================
# Named TPC-H suite (every query the driver's star schema can express:
# Q1 is group_agg_pricing_summary, Q3 is tpch_q3_shipping_priority;
# Q2/Q4/Q9/Q11/Q12/Q16/Q19-Q22 need columns/tables the testdata lacks
# — partsupp, l_shipmode, l_commitdate, c_phone — and are adapted or
# omitted as noted).
# ===========================================================================


@_register(
    "tpch_q5_local_supplier_volume",
    """
    SELECT n.n_name,
           floor(SUM(l.l_extendedprice * (1 - l.l_discount))*100 + 0.50005)
             /100 AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5: revenue through local suppliers per nation in one "
    "region-year; the canonical 6-table star join (dims broadcast, "
    "facts shuffle once on the join keys).",
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(
        _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            _r2(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
    )


@_register(
    "tpch_q6_revenue_forecast",
    """
    SELECT floor(SUM(l_extendedprice * l_discount)*100 + 0.50005)/100
             AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6: pure scan-filter-aggregate; every predicate pushes "
    "to the parquet scan, no shuffle at all (single global agg).",
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _r2(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


@_register(
    "tpch_q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year,
           floor(SUM(volume)*100 + 0.50005)/100 AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l.l_shipdate) AS INT) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate < TIMESTAMP '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7: bilateral trade volume between two nations by year "
    "(two broadcast nation joins with a disjunctive cross-filter).",
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n1_key"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    n2 = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n2_key"),
            F.col("n_name").alias("cust_nation"),
        )
    )
    pair = (
        (F.col("supp_nation") == "NATION_1")
        & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2")
        & (F.col("cust_nation") == "NATION_1")
    )
    return (
        s.join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("int"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            _r2(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
    )


@_register(
    "tpch_q8_market_share",
    """
    SELECT o_year,
           floor(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / SUM(volume) *10000 + 0.5000005)/10000 AS mkt_share
    FROM (
      SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n1.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      JOIN region r ON n2.n_regionkey = r.r_regionkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      WHERE r.r_name = 'ASIA'
        AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                              AND TIMESTAMP '1997-12-31'
        AND p.p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    """,
    doc="TPC-H Q8 (adapted: p_type = 'ECONOMY' — the testdata's "
    "single-word types replace TPC-H's 'ECONOMY ANODIZED STEEL'): one "
    "nation's market share of a part class in a region, by year.",
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31").cast("timestamp"))
    )
    c = _t(spark, sf_dir, "customer")
    n1 = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n1_key"),
            F.col("n_name").alias("nation"),
        )
    )
    n2 = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n2_key"),
            F.col("n_regionkey").alias("n2_region"),
        )
    )
    r = F.broadcast(
        _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        p.join(li, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .join(r, F.col("n2_region") == F.col("r_regionkey"))
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .withColumn("o_year", F.year("o_orderdate").cast("int"))
        .groupBy("o_year")
        .agg(
            _r4(
                F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol)
            ).alias("mkt_share")
        )
    )


@_register(
    "tpch_q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name,
           floor(SUM(l.l_extendedprice * (1 - l.l_discount))*100 + 0.50005)
             /100 AS revenue,
           floor(c.c_acctbal*100 + 0.50005)/100 AS c_acctbal,
           n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10: top-20 customers by lost revenue from returned "
    "items in a quarter (group on the customer key, "
    "TakeOrderedAndProject for the top-k).",
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            _r2(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            _r2(F.col("c_acctbal")).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@_register(
    "tpch_q13_customer_distribution",
    """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    doc="TPC-H Q13: distribution of customers by order count (left "
    "join keeps zero-order customers; two stacked aggregations).",
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@_register(
    "tpch_q14_promo_revenue",
    """
    SELECT floor(100.00 * SUM(CASE WHEN p.p_type = 'ECONOMY'
                                   THEN l.l_extendedprice * (1 - l.l_discount)
                                   ELSE 0 END)
                 / SUM(l.l_extendedprice * (1 - l.l_discount))
                 *10000 + 0.5000005)/10000 AS promo_revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
      AND l.l_shipdate < TIMESTAMP '1996-04-01'
    """,
    doc="TPC-H Q14 (adapted: 'ECONOMY' stands in for 'PROMO%'): one "
    "part class's share of a month's revenue; part side broadcasts.",
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = F.broadcast(_t(spark, sf_dir, "part").select("p_partkey", "p_type"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            _r4(
                100.0
                * F.sum(
                    F.when(F.col("p_type") == "ECONOMY", rev).otherwise(0.0)
                )
                / F.sum(rev)
            ).alias("promo_revenue")
        )
    )


@_register(
    "tpch_q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name,
           floor(r.total_revenue*100 + 0.50005)/100 AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    doc="TPC-H Q15: supplier(s) with the maximum quarterly revenue — "
    "aggregate once, compare against its own scalar max.",
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    revenue.createOrReplaceTempView("v_q15_revenue")
    s = _t(spark, sf_dir, "supplier")
    max_rev = F.broadcast(
        revenue.agg(F.max("total_revenue").alias("__max_rev"))
    )
    return (
        s.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .crossJoin(max_rev)
        .filter(F.col("total_revenue") == F.col("__max_rev"))
        .select(
            "s_suppkey",
            "s_name",
            _r2(F.col("total_revenue")).alias("total_revenue"),
        )
    )


@_register(
    "tpch_q17_small_quantity_revenue",
    """
    SELECT floor(SUM(l.l_extendedprice) / 7.0 *100 + 0.50005)/100
             AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (SELECT l_partkey, 0.2 * AVG(l_quantity) AS qty_threshold
          FROM lineitem GROUP BY l_partkey) t
      ON t.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#9'
      AND l.l_quantity < t.qty_threshold
    """,
    doc="TPC-H Q17 (container predicate dropped — column absent): "
    "revenue from unusually small orders of one brand; the per-part "
    "average-quantity subquery joins back on the part key.",
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = F.broadcast(
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#9")
        .select("p_partkey")
    )
    thresholds = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(thresholds, F.col("t_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(_r2(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


@_register(
    "tpch_q18_large_volume_customer",
    """
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS o_orderdate, o.o_totalprice,
           floor(SUM(l.l_quantity)*100 + 0.50005)/100 AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
             o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
    doc="TPC-H Q18: customers whose single orders exceed 300 units — "
    "semi-join against a HAVING aggregate, then re-aggregate.",
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 300)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(
            big,
            F.col("o_orderkey") == F.col("big_orderkey"),
            "left_semi",
        )
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
        )
        .agg(_r2(F.sum("l_quantity")).alias("total_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


# ===========================================================================
# Text cleaning / PII redaction (operators/text.py hygiene pass)
# ===========================================================================


def _clean_redact_sql() -> str:
    """Build the oracle's nested regexp_replace from the SAME pattern
    constants the Spark operator uses — one source of truth."""
    from financial_data_pipeline_optimization_spark.operators.text import PII_PATTERNS

    expr = "text"
    for pattern, repl in (
        (r"<[^>]+>", " "),
        (r"[\x00-\x1f\x7f]", " "),
    ):
        expr = f"regexp_replace({expr}, '{pattern}', '{repl}', 'g')"
    expr = f"trim(regexp_replace({expr}, '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'))"
    for pattern, token in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pattern}', '{token}', 'g')"
    return f"""
    SELECT doc_id, {expr} AS clean_text,
           CAST(length({expr}) AS INT) AS clean_len
    FROM documents
    """


@_register(
    "text_clean_redact",
    _clean_redact_sql(),
    doc="Corpus hygiene pass: strip HTML-ish tags and control chars, "
    "collapse whitespace, then redact URLs/emails/phone shapes to "
    "typed tokens. Pure chained regexp_replace — narrow map, no "
    "shuffle; the oracle replays the identical patterns.",
)
def q_text_clean_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import text as text_ops

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = text_ops.redact_pii(
        text_ops.clean_text(docs, "text", "clean_text"), "clean_text"
    )
    return out.select(
        "doc_id",
        "clean_text",
        F.length("clean_text").alias("clean_len"),
    )


# ===========================================================================
# Deterministic sampling / splitting (operators/sampling.py)
# ===========================================================================


def _sample_sql() -> str:
    from financial_data_pipeline_optimization_spark.operators.sampling import hex_threshold

    t = hex_threshold(0.1)
    return f"""
    SELECT doc_id, lang
    FROM documents
    WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{t}'
    """


@_register(
    "deterministic_sample",
    _sample_sql(),
    doc="Reproducible 10% corpus sample by key hash (md5 hex-prefix "
    "threshold): stable under repartitioning, reruns, and corpus "
    "growth — unlike df.sample(), whose output depends on partition "
    "layout. Narrow filter, no shuffle.",
)
def q_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import sampling

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return sampling.hash_sample(docs, ["doc_id"], 0.1, method="md5")


def _split_sql() -> str:
    from financial_data_pipeline_optimization_spark.operators.sampling import hex_threshold

    t_train = hex_threshold(0.8)
    t_val = hex_threshold(0.9)
    return f"""
    SELECT split, CAST(COUNT(*) AS BIGINT) AS n
    FROM (
      SELECT CASE
               WHEN substring(md5(CAST(vec_id AS VARCHAR)), 1, 8)
                    < '{t_train}' THEN 'train'
               WHEN substring(md5(CAST(vec_id AS VARCHAR)), 1, 8)
                    < '{t_val}' THEN 'val'
               ELSE 'test' END AS split
      FROM embeddings)
    GROUP BY split
    """


@_register(
    "train_test_split",
    _split_sql(),
    doc="Deterministic 80/10/10 train/val/test assignment by key hash; "
    "a key's split never changes when the corpus grows (no "
    "cross-version contamination). Counts per split.",
)
def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import sampling

    emb = _t(spark, sf_dir, "embeddings").select("vec_id")
    out = sampling.with_split(
        emb, ["vec_id"], {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    return out.groupBy("split").agg(F.count("*").alias("n"))


@_register(
    "stratified_topn_orders",
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey DESC)
               AS rn
      FROM orders)
    WHERE rn <= 3
    """,
    doc="Exact-quota stratified selection: top-3 orders per priority "
    "class by deterministic ordering — the reproducible alternative "
    "to sampleBy's probabilistic strata. One shuffle on the stratum "
    "key.",
)
def q_stratified_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import sampling

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderkey", "o_totalprice"
    )
    return sampling.stratified_topn(
        orders,
        ["o_orderpriority"],
        ["o_totalprice", "o_orderkey"],
        n=3,
        descending=True,
    )


# ===========================================================================
# Transitive dedup clusters (operators/graph.py connected components)
# ===========================================================================


@_register(
    "near_dup_clusters",
    f"""
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
    )
    SELECT doc.doc_id,
           CAST(COALESCE(l.component, doc.doc_id) AS BIGINT) AS cluster_id
    FROM documents doc
    LEFT JOIN (SELECT s AS node, least(s, min(d)) AS component
               FROM reach GROUP BY s) l
      ON doc.doc_id = l.node
    """,
    doc="Transitive near-dup clusters: exact bigram-Jaccard pairs → "
    "connected components (large-star/small-star, O(log n) rounds, "
    "lineage truncated per round) → every doc labeled with its "
    "cluster's min id. Oracle computes the same closure with a "
    "recursive CTE. At 100 TB pass pair_source='lsh' to feed the "
    "cluster stage from the banded LSH join instead of the exact "
    "inverted index (tests/test_graph.py pins the refinement "
    "property).",
)
def q_near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return dedup.near_dup_clusters(
        docs, "doc_id", "text", n=2, min_jaccard=0.8
    )


@_register(
    "tpch_q19_disjunctive",
    """
    SELECT floor(SUM(l.l_extendedprice * (1 - l.l_discount))*100 + 0.50005)
             /100 AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 5 AND 15)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 15 AND 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 25 AND 40)
    """,
    doc="TPC-H Q19 (shipmode/container predicates dropped — columns "
    "absent): disjunction of brand×size×quantity conjunctions across "
    "both join sides — the classic test that per-side filters still "
    "push down (Catalyst extracts p_brand IN (...) and quantity "
    "bounds below the join) while the cross-side residual stays on "
    "the join.",
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = F.broadcast(_t(spark, sf_dir, "part"))
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(5, 15)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(15, 30)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(25, 40)
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            _r2(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
    )


# ===========================================================================
# Data-quality checks (operators/checks.py)
# ===========================================================================


@_register(
    "data_quality_profile",
    """
    WITH m AS (
      SELECT COUNT(*) AS n,
             COUNT(o_custkey) AS nn1, COUNT(DISTINCT o_custkey) AS nd1,
             COUNT(o_orderstatus) AS nn2,
             COUNT(DISTINCT o_orderstatus) AS nd2,
             COUNT(o_totalprice) AS nn3,
             COUNT(DISTINCT o_totalprice) AS nd3
      FROM orders)
    SELECT 'o_custkey' AS column_name, CAST(n AS BIGINT) AS n_rows,
           CAST(n - nn1 AS BIGINT) AS n_nulls,
           CAST(nd1 AS BIGINT) AS n_distinct FROM m
    UNION ALL
    SELECT 'o_orderstatus', CAST(n AS BIGINT), CAST(n - nn2 AS BIGINT),
           CAST(nd2 AS BIGINT) FROM m
    UNION ALL
    SELECT 'o_totalprice', CAST(n AS BIGINT), CAST(n - nn3 AS BIGINT),
           CAST(nd3 AS BIGINT) FROM m
    """,
    doc="Single-scan column profile (rows / nulls / exact distinct per "
    "column, long format) — the data-level health check the "
    "reference's guard-and-fail sites never compute.",
)
def q_data_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import checks

    return checks.column_profile(
        _t(spark, sf_dir, "orders"),
        ["o_custkey", "o_orderstatus", "o_totalprice"],
    )


@_register(
    "referential_orphans",
    """
    WITH child AS (
      SELECT CASE WHEN l_orderkey % 997 = 1 THEN -l_orderkey
                  ELSE l_orderkey END AS l_orderkey,
             l_linenumber
      FROM lineitem
    )
    SELECT c.l_orderkey, c.l_linenumber
    FROM child c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_orderkey = c.l_orderkey)
    """,
    doc="Referential-integrity check: lineitem rows with no parent "
    "order (left-anti join — the reference's NOT-EXISTS plan shape "
    "pointed at integrity). The driver tables are consistent, so a "
    "deterministic corruption (negating every 997th order key) is "
    "planted FIRST and the check must surface exactly those rows — "
    "a detection test, not a vacuous 0≡0 pass.",
)
def q_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import checks

    child = _t(spark, sf_dir, "lineitem").select(
        F.when(
            F.col("l_orderkey") % 997 == 1, -F.col("l_orderkey")
        )
        .otherwise(F.col("l_orderkey"))
        .alias("l_orderkey"),
        "l_linenumber",
    )
    return checks.referential_orphans(
        child,
        _t(spark, sf_dir, "orders").select("o_orderkey"),
        "l_orderkey",
        "o_orderkey",
    )


@_register(
    "map_functions",
    """
    SELECT event_id,
           array_to_string(list_sort(json_keys(props)), ',') AS prop_keys,
           CAST(len(json_keys(props)) AS INT) AS n_props,
           CAST(props->>'$.k' AS INT) AS k_value
    FROM events
    """,
    doc="Map-typed column surface: parse events.props JSON into "
    "map<string,int> once, then map_keys / size / element_at — the "
    "declared-schema alternative to per-access json path extraction. "
    "Keys are serialized to one comma-joined string (both engines) so "
    "the driver's order-insensitive value hash can compare them.",
)
def q_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return ev.select(
        "event_id",
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("prop_keys"),
        F.size(m).alias("n_props"),
        F.element_at(m, F.lit("k")).alias("k_value"),
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
    "multi-supplier order — expressed Spark-side as ONE window over "
    "the order key (collect_set of suppliers / late suppliers) "
    "instead of three self-joins of lineitem.",
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
        .agg(F.count(F.lit(1)).alias("numwait"))
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


# ===========================================================================
# Warehouse maintenance: SCD2 version chains (operators.scd) — the
# history-preserving replacement for the reference's overwrite-the-table
# load (loading.py:110-127).
# ===========================================================================


@_register(
    "scd2_apply_customers",
    """
    WITH base AS (
      SELECT c_custkey, c_mktsegment, c_acctbal,
             TIMESTAMP '2024-01-01' AS effective_from
      FROM customer
    ),
    u_noop AS (  -- no attribute change: must compress away
      SELECT c_custkey, c_mktsegment, c_acctbal,
             TIMESTAMP '2024-03-01' AS effective_from
      FROM customer WHERE c_custkey % 5 = 0
    ),
    u_seg AS (
      SELECT c_custkey, 'M-' || c_mktsegment AS c_mktsegment, c_acctbal,
             TIMESTAMP '2024-06-01' AS effective_from
      FROM customer WHERE c_nationkey < 10
    ),
    u_bal AS (
      SELECT c_custkey,
             CASE WHEN c_nationkey < 10 THEN 'M-' || c_mktsegment
                  ELSE c_mktsegment END AS c_mktsegment,
             c_acctbal + 100 AS c_acctbal,
             TIMESTAMP '2024-09-01' AS effective_from
      FROM customer WHERE c_custkey % 7 = 0
    ),
    allv AS (
      SELECT * FROM base UNION ALL SELECT * FROM u_noop
      UNION ALL SELECT * FROM u_seg UNION ALL SELECT * FROM u_bal
    ),
    chain AS (
      SELECT *,
             lag(c_mktsegment) OVER w AS pseg,
             lag(c_acctbal) OVER w AS pbal,
             row_number() OVER w AS rn
      FROM allv
      WINDOW w AS (PARTITION BY c_custkey ORDER BY effective_from)
    ),
    kept AS (
      SELECT c_custkey, c_mktsegment, c_acctbal, effective_from
      FROM chain
      WHERE rn = 1 OR c_mktsegment IS DISTINCT FROM pseg
         OR c_acctbal IS DISTINCT FROM pbal
    )
    SELECT c_custkey, c_mktsegment, c_acctbal, effective_from,
           lead(effective_from) OVER w2 AS effective_to,
           lead(effective_from) OVER w2 IS NULL AS is_current
    FROM kept
    WINDOW w2 AS (PARTITION BY c_custkey ORDER BY effective_from)
    """,
    doc="SCD2 merge (operators.scd.scd2_apply): three update batches "
    "(a no-op that must compress away, a segment change, a balance "
    "change) folded into version chains in one shuffle; oracle rebuilds "
    "the chain with lag/lead windows.",
)
def q_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    keys, tracked = ["c_custkey"], ["c_mktsegment", "c_acctbal"]
    dim = scd.scd2_snapshot(
        cust, keys, tracked, F.lit("2024-01-01").cast("timestamp")
    )
    u_noop = cust.filter(F.col("c_custkey") % 5 == 0).select(
        *keys, *tracked, F.lit("2024-03-01").cast("timestamp").alias("change_ts")
    )
    u_seg = cust.filter(F.col("c_nationkey") < 10).select(
        "c_custkey",
        F.concat(F.lit("M-"), F.col("c_mktsegment")).alias("c_mktsegment"),
        "c_acctbal",
        F.lit("2024-06-01").cast("timestamp").alias("change_ts"),
    )
    u_bal = cust.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        F.when(
            F.col("c_nationkey") < 10,
            F.concat(F.lit("M-"), F.col("c_mktsegment")),
        ).otherwise(F.col("c_mktsegment")).alias("c_mktsegment"),
        (F.col("c_acctbal") + 100).alias("c_acctbal"),
        F.lit("2024-09-01").cast("timestamp").alias("change_ts"),
    )
    updates = u_noop.unionByName(u_seg).unionByName(u_bal)
    return scd.scd2_apply(dim, updates, keys, tracked)


@_register(
    "asof_join_nearest_view",
    """
    WITH clicks AS (SELECT * FROM events WHERE event_type = 'click'),
         views AS (
           SELECT user_id, ts, value FROM events
           WHERE event_type = 'view'
           QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                      ORDER BY event_id DESC) = 1
         )
    SELECT c.event_id, c.user_id, c.ts, v.ts AS ts_right,
           v.value AS value_right
    FROM clicks c LEFT JOIN LATERAL (
      SELECT ts, value FROM views v
      WHERE v.user_id = c.user_id
        AND abs(epoch_us(v.ts) - epoch_us(c.ts)) <= 1800 * 1000000
      ORDER BY abs(epoch_us(v.ts) - epoch_us(c.ts)),
               CASE WHEN v.ts <= c.ts THEN 0 ELSE 1 END
      LIMIT 1
    ) v ON TRUE
    """,
    doc="As-of join, direction='nearest' with 30-minute tolerance "
    "(operators.joins.asof_join): each click matched to the closest "
    "view either side, ties to backward, unmatched beyond tolerance "
    "stay null; oracle is a DuckDB lateral top-1.",
)
def q_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = dedup.keep_latest(
        events.filter(F.col("event_type") == "view").select(
            "user_id", "ts", "value", "event_id"
        ),
        ["user_id", "ts"],
        ["event_id"],
    ).drop("event_id")
    return joins.asof_join(
        clicks,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        direction="nearest",
        tolerance="30 minutes",
    ).withColumnRenamed("value", "value_right")


@_register(
    "hll_distinct_rollup",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
           TRUE AS sketch_rollup_ok
    FROM orders
    GROUP BY 1
    """,
    doc="Mergeable HLL pre-aggregation (operators.sketch): monthly "
    "o_custkey sketches unioned to per-year estimates without "
    "re-reading facts; the in-plan check asserts the rollup estimate "
    "is within 5% of exact (lg_k=12 => ~1.6% RSE), so a hash match "
    "proves the sketch path, not just the exact twin.",
)
def q_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate").cast("int")
    ).withColumn("order_month", F.month("o_orderdate"))
    monthly = sketch.build_distinct_sketches(
        orders, ["order_year", "order_month"], "o_custkey", lg_k=12
    )
    yearly = sketch.rollup_distinct_sketches(
        monthly, ["order_year"], "o_custkey_hll"
    )
    est = sketch.estimate_distinct(yearly, "o_custkey_hll", "approx_customers")
    exact = orders.groupBy("order_year").agg(
        F.countDistinct("o_custkey").cast("long").alias("exact_customers")
    )
    return exact.join(est, "order_year").select(
        "order_year",
        "exact_customers",
        (
            F.abs(F.col("approx_customers") - F.col("exact_customers"))
            / F.col("exact_customers")
            < 0.05
        ).alias("sketch_rollup_ok"),
    )


@_register(
    "chunk_documents",
    """
    WITH base AS (
      SELECT doc_id, text, length(text) AS n
      FROM documents WHERE length(text) > 0
    ),
    k AS (
      SELECT doc_id, text,
             unnest(range(0, greatest(1,
               CAST(ceil((n - 20) / 100.0) AS BIGINT)))) AS ci
      FROM base
    )
    SELECT doc_id,
           CAST(ci AS INT) AS chunk_index,
           CAST(ci * 100 AS BIGINT) AS chunk_start,
           substring(text, CAST(ci * 100 + 1 AS INT), 120) AS chunk_text,
           CAST(length(substring(text, CAST(ci * 100 + 1 AS INT), 120))
                AS INT) AS n_chunk_chars
    FROM k
    """,
    doc="Fixed-window character chunking with overlap "
    "(operators.text.chunk_text): context-window packing for LLM "
    "training — stride-100 windows of 120 chars, consecutive chunks "
    "share 20 chars; pure explode, no shuffle.",
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import text as text_ops

    docs = _t(spark, sf_dir, "documents")
    return text_ops.chunk_text(
        docs, "doc_id", "text", chunk_size=120, overlap=20
    )


@_register(
    "skew_salted_join",
    """
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           floor(sum(o.o_totalprice) * 100 + 0.50005) / 100 AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    doc="Skew-mitigating salted equi-join (operators.joins.salted_join): "
    "orders salted across 8 sub-keys, customer replicated per salt, so "
    "a hot customer key spreads over 8 reducers; the oracle is the "
    "plain join — salting must not change results.",
)
def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_totalprice"
    )
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    joined = joins.salted_join(orders, cust, on=["custkey"], salt_factor=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        _r2(F.sum("o_totalprice")).alias("total_price"),
    )


@_register(
    "chunk_documents_tokens",
    f"""
    WITH toks AS (
      SELECT doc_id, {_ORACLE_TOKENS} AS t FROM documents
    ),
    base AS (
      SELECT doc_id, t, len(t) AS n FROM toks
      WHERE len(t) > 0 AND NOT (len(t) = 1 AND t[1] = '')
    ),
    k AS (
      SELECT doc_id, t,
             unnest(range(0, greatest(1,
               CAST(ceil((n - 8) / 32.0) AS BIGINT)))) AS ci
      FROM base
    )
    SELECT doc_id,
           CAST(ci AS INT) AS chunk_index,
           CAST(ci * 32 AS BIGINT) AS chunk_start_token,
           array_to_string(
             list_slice(t, CAST(ci * 32 + 1 AS INT),
                        CAST(ci * 32 + 40 AS INT)), ' ') AS chunk_text,
           CAST(len(list_slice(t, CAST(ci * 32 + 1 AS INT),
                               CAST(ci * 32 + 40 AS INT))) AS INT)
             AS n_chunk_tokens
    FROM k
    """,
    doc="Token-window chunking with overlap "
    "(operators.text.chunk_tokens): 40-token windows at stride 32 over "
    "the shared canonical tokenizer, so chunks never split a token; "
    "pure explode+slice, no shuffle.",
)
def q_chunk_documents_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import text as text_ops

    docs = _t(spark, sf_dir, "documents")
    return text_ops.chunk_tokens(
        docs, "doc_id", "text", chunk_size=40, overlap=8
    )


@_register(
    "weighted_sample_docs",
    """
    SELECT doc_id, n_chars
    FROM documents
    WHERE n_chars / 600.0 >= 1.0
       OR substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
          < lower(lpad(to_hex(CAST(least(
              floor(least(greatest(n_chars / 600.0, 0.0), 1.0)
                    * 4294967296.0),
              4294967295) AS BIGINT)), 8, '0'))
    """,
    doc="Quality-proportional Bernoulli sample "
    "(operators.sampling.weighted_sample): keep-probability = "
    "n_chars/600 per document, deterministic by key hash so the exact "
    "kept-set is engine-checkable; narrow filter, no shuffle.",
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import sampling

    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return sampling.weighted_sample(
        docs, ["doc_id"], F.col("n_chars") / F.lit(600.0)
    )


@_register(
    "hash_topn_docs",
    """
    SELECT doc_id, source
    FROM documents
    ORDER BY substring(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id
    LIMIT 100
    """,
    doc="Deterministic exactly-100 pseudo-random subset "
    "(operators.sampling.hash_topn): order by key hash, take n — "
    "plans as TakeOrderedAndProject (partition-local top-n + driver "
    "merge), no global sort.",
)
def q_hash_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import sampling

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return sampling.hash_topn(docs, ["doc_id"], 100)


def _rebalance_sql() -> str:
    from financial_data_pipeline_optimization_spark.operators.sampling import (
        hex_threshold_str,
    )

    t_en = hex_threshold_str(0.3)
    t_zh = hex_threshold_str(0.8)
    t_def = hex_threshold_str(1.0)
    return f"""
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents
    WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
          < CASE lang WHEN 'en' THEN '{t_en}'
                      WHEN 'zh' THEN '{t_zh}'
                      ELSE '{t_def}' END
    GROUP BY lang
    """


@_register(
    "stratified_rebalance_docs",
    _rebalance_sql(),
    doc="Per-stratum deterministic rebalancing "
    "(operators.sampling.stratified_hash_sample): downsample "
    "over-represented languages (en to 30%, zh to 80%, rest kept) "
    "with an exact reproducible kept-set — the corpus-mix control "
    "sampleBy can't give; narrow filter, no shuffle beyond the "
    "count agg.",
)
def q_stratified_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import sampling

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    kept = sampling.stratified_hash_sample(
        docs, "lang", {"en": 0.3, "zh": 0.8}, ["doc_id"]
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )


@_register(
    "pack_chunks_bins",
    f"""
    WITH toks AS (
      SELECT doc_id, {_ORACLE_TOKENS} AS t FROM documents
    ),
    base AS (
      SELECT doc_id, t, len(t) AS n FROM toks
      WHERE len(t) > 0 AND NOT (len(t) = 1 AND t[1] = '')
    ),
    chunks AS (
      SELECT doc_id,
             unnest(range(0, greatest(1,
               CAST(ceil((n - 8) / 32.0) AS BIGINT)))) AS ci,
             t, n
      FROM base
    ),
    sized AS (
      SELECT CAST(doc_id % 8 AS INT) AS shard,
             doc_id,
             CAST(ci AS INT) AS chunk_index,
             CAST(len(list_slice(t, CAST(ci * 32 + 1 AS INT),
                                 CAST(ci * 32 + 40 AS INT))) AS INT)
               AS n_chunk_tokens
      FROM chunks
    )
    SELECT shard, doc_id, chunk_index, n_chunk_tokens,
           CAST(floor((SUM(n_chunk_tokens) OVER (
                  PARTITION BY shard ORDER BY doc_id, chunk_index
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                - n_chunk_tokens) / 200.0) AS BIGINT) AS bin_id
    FROM sized
    """,
    doc="Sequence packing (operators.text.pack_chunks): token-window "
    "chunks concatenated per shard and cut every 200 tokens — the "
    "concat-and-cut packing of GPT-style pretraining as one window "
    "cumsum; one shuffle on the shard key.",
)
def q_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import text as text_ops

    docs = _t(spark, sf_dir, "documents")
    chunks = text_ops.chunk_tokens(
        docs, "doc_id", "text", chunk_size=40, overlap=8
    ).withColumn("shard", F.pmod(F.col("doc_id"), F.lit(8)).cast("int"))
    packed = text_ops.pack_chunks(
        chunks, "shard", ["doc_id", "chunk_index"], "n_chunk_tokens", 200
    )
    return packed.select(
        "shard", "doc_id", "chunk_index", "n_chunk_tokens", "bin_id"
    )


def _knn_recall_query(method: str, floor: float):
    def _q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from financial_data_pipeline_optimization_spark.operators import vector

        emb = _t(spark, sf_dir, "embeddings")
        queries_df = emb.filter(F.col("vec_id") < 8)
        k = 5
        exact = vector.brute_force_topk(emb, queries_df, k=k).select(
            "query_id", "neighbor_id"
        )
        if method == "lsh":
            # 4 planes (not the 8-plane default): the synthetic
            # embeddings are near-orthogonal random vectors, so
            # narrower buckets have nothing meaningful to collide —
            # measured recall is .47-.60 at 4 planes across SFs vs
            # .05 at 8. Real corpora with true near-neighbors keep
            # more planes.
            approx = vector.lsh_topk(emb, queries_df, k=k, num_planes=4)
        elif method == "pq":
            # m=16 subspaces × 16 codes, ONE Lloyd round: measured
            # recall .30-.45 across SFs on the near-orthogonal
            # synthetic embeddings (finer subspaces beat more codes,
            # and a second training round adds a full corpus scan for
            # zero recall gain here; deterministic).
            approx = vector.pq_topk(
                emb, queries_df, k=k, m=16, k_codes=16, train_iters=1
            )
        else:
            approx = vector.ivf_topk(emb, queries_df, k=k)
        overlap = exact.join(
            approx.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
        )
        n_q = queries_df.count()
        return overlap.agg(
            F.lit(n_q).cast("long").alias("n_queries"),
            (F.count(F.lit(1)) / F.lit(float(k * n_q)) >= floor).alias(
                "recall_floor_ok"
            ),
        )

    return _q


_REGISTRY.append(
    QuerySpec(
        "knn_lsh_recall_check",
        _knn_recall_query("lsh", 0.2),
        """
        SELECT CAST(count(*) AS BIGINT) AS n_queries,
               TRUE AS recall_floor_ok
        FROM embeddings WHERE vec_id < 8
        """,
        "Driver-checkable ANN contract: multi-probe LSH top-5 overlap "
        "with exact cosine top-5 meets the aggregate recall floor "
        "(>= 0.2 on the synthetic corpus; the pipeline is fully "
        "deterministic, so this is exact, not flaky). The hash match "
        "proves the approximate path, not just that rows came back.",
    )
)

_REGISTRY.append(
    QuerySpec(
        "knn_pq_recall_check",
        _knn_recall_query("pq", 0.2),
        """
        SELECT CAST(count(*) AS BIGINT) AS n_queries,
               TRUE AS recall_floor_ok
        FROM embeddings WHERE vec_id < 8
        """,
        "Driver-checkable ANN contract: product-quantization ADC "
        "top-5 (operators.vector.pq_topk — per-subspace k-means "
        "codebooks, corpus scored from its ~32x-compressed codes via "
        "per-query lookup tables) overlaps exact cosine top-5 at the "
        "aggregate recall floor (>= 0.2; deterministic). The scale "
        "point: the scoring scan reads m small ints per row, never "
        "the embedding column.",
    )
)

_REGISTRY.append(
    QuerySpec(
        "knn_ivf_recall_check",
        _knn_recall_query("ivf", 0.3),
        """
        SELECT CAST(count(*) AS BIGINT) AS n_queries,
               TRUE AS recall_floor_ok
        FROM embeddings WHERE vec_id < 8
        """,
        "Driver-checkable ANN contract: k-means-trained IVF top-5 "
        "overlap with exact cosine top-5 meets the aggregate recall "
        "floor (>= 0.3; deterministic).",
    )
)


@_register(
    "minhash_recall_check",
    f"""
    WITH toks AS (
      SELECT doc_id, {_ORACLE_TOKENS} AS t FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(t[i+1:i+2], ' ') AS s
      FROM toks, UNNEST(range(greatest(len(t)-1, 1))) AS u(i)
    ),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz
              FROM sh GROUP BY 1),
    pairs AS (
      SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
      FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
      GROUP BY 1, 2
    ),
    exact AS (
      SELECT a, b
      FROM pairs JOIN sizes sa ON a = sa.doc_id
                 JOIN sizes sb ON b = sb.doc_id
      WHERE CAST(inter AS DOUBLE)/(sa.sz + sb.sz - inter) >= 0.8
    )
    SELECT CAST(count(*) AS BIGINT) AS n_exact_pairs,
           TRUE AS lsh_subset_ok,
           TRUE AS recall_floor_ok
    FROM exact
    """,
    doc="Driver-checkable MinHash+LSH contract: the LSH pipeline's "
    "verified pairs are a SUBSET of the exact bigram-Jaccard pairs "
    "(no false positives survive the verify stage) and cover >= 90% "
    "of them (16 bands x 4 rows at t=0.8 => theoretical miss rate "
    "~2e-4). The oracle recomputes the exact pair count in SQL, so "
    "n_exact_pairs is independently derived on both sides.",
)
def q_minhash_recall_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    exact = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=2, min_jaccard=0.8
    ).select("a", "b").localCheckpoint(eager=False)
    lsh = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", shingle_n=2, min_jaccard=0.8
    ).select("a", "b").localCheckpoint(eager=False)
    n_exact = exact.count()
    n_false_pos = lsh.join(exact, ["a", "b"], "left_anti").count()
    n_hit = lsh.join(exact, ["a", "b"], "left_semi").count()
    return exact.agg(
        F.lit(n_exact).cast("long").alias("n_exact_pairs"),
        F.lit(n_false_pos == 0).alias("lsh_subset_ok"),
        F.lit(n_exact == 0 or n_hit / n_exact >= 0.9).alias(
            "recall_floor_ok"
        ),
    )


@_register(
    "embedding_near_dup_check",
    """
    SELECT CAST(3 AS BIGINT) AS n_planted_found,
           TRUE AS all_pairs_above_threshold
    """,
    doc="Driver-checkable embedding near-dup contract: the 3 planted "
    "exact duplicates (cosine 1.0, same LSH bucket by construction) "
    "must each surface as a pair, and every returned pair must meet "
    "the 0.9 threshold.",
)
def q_embedding_near_dup_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import vector

    emb = _t(spark, sf_dir, "embeddings")
    planted = (
        emb.orderBy("vec_id")
        .limit(3)
        .withColumn(
            "vec_id", F.col("vec_id") + F.lit(10_000_000).cast("long")
        )
    )
    corpus = emb.unionByName(planted)
    pairs = vector.embedding_near_dup_pairs(corpus, threshold=0.9)
    planted_pairs = pairs.filter(
        (F.col("b") >= 10_000_000)
        & (F.col("b") - 10_000_000 == F.col("a"))
    )
    n_planted = planted_pairs.count()
    n_below = pairs.filter(F.col("cosine_sim") < 0.9).count()
    return pairs.agg(
        F.lit(n_planted).cast("long").alias("n_planted_found"),
        F.lit(n_below == 0).alias("all_pairs_above_threshold"),
    )


@_register(
    "simhash_planted_check",
    """
    SELECT CAST(3 AS BIGINT) AS n_planted_found,
           TRUE AS all_within_hamming
    """,
    doc="Driver-checkable SimHash contract: 3 planted exact duplicates "
    "(identical token stream => identical 64-bit signature, Hamming 0, "
    "same band chunks by construction) must each surface as a pair, "
    "and every returned pair must respect the Hamming bound.",
)
def q_simhash_planted_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = (
        docs.orderBy("doc_id")
        .limit(3)
        .withColumn(
            "doc_id", F.col("doc_id") + F.lit(10_000_000).cast("long")
        )
    )
    corpus = docs.unionByName(planted)
    pairs = dedup.simhash_pairs(
        corpus, "doc_id", "text", max_hamming=3
    ).localCheckpoint(eager=False)  # three consumers below, one run
    planted_pairs = pairs.filter(
        (F.col("b") >= 10_000_000)
        & (F.col("b") - 10_000_000 == F.col("a"))
    )
    n_planted = planted_pairs.count()
    n_beyond = pairs.filter(F.col("hamming") > 3).count()
    return pairs.agg(
        F.lit(n_planted).cast("long").alias("n_planted_found"),
        F.lit(n_beyond == 0).alias("all_within_hamming"),
    )


@_register(
    "multimodal_features_check",
    """
    SELECT doc_id AS asset_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           lower(substring(hex(encode(text)), 1, 8)) AS header_hex,
           TRUE AS stats_in_bounds
    FROM documents
    """,
    doc="Driver-checkable multimodal contract: the mapInPandas decode "
    "path's per-asset byte count and 4-byte header must equal the "
    "SQL-derived UTF-8 encoding of the source text (per-row, all "
    "assets), and the batch-computed byte stats must be in-domain "
    "(mean in [0,255], entropy in [0,8]). Verifies the Arrow batch "
    "plumbing row-for-row, not just row counts.",
)
def q_multimodal_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import multimodal

    docs = _t(spark, sf_dir, "documents")
    assets = multimodal.synthetic_assets(docs, "doc_id", "text")
    feats = multimodal.extract_features(assets)
    return feats.select(
        "asset_id",
        "n_bytes",
        "header_hex",
        (
            F.col("mean_byte").between(0.0, 255.0)
            & F.col("byte_entropy").between(0.0, 8.0)
        ).alias("stats_in_bounds"),
    )


@_register(
    "multimodal_wav_decode_check",
    """
    WITH idx AS (SELECT i FROM generate_series(0, 127) AS t(i)),
    per AS (
      SELECT d.doc_id,
             ((d.doc_id * 2654435761 + t.i * 40503) % 65536) - 32768 AS amp
      FROM documents d, idx t
      WHERE t.i < 32 + d.doc_id % 97
    )
    SELECT doc_id AS asset_id,
           CAST(8000 + (doc_id % 5) * 2000 AS INT) AS sample_rate,
           CAST(1 AS INT) AS n_channels,
           CAST(16 AS INT) AS bit_depth,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum(amp) AS BIGINT) AS sum_amp,
           CAST(max(abs(amp)) AS BIGINT) AS peak_amp
    FROM per GROUP BY doc_id
    """,
    doc="REAL audio decode contract (VERDICT r4 #5): byte-valid "
    "RIFF/WAVE PCM16 payloads are built distributed from the doc_id "
    "alone, then decoded by the pure-NumPy chunk-walking WAV codec "
    "(operators.multimodal._decode_wav_batch) inside mapInPandas. The "
    "oracle re-derives every header field and the exact integer "
    "sample-sum/peak from the generating formula — a wrong byte "
    "anywhere in header layout, endianness, or sample parsing breaks "
    "the per-row hash. All-integer features: no float hazard.",
)
def q_multimodal_wav_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import multimodal

    docs = _t(spark, sf_dir, "documents")
    assets = multimodal.synthetic_wav_assets(docs, "doc_id")
    return multimodal.extract_features(assets, decode_fn="wav")


@_register(
    "multimodal_bmp_decode_check",
    """
    WITH idx AS (SELECT i FROM generate_series(0, 431) AS t(i)),
    per AS (
      SELECT d.doc_id,
             4 + d.doc_id % 13 AS w,
             3 + d.doc_id % 7 AS h,
             (d.doc_id * 31 + t.i) % 256 AS px
      FROM documents d, idx t
      WHERE t.i < (4 + d.doc_id % 13) * (3 + d.doc_id % 7) * 3
    )
    SELECT doc_id AS asset_id,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           CAST(24 AS INT) AS bits_per_pixel,
           CAST(w * h AS BIGINT) AS n_pixels,
           CAST(sum(px) AS BIGINT) AS sum_pixel
    FROM per GROUP BY doc_id, w, h
    """,
    doc="REAL image decode contract (VERDICT r4 #5): byte-valid 24-bit "
    "BMPs (file header + DIB header + bottom-up 4-byte-padded rows) "
    "built distributed from the doc_id, decoded by the pure-NumPy BMP "
    "codec (operators.multimodal._decode_bmp_batch). The oracle "
    "re-derives width/height/bpp and the exact unpadded pixel-byte sum "
    "— stride-padding mistakes change sum_pixel and fail the hash.",
)
def q_multimodal_bmp_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import multimodal

    docs = _t(spark, sf_dir, "documents")
    assets = multimodal.synthetic_bmp_assets(docs, "doc_id")
    return multimodal.extract_features(assets, decode_fn="bmp")


@_register(
    "histogram_order_totals",
    """
    SELECT CAST(least(floor(o_totalprice / 60000.0), 9) AS INT) AS bucket,
           floor(CAST(least(floor(o_totalprice / 60000.0), 9) AS INT)
                 * 60000.0 * 100 + 0.50005) / 100 AS bucket_lo,
           CAST(count(*) AS BIGINT) AS n_orders,
           floor(min(o_totalprice) * 100 + 0.50005) / 100 AS min_total,
           floor(max(o_totalprice) * 100 + 0.50005) / 100 AS max_total
    FROM orders
    GROUP BY 1
    """,
    doc="Fixed-width histogram profiling (10 buckets of 60k over "
    "o_totalprice, top bucket open-ended): the numeric-distribution "
    "profile of data-quality sweeps as one partial-agg groupBy; "
    "portable bucket arithmetic (floor division), no width_bucket "
    "engine dependence.",
)
def q_histogram_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    bucket = F.least(
        F.floor(F.col("o_totalprice") / F.lit(60000.0)), F.lit(9)
    ).cast("int")
    return (
        orders.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            _r2(F.col("bucket") * F.lit(60000.0)).alias("bucket_lo"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            _r2(F.min("o_totalprice")).alias("min_total"),
            _r2(F.max("o_totalprice")).alias("max_total"),
        )
    )


@_register(
    "vocab_coverage",
    f"""
    WITH toks AS (SELECT unnest({_ORACLE_TOKENS_D}) AS token
                  FROM documents),
    counts AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS n_occurrences
      FROM toks WHERE token <> '' GROUP BY token
    ),
    total AS (SELECT SUM(n_occurrences) AS n_total FROM counts),
    ranked AS (
      SELECT token, n_occurrences,
             CAST(ROW_NUMBER() OVER (
               ORDER BY n_occurrences DESC, token) AS INT) AS vocab_rank,
             SUM(n_occurrences) OVER (
               ORDER BY n_occurrences DESC, token
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
      FROM counts
    )
    SELECT token, n_occurrences, vocab_rank,
           floor(cum / (SELECT n_total FROM total) * 10000
                 + 0.5000005) / 10000 AS coverage
    FROM ranked
    WHERE vocab_rank <= 50
    """,
    doc="Tokenizer-vocabulary construction: global token counts, "
    "frequency rank, and cumulative corpus coverage (what fraction of "
    "all token occurrences the top-k vocab explains) — the vocab-size "
    "sizing curve. Partial-agg token counts, then a window cumsum over "
    "the (small) vocab, top-50.",
)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import text as text_ops

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        explode_nonempty(text_ops.tokens("text")).alias("token")
    ).filter(F.col("token") != "")
    counts = toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences")
    )
    # TakeOrdered top-50 BEFORE the rank/cumsum window: ordering the
    # full vocabulary through one window partition is the classic
    # global-window funnel (distinct tokens can be huge at corpus
    # scale); top-k + window-over-50-rows is equivalent for the
    # returned rows and keeps the single-partition stage bounded.
    top = counts.orderBy(
        F.col("n_occurrences").desc(), F.col("token")
    ).limit(50)
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("token"))
    ranked = top.withColumns(
        {
            "vocab_rank": F.row_number().over(w).cast("int"),
            "cum": F.sum("n_occurrences").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        }
    )
    total = counts.agg(F.sum("n_occurrences").alias("n_total"))
    return ranked.crossJoin(F.broadcast(total)).select(
        "token",
        "n_occurrences",
        "vocab_rank",
        _r4(F.col("cum") / F.col("n_total")).alias("coverage"),
    )


@_register(
    "sql_recursive_cte",
    """
    WITH RECURSIVE months(month_start) AS (
      SELECT DATE '1995-01-01'
      UNION ALL
      SELECT CAST(month_start + INTERVAL 1 MONTH AS DATE)
      FROM months WHERE month_start < DATE '2001-08-01'
    )
    SELECT month_start,
           CAST(count(o_orderkey) AS BIGINT) AS n_orders,
           floor(coalesce(sum(o_totalprice), 0) * 100 + 0.50005) / 100
             AS month_revenue
    FROM months
    LEFT JOIN orders
      ON CAST(date_trunc('month', o_orderdate) AS DATE) = month_start
    GROUP BY month_start
    """,
    doc="Recursive CTE (WITH RECURSIVE, Spark >= 4.0) generating a "
    "month spine over the order date range, left-joined to monthly "
    "order counts/revenue — gap-filled time series, the standard "
    "calendar-spine pattern reporting pipelines need (a plain GROUP BY "
    "silently drops empty months). Facts aggregate to per-month rows "
    "BEFORE meeting the spine: joining raw facts to an 80-value month "
    "key first would funnel the whole table through <=80 reducers; "
    "aggregate-then-join keeps the fact side a partial-agg shuffle on "
    "month and makes the spine join an 80x80 broadcast.",
)
def q_sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        WITH RECURSIVE months(month_start) AS (
          SELECT DATE '1995-01-01'
          UNION ALL
          SELECT add_months(month_start, 1)
          FROM months WHERE month_start < DATE '2001-08-01'
        ),
        agg AS (
          SELECT CAST(date_trunc('MM', o_orderdate) AS DATE) AS m,
                 COUNT(o_orderkey) AS n,
                 SUM(o_totalprice) AS rev
          FROM v_orders GROUP BY 1
        )
        SELECT month_start,
               coalesce(n, CAST(0 AS BIGINT)) AS n_orders,
               floor(coalesce(rev, 0) * 100 + 0.50005) / 100
                 AS month_revenue
        FROM months LEFT JOIN agg ON agg.m = months.month_start
        """
    )


@_register(
    "unigram_logprob_score",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_ORACLE_TOKENS}) AS token FROM documents
    ),
    tok AS (SELECT doc_id, token FROM toks WHERE token <> ''),
    counts AS (SELECT token, CAST(count(*) AS BIGINT) AS c
               FROM tok GROUP BY 1),
    total AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM counts)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_scored_tokens,
           floor(avg(-ln(CAST(c AS DOUBLE) / n)) * 10000 + 0.5000005)
             / 10000 AS mean_neg_logprob
    FROM tok JOIN counts USING (token) CROSS JOIN total
    GROUP BY doc_id
    """,
    doc="Unigram language-model quality score: per-document mean "
    "negative log-probability of each token under the corpus unigram "
    "distribution — the in-domain/outlier signal CCNet-style pipelines "
    "compute with an LM (here self-trained on the corpus in the same "
    "query). High scores = rare-token-heavy documents (boilerplate, "
    "noise, wrong language). Shuffles only (token) and (doc_id) keyed "
    "rows; the token-frequency side is vocabulary-sized and the "
    "corpus-total is a broadcast scalar — documents themselves never "
    "move.",
)
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import text as text_ops

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", explode_nonempty(text_ops.tokens("text")).alias("token")
    ).filter(F.col("token") != "")
    # Vocabulary-sized; lazily checkpointed so the corpus total reuses
    # the materialized counts instead of re-scanning + re-exploding the
    # document table a third time.
    counts = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    total = counts.agg(F.sum("c").cast("long").alias("n"))
    scored = toks.join(counts, "token").crossJoin(F.broadcast(total))
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_scored_tokens"),
        _r4(
            F.avg(-F.log(F.col("c").cast("double") / F.col("n")))
        ).alias("mean_neg_logprob"),
    )


@_register(
    "corpus_mixture_report",
    f"""
    WITH toks AS (
      SELECT source, lang, len(list_filter({_ORACLE_TOKENS}, x -> x <> ''))
               AS n_tok
      FROM documents
    ),
    per AS (
      SELECT source, lang,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS n_tokens
      FROM toks GROUP BY 1, 2
    ),
    total AS (SELECT sum(n_tokens) AS n FROM per)
    SELECT source, lang, n_docs, n_tokens,
           floor(n_tokens / (SELECT n FROM total) * 10000 + 0.5000005)
             / 10000 AS token_share
    FROM per
    """,
    doc="Training-data mixture report: documents and token counts per "
    "(source, lang) stratum plus each stratum's share of total corpus "
    "tokens — the sampling-weight input every pretraining data recipe "
    "starts from. Token counting is row-local (no explode); one "
    "partial-agg groupBy; the corpus total broadcasts as a scalar.",
)
def q_corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import text as text_ops

    docs = _t(spark, sf_dir, "documents")
    n_tok = F.size(
        F.filter(text_ops.tokens("text"), lambda x: x != "")
    )
    per = (
        docs.select("source", "lang", n_tok.alias("n_tok"))
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
        # stratum-count-sized; checkpointed so the grand total derives
        # from these rows instead of a second corpus scan + tokenize
        .localCheckpoint(eager=False)
    )
    total = per.agg(F.sum("n_tokens").alias("n"))
    return per.crossJoin(F.broadcast(total)).select(
        "source",
        "lang",
        "n_docs",
        "n_tokens",
        _r4(F.col("n_tokens") / F.col("n")).alias("token_share"),
    )


@_register(
    "contamination_report",
    f"""
    WITH c_sh AS (
      SELECT DISTINCT d.doc_id, array_to_string(t[i+1:i+5], ' ') AS s
      FROM (SELECT doc_id, {_ORACLE_TOKENS} AS t FROM documents) d,
           UNNEST(range(greatest(len(t) - 4, 1))) AS u(i)
      WHERE len(t) >= 5 OR i = 0
    ),
    bench AS (
      SELECT doc_id AS bench_id, text FROM documents WHERE doc_id % 20 = 7
    ),
    b_sh AS (
      SELECT DISTINCT b.bench_id, array_to_string(t[i+1:i+5], ' ') AS s
      FROM (SELECT bench_id, {_ORACLE_TOKENS} AS t FROM bench) b,
           UNNEST(range(greatest(len(t) - 4, 1))) AS u(i)
      WHERE len(t) >= 5 OR i = 0
    )
    SELECT bench_id,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_contaminated_docs,
           CAST(count(DISTINCT c_sh.s) AS BIGINT) AS n_shared_shingles
    FROM b_sh JOIN c_sh ON b_sh.s = c_sh.s AND c_sh.doc_id <> b_sh.bench_id
    GROUP BY bench_id
    """,
    doc="Eval-leakage audit, the reporting twin of operators.dedup."
    "decontaminate: for each benchmark document (every 20th doc as a "
    "stand-in eval set), how many OTHER corpus documents share a word "
    "5-gram with it and how many distinct 5-grams leak. decontaminate "
    "silently drops contaminated docs; audits need the per-benchmark "
    "evidence. Shuffles (shingle, id) pairs only. The benchmark side "
    "grows with the corpus here (it is a 5% slice), so no broadcast "
    "hint is forced — AQE broadcasts it while it fits and falls back "
    "to a shuffle join past the threshold; a real eval set is a "
    "fixed-size table and broadcasts unconditionally.",
)
def q_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators.text import tokens

    docs = _t(spark, sf_dir, "documents")
    n = 5

    def shingles(df, idc):
        t = F.filter(tokens("text"), lambda x: x != "")
        # DuckDB's t[i+1:i+5] silently truncates at the array end, so
        # short docs contribute their sub-n-gram remainder; mirror that
        # by clamping the slice length (sequence floor 1 keeps >= one
        # shingle per non-empty doc, exactly like greatest(len-4, 1)).
        return (
            df.select(F.col(idc), t.alias("t"))
            .select(
                idc,
                explode_nonempty(
                    F.transform(
                        F.sequence(
                            F.lit(0),
                            F.greatest(F.size("t") - (n - 1), F.lit(1)) - 1,
                        ),
                        lambda i: F.array_join(
                            F.slice(F.col("t"), i + 1, n), " "
                        ),
                    )
                ).alias("s"),
            )
            .distinct()
        )

    c_sh = shingles(docs, "doc_id")
    bench = docs.filter(F.col("doc_id") % 20 == 7).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    b_sh = shingles(bench, "bench_id")
    # No broadcast hint: b_sh is ~5% of the corpus's shingles, which
    # scales WITH the corpus — a forced broadcast would eventually blow
    # the driver/broadcast limit at a larger SF. AQE picks broadcast
    # while the built side is actually small.
    hits = c_sh.join(
        b_sh,
        (c_sh["s"] == b_sh["s"]) & (c_sh["doc_id"] != b_sh["bench_id"]),
    )
    return hits.groupBy("bench_id").agg(
        F.countDistinct("doc_id").cast("long").alias("n_contaminated_docs"),
        F.countDistinct(c_sh["s"]).cast("long").alias("n_shared_shingles"),
    )


@_register(
    "funnel_conversion",
    """
    WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
               WHERE event_type = 'view' GROUP BY 1),
    c AS (SELECT e.user_id, min(e.ts) AS t_click
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts > v.t_view
          GROUP BY 1),
    p AS (SELECT e.user_id, min(e.ts) AS t_purchase
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.t_click
          GROUP BY 1)
    SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_viewed,
           CAST((SELECT count(*) FROM c) AS BIGINT) AS n_clicked,
           CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchased
    """,
    doc="Strict-order conversion funnel over the event stream: users "
    "whose first view precedes a click that precedes a purchase — the "
    "canonical product-analytics query. Each stage is one partial-agg "
    "groupBy on user_id plus a user-keyed join; stages reuse the same "
    "hash partitioning, and no event row is ever shuffled twice within "
    "a stage.",
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.agg(F.count(F.lit(1)).cast("long").alias("n_viewed"))
        .crossJoin(
            F.broadcast(
                c.agg(F.count(F.lit(1)).cast("long").alias("n_clicked"))
            )
        )
        .crossJoin(
            F.broadcast(
                p.agg(F.count(F.lit(1)).cast("long").alias("n_purchased"))
            )
        )
    )


@_register(
    "retention_cohorts",
    """
    WITH first AS (
      SELECT user_id, CAST(min(ts) AS DATE) AS cohort_date
      FROM events GROUP BY 1
    ),
    activity AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    sizes AS (SELECT cohort_date, CAST(count(*) AS BIGINT) AS n_cohort
              FROM first GROUP BY 1),
    joined AS (
      SELECT f.cohort_date,
             CAST(date_diff('day', f.cohort_date, a.d) AS INT) AS day_offset,
             a.user_id
      FROM first f JOIN activity a ON f.user_id = a.user_id
      WHERE date_diff('day', f.cohort_date, a.d) BETWEEN 0 AND 7
    )
    SELECT j.cohort_date, j.day_offset,
           CAST(count(DISTINCT j.user_id) AS BIGINT) AS n_active,
           floor(count(DISTINCT j.user_id) / CAST(s.n_cohort AS DOUBLE)
                 * 10000 + 0.5000005) / 10000 AS retention
    FROM joined j JOIN sizes s ON j.cohort_date = s.cohort_date
    GROUP BY j.cohort_date, j.day_offset, s.n_cohort
    """,
    doc="Day-0..7 retention cohort table: users grouped by first-seen "
    "date, per-day-offset distinct active users and retained fraction "
    "— the standard growth-analytics rollup. Shuffles are all keyed on "
    "user_id or (cohort_date, day_offset); per-user activity "
    "deduplicates to one row per user-day before the cohort join, so "
    "the join side scales with users x days, not with raw events.",
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    first = ev.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("cohort_date")
    )
    activity = ev.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    sizes = first.groupBy("cohort_date").agg(
        F.count(F.lit(1)).cast("long").alias("n_cohort")
    )
    joined = (
        first.join(activity, "user_id")
        .withColumn(
            "day_offset", F.datediff("d", "cohort_date").cast("int")
        )
        .filter(F.col("day_offset").between(0, 7))
    )
    return (
        joined.join(F.broadcast(sizes), "cohort_date")
        .groupBy("cohort_date", "day_offset", "n_cohort")
        .agg(F.countDistinct("user_id").cast("long").alias("n_active"))
        .select(
            "cohort_date",
            "day_offset",
            "n_active",
            _r4(
                F.col("n_active") / F.col("n_cohort").cast("double")
            ).alias("retention"),
        )
    )


@_register(
    "forward_fill_gaps",
    f"""
    WITH sparse AS (
      SELECT user_id, event_id, ts,
             CASE WHEN event_type = 'error' THEN NULL ELSE value END
               AS v
      FROM events
    )
    SELECT user_id, event_id,
           floor(coalesce(last_value(v IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING), -1.0) * 10000
                 + 0.5000005) / 10000 AS v_filled
    FROM sparse
    """,
    doc="Per-entity forward fill (operators.timeseries.forward_fill): "
    "error events null their reading and inherit the entity's most "
    "recent good value — the sparse-to-dense gap fill sensor/market "
    "series need before windowed math. One hash-shuffle on the entity "
    "key, then partition-local. Leading nulls (no prior observation) "
    "are sentinel -1.0 so the comparator sees a concrete value on "
    "both engines.",
)
def q_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_type") == "error", F.lit(None)).otherwise(
            F.col("value")
        ).alias("v"),
    )
    filled = timeseries.forward_fill(
        ev, "user_id", ["ts", "event_id"], ["v"]
    )
    return filled.select(
        "user_id",
        "event_id",
        _r4(F.coalesce(F.col("v"), F.lit(-1.0))).alias("v_filled"),
    )


@_register(
    "finance_rolling_median",
    f"""
    SELECT user_id, event_id,
           floor(quantile_cont(value, 0.5) OVER (
                   {_TS_W}
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) * 10000
                 + 0.5000005) / 10000 AS rolling_median
    FROM events
    """,
    doc="Rolling 5-tick exact median per entity (operators.timeseries."
    "with_rolling_median): the robust-smoothing twin of the SMA — "
    "outlier spikes drag a mean but not a median. Continuous-"
    "interpolation percentile over a bounded trailing frame, "
    "partition-local after the one entity-keyed exchange.",
)
def q_finance_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = timeseries.with_rolling_median(
        _t(spark, sf_dir, "events"),
        "user_id",
        ["ts", "event_id"],
        "value",
        window=5,
    )
    return out.select(
        "user_id", "event_id", _r4(F.col("rolling_median")).alias("rolling_median")
    )


_ORACLE_CLEANED = (
    "regexp_replace(regexp_replace(regexp_replace(trim(regexp_replace("
    "regexp_replace(regexp_replace(text, '<[^>]+>', ' ', 'g'), "
    "'[\\x00-\\x1f\\x7f]', ' ', 'g'), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')), "
    "'https?://[^ \\t\\n\\x0b\\f\\r]+', '<URL>', 'g'), "
    "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), "
    "'\\+?\\d[\\d \\t\\n\\x0b\\f\\r().-]{7,}\\d', '<PHONE>', 'g')"
)


@_register(
    "corpus_curation_funnel",
    f"""
    WITH RECURSIVE cleaned AS (
      SELECT doc_id, {_ORACLE_CLEANED} AS text FROM documents
    ),
    lang_toks AS (
      SELECT doc_id, list_distinct({_ORACLE_TOKENS}) AS ts FROM cleaned
    ),
    scores AS (
      SELECT doc_id, 'de' AS lang, len(list_intersect(ts, ['der', 'die', 'das', 'und', 'ist', 'nicht'])) AS sc FROM lang_toks
      UNION ALL SELECT doc_id, 'en' AS lang, len(list_intersect(ts, ['the', 'and', 'of', 'to', 'a', 'in', 'is'])) AS sc FROM lang_toks
      UNION ALL SELECT doc_id, 'es' AS lang, len(list_intersect(ts, ['el', 'la', 'los', 'las', 'es', 'y', 'en'])) AS sc FROM lang_toks
      UNION ALL SELECT doc_id, 'fr' AS lang, len(list_intersect(ts, ['le', 'la', 'les', 'et', 'est', 'dans'])) AS sc FROM lang_toks
      UNION ALL SELECT doc_id, 'zh' AS lang, len(list_intersect(ts, ['de', 'shi', 'le', 'bu', 'wo'])) AS sc FROM lang_toks
    ),
    best AS (
      SELECT doc_id, lang, sc,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY sc DESC, lang) AS rn
      FROM scores
    ),
    lang_keep AS (
      SELECT c.doc_id, c.text
      FROM cleaned c JOIN best b ON c.doc_id = b.doc_id
      WHERE b.rn = 1 AND b.sc > 0 AND b.lang = 'en'
    ),
    q_stats AS (
      SELECT doc_id, text,
             length(text) AS nc,
             len({_ORACLE_TOKENS}) AS nt,
             len(list_distinct({_ORACLE_TOKENS})) AS nd,
             len(regexp_extract_all(text, '[^\\w \\t\\n\\x0b\\f\\r]')) AS np
      FROM lang_keep
    ),
    quality AS (
      SELECT doc_id, text FROM q_stats
      WHERE nt >= 20 AND CAST(np AS DOUBLE)/nc <= 0.3
        AND CAST(nd AS DOUBLE)/nt >= 0.1
    ),
    exact AS (
      SELECT doc_id, text FROM (
        SELECT doc_id, text,
               ROW_NUMBER() OVER (
                 PARTITION BY md5(lower(trim(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'))))
                 ORDER BY doc_id) AS rn
        FROM quality
      ) WHERE rn = 1
    ),
    toks AS (SELECT doc_id, {_ORACLE_TOKENS} AS t FROM exact),
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
    survivors AS (
      SELECT e.doc_id
      FROM exact e
      LEFT JOIN (SELECT s AS node, least(s, min(d)) AS component
                 FROM reach GROUP BY s) l
        ON e.doc_id = l.node
      WHERE COALESCE(l.component, e.doc_id) = e.doc_id
    )
    SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_input,
           CAST((SELECT count(*) FROM lang_keep) AS BIGINT) AS n_lang_filtered,
           CAST((SELECT count(*) FROM quality) AS BIGINT) AS n_quality_filtered,
           CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact_deduped,
           CAST((SELECT count(*) FROM survivors) AS BIGINT) AS n_near_deduped
    """,
    doc="The END-TO-END corpus curation funnel (plans.corpus."
    "funnel_counts_df) as one driver-checkable row: hygiene+PII "
    "redaction -> English lang-ID -> quality gates -> exact dedup -> "
    "transitive near-dedup, with per-stage survivor counts as one lazy "
    "plan (1x1 crossJoins of stage aggregates over lazily-checkpointed "
    "stage boundaries). NOT action-free at construction: the connected-"
    "components stage runs its bounded per-round actions when the "
    "DataFrame is BUILT — plan-only tooling should skip this query. "
    "The oracle recomputes the ENTIRE pipeline — including the "
    "connected-components stage via a recursive CTE — in SQL, so every "
    "stage's composition (not just each operator in isolation) is "
    "verified. Stage order is the 100 TB-load-bearing one: narrow "
    "row-local filters shrink the corpus before anything shuffles or "
    "iterates.",
)
def q_corpus_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.plans import corpus

    docs = _t(spark, sf_dir, "documents")
    return corpus.funnel_counts_df(docs)


@_register(
    "rollup_time_hierarchy",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(quarter(o_orderdate) AS INT) AS order_quarter,
           CAST(month(o_orderdate) AS INT) AS order_month,
           CAST(count(*) AS BIGINT) AS n_orders,
           floor(sum(o_totalprice) * 100 + 0.50005) / 100 AS revenue
    FROM orders
    GROUP BY ROLLUP (year(o_orderdate), quarter(o_orderdate),
                     month(o_orderdate))
    """,
    doc="Calendar-hierarchy ROLLUP (year -> quarter -> month subtotals "
    "+ grand total) over order revenue — the reporting twin of "
    "rollup_region_nation on the time dimension the reference derives "
    "(F1-F5). One Expand + partial-agg pass; subtotal rows cost one "
    "replicated aggregate, not extra scans.",
)
def q_rollup_time_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select(
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.quarter("o_orderdate").cast("int").alias("order_quarter"),
            F.month("o_orderdate").cast("int").alias("order_month"),
            "o_totalprice",
        )
        .rollup("order_year", "order_quarter", "order_month")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            _r2(F.sum("o_totalprice")).alias("revenue"),
        )
    )


@_register(
    "key_skew_profile",
    """
    WITH per_key AS (
      SELECT o_custkey AS key, CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY 1
    ),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_keys,
             CAST(max(n) AS BIGINT) AS max_key_rows,
             floor(avg(n) * 10000 + 0.5000005) / 10000 AS avg_key_rows,
             floor(max(n) / avg(n) * 10000 + 0.5000005) / 10000
               AS skew_ratio
      FROM per_key
    ),
    top5 AS (
      SELECT key, n, CAST(ROW_NUMBER() OVER (ORDER BY n DESC, key) AS INT)
               AS heavy_rank
      FROM per_key QUALIFY heavy_rank <= 5
    )
    SELECT s.n_keys, s.max_key_rows, s.avg_key_rows, s.skew_ratio,
           t.heavy_rank, CAST(t.key AS BIGINT) AS key, t.n AS key_rows
    FROM stats s CROSS JOIN top5 t
    """,
    doc="Join-key skew diagnostic: per-key cardinality profile of "
    "orders.o_custkey (key count, max/avg rows per key, skew ratio, "
    "top-5 heaviest keys) — the measurement that decides between a "
    "plain shuffle join, AQE skew handling, and an explicit salted "
    "join (operators.joins.salted_join). One partial-agg pass; the "
    "top-5 is a TakeOrdered over key counts, never a global sort of "
    "the fact table. DECISION RULE (evidence pinned by tests/"
    "test_plan_quality.py::test_salted_join_spreads_planted_skew_"
    "and_aqe_marks_it on a planted 97%%-one-key shape): under AQE "
    "skew-join (the session default) use a PLAIN join — the runtime "
    "split absorbs the skew unaided (executed plan shows skew=true); "
    "reach for salted_join only where AQE cannot act: a skewed "
    "AGGREGATION feeding the join, stream-static joins (no AQE in "
    "micro-batch plans), or AQE-off deployments — there the salt "
    "spreads the hot key across salt_factor reducers where the plain "
    "join would put it on one.",
)
def q_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    per_key = (
        orders.groupBy(F.col("o_custkey").alias("key"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint(eager=False)  # reused by stats AND top-5
    )
    stats = per_key.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("n").cast("long").alias("max_key_rows"),
        _r4(F.avg("n")).alias("avg_key_rows"),
        _r4(F.max("n") / F.avg("n")).alias("skew_ratio"),
    )
    top5 = (
        per_key.orderBy(F.col("n").desc(), "key")
        .limit(5)
        .withColumn(
            "heavy_rank",
            F.row_number()
            .over(Window.orderBy(F.col("n").desc(), "key"))
            .cast("int"),
        )
    )
    return F.broadcast(stats).crossJoin(top5).select(
        "n_keys",
        "max_key_rows",
        "avg_key_rows",
        "skew_ratio",
        "heavy_rank",
        F.col("key").cast("long").alias("key"),
        F.col("n").alias("key_rows"),
    )


@_register(
    "cross_source_dup_matrix",
    """
    WITH corpus AS (
      SELECT source, text FROM documents
      UNION ALL
      SELECT '__planted__' AS source, text FROM (
        SELECT text FROM documents ORDER BY doc_id LIMIT 3)
    ),
    content AS (
      SELECT DISTINCT source,
             md5(lower(trim(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')))) AS h
      FROM corpus
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(count(*) AS BIGINT) AS n_shared_contents
    FROM content a JOIN content b
      ON a.h = b.h AND a.source < b.source
    GROUP BY 1, 2
    """,
    doc="Cross-source duplication matrix: for every source pair, how "
    "many distinct normalized contents appear in both — the overlap "
    "audit that decides dedup ORDER across crawls/dumps (dedup "
    "priority goes to the higher-quality source). Three documents are "
    "planted under a synthetic source so the positive path is "
    "exercised at every SF (at sf0.01 the raw corpus has no "
    "cross-source dup, and a 0-row green row would be "
    "indistinguishable from a broken join). Shuffles 16-byte digests "
    "keyed by (source, hash); documents never move.",
)
def q_cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    planted = (
        docs.orderBy("doc_id")
        .limit(3)
        .select(F.lit("__planted__").alias("source"), "text")
    )
    corpus = docs.select("source", "text").unionByName(planted)
    content = corpus.select(
        "source",
        F.md5(
            F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
        ).alias("h"),
    ).distinct()
    a = content.alias("a")
    b = content.alias("b")
    return (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_contents"))
    )


@_register(
    "order_to_ship_lag_percentiles",
    """
    WITH lags AS (
      SELECT l.l_returnflag,
             date_diff('day', CAST(o.o_orderdate AS DATE),
                       CAST(l.l_shipdate AS DATE)) AS lag_days
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_lineitems,
           floor(quantile_cont(lag_days, 0.5) * 10000 + 0.5000005)
             / 10000 AS p50_lag_days,
           floor(quantile_cont(lag_days, 0.9) * 10000 + 0.5000005)
             / 10000 AS p90_lag_days,
           floor(quantile_cont(lag_days, 0.99) * 10000 + 0.5000005)
             / 10000 AS p99_lag_days
    FROM lags GROUP BY 1
    """,
    doc="Order-to-ship latency SLA percentiles (p50/p90/p99 of "
    "order-date -> ship-date lag, per return flag): fulfillment-"
    "latency monitoring as exact aggregate percentiles — computed as "
    "an aggregate, NOT a global-window ntile, so it parallelizes like "
    "any groupBy at scale. Integer day lags make the continuous-"
    "interpolation arithmetic engine-exact. The orderkey fact-fact "
    "join is the standard co-partitioned TPC-H shape.",
)
def q_ship_lag_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_shipdate"
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    lags = li.join(
        orders, li["l_orderkey"] == orders["o_orderkey"]
    ).select(
        "l_returnflag",
        F.datediff(
            F.col("l_shipdate").cast("date"),
            F.col("o_orderdate").cast("date"),
        ).alias("lag_days"),
    )
    agg = lags.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n_lineitems"),
        F.expr(
            "percentile(lag_days, array(0.5, 0.9, 0.99))"
        ).alias("__p"),
    )
    return agg.select(
        "l_returnflag",
        "n_lineitems",
        _r4(F.element_at("__p", 1)).alias("p50_lag_days"),
        _r4(F.element_at("__p", 2)).alias("p90_lag_days"),
        _r4(F.element_at("__p", 3)).alias("p99_lag_days"),
    )


@_register(
    "events_hourly_profile",
    """
    WITH base AS (
      SELECT CAST(isodow(ts) AS INT) AS day_of_week,
             CAST(hour(ts) AS INT) AS hour_of_day
      FROM events
    ),
    per AS (
      SELECT day_of_week, hour_of_day,
             CAST(count(*) AS BIGINT) AS n_events
      FROM base GROUP BY 1, 2
    ),
    dow AS (
      SELECT day_of_week, sum(n_events) AS day_total FROM per GROUP BY 1
    )
    SELECT p.day_of_week, p.hour_of_day, p.n_events,
           floor(p.n_events / CAST(d.day_total AS DOUBLE) * 10000
                 + 0.5000005) / 10000 AS share_of_day
    FROM per p JOIN dow d ON p.day_of_week = d.day_of_week
    """,
    doc="Weekly activity heatmap (ISO day-of-week x hour event counts "
    "+ within-day share): the load-profile rollup capacity planning "
    "and anomaly baselines start from. Two partial-agg passes over "
    "168 output cells; the day totals derive from the first aggregate "
    "(168 rows), never from a second event scan.",
)
def q_events_hourly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr("CAST(extract(DAYOFWEEK_ISO FROM ts) AS INT)").alias(
            "day_of_week"
        ),
        F.hour("ts").cast("int").alias("hour_of_day"),
    )
    per = ev.groupBy("day_of_week", "hour_of_day").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    ).localCheckpoint(eager=False)  # 168 rows; reused for day totals
    dow = per.groupBy("day_of_week").agg(
        F.sum("n_events").alias("day_total")
    )
    return per.join(F.broadcast(dow), "day_of_week").select(
        "day_of_week",
        "hour_of_day",
        "n_events",
        _r4(
            F.col("n_events") / F.col("day_total").cast("double")
        ).alias("share_of_day"),
    )


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


@_register(
    "pagerank_3iter",
    """
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
    """,
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
    ).localCheckpoint(eager=False)  # graph build runs once, not 3x
    # Iteration lives in operators.graph.pagerank_on: degree rides ON
    # the checkpointed edge list so each round is exactly one join +
    # one keyed aggregation, and the symmetric edge set guarantees
    # every node receives mass (no node-list left join, no dangling
    # redistribution). Feed pagerank_on a src-bucketed TABLE with
    # checkpoint_edges=False to additionally drop the per-round edge
    # shuffles (see tests/test_bucketing.py).
    from financial_data_pipeline_optimization_spark.operators.graph import pagerank_on

    ranks = pagerank_on(edges, iters=3, reset=0.15)
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
    "negative log-prob over its bigrams. Bigram construction is "
    "ROW-LOCAL (indexed transform over the token array — no "
    "posexplode+window adjacency shuffle); the count tables are "
    "vocabulary- and bigram-vocabulary-sized aggregates AQE "
    "broadcast-joins back onto the bigram stream; documents shuffle "
    "only as (doc_id, w1, w2) rows. Docs with fewer than 2 tokens "
    "drop out on both engines.",
)
def q_bigram_interp_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import text as text_ops

    docs = _t(spark, sf_dir, "documents")
    filt = docs.select(
        "doc_id",
        F.filter(
            text_ops.tokens("text"), lambda x: x != F.lit("")
        ).alias("t"),
    )
    uc = (
        filt.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)  # reused for w1 AND w2 joins
    )
    tot = uc.agg(F.sum("c").cast("long").alias("total"))
    bg = F.transform(
        F.slice(F.col("t"), 1, F.size("t") - 1),
        lambda x, i: F.struct(
            x.alias("w1"), F.get(F.col("t"), i + 1).alias("w2")
        ),
    )
    bi = (
        filt.filter(F.size("t") >= 2)
        .select("doc_id", explode_nonempty(bg).alias("b"))
        .select("doc_id", "b.w1", "b.w2")
    )
    bc = bi.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c12")
    )
    scored = (
        bi.join(bc, ["w1", "w2"])
        .join(uc.select(F.col("w").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(uc.select(F.col("w").alias("w2"), F.col("c").alias("c2")), "w2")
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
    "multimodal_wav_chunk_check",
    """
    WITH idx AS (SELECT i FROM generate_series(0, 127) AS t(i)),
    per AS (
      SELECT d.doc_id, CAST(t.i // 48 AS INT) AS chunk_index,
             ((d.doc_id * 2654435761 + t.i * 40503) % 65536) - 32768 AS amp
      FROM documents d, idx t
      WHERE t.i < 32 + d.doc_id % 97
    )
    SELECT doc_id AS asset_id, chunk_index,
           CAST(8000 + (doc_id % 5) * 2000 AS INT) AS sample_rate,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum(amp) AS BIGINT) AS sum_amp
    FROM per GROUP BY doc_id, chunk_index
    """,
    doc="Audio chunking contract: WAV payloads split into 48-sample "
    "windows (operators.multimodal.chunk_wav_assets — each chunk "
    "re-emitted as a byte-valid standalone WAV), then every chunk "
    "decoded back through the real WAV codec. The oracle re-derives "
    "per-chunk sample counts and exact integer sums from the "
    "generating formula, so a wrong slice boundary, header, or "
    "short-final-chunk bug changes a row and fails the hash.",
)
def q_multimodal_wav_chunk_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import multimodal

    docs = _t(spark, sf_dir, "documents")
    assets = multimodal.synthetic_wav_assets(docs, "doc_id")
    chunks = multimodal.chunk_wav_assets(assets, chunk_samples=48)
    # n <= 128 samples -> at most 3 chunks; pack (asset, chunk) into one
    # id for the decoder, unpack after
    feats = multimodal.extract_features(
        chunks.select(
            (F.col("asset_id") * 10 + F.col("chunk_index")).alias(
                "asset_id"
            ),
            "payload",
        ),
        decode_fn="wav",
    )
    return feats.select(
        F.floor(F.col("asset_id") / 10).cast("long").alias("asset_id"),
        (F.col("asset_id") % 10).cast("int").alias("chunk_index"),
        "sample_rate",
        "n_samples",
        "sum_amp",
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
           floor(3.0 * (SELECT n_triangles FROM tri)
                 / (SELECT sum(d * (d - 1) / 2) FROM deg)
                 * 10000 + 0.5000005) / 10000 AS transitivity
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
            _r4(
                F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges")
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


# ===========================================================================
# Round-5 batch 2: record linkage, sequence export, mergeable sketches
# (heavy hitters + histogram quantiles), k-means clustering contract
# ===========================================================================


@_register(
    "fuzzy_match_parts",
    """
    WITH p AS (
      SELECT p_partkey, p_name,
             split_part(p_name, ' ', 1) || '|' || p_brand AS blk
      FROM part
    )
    SELECT a.p_partkey AS a_id, b.p_partkey AS b_id,
           CAST(levenshtein(a.p_name, b.p_name) AS INTEGER)
             AS edit_distance
    FROM p a JOIN p b ON a.blk = b.blk AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 1
    """,
    doc="Record-linkage fuzzy dedup of the part master: candidate "
    "pairs block on (first name word, brand), survivors are within 1 "
    "Levenshtein edit. The Fellegi-Sunter blocking design: the "
    "equi-join on the block key replaces the O(n^2) cross join, "
    "levenshtein is a codegen'd JVM built-in evaluated only on "
    "within-block candidates, and a hot block is an AQE skew split. "
    "Blocking selectivity is the scale lever at a 100 TB master.",
)
def q_fuzzy_match_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    blk = F.concat(
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)),
        F.lit("|"),
        F.col("p_brand"),
    )
    return joins.blocked_fuzzy_pairs(
        part, "p_partkey", "p_name", [blk], max_distance=1
    ).select(
        F.col("a_id").cast("long"),
        F.col("b_id").cast("long"),
        F.col("edit_distance").cast("int"),
    )


@_register(
    "user_event_sequences",
    """
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           array_to_string(
             (list(event_type ORDER BY ts, event_id))[1:20], ' '
           ) AS seq_head
    FROM events GROUP BY user_id
    """,
    doc="Behavioral-sequence export: each user's event-type history in "
    "strict (ts, event_id) order, truncated to the first 20 — the "
    "sequence-modeling training-data shape (next-event prediction, "
    "session embedding). ONE shuffle keyed by user_id carrying "
    "(ts, event_id, type) structs; array_sort on the collected struct "
    "gives a deterministic order without a global sort, and the "
    "truncation bounds output row width regardless of history length.",
)
def q_user_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    seq = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", "event_type"))
    )
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.array_join(
            F.slice(
                F.transform(seq, lambda s: s.getField("event_type")), 1, 20
            ),
            " ",
        ).alias("seq_head"),
    )


@_register(
    "heavy_hitters_check",
    f"""
    WITH tok AS (
      SELECT t.token FROM (
        SELECT unnest({_ORACLE_TOKENS}) AS token FROM documents
      ) t WHERE t.token <> ''
    ),
    counts AS (SELECT token, CAST(count(*) AS BIGINT) AS c
               FROM tok GROUP BY 1),
    total AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM counts)
    SELECT n AS n_tokens,
           (SELECT CAST(count(*) AS BIGINT) FROM counts, total
             WHERE c * 128 > n) AS n_heavy_exact,
           TRUE AS all_heavy_found,
           TRUE AS counts_are_lower_bounds
    FROM total
    """,
    doc="Misra-Gries heavy-hitter contract: per-partition 128-counter "
    "summaries (each partition emits <=128 rows; raw tokens never "
    "shuffle) merged by keyed sum must contain EVERY token with global "
    "frequency > n/128 — the pigeonhole guarantee (a globally heavy "
    "token is heavy in at least one partition, and MG never evicts a "
    "partition-heavy value) — and every merged count must lower-bound "
    "the exact count. The oracle recomputes n_tokens and the exact "
    "heavy set in SQL; at 100 TB the sketch replaces the full-"
    "cardinality token groupBy with an O(k x partitions) merge plus an "
    "exact recount restricted to candidates.",
)
def q_heavy_hitters_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import text as text_ops

    docs = _t(spark, sf_dir, "documents")
    tok = (
        docs.select(explode_nonempty(text_ops.tokens("text")).alias("token"))
        .filter(F.col("token") != "")
        .localCheckpoint(eager=False)  # reused: sketch pass + exact pass
    )
    k = 128
    cand = sketch.misra_gries_candidates(tok, "token", k=k).localCheckpoint(
        eager=False
    )
    exact = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    n_tokens = tok.count()
    heavy = exact.filter(F.col("c") * k > F.lit(n_tokens))
    n_heavy = heavy.count()
    n_missed = heavy.join(
        cand.withColumnRenamed("value", "token"), "token", "left_anti"
    ).count()
    n_over = (
        cand.withColumnRenamed("value", "token")
        .join(exact, "token")
        .filter(F.col("mg_count") > F.col("c"))
        .count()
    )
    return tok.agg(
        F.lit(n_tokens).cast("long").alias("n_tokens"),
        F.lit(n_heavy).cast("long").alias("n_heavy_exact"),
        F.lit(n_missed == 0).alias("all_heavy_found"),
        F.lit(n_over == 0).alias("counts_are_lower_bounds"),
    )


@_register(
    "histogram_median_rollup",
    """
    WITH h AS (
      SELECT o_orderpriority,
             CAST(floor(o_totalprice / 1000.0) AS BIGINT) AS bucket,
             CAST(count(*) AS BIGINT) AS c
      FROM orders GROUP BY 1, 2
    ),
    t AS (
      SELECT o_orderpriority, bucket,
             sum(c) OVER (PARTITION BY o_orderpriority
                          ORDER BY bucket) AS cum,
             sum(c) OVER (PARTITION BY o_orderpriority) AS n
      FROM h
    ),
    est AS (
      SELECT o_orderpriority,
             min(bucket) * 1000.0 + 500.0 AS est_median
      FROM t WHERE cum >= CAST(ceil(0.5 * n) AS BIGINT)
      GROUP BY o_orderpriority
    ),
    ex AS (
      SELECT o_orderpriority, median(o_totalprice) AS m
      FROM orders GROUP BY 1
    )
    SELECT est.o_orderpriority, est.est_median,
           abs(est.est_median - ex.m) <= 1000.0 AS within_bucket_ok
    FROM est JOIN ex USING (o_orderpriority)
    """,
    doc="Mergeable-histogram rank query: equi-width integer bucket "
    "counts per priority (partial histograms from different ingest "
    "partitions merge by plain addition — the rank-query twin of the "
    "HLL sketch contract), median estimated as the midpoint of the "
    "first bucket reaching ceil(n/2) cumulative. Integer-count "
    "arithmetic makes the estimate bit-identical across engines; the "
    "in-plan tolerance check pins it within one bucket width of the "
    "exact median. The quantile window runs over the bucket table "
    "(<=500 rows), never the raw facts.",
)
def q_histogram_median_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    width = 1000.0
    hist = sketch.histogram_counts(
        orders, ["o_orderpriority"], "o_totalprice", width
    )
    est = sketch.histogram_quantile(
        hist, ["o_orderpriority"], 0.5, width, out_col="est_median"
    )
    exact = orders.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("__m")
    )
    return est.join(exact, "o_orderpriority").select(
        "o_orderpriority",
        "est_median",
        (F.abs(F.col("est_median") - F.col("__m")) <= F.lit(width)).alias(
            "within_bucket_ok"
        ),
    )


@_register(
    "kmeans_cluster_check",
    """
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM embeddings)
             AS n_assigned,
           TRUE AS one_cell_per_vector,
           TRUE AS argmax_cosine_ok,
           TRUE AS inertia_monotone_ok
    """,
    doc="Distributed spherical k-means contract (k=10, 3 Lloyd "
    "rounds, deterministic lowest-id seeds): every vector lands in "
    "exactly one cell; the Arrow-matmul assignment is cross-validated "
    "against an independent JVM-expression cosine (zip_with dot over a "
    "broadcast centroid literal) — the assigned cell's cosine must "
    "equal the true max within 1e-9; and the per-iteration objective "
    "sum(1 - cos) must be non-increasing, Lloyd's convergence "
    "guarantee. Each training round is one corpus scan + one "
    "cell-keyed shuffle of K rows; inertia rides the same action, and "
    "only the KxDim matrix ever reaches the driver. At 100 TB this is "
    "the semantic-clustering / curriculum-binning primitive: train on "
    "a sample, assign with the same scan.",
)
def q_kmeans_cluster_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import vector

    emb = _t(spark, sf_dir, "embeddings")
    cen, inertias = vector.train_ivf_centroids(
        emb, num_centroids=10, iters=3, track_inertia=True
    )
    unit = vector._unit_rows(cen)
    assigned = vector._nearest_cells(
        emb, unit, 1, "vec_id", "embedding", "vec_id", with_sim=True
    ).select("vec_id", "cell", "sim")

    # Independent JVM-side recompute: cosine of every (vector, centroid)
    # pair via zip_with/aggregate over a broadcast centroid literal —
    # no Arrow, no numpy — reduced to each vector's true max cosine.
    cen_lit = F.array(
        *[
            F.array(*[F.lit(float(x)) for x in unit[i]])
            for i in range(unit.shape[0])
        ]
    )
    vnorm = F.sqrt(
        F.aggregate(
            "embedding",
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    best = F.array_max(
        F.transform(
            cen_lit,
            lambda c: F.aggregate(
                F.zip_with(
                    "embedding", c, lambda a, b: a.cast("double") * b
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.when(vnorm == 0, F.lit(1.0)).otherwise(vnorm),
        )
    )
    jvm_best = emb.select("vec_id", best.alias("jvm_max_cos"))

    joined = assigned.join(jvm_best, "vec_id")
    n_assigned = joined.count()
    n_dup = n_assigned - joined.select("vec_id").distinct().count()
    n_not_argmax = joined.filter(
        F.abs(F.col("jvm_max_cos") - F.col("sim")) > 1e-9
    ).count()
    monotone = all(
        b <= a + 1e-9 for a, b in zip(inertias, inertias[1:])
    )
    return emb.agg(
        F.lit(n_assigned).cast("long").alias("n_assigned"),
        F.lit(n_dup == 0).alias("one_cell_per_vector"),
        F.lit(n_not_argmax == 0).alias("argmax_cosine_ok"),
        F.lit(monotone).alias("inertia_monotone_ok"),
    )


@_register(
    "dup_span_report",
    f"""
    WITH g AS (
      SELECT d.doc_id, array_to_string(t[i+1:i+8], ' ') AS s
      FROM (SELECT doc_id, {_ORACLE_TOKENS} AS t FROM documents) d,
           UNNEST(range(greatest(len(t) - 7, 1))) AS u(i)
    ),
    c AS (SELECT s, CAST(count(*) AS BIGINT) AS cnt FROM g GROUP BY 1)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(CASE WHEN c.cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_spans,
           floor(sum(CASE WHEN c.cnt >= 2 THEN 1 ELSE 0 END)
                 / count(*) * 10000 + 0.5000005) / 10000 AS dup_frac
    FROM g JOIN c USING (s)
    GROUP BY doc_id
    """,
    doc="Duplicated-span report: per document, the fraction of word "
    "8-gram positions whose 8-gram occurs more than once in the "
    "corpus — the distributable stand-in for exact-substring dedup "
    "(Lee et al., ACL 2022): high-dup_frac docs are near-verbatim "
    "template repeats worth dropping before training. Positional "
    "8-grams hash to 8-byte keys before ANY shuffle (gram text never "
    "moves); one partial-agg groupBy builds the global span-frequency "
    "table, one hash join classifies positions, one groupBy(doc_id) "
    "folds to stats. The oracle recomputes every count on the raw "
    "gram strings.",
)
def q_dup_span_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import text as text_ops

    docs = _t(spark, sf_dir, "documents")
    stats = text_ops.dup_span_stats(docs, "doc_id", "text", n=8)
    return stats.select(
        "doc_id",
        "n_spans",
        "n_dup_spans",
        _r4(F.col("n_dup_spans") / F.col("n_spans")).alias("dup_frac"),
    )


@_register(
    "bpe_pair_step",
    f"""
    WITH w AS (
      SELECT unnest({_ORACLE_TOKENS}) AS w FROM documents
    ),
    wc AS (SELECT w, count(*) AS c FROM w WHERE w <> '' GROUP BY 1),
    p AS (
      SELECT substring(w, i, 2) AS pair, c
      FROM wc, UNNEST(range(1, length(w))) AS u(i)
      WHERE length(w) >= 2
    )
    SELECT pair, CAST(sum(c) AS BIGINT) AS n_occurrences
    FROM p GROUP BY 1
    ORDER BY n_occurrences DESC, pair
    LIMIT 20
    """,
    doc="One BPE-training pair-count round (Sennrich et al., ACL "
    "2016): the 20 most frequent adjacent character pairs, weighted "
    "by word frequency — what each tokenizer merge step maximizes. "
    "Scale shape is the WordPiece counting trick: the corpus reduces "
    "to a vocabulary-sized word-frequency table first (partial-agg "
    "groupBy), and pair enumeration runs over DISTINCT words x their "
    "counts — O(vocab x word-length), independent of corpus size. "
    "Deterministic lexicographic tie-break at the k boundary; top-k "
    "is a TakeOrderedAndProject, never a global sort.",
)
def q_bpe_pair_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import text as text_ops

    docs = _t(spark, sf_dir, "documents")
    return text_ops.bpe_pair_counts(docs, "text", top_k=20)


@_register(
    "int8_quantize_check",
    """
    WITH s AS (
      SELECT vec_id, embedding,
             127.0 / greatest(
               list_max(list_transform(embedding, x -> abs(x))), 1e-30
             ) AS sc
      FROM embeddings
    )
    SELECT vec_id,
           CAST(list_min(list_transform(embedding,
                 x -> floor(x * sc + 0.5))) AS INTEGER) AS q_min,
           CAST(list_max(list_transform(embedding,
                 x -> floor(x * sc + 0.5))) AS INTEGER) AS q_max,
           list_max(list_transform(embedding,
                 x -> abs(x - floor(x * sc + 0.5) / sc)))
             <= 1.0 / (2 * sc) + 1e-12 AS within_bound
    FROM s
    """,
    doc="Symmetric per-vector int8 quantization contract "
    "(vector.quantize_int8): quantized components must span at most "
    "[-127, 127] and reconstruction q/scale must land within half a "
    "quantization step of every original component. Row-local "
    "codegen'd expressions, zero shuffles; rounding uses the "
    "engine-portable floor(x*s + 0.5), so the oracle recomputes the "
    "EXACT same integers — at 100 TB this is the 4x ANN-corpus "
    "compression pass that runs as a pure map over the embedding "
    "table.",
)
def q_int8_quantize_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import vector

    emb = _t(spark, sf_dir, "embeddings")
    qd = vector.quantize_int8(emb, "embedding", q_col="q", scale_col="sc")
    recon_err = F.array_max(
        F.zip_with(
            "embedding",
            "q",
            lambda x, qv: F.abs(
                x.cast("double") - qv.cast("double") / F.col("sc")
            ),
        )
    )
    return qd.select(
        "vec_id",
        F.array_min("q").cast("int").alias("q_min"),
        F.array_max("q").cast("int").alias("q_max"),
        (
            recon_err <= F.lit(1.0) / (F.lit(2.0) * F.col("sc")) + F.lit(1e-12)
        ).alias("within_bound"),
    )


# ===========================================================================
# Round 5 additions: phrase mining, gaps-and-islands, co-occurrence
# lift, embedding-cluster cohesion.
# ===========================================================================


@_register(
    "pmi_bigram_phrases",
    f"""
    WITH toks AS (SELECT {_ORACLE_TOKENS} AS t FROM documents),
    uni AS (
      SELECT w, CAST(count(*) AS BIGINT) AS cw
      FROM (SELECT unnest(t) AS w FROM toks) u WHERE w <> '' GROUP BY 1
    ),
    big AS (
      SELECT t[i+1] AS w1, t[i+2] AS w2
      FROM toks, UNNEST(range(len(t) - 1)) AS u(i)
      WHERE len(t) >= 2 AND t[1] <> ''
    ),
    bigc AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS cab
      FROM big GROUP BY 1, 2
    ),
    n AS (SELECT CAST(sum(cw) AS DOUBLE) AS nt FROM uni),
    m AS (SELECT CAST(count(*) AS DOUBLE) AS mb FROM big)
    SELECT w1, w2, cab,
           floor(ln(cab * nt * nt / (mb * a.cw * b.cw)) * 10000
                 + 0.5000005) / 10000 AS pmi
    FROM bigc JOIN uni a ON bigc.w1 = a.w
              JOIN uni b ON bigc.w2 = b.w
              CROSS JOIN n CROSS JOIN m
    WHERE cab >= 5
    ORDER BY pmi DESC, w1, w2
    LIMIT 20
    """,
    doc="PMI phrase mining (word2phrase, Mikolov et al. NeurIPS 2013): "
    "adjacent-token pairs scored by pointwise mutual information "
    "ln(P(ab)/(P(a)P(b))) to surface collocations worth merging into "
    "single tokens before tokenizer training. One tokenize pass feeds "
    "both tables: unigram counts (token-keyed groupBy) and positional "
    "bigram counts (row-local transform, pair-keyed groupBy); the two "
    "corpus totals ride as broadcast scalars, and the bigram→unigram "
    "joins shuffle only vocabulary-sized count tables — document text "
    "never crosses the wire. PMI is computed from exact integer counts "
    "on both engines, so the float is bit-identical pre-rounding. At "
    "100 TB the shuffles are O(vocab + bigram-vocab), both heavy-tail "
    "bounded by the cab >= 5 support floor applied before the joins.",
)
def q_pmi_bigram_phrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import text as text_ops

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(text_ops.tokens(F.col("text")).alias("t"))
    # Both count tables are CHECKPOINTED because each is consumed more
    # than once (uni feeds the two frequency joins AND the corpus
    # total; the unfiltered bigram counts feed the support filter AND
    # the bigram total). Without the checkpoints every consumer
    # re-runs the tokenize+explode corpus scan — 5 scans instead of 2.
    uni = (
        toks.select(F.explode("t").alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cw"))
        .localCheckpoint(eager=False)
    )
    t = F.col("t")
    big = (
        toks.where((F.size(t) >= 2) & (F.element_at(t, 1) != ""))
        .select(
            explode_nonempty(
                F.transform(
                    F.sequence(F.lit(1), F.size(t) - 1),
                    lambda i: F.struct(
                        F.element_at(t, i).alias("w1"),
                        F.element_at(t, i + 1).alias("w2"),
                    ),
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
    )
    bigc_all = (
        big.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cab"))
        .localCheckpoint(eager=False)
    )
    bigc = bigc_all.where(F.col("cab") >= 5)
    nt = uni.agg(F.sum("cw").cast("double").alias("nt"))
    mb = bigc_all.agg(F.sum("cab").cast("double").alias("mb"))
    a = uni.select(F.col("w").alias("w1"), F.col("cw").alias("ca"))
    b = uni.select(F.col("w").alias("w2"), F.col("cw").alias("cb"))
    pmi = F.log(
        F.col("cab") * F.col("nt") * F.col("nt")
        / (F.col("mb") * F.col("ca") * F.col("cb"))
    )
    return (
        bigc.join(a, "w1")
        .join(b, "w2")
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(mb))
        .select("w1", "w2", "cab", _r4(pmi).alias("pmi"))
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(20)
    )


@_register(
    "order_streak_islands",
    """
    WITH m AS (
      SELECT DISTINCT o_custkey,
             CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                  AS BIGINT) AS mi
      FROM orders
    ),
    isl AS (
      SELECT o_custkey,
             mi - ROW_NUMBER() OVER (PARTITION BY o_custkey
                                     ORDER BY mi) AS grp
      FROM m
    ),
    streaks AS (
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS streak_len
      FROM isl GROUP BY o_custkey, grp
    )
    SELECT streak_len,
           CAST(count(*) AS BIGINT) AS n_streaks,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM streaks GROUP BY streak_len
    ORDER BY streak_len
    """,
    doc="Gaps-and-islands: maximal runs of consecutive active months "
    "per customer via the classic row_number-difference grouping (a "
    "run of consecutive month indexes has constant mi - row_number), "
    "folded to a streak-length histogram. Everything shuffles on "
    "o_custkey once (the distinct, the window, and the island groupBy "
    "all share the key, so the exchange is reused), then one tiny "
    "histogram agg. The month-index arithmetic is integer-exact on "
    "both engines. At 100 TB: per-customer windows over at most "
    "#distinct-months rows, no global sort until the final "
    "histogram-sized ORDER BY.",
)
def q_order_streak_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    m = orders.select(
        "o_custkey",
        (
            F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
        ).cast("long").alias("mi"),
    ).distinct()
    w = Window.partitionBy("o_custkey").orderBy("mi")
    isl = m.select(
        "o_custkey", (F.col("mi") - F.row_number().over(w)).alias("grp")
    )
    streaks = isl.groupBy("o_custkey", "grp").agg(
        F.count(F.lit(1)).alias("streak_len")
    )
    return (
        streaks.groupBy("streak_len")
        .agg(
            F.count(F.lit(1)).alias("n_streaks"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
        .orderBy("streak_len")
    )


@_register(
    "market_basket_lift",
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    freq AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS c FROM items GROUP BY 1
    ),
    n AS (SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS n_orders
          FROM items),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             CAST(count(*) AS BIGINT) AS n_both
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 3
    )
    SELECT part_a, part_b, n_both,
           floor(n_both * n_orders / (fa.c * fb.c) * 10000
                 + 0.5000005) / 10000 AS lift
    FROM pairs JOIN freq fa ON pairs.part_a = fa.l_partkey
               JOIN freq fb ON pairs.part_b = fb.l_partkey
               CROSS JOIN n
    ORDER BY lift DESC, part_a, part_b
    LIMIT 20
    """,
    doc="Market-basket co-occurrence with lift (association-rule "
    "screening): distinct (order, part) pairs self-joined on the order "
    "key with part_a < part_b, pair counts floored at support 3 "
    "BEFORE the frequency joins, lift = P(ab)/(P(a)P(b)) from exact "
    "integer counts (bit-identical across engines pre-rounding). The "
    "self-join shuffles both sides on the order key once and emits "
    "at most items-per-order-choose-2 rows per order — bounded "
    "fan-out, no cartesian risk; the lift joins touch only the "
    "support-filtered pair table against the part-keyed frequency "
    "table. The same shape computes token/document co-occurrence "
    "matrices for corpus PMI at 100 TB.",
)
def q_market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # Checkpointed: the distinct item set feeds four consumers (both
    # self-join sides, the part frequencies, the order total) — one
    # scan+distinct instead of four.
    items = (
        li.select("l_orderkey", "l_partkey")
        .distinct()
        .localCheckpoint(eager=False)
    )
    freq = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    n = items.agg(
        F.countDistinct("l_orderkey").cast("double").alias("n_orders")
    )
    a = items.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = items.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .where(F.col("n_both") >= 3)
    )
    fa = freq.select(F.col("l_partkey").alias("part_a"), F.col("c").alias("ca"))
    fb = freq.select(F.col("l_partkey").alias("part_b"), F.col("c").alias("cb"))
    lift = F.col("n_both") * F.col("n_orders") / (F.col("ca") * F.col("cb"))
    return (
        pairs.join(fa, "part_a")
        .join(fb, "part_b")
        .crossJoin(F.broadcast(n))
        .select("part_a", "part_b", "n_both", _r4(lift).alias("lift"))
        .orderBy(F.col("lift").desc(), "part_a", "part_b")
        .limit(20)
    )


@_register(
    "label_centroid_cohesion",
    """
    WITH pos AS (
      SELECT label, i, CAST(e AS DOUBLE) AS v
      FROM (SELECT label, unnest(embedding) AS e,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings)
    ),
    cen AS (
      SELECT label, list(c ORDER BY i) AS centroid
      FROM (SELECT label, i, avg(v) AS c FROM pos GROUP BY 1, 2)
      GROUP BY label
    ),
    cosv AS (
      SELECT e.label, e.vec_id,
             list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                    cen.centroid) AS cos
      FROM embeddings e JOIN cen USING (label)
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           floor(avg(cos) * 10000 + 0.5000005) / 10000 AS mean_cos,
           floor(min(cos) * 10000 + 0.5000005) / 10000 AS min_cos
    FROM cosv GROUP BY label ORDER BY label
    """,
    doc="Embedding-cluster cohesion report: per-label mean vector "
    "(posexplode → (label, position) partial-avg — the shuffle carries "
    "label x dim x partitions rows, never whole vectors), then each "
    "vector's cosine to its own label centroid via row-local zip_with "
    "fold against the label-keyed centroid join, folded to per-label "
    "mean/min cohesion. This is the semantic-outlier screening "
    "primitive for embedding-clustered training data (low min_cos "
    "labels contain mislabeled or junk members). Cross-engine floats: "
    "centroid averages and cosines involve float summation, so "
    "outputs are label-level aggregates rounded at 1e-4 — two orders "
    "above cross-engine reduction-order noise. At 100 TB the only "
    "vector-sized shuffle is the one centroid join, label-keyed.",
)
def q_label_centroid_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import vector

    emb = _t(spark, sf_dir, "embeddings")
    pos = emb.select(
        "label", F.posexplode("embedding").alias("i", "e")
    ).select("label", "i", F.col("e").cast("double").alias("v"))
    cen = (
        pos.groupBy("label", "i")
        .agg(F.avg("v").alias("c"))
        .groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("i", "c"))
            ).alias("__ic")
        )
        .select(
            "label",
            F.transform(F.col("__ic"), lambda s: s.getField("c")).alias(
                "centroid"
            ),
        )
    )
    # The centroid table is label-cardinality x dim — bounded by the
    # label vocabulary, not the corpus — so it broadcasts and the
    # vector column never enters an Exchange (gated in
    # tests/test_plan_quality.py).
    joined = emb.join(F.broadcast(cen), "label")
    cos = vector.dot(
        F.col("embedding"), F.col("centroid")
    ) / (
        vector.l2_norm(F.col("embedding")) * vector.l2_norm(F.col("centroid"))
    )
    per_vec = joined.select("label", "vec_id", cos.alias("cos"))
    return (
        per_vec.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            _r4(F.avg("cos")).alias("mean_cos"),
            _r4(F.min("cos")).alias("min_cos"),
        )
        .orderBy("label")
    )


@_register(
    "cluster_representatives",
    f"""
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
               AS cluster_id,
             doc.n_chars
      FROM documents doc
      LEFT JOIN (SELECT s AS node, least(s, min(d)) AS component
                 FROM reach GROUP BY s) l
        ON doc.doc_id = l.node
    ),
    sized AS (
      SELECT cluster_id, doc_id, n_chars,
             count(*) OVER (PARTITION BY cluster_id) AS nm,
             ROW_NUMBER() OVER (PARTITION BY cluster_id
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM labels
    )
    SELECT cluster_id, CAST(nm AS BIGINT) AS n_members,
           doc_id AS rep_doc_id, CAST(n_chars AS BIGINT) AS rep_chars
    FROM sized WHERE nm >= 2 AND rn = 1 ORDER BY cluster_id
    """,
    doc="Keep-best dedup policy on transitive near-dup clusters: for "
    "every multi-member cluster, elect the representative the corpus "
    "KEEPS — longest document, doc_id tiebreak — instead of the "
    "arbitrary min-id the raw cluster labels imply. This is the "
    "last step of the near-dedup stage in a curation pipeline "
    "(clusters → one survivor each). One cluster-keyed exchange "
    "serves both window functions (member count and rank share the "
    "partition key); the oracle recomputes clusters with a recursive "
    "CTE and the same election. At 100 TB the added cost over "
    "near_dup_clusters is a single window over (cluster_id)-keyed "
    "label rows — document text never moves.",
)
def q_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    labels = dedup.near_dup_clusters(
        docs, "doc_id", "text", n=2, min_jaccard=0.8,
        carry_cols=["n_chars"],
    )
    return (
        dedup.elect_representatives(
            labels, "doc_id", "cluster_id", "n_chars", min_members=2
        )
        .select(
            "cluster_id",
            F.col("n_members").cast("long").alias("n_members"),
            F.col("rep_id").alias("rep_doc_id"),
            F.col("rep_order").cast("long").alias("rep_chars"),
        )
        .orderBy("cluster_id")
    )


@_register(
    "mixture_budget_plan",
    f"""
    WITH per AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(list_filter({_ORACLE_TOKENS}, x -> x <> '')))
                  AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT CAST(sum(n_tokens) AS DOUBLE) AS t,
             sum(sqrt(CAST(n_tokens AS DOUBLE))) AS wsum
      FROM per
    )
    SELECT source, n_docs, n_tokens,
           floor(0.5 * t * sqrt(CAST(n_tokens AS DOUBLE)) / wsum)
             AS target_tokens,
           floor(0.5 * t * sqrt(CAST(n_tokens AS DOUBLE)) / wsum
                 / n_tokens * 10000 + 0.5000005) / 10000
             AS repeat_factor,
           least(1.0, floor(0.5 * t * sqrt(CAST(n_tokens AS DOUBLE)) / wsum
                            / n_tokens * 10000 + 0.5000005) / 10000)
             AS sample_rate
    FROM per CROSS JOIN tot
    ORDER BY source
    """,
    doc="Data-mixture budget plan (sqrt-rebalanced, the standard "
    "heavy-tail flattening between proportional and uniform; cf. "
    "multilingual sampling in XLM-R and the Pile's source weights): "
    "given a token budget of 50% of the corpus, allocate each source "
    "target_tokens proportional to sqrt(its token count), express it "
    "as a repeat_factor (>1 = upsample epochs) and a capped "
    "sample_rate consumable by deterministic hash sampling "
    "(operators.sampling). One tokenize scan folds to a "
    "source-keyed aggregate; the two corpus totals ride as one "
    "broadcast scalar row. All floats derive from exact integer "
    "counts, so both engines compute bit-identical doubles "
    "pre-rounding. At 100 TB this plan step is what turns corpus "
    "stats into the sampling knobs of the final training mix.",
)
def q_mixture_budget_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import text as text_ops

    docs = _t(spark, sf_dir, "documents")
    n_tok = F.size(F.filter(text_ops.tokens("text"), lambda x: x != ""))
    per = (
        docs.select("source", n_tok.alias("n_tok"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
        .localCheckpoint(eager=False)  # totals derive from these rows
    )
    tot = per.agg(
        F.sum("n_tokens").cast("double").alias("t"),
        F.sum(F.sqrt(F.col("n_tokens").cast("double"))).alias("wsum"),
    )
    target = (
        F.lit(0.5) * F.col("t")
        * F.sqrt(F.col("n_tokens").cast("double")) / F.col("wsum")
    )
    rf = _r4(target / F.col("n_tokens"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.floor(target).cast("double").alias("target_tokens"),
            rf.alias("repeat_factor"),
            F.least(F.lit(1.0), rf).alias("sample_rate"),
        )
        .orderBy("source")
    )


@_register(
    "gopher_quality_flags",
    """
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '[ \\t\\n\\x0b\\f\\r]+'),
                         w -> w <> '') AS words,
             string_split(text, chr(10)) AS lines,
             text
      FROM documents
    ),
    sig AS (
      SELECT doc_id,
             CAST(len(words) AS BIGINT) AS n_words,
             CAST(coalesce(list_sum(list_transform(words,
                  w -> length(w))), 0) AS DOUBLE)
               / greatest(len(words), 1) AS mwl,
             (CAST(length(text) - length(replace(text, '#', ''))
                   AS DOUBLE)
              + (length(text) - length(replace(text, '...', ''))) / 3.0)
               / greatest(len(words), 1) AS swr,
             CAST(len(list_filter(lines,
                  l -> starts_with(ltrim(l), '- ')
                    OR starts_with(ltrim(l), '* ')
                    OR starts_with(ltrim(l), '•'))) AS DOUBLE)
               / greatest(len(lines), 1) AS blf,
             CAST(len(list_filter(lines,
                  l -> ends_with(rtrim(l), '...')
                    OR ends_with(rtrim(l), '…'))) AS DOUBLE)
               / greatest(len(lines), 1) AS elf,
             CAST(len(list_filter(words,
                  w -> regexp_matches(w, '[a-zA-Z]'))) AS DOUBLE)
               / greatest(len(words), 1) AS awf,
             CAST(len(list_intersect(
                  list_distinct(list_transform(words, w -> lower(w))),
                  ['the','be','to','of','and','that','have','with']))
               AS BIGINT) AS n_stop_hits
      FROM base
    )
    SELECT doc_id, n_words,
           floor(mwl * 10000 + 0.5000005) / 10000 AS mean_word_len,
           floor(swr * 10000 + 0.5000005) / 10000 AS symbol_word_ratio,
           floor(awf * 10000 + 0.5000005) / 10000 AS alpha_word_frac,
           n_stop_hits,
           (n_words >= 50 AND n_words <= 100000
            AND mwl >= 3 AND mwl <= 10
            AND swr <= 0.1
            AND blf <= 0.9
            AND elf <= 0.3
            AND awf >= 0.8
            AND n_stop_hits >= 2) AS keep
    FROM sig
    """,
    doc="The complete Gopher quality rule set (Rae et al. 2021 "
    "appendix A1.1) as per-document flags: word-count bounds, mean "
    "word length 3-10, symbol-to-word ratio (# and ellipses), bullet/"
    "ellipsis line fractions, 80% alphabetic words, >=2 canonical "
    "stopwords. operators.text.gopher_quality_stats computes every "
    "signal in ONE row-local projection — higher-order folds over the "
    "word and line lists, no explode, no shuffle, whole-stage codegen "
    "end to end. All signals are exact integer ratios, so the keep "
    "verdicts are bit-identical across engines; only the reported "
    "float columns are rounded. At 100 TB this runs at scan speed as "
    "the first corpus gate.",
)
def q_gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import text as text_ops

    docs = _t(spark, sf_dir, "documents")
    sig = text_ops.gopher_quality_stats(docs, "doc_id", "text")
    keep = (
        (F.col("n_words") >= 50) & (F.col("n_words") <= 100000)
        & (F.col("mean_word_len") >= 3) & (F.col("mean_word_len") <= 10)
        & (F.col("symbol_word_ratio") <= 0.1)
        & (F.col("bullet_line_frac") <= 0.9)
        & (F.col("ellipsis_line_frac") <= 0.3)
        & (F.col("alpha_word_frac") >= 0.8)
        & (F.col("n_stop_hits") >= 2)
    )
    return sig.select(
        "doc_id",
        "n_words",
        _r4(F.col("mean_word_len")).alias("mean_word_len"),
        _r4(F.col("symbol_word_ratio")).alias("symbol_word_ratio"),
        _r4(F.col("alpha_word_frac")).alias("alpha_word_frac"),
        "n_stop_hits",
        keep.alias("keep"),
    )


@_register(
    "c4_line_filter",
    """
    WITH base AS (
      SELECT doc_id, string_split(text, chr(10)) AS lines, text
      FROM documents
    ),
    k AS (
      SELECT doc_id,
             CAST(len(lines) AS BIGINT) AS n_lines,
             list_filter(lines, l ->
               len(list_filter(string_split_regex(trim(l), '[ \\t\\n\\x0b\\f\\r]+'),
                               w -> w <> '')) >= 5
               AND right(rtrim(l), 1) IN ('.', '!', '?', '"', ''''))
               AS kept,
             contains(lower(text), 'lorem ipsum') AS has_lorem,
             contains(text, '{') AS has_brace
      FROM base
    )
    SELECT doc_id, n_lines,
           CAST(len(kept) AS BIGINT) AS n_kept_lines,
           CAST(coalesce(list_sum(list_transform(kept,
                l -> length(l))), 0) AS BIGINT) AS kept_chars,
           has_lorem, has_brace,
           (len(kept) >= 3 AND NOT has_lorem AND NOT has_brace) AS keep
    FROM k
    """,
    doc="C4 line-level cleaning (Raffel et al. 2020 §2.2): keep lines "
    "with >= 5 words ending in terminal punctuation; drop documents "
    "with < 3 surviving lines, a 'lorem ipsum' mention, or a curly "
    "brace. operators.text.c4_line_stats folds the line list "
    "row-locally (no explode — the per-line word counts and the "
    "kept-character sum are higher-order folds), so the filter runs "
    "at scan speed with zero exchanges, and the per-document evidence "
    "columns let audits share the scan with the filter. Integer "
    "counts only — engine-exact.",
)
def q_c4_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import text as text_ops

    docs = _t(spark, sf_dir, "documents")
    return text_ops.c4_line_stats(docs, "doc_id", "text")


@_register(
    "near_decontaminate_report",
    f"""
    WITH toks AS (
      SELECT doc_id, {_ORACLE_TOKENS} AS t FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(t[i+1:i+2], ' ') AS s
      FROM toks, UNNEST(range(greatest(len(t)-1, 1))) AS u(i)
    ),
    c_sh AS (SELECT * FROM sh WHERE doc_id % 20 <> 7),
    b_sh AS (SELECT * FROM sh WHERE doc_id % 20 = 7),
    c_sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz
             FROM c_sh GROUP BY 1),
    b_sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz
             FROM b_sh GROUP BY 1),
    inter AS (
      SELECT c.doc_id AS cid, b.doc_id AS bid, count(*) AS i
      FROM c_sh c JOIN b_sh b ON c.s = b.s
      GROUP BY 1, 2
    ),
    matched AS (
      SELECT cid, bid,
             CAST(i AS DOUBLE) / (ca.sz + cb.sz - i) AS jac
      FROM inter
      JOIN c_sz ca ON cid = ca.doc_id
      JOIN b_sz cb ON bid = cb.doc_id
      WHERE CAST(i AS DOUBLE) / (ca.sz + cb.sz - i) >= 0.8
    )
    SELECT cid AS doc_id,
           CAST(count(*) AS BIGINT) AS n_matched_bench,
           floor(max(jac) * 10000 + 0.5000005) / 10000 AS max_jaccard
    FROM matched GROUP BY cid ORDER BY doc_id
    """,
    doc="Near-duplicate decontamination report: corpus documents whose "
    "bigram-set Jaccard against ANY benchmark document (every 20th "
    "doc as the stand-in eval set) reaches 0.8 — the FUZZY "
    "decontamination pass run alongside exact n-gram overlap "
    "(operators.dedup.decontaminate) because light paraphrases evade "
    "exact n-gram membership. Dataflow is the bipartite twin of "
    "ngram_jaccard_pairs: both sides shingle row-locally and hash to "
    "8 bytes, the inverted-index join keys on the shingle hash, "
    "intersection counts aggregate on (corpus, bench) pairs, and the "
    "size join applies the threshold — document text never shuffles. "
    "At 100 TB the benchmark side is a fixed eval set (thousands of "
    "docs), so its shingle table broadcasts and the corpus-side cost "
    "is one scan + one (hash)-keyed aggregation.",
)
def q_near_decontaminate_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    sh = (
        dedup.with_shingles(
            docs.select("doc_id", "text"), "text", n=2, out_col="sh"
        )
        .select("doc_id", explode_nonempty("sh").alias("s"))
        .select("doc_id", F.xxhash64("s").alias("h"))
        .localCheckpoint(eager=False)  # feeds both sides + both sizes
    )
    c_sh = sh.where(F.col("doc_id") % 20 != 7)
    b_sh = sh.where(F.col("doc_id") % 20 == 7).select(
        F.col("doc_id").alias("bid"), "h"
    )
    c_sz = c_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("ca"))
    b_sz = b_sh.groupBy("bid").agg(F.count(F.lit(1)).alias("cb"))
    inter = (
        c_sh.join(b_sh, "h")
        .groupBy("doc_id", "bid")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    jac = F.col("i") / (F.col("ca") + F.col("cb") - F.col("i"))
    matched = (
        inter.join(c_sz, "doc_id")
        .join(b_sz, "bid")
        .where(jac >= 0.8)
        .select("doc_id", "bid", jac.alias("jac"))
    )
    return (
        matched.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_matched_bench"),
            _r4(F.max("jac")).alias("max_jaccard"),
        )
        .orderBy("doc_id")
    )


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
    "with a recursive CTE and the same md5 thresholds.",
)
def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import sampling

    docs = _t(spark, sf_dir, "documents")
    cl = dedup.near_dup_clusters(
        docs, "doc_id", "text", n=2, min_jaccard=0.8
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
    "multi_horizon_features",
    """
    WITH o AS (
      SELECT o_custkey, o_orderkey,
             CAST(CAST(o_orderdate AS DATE) - DATE '1992-01-01'
                  AS BIGINT) AS d,
             CAST(o_totalprice AS DOUBLE) AS price
      FROM orders
    )
    SELECT o_custkey, o_orderkey,
           CAST(count(*) OVER w30 AS BIGINT) AS n_orders_30d,
           CAST(count(*) OVER w90 AS BIGINT) AS n_orders_90d,
           CAST(count(*) OVER w365 AS BIGINT) AS n_orders_365d,
           floor(sum(price) OVER w365 * 100 + 0.50005) / 100
             AS revenue_365d
    FROM o
    WINDOW
      w30 AS (PARTITION BY o_custkey ORDER BY d
              RANGE BETWEEN 29 PRECEDING AND CURRENT ROW),
      w90 AS (PARTITION BY o_custkey ORDER BY d
              RANGE BETWEEN 89 PRECEDING AND CURRENT ROW),
      w365 AS (PARTITION BY o_custkey ORDER BY d
               RANGE BETWEEN 364 PRECEDING AND CURRENT ROW)
    """,
    doc="Feature-store style multi-horizon trailing aggregates: for "
    "every order, the same customer's order count over trailing "
    "30/90/365-day windows plus trailing-year revenue — the "
    "point-in-time-correct feature shape ML training joins against "
    "(no leakage: each row sees only history up to itself). All four "
    "features are RANGE-frame windows over ONE customer-keyed "
    "exchange (same partition key, same sort — Spark computes all "
    "horizons in a single Window operator chain without re-shuffling). "
    "Day arithmetic is integer (days since epoch), so frames are "
    "engine-exact; only the revenue float is rounded. At 100 TB this "
    "shape replaces the N-self-joins a naive feature backfill runs.",
)
def q_multi_horizon_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    o = orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01"))
        .cast("long")
        .alias("d"),
        F.col("o_totalprice").cast("double").alias("price"),
    )
    base = Window.partitionBy("o_custkey").orderBy("d")
    w30 = base.rangeBetween(-29, 0)
    w90 = base.rangeBetween(-89, 0)
    w365 = base.rangeBetween(-364, 0)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.count(F.lit(1)).over(w30).alias("n_orders_30d"),
        F.count(F.lit(1)).over(w90).alias("n_orders_90d"),
        F.count(F.lit(1)).over(w365).alias("n_orders_365d"),
        _r2(F.sum("price").over(w365)).alias("revenue_365d"),
    )


@_register(
    "event_rate_anomalies",
    """
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    scored AS (
      SELECT event_type, h, c,
             avg(CAST(c AS DOUBLE)) OVER w AS mu,
             stddev_samp(CAST(c AS DOUBLE)) OVER w AS sd,
             count(*) OVER w AS n_hist
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY h
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, h AS hour_ts, c AS n_events,
           floor((c - mu) / sd * 10000 + 0.5000005) / 10000 AS zscore
    FROM scored
    WHERE n_hist >= 12 AND sd > 0 AND abs((c - mu) / sd) > 3
    ORDER BY event_type, hour_ts
    """,
    doc="Event-rate anomaly detection: hourly counts per event type, "
    "each hour z-scored against its own trailing 24-hour window "
    "(PRECEDING-only frame — point-in-time correct, an hour never "
    "scores against itself or the future), flag |z| > 3 with a "
    "12-hour minimum history so cold starts don't alert. The raw "
    "event stream folds to the hour×type table in one partial-agg "
    "groupBy; the window then runs over that TINY aggregate, keyed "
    "by event_type — this aggregate-then-window layering is the only "
    "shape that survives 100 TB of events, and it is exactly how the "
    "streaming twin would run on watermarked tumbling windows. "
    "Counts are integers; mean/std divide exact sums, rounded 1e-4.",
)
def q_event_rate_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).alias("c"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-24, -1)
    )
    cd = F.col("c").cast("double")
    scored = hourly.select(
        "event_type",
        "h",
        "c",
        F.avg(cd).over(w).alias("mu"),
        F.stddev_samp(cd).over(w).alias("sd"),
        F.count(F.lit(1)).over(w).alias("n_hist"),
    )
    z = (F.col("c") - F.col("mu")) / F.col("sd")
    return (
        scored.where(
            (F.col("n_hist") >= 12) & (F.col("sd") > 0) & (F.abs(z) > 3)
        )
        .select(
            "event_type",
            F.col("h").alias("hour_ts"),
            F.col("c").alias("n_events"),
            _r4(z).alias("zscore"),
        )
        .orderBy("event_type", "hour_ts")
    )


@_register(
    "gopher_keep_rate_by_source",
    """
    WITH base AS (
      SELECT source,
             list_filter(string_split_regex(text, '[ \\t\\n\\x0b\\f\\r]+'),
                         w -> w <> '') AS words,
             string_split(text, chr(10)) AS lines,
             text
      FROM documents
    ),
    sig AS (
      SELECT source,
             CAST(len(words) AS BIGINT) AS n_words,
             CAST(coalesce(list_sum(list_transform(words,
                  w -> length(w))), 0) AS DOUBLE)
               / greatest(len(words), 1) AS mwl,
             (CAST(length(text) - length(replace(text, '#', ''))
                   AS DOUBLE)
              + (length(text) - length(replace(text, '...', ''))) / 3.0)
               / greatest(len(words), 1) AS swr,
             CAST(len(list_filter(lines,
                  l -> starts_with(ltrim(l), '- ')
                    OR starts_with(ltrim(l), '* ')
                    OR starts_with(ltrim(l), '•'))) AS DOUBLE)
               / greatest(len(lines), 1) AS blf,
             CAST(len(list_filter(lines,
                  l -> ends_with(rtrim(l), '...')
                    OR ends_with(rtrim(l), '…'))) AS DOUBLE)
               / greatest(len(lines), 1) AS elf,
             CAST(len(list_filter(words,
                  w -> regexp_matches(w, '[a-zA-Z]'))) AS DOUBLE)
               / greatest(len(words), 1) AS awf,
             CAST(len(list_intersect(
                  list_distinct(list_transform(words, w -> lower(w))),
                  ['the','be','to','of','and','that','have','with']))
               AS BIGINT) AS n_stop_hits
      FROM base
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n_words >= 50 AND n_words <= 100000
                 AND mwl >= 3 AND mwl <= 10 AND swr <= 0.1
                 AND blf <= 0.9 AND elf <= 0.3 AND awf >= 0.8
                 AND n_stop_hits >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_keep,
           floor(avg(CASE WHEN n_words >= 50 AND n_words <= 100000
                 AND mwl >= 3 AND mwl <= 10 AND swr <= 0.1
                 AND blf <= 0.9 AND elf <= 0.3 AND awf >= 0.8
                 AND n_stop_hits >= 2 THEN 1.0 ELSE 0.0 END) * 10000
                 + 0.5000005) / 10000 AS keep_rate
    FROM sig GROUP BY source ORDER BY source
    """,
    doc="Corpus-governance rollup: per-source document counts, Gopher "
    "keep counts and keep rate — the dashboard that decides which "
    "ingest sources are worth their storage before any expensive "
    "dedup runs. One scan: the row-local gopher_quality_stats "
    "projection folds straight into a source-keyed partial aggregate "
    "(no per-doc rows survive the map side). Keep verdicts are "
    "integer-ratio exact; only the rate is rounded.",
)
def q_gopher_keep_rate_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import text as text_ops

    docs = _t(spark, sf_dir, "documents")
    sig = text_ops.gopher_quality_stats(
        docs.select(F.col("source").alias("doc_key"), "text"),
        "doc_key",
        "text",
    )
    keep = (
        (F.col("n_words") >= 50) & (F.col("n_words") <= 100000)
        & (F.col("mean_word_len") >= 3) & (F.col("mean_word_len") <= 10)
        & (F.col("symbol_word_ratio") <= 0.1)
        & (F.col("bullet_line_frac") <= 0.9)
        & (F.col("ellipsis_line_frac") <= 0.3)
        & (F.col("alpha_word_frac") >= 0.8)
        & (F.col("n_stop_hits") >= 2)
    )
    return (
        sig.select(F.col("doc_key").alias("source"), keep.alias("k"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("k").cast("int")).cast("long").alias("n_keep"),
            _r4(F.avg(F.col("k").cast("double"))).alias("keep_rate"),
        )
        .orderBy("source")
    )


@_register(
    "multimodal_bmp_resize_check",
    """
    WITH oi AS (SELECT i FROM generate_series(0, 3) t(i)),
         oj AS (SELECT j FROM generate_series(0, 7) t(j)),
         oc AS (SELECT c FROM generate_series(0, 2) t(c)),
    per AS (
      SELECT d.doc_id,
             (d.doc_id * 31
              + ((t.i * (3 + d.doc_id % 7)) // 4)
                * ((4 + d.doc_id % 13) * 3)
              + ((u.j * (4 + d.doc_id % 13)) // 8) * 3
              + v.c) % 256 AS px
      FROM documents d, oi t, oj u, oc v
    )
    SELECT doc_id AS asset_id,
           CAST(8 AS INT) AS width,
           CAST(4 AS INT) AS height,
           CAST(24 AS INT) AS bits_per_pixel,
           CAST(32 AS BIGINT) AS n_pixels,
           CAST(sum(px) AS BIGINT) AS sum_pixel
    FROM per GROUP BY doc_id
    """,
    doc="REAL image transform contract: synthetic 24-bit BMPs are "
    "nearest-neighbor resized to 8x4 by the pure-NumPy codec "
    "(operators.multimodal.resize_bmp_assets — decode, index-map "
    "src = (dst * src_len) // dst_len, re-encode with row padding), "
    "then the RESIZED payload is re-decoded by the BMP feature "
    "extractor. The oracle recomputes the exact resized pixel-byte "
    "sum arithmetically from the generating formula + the same "
    "index map — a wrong stride, orientation flip, or off-by-one in "
    "the NN mapping changes sum_pixel and fails the hash. This "
    "closes the decode → transform → re-encode → decode loop with "
    "blobs never leaving executors.",
)
def q_multimodal_bmp_resize_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import multimodal

    docs = _t(spark, sf_dir, "documents")
    assets = multimodal.synthetic_bmp_assets(docs, "doc_id")
    resized = multimodal.resize_bmp_assets(assets, out_w=8, out_h=4)
    return multimodal.extract_features(resized, decode_fn="bmp")


@_register(
    "snapshot_diff_orders",
    """
    WITH old AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE CAST(o_orderdate AS DATE) < DATE '1997-01-01'
    ),
    new AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 97 = 0 THEN 'X'
                  ELSE o_orderstatus END AS o_orderstatus,
             o_totalprice
      FROM orders
      WHERE CAST(o_orderdate AS DATE) < DATE '1998-01-01'
    ),
    j AS (
      SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS k,
             CASE WHEN o.o_orderkey IS NULL THEN 'added'
                  WHEN n.o_orderkey IS NULL THEN 'removed'
                  WHEN o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus
                   AND o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
                  THEN 'unchanged' ELSE 'changed' END AS change_type
      FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    )
    SELECT change_type, CAST(count(*) AS BIGINT) AS n_rows
    FROM j GROUP BY change_type ORDER BY change_type
    """,
    doc="Snapshot diff audit (operators.incremental.snapshot_diff): "
    "yesterday's load (orders before 1997) vs today's (orders before "
    "1998, with a planted status mutation on every 97th key) — one "
    "key-partitioned full outer join classifies every key "
    "added/removed/changed/unchanged with null-safe column compares, "
    "folded to the audit histogram. This is the 'what did this rerun "
    "change' primitive behind CDC validation and SCD backfills; at "
    "100 TB it is one co-partitioned shuffle per side and the planted "
    "mutation proves the changed-detection path end to end.",
)
def q_snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import incremental

    orders = _t(spark, sf_dir, "orders")
    old = orders.where(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("date")
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")
    new = (
        orders.where(
            F.col("o_orderdate") < F.lit("1998-01-01").cast("date")
        )
        .select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 97 == 0, F.lit("X"))
            .otherwise(F.col("o_orderstatus"))
            .alias("o_orderstatus"),
            "o_totalprice",
        )
    )
    diff = incremental.snapshot_diff(
        old, new, ["o_orderkey"], ["o_orderstatus", "o_totalprice"]
    )
    return (
        diff.groupBy("change_type")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("change_type")
    )


@_register(
    "cm_sketch_check",
    """
    WITH exact AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS exact_count
      FROM lineitem GROUP BY 1
      ORDER BY exact_count DESC, l_partkey LIMIT 10
    ),
    probes AS (
      SELECT e.l_partkey, e.exact_count, t.i AS d,
             substring(md5(concat(t.i, ':',
                       CAST(e.l_partkey AS VARCHAR))), 1, 3) AS bucket
      FROM exact e, generate_series(0, 3) t(i)
    ),
    sk AS (
      SELECT i AS d,
             substring(md5(concat(i, ':',
                       CAST(l_partkey AS VARCHAR))), 1, 3) AS bucket,
             CAST(count(*) AS BIGINT) AS c
      FROM lineitem, generate_series(0, 3) t(i)
      GROUP BY 1, 2
    ),
    est AS (
      SELECT p.l_partkey, any_value(p.exact_count) AS exact_count,
             min(COALESCE(sk.c, 0)) AS cm_estimate
      FROM probes p LEFT JOIN sk USING (d, bucket)
      GROUP BY p.l_partkey
    )
    SELECT l_partkey, exact_count, cm_estimate,
           cm_estimate >= exact_count AS no_underestimate
    FROM est ORDER BY exact_count DESC, l_partkey
    """,
    doc="Count-min sketch contract (operators.sketch.cm_sketch / "
    "cm_estimate; Cormode-Muthukrishnan 2005): a 4x4096 relational "
    "sketch over lineitem part keys — at most depth x width rows "
    "survive the partial agg no matter the input size, and "
    "partition/day sketches merge by keyed sum — probed for the 10 "
    "most frequent parts. The oracle rebuilds the identical sketch "
    "(md5 hex-prefix buckets, engine-portable) and the driver hash "
    "pins every estimate; the no_underestimate column is the CM "
    "guarantee (min over rows can never undercount). Integer-only.",
)
def q_cm_sketch_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    exact = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .orderBy(F.col("exact_count").desc(), "l_partkey")
        .limit(10)
        .localCheckpoint(eager=False)  # feeds probes + final join
    )
    sk = sketch.cm_sketch(li, "l_partkey", depth=4, hex_digits=3)
    est = sketch.cm_estimate(
        sk, exact.select("l_partkey"), "l_partkey", depth=4, hex_digits=3
    )
    return (
        exact.join(est, "l_partkey")
        .select(
            "l_partkey",
            "exact_count",
            "cm_estimate",
            (F.col("cm_estimate") >= F.col("exact_count")).alias(
                "no_underestimate"
            ),
        )
        .orderBy(F.col("exact_count").desc(), "l_partkey")
    )


@_register(
    "flag_propagation_near_dups",
    f"""
    WITH toks AS (
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
    sym AS (SELECT a AS s, d FROM (SELECT a, b AS d FROM pairs) x(a, d)
            UNION SELECT b AS s, a AS d FROM pairs),
    seeds AS (SELECT doc_id FROM documents WHERE doc_id % 31 = 0),
    hop1 AS (
      SELECT DISTINCT sym.d AS doc_id
      FROM sym JOIN seeds ON sym.s = seeds.doc_id
    ),
    hop2 AS (
      SELECT DISTINCT sym.d AS doc_id
      FROM sym JOIN hop1 ON sym.s = hop1.doc_id
    ),
    lab AS (
      SELECT doc_id, 0 AS hop FROM seeds
      UNION ALL SELECT doc_id, 1 FROM hop1
      UNION ALL SELECT doc_id, 2 FROM hop2
    )
    SELECT doc_id, CAST(min(hop) AS INT) AS hop
    FROM lab GROUP BY doc_id ORDER BY doc_id
    """,
    doc="Seeded flag propagation over the near-duplicate graph: docs "
    "flagged by an upstream signal (every 31st doc as the stand-in "
    "seed set — in production, known-spam / known-benchmark / "
    "known-toxic ids) spread their flag to near-duplicates within 2 "
    "hops, labeling each reached doc with its minimum hop distance. "
    "This is the semi-supervised corpus-labeling primitive: a cheap "
    "seed list plus the similarity graph recovers paraphrase "
    "families that evade per-doc classifiers. Two unrolled "
    "edge-join rounds (BFS frontier joins, each one keyed shuffle of "
    "id pairs) — for unbounded-depth closure use "
    "near_dup_clusters' O(log n) star rounds instead; bounded-hop "
    "propagation is the right tool when flags should NOT cross an "
    "entire weakly-connected mega-cluster.",
)
def q_flag_propagation_near_dups(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(
        docs.select("doc_id", "text"), "doc_id", "text", n=2,
        min_jaccard=0.8,
    ).select("a", "b")
    sym = pairs.union(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=False)  # frontier joins reuse the edge set
    seeds = docs.where(F.col("doc_id") % 31 == 0).select("doc_id")
    hop1 = (
        sym.join(seeds, sym["a"] == seeds["doc_id"])
        .select(F.col("b").alias("doc_id"))
        .distinct()
    )
    hop2 = (
        sym.join(hop1, sym["a"] == hop1["doc_id"])
        .select(F.col("b").alias("doc_id"))
        .distinct()
    )
    lab = (
        seeds.select("doc_id", F.lit(0).alias("hop"))
        .unionAll(hop1.select("doc_id", F.lit(1).alias("hop")))
        .unionAll(hop2.select("doc_id", F.lit(2).alias("hop")))
    )
    return (
        lab.groupBy("doc_id")
        .agg(F.min("hop").cast("int").alias("hop"))
        .orderBy("doc_id")
    )


@_register(
    "semdedup_check",
    """
    SELECT (SELECT CAST(count(*) AS BIGINT)
            FROM embeddings x JOIN embeddings y
              ON x.embedding = y.embedding AND x.vec_id < y.vec_id)
             AS n_exact_dup_pairs,
           TRUE AS exact_pairs_all_found,
           TRUE AS pairs_verified
    """,
    doc="SemDeDup contract (operators.vector.semantic_dedup_pairs; "
    "Abbas et al. 2023): spherical-k-means cells confine the "
    "quadratic cosine comparison to cell-sized blocks. The oracle "
    "counts EXACT duplicate vector pairs in SQL (identical float "
    "arrays); the driver-checked flags pin (a) every exact pair "
    "appears in the SemDeDup output — identical vectors share an "
    "argmax cell under the deterministic tie-break, so the recall "
    "floor is structural, and (b) every emitted pair's cosine, "
    "independently recomputed from the RAW embeddings via a zip_with "
    "fold (not the join's dot), reaches the 0.95 threshold. The "
    "complementary hyperplane-bucket variant is "
    "embedding_near_dup_check; SemDeDup exists because random "
    "hyperplanes can split a dense semantic cluster across buckets.",
)
def q_semdedup_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import vector

    emb = _t(spark, sf_dir, "embeddings")
    pairs = vector.semantic_dedup_pairs(emb, threshold=0.95).localCheckpoint(
        eager=False
    )

    exact = (
        emb.alias("x")
        .join(
            emb.alias("y"),
            (F.col("x.embedding") == F.col("y.embedding"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .select(
            F.col("x.vec_id").alias("a"), F.col("y.vec_id").alias("b")
        )
    )
    n_exact = exact.count()
    n_missing = exact.join(pairs, ["a", "b"], "left_anti").count()

    # Independent verification: recompute each pair's cosine from the
    # raw embedding arrays with zip_with folds (no shared subtree with
    # the operator's dot-product join).
    def raw(side):
        return emb.select(
            F.col("vec_id").alias(side),
            F.col("embedding").alias(f"__e_{side}"),
        )

    dd = lambda c: F.aggregate(  # noqa: E731
        c, F.lit(0.0), lambda acc, x: acc + x
    )
    rechecked = (
        pairs.join(raw("a"), "a")
        .join(raw("b"), "b")
        .select(
            (
                dd(
                    F.zip_with(
                        "__e_a",
                        "__e_b",
                        lambda p, q: p.cast("double") * q.cast("double"),
                    )
                )
                / (
                    F.sqrt(
                        dd(
                            F.transform(
                                "__e_a",
                                lambda p: p.cast("double") * p.cast("double"),
                            )
                        )
                    )
                    * F.sqrt(
                        dd(
                            F.transform(
                                "__e_b",
                                lambda q: q.cast("double") * q.cast("double"),
                            )
                        )
                    )
                )
            ).alias("__cos")
        )
    )
    n_below = rechecked.filter(F.col("__cos") < 0.95 - 1e-9).count()
    return emb.agg(
        F.lit(n_exact).cast("long").alias("n_exact_dup_pairs"),
        F.lit(n_missing == 0).alias("exact_pairs_all_found"),
        F.lit(n_below == 0).alias("pairs_verified"),
    )


@_register(
    "dsir_importance_weights",
    f"""
    WITH toks AS (
      SELECT doc_id, lang, t.w
      FROM (SELECT doc_id, lang,
                   list_filter({_ORACLE_TOKENS}, x -> x <> '') AS tt
            FROM documents) d,
           UNNEST(d.tt) AS t(w)
    ),
    uc AS (
      SELECT w, CAST(count(*) AS BIGINT) AS c_all,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c_en
      FROM toks GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(c_all) AS DOUBLE) AS n_all,
             CAST(sum(c_en) AS DOUBLE) AS n_en,
             CAST(count(*) AS DOUBLE) AS v
      FROM uc
    ),
    scored AS (
      SELECT t.doc_id,
             CAST(count(*) AS BIGINT) AS n_tokens,
             avg(ln((uc.c_en + 1) / (tot.n_en + tot.v))
                 - ln((uc.c_all + 1) / (tot.n_all + tot.v))) AS wt
      FROM toks t JOIN uc USING (w) CROSS JOIN tot
      GROUP BY t.doc_id
    )
    SELECT doc_id, n_tokens,
           floor(wt * 10000 + 0.5000005) / 10000 AS dsir_weight
    FROM scored ORDER BY dsir_weight DESC, doc_id LIMIT 20
    """,
    doc="DSIR importance weights (Xie et al., 'Data Selection for "
    "Language Models via Importance Resampling', NeurIPS 2023), "
    "unigram variant: per document, the mean log-likelihood ratio "
    "between a TARGET-domain LM (English docs as the stand-in "
    "target) and the full-corpus LM, both add-one-smoothed unigram "
    "models trained in the SAME token-keyed aggregate (one pass "
    "computes c_all and c_en per token). High-weight docs read like "
    "the target domain and get sampled into the mix. Shuffles: one "
    "vocab-keyed count, one (doc, token)->vocab hash join, one "
    "doc-keyed fold — documents never move, the two LM totals ride "
    "as one broadcast scalar row, and the top-20 is a "
    "TakeOrderedAndProject on the ROUNDED weight (floats from exact "
    "integer counts; only the per-doc mean's summation order is "
    "engine-dependent, far below the 1e-4 rounding).",
)
def q_dsir_importance_weights(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import text as text_ops

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.filter(text_ops.tokens("text"), lambda x: x != "")
        ).alias("w"),
    )
    uc = (
        toks.groupBy("w")
        .agg(
            F.count(F.lit(1)).alias("c_all"),
            F.count_if(F.col("lang") == "en").alias("c_en"),
        )
        .localCheckpoint(eager=False)  # feeds the join AND the totals
    )
    tot = uc.agg(
        F.sum("c_all").cast("double").alias("n_all"),
        F.sum("c_en").cast("double").alias("n_en"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    term = F.log(
        (F.col("c_en") + 1) / (F.col("n_en") + F.col("v"))
    ) - F.log((F.col("c_all") + 1) / (F.col("n_all") + F.col("v")))
    return (
        toks.join(uc, "w")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            _r4(F.avg(term)).alias("dsir_weight"),
        )
        .orderBy(F.col("dsir_weight").desc(), "doc_id")
        .limit(20)
    )


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
    doc="Interval×interval OVERLAP join with NO equi-key — the shape "
    "that naively demands an inequality cross join (quadratic, "
    "unshuffleable). Implemented as a GRID-BUCKETED join: each "
    "3-day order window explodes to the (≤2) week cells it covers, "
    "cells equi-join (shuffling 8-byte bucket keys), the true "
    "overlap predicate filters inside cells, and each pair is "
    "emitted EXACTLY once by keeping only the first cell both "
    "intervals share (bucket == max of the two start buckets) — no "
    "distinct pass. Cost is O(pairs-per-cell), not O(|A|·|B|); cell "
    "width trades replication (window/cell) against cell "
    "population, and AQE rebalances hot weeks. The oracle runs the "
    "naive inequality join, pinning that bucketing loses nothing.",
)
def q_interval_overlap_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")

    def wins(pri: str, pre: str) -> DataFrame:
        return orders.where(F.col("o_orderpriority") == pri).select(
            F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01"))
            .cast("long")
            .alias(f"{pre}sd"),
            F.col("o_totalprice").alias(f"{pre}p"),
        )

    a = wins("1-URGENT", "a").withColumn(
        "aed", F.col("asd") + 3
    )
    b = wins("2-HIGH", "b").withColumn("bed", F.col("bsd") + 3)
    return (
        joins.interval_overlap_join(
            a, b, "asd", "aed", "bsd", "bed", cell=7
        )
        .groupBy(
            F.floor(F.col("asd") / 7).cast("long").alias("wk_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            _r2(F.sum(F.col("ap") + F.col("bp"))).alias("paired_value"),
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


@_register(
    "kcore_trade_graph",
    """
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
    """,
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
    return core.select(
        "node",
        F.when(F.col("node") % 2 == 0, "customer")
        .otherwise("supplier")
        .alias("node_type"),
        "degree",
    )


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

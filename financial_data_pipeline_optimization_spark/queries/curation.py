"""Text cleaning, sampling/splitting, cluster labels, quality checks (split from the original queries.py; registration
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
    doc="Transitive near-dup clusters: similarity pairs → connected "
    "components (large-star/small-star, O(log n) rounds, lineage "
    "truncated per round) → every doc labeled with its cluster's min "
    "id. Oracle computes the same closure with a recursive CTE. The "
    "default pair source is AUTO (r15): a linear fan-out probe keeps "
    "the exact inverted index under a measured candidate budget and "
    "switches to the banded LSH join beyond it — at driver SFs the "
    "gate picks exact (fan-out ~7e4-7e6 vs the 5e7 budget), so the "
    "oracle compares against the exact closure; at the r14 skewed "
    "500k-doc corpus (fan-out ~6e10) it takes the LSH path that "
    "finishes in ~35 s instead of the exact DNF "
    "(tests/test_dedup.py pins the gate both ways; "
    "tests/test_graph.py pins LSH-refines-exact).",
)
def q_near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return dedup.near_dup_clusters(
        docs, "doc_id", "text", n=2, min_jaccard=0.8, materialize=False
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



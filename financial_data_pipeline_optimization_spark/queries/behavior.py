"""Behavioral analytics, time-series gap handling and corpus/ops
profiling driver checks (peeled from ``warehouse.py`` — the VERDICT
r7/r8 "continue peeling" hygiene item — with the same
position-preserving SPECS pattern as ``vector_checks``/``media``/
``ranking``: REGISTRATION ORDER IS LOAD-BEARING for these pre-split
names, so this module only collects ``QuerySpec``s into ``SPECS`` and
``warehouse.py`` appends them into ``_REGISTRY`` at their original
positions)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from financial_data_pipeline_optimization_spark.operators import joins, timeseries
from financial_data_pipeline_optimization_spark.queries._registry import (
    QuerySpec,
    _r2,
    _r4,
    _t,
)
from financial_data_pipeline_optimization_spark.queries.documents import (
    _ORACLE_TOKENS,
)
from financial_data_pipeline_optimization_spark.queries.finance import (
    _TS_W,
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
    "iterates. Exact-closure-sensitive (r16): the near-dedup stage "
    "runs with on_budget_exceeded='error', so past the exact fan-out "
    "budget the funnel raises instead of silently reporting the "
    "finer LSH clustering's survivor count as exact; at that scale "
    "pass pair_source='lsh' explicitly.",
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



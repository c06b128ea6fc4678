"""Warehouse maintenance, SCD2, ANN recall contracts, LLM-curation ops (split from the original queries.py; registration
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

from financial_data_pipeline_optimization_spark.queries.vector_checks import (
    SPECS as _VEC_SPECS,
)
from financial_data_pipeline_optimization_spark.queries.media import (
    SPECS as _MEDIA_SPECS,
)
from financial_data_pipeline_optimization_spark.queries.ranking import (
    SPECS as _RANK_SPECS,
)
from financial_data_pipeline_optimization_spark.queries.behavior import (
    SPECS as _BEHAV_SPECS,
)
from financial_data_pipeline_optimization_spark.queries.documents import (
    _ORACLE_TOKENS,
)
from financial_data_pipeline_optimization_spark.queries.breadth import (
    _ORACLE_TOKENS_D,
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
    nd AS (
      SELECT GREATEST(8, CAST(floor(count(*) / 2500.0) AS BIGINT))
               AS n_shards
      FROM documents
    ),
    chunks AS (
      SELECT doc_id,
             unnest(range(0, greatest(1,
               CAST(ceil((n - 8) / 32.0) AS BIGINT)))) AS ci,
             t, n
      FROM base
    ),
    sized AS (
      SELECT CAST(doc_id % n_shards AS INT) AS shard,
             doc_id,
             CAST(ci AS INT) AS chunk_index,
             CAST(len(list_slice(t, CAST(ci * 32 + 1 AS INT),
                                 CAST(ci * 32 + 40 AS INT))) AS INT)
               AS n_chunk_tokens
      FROM chunks, nd
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
    "cumsum; one shuffle on the shard key. The shard count is DERIVED "
    "FROM THE DATA (greatest(8, n_docs/2500), mirrored in the oracle): "
    "shards bound the packing window's parallelism, so a fixed count "
    "caps the stage at that many tasks regardless of corpus size — "
    "~2500 docs/shard keeps tasks output-file-sized (the "
    "operators.text.pack_chunks sizing rule) at every scale: 8 at the "
    "driver SFs, ~200 at the x100 replicated corpus, thousands at "
    "100 TB. n_docs rides as a broadcast scalar, never a collect.",
)
def q_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import text as text_ops

    docs = _t(spark, sf_dir, "documents")
    nd = docs.agg(
        F.greatest(
            F.lit(8).cast("long"),
            F.floor(F.count(F.lit(1)) / F.lit(2500.0)).cast("long"),
        ).alias("__n_shards")
    )
    # chunk_token_counts, not chunk_tokens: packing reads only the
    # per-chunk token COUNT, which is arithmetic on the doc's token
    # count — the full-array twin duplicated the token data onto
    # every chunk row (~5× here, k× in general) just to size a slice
    # of it, the measured dominant cost of this query at ×100.
    chunks = (
        text_ops.chunk_token_counts(
            docs, "doc_id", "text", chunk_size=40, overlap=8
        )
        .crossJoin(F.broadcast(nd))
        .withColumn(
            "shard",
            F.pmod(F.col("doc_id"), F.col("__n_shards")).cast("int"),
        )
        .drop("__n_shards")
    )
    packed = text_ops.pack_chunks(
        chunks, "shard", ["doc_id", "chunk_index"], "n_chunk_tokens", 200
    )
    return packed.select(
        "shard", "doc_id", "chunk_index", "n_chunk_tokens", "bin_id"
    )


# ANN recall contracts live in queries.vector_checks (split, VERDICT
# r6 #8); appended HERE so the registry sequence matches the pre-split
# single-file order exactly.
for _n in (
    "knn_lsh_recall_check",
    "knn_pq_recall_check",
    "knn_ivf_recall_check",
):
    _REGISTRY.append(_VEC_SPECS[_n])

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
    "of them (derived 8 bands x 8 rows at t=0.8: J=0.85 detected "
    "with p~0.93, J->1 with p->1). The oracle recomputes the exact "
    "pair count in SQL, so "
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
    "incremental_second_batch_check",
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
    exact_cross AS (
      SELECT a, b
      FROM pairs JOIN sizes sa ON a = sa.doc_id
                 JOIN sizes sb ON b = sb.doc_id
      WHERE CAST(inter AS DOUBLE)/(sa.sz + sb.sz - inter) >= 0.8
        AND (a % 2) <> (b % 2)
    )
    SELECT CAST(count(*) AS BIGINT) AS n_exact_cross_pairs,
           TRUE AS incremental_subset_ok,
           TRUE AS incremental_matches_batch,
           TRUE AS recall_floor_ok
    FROM exact_cross
    """,
    doc="Driver-checkable incremental-ingest contract: the corpus is "
    "split into a KNOWN batch (even doc_id -> minhash_store) and an "
    "INCOMING batch (odd doc_id) matched against the persisted store "
    "(incremental_near_dups) WITHOUT re-scanning the known corpus. "
    "Checks: (a) incremental pairs are a subset of the exact "
    "cross-batch bigram-Jaccard pairs (no false positives survive "
    "the verify stage), (b) incremental detection EXACTLY equals "
    "full-batch LSH detection restricted to cross-batch pairs "
    "(signatures and band hashes are row-local, so store-based "
    "detection loses nothing vs reclustering the world), (c) recall "
    "vs exact cross-batch pairs >= 0.9. The oracle recomputes the "
    "exact cross-batch pair count in SQL. This is the production "
    "continuous-ingestion shape: at 100 TB the store is a few "
    "hundred bytes per doc, bucketed on (band, band_hash), and only "
    "the new batch moves.",
)
def q_incremental_second_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    old = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 2 == 1)
    inc = (
        dedup.incremental_near_dups(
            dedup.minhash_store(new, "doc_id", "text", shingle_n=2),
            dedup.minhash_store(old, "doc_id", "text", shingle_n=2),
            min_jaccard=0.8,
        )
        .select(
            F.least("new_id", "old_id").alias("a"),
            F.greatest("new_id", "old_id").alias("b"),
        )
        .localCheckpoint(eager=False)  # three set-compares below
    )
    exact_cross = (
        dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", n=2, min_jaccard=0.8
        )
        .where((F.col("a") % 2) != (F.col("b") % 2))
        .select("a", "b")
        .localCheckpoint(eager=False)
    )
    batch_cross = (
        dedup.minhash_lsh_pairs(
            docs, "doc_id", "text", shingle_n=2, min_jaccard=0.8
        )
        .where((F.col("a") % 2) != (F.col("b") % 2))
        .select("a", "b")
        .localCheckpoint(eager=False)
    )
    n_exact = exact_cross.count()
    n_false_pos = inc.join(exact_cross, ["a", "b"], "left_anti").count()
    n_hit = inc.join(exact_cross, ["a", "b"], "left_semi").count()
    sym_diff = (
        inc.join(batch_cross, ["a", "b"], "left_anti").count()
        + batch_cross.join(inc, ["a", "b"], "left_anti").count()
    )
    return exact_cross.agg(
        F.lit(n_exact).cast("long").alias("n_exact_cross_pairs"),
        F.lit(n_false_pos == 0).alias("incremental_subset_ok"),
        F.lit(sym_diff == 0).alias("incremental_matches_batch"),
        F.lit(n_exact == 0 or n_hit / n_exact >= 0.9).alias(
            "recall_floor_ok"
        ),
    )


# Embedding/SimHash planted-duplicate checks: queries.vector_checks.
for _n in ("embedding_near_dup_check", "simhash_planted_check"):
    _REGISTRY.append(_VEC_SPECS[_n])

# Multimodal decode contracts live in queries.media (split, VERDICT
# r6 #8); appended at their original registry positions.
for _n in (
    "multimodal_features_check",
    "multimodal_wav_decode_check",
    "multimodal_bmp_decode_check",
):
    _REGISTRY.append(_MEDIA_SPECS[_n])

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
    "noise, wrong language). Scale shape: tokens become 8-byte "
    "xxhash64 longs at the explode (the minhash-verify trade — "
    "distinct vocab tokens collide with p ~ vocab²/2^64 ≈ 1e-10, and "
    "the oracle's exact string counts have never mismatched), so the "
    "scoring join sorts/shuffles fixed 16-byte rows instead of "
    "variable-length strings, and the doc-grain aggregate collapses "
    "in-partition (a document's exploded tokens are co-located). "
    "SHIP-THE-LM HISTORY: an r12 force-broadcast experiment on the "
    "replicated ×100 corpus measured only 58.7→49.9 s and left "
    "lingering heap pressure (pre-hashing era); the r13 re-run on "
    "realistic Heaps-law text (266,940 types ≈ a 4 MB hashed count "
    "relation) measured the broadcast WINNING 2.7 s vs 3.8 s SMJ "
    "with no pressure. Since r15 the query ships that win behind a "
    "SIZE GATE (joins.broadcast_if_small, the kcore_peel gate "
    "discipline): the vocabulary relation — already materialized for "
    "the corpus total — is counted once and broadcast only under "
    "COUNT_BROADCAST_MAX_ROWS (8M rows ≈ ~1 GB as a hash relation); "
    "past the budget the hashed sort-merge join remains, so the "
    "shape stays memory-safe under ANY corpus regime. AQE cannot "
    "make this call itself: the checkpointed count table's stats "
    "are conservative, so it always kept the SMJ. NOT action-free "
    "at construction (r16 doc, ADVICE): the size gate's count() runs "
    "when the DataFrame is BUILT — it materializes the vocabulary "
    "checkpoint the query needs anyway, but plan-only tooling "
    "(explain audits, speculative construction) pays it; such "
    "tooling should skip this query, the same contract as the "
    "connected-components family.",
)
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import text as text_ops

    docs = _t(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id",
            explode_nonempty(text_ops.tokens("text")).alias("token"),
        )
        .filter(F.col("token") != "")
        .select("doc_id", F.xxhash64("token").alias("th"))
    )
    # Vocabulary-sized; lazily checkpointed so the corpus total, the
    # size gate's count, and the scoring join all reuse ONE
    # materialization instead of re-scanning + re-exploding the
    # document table.
    counts = (
        toks.groupBy("th")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    total = counts.agg(F.sum("c").cast("long").alias("n"))
    scored = toks.join(
        joins.broadcast_if_small(counts, joins.COUNT_BROADCAST_MAX_ROWS),
        "th",
    ).crossJoin(F.broadcast(total))
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
    "evidence. r14 plan: the corpus side is NEVER shuffled before the "
    "join — its per-doc DISTINCT was semantically redundant under the "
    "countDistinct aggregates (within-doc repeat shingles are rare "
    "and dedup map-side anyway) yet cost a full corpus-sized exchange "
    "(25M rows at zx100); and shingles join by xxhash64 (8-byte "
    "keys, strings never shuffle; collisions ~1e-12 — the repo-wide "
    "hashed-set trade). Together: 33.4s -> ~22s at zx100, and the "
    "plan is scan -> explode -> (AQE-broadcast) join -> partial "
    "distinct, zero corpus-sized exchanges. The single pair join IS "
    "the semantic floor: the r14 experiments measured the doc-count "
    "half alone within ~10% of the whole query, and a split plan "
    "that pre-aggregates the corpus per shingle to avoid the pair "
    "fan-out LOSES (extra corpus-cardinality shuffle > the fan-out "
    "it saves) — SCALING.md zipf section. No broadcast hint: the "
    "benchmark side grows with the corpus here (a 5% slice), so AQE "
    "picks broadcast while it fits; a real eval set is a fixed-size "
    "table and broadcasts unconditionally.",
)
def q_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators.text import tokens

    docs = _t(spark, sf_dir, "documents")
    n = 5

    def shingles(df, idc, distinct):
        t = F.filter(tokens("text"), lambda x: x != "")
        # DuckDB's t[i+1:i+5] silently truncates at the array end, so
        # short docs contribute their sub-n-gram remainder; mirror that
        # by clamping the slice length (sequence floor 1 keeps >= one
        # shingle per non-empty doc, exactly like greatest(len-4, 1)).
        # Project straight to the 64-bit shingle hash: the join and
        # both aggregates below run on 8-byte keys.
        out = (
            df.select(F.col(idc), t.alias("t"))
            .select(
                idc,
                explode_nonempty(
                    F.transform(
                        F.sequence(
                            F.lit(0),
                            F.greatest(F.size("t") - (n - 1), F.lit(1)) - 1,
                        ),
                        lambda i: F.xxhash64(
                            F.array_join(F.slice(F.col("t"), i + 1, n), " ")
                        ),
                    )
                ).alias("__h"),
            )
        )
        return out.distinct() if distinct else out

    # Corpus side: NO distinct (see doc= — redundant under the
    # countDistinct aggregates, and it cost a corpus-sized shuffle);
    # bench side keeps it (cheap, bounds the broadcast build side).
    c_h = shingles(docs, "doc_id", distinct=False)
    bench = docs.filter(F.col("doc_id") % 20 == 7).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    b_h = shingles(bench, "bench_id", distinct=True)
    # One pair join, both counts off it: the per-shingle fan-out
    # dedups map-side inside the partial distinct aggregates, so only
    # distinct (bench, doc) / (bench, shingle) pairs ever shuffle —
    # the doc half of which is this report's semantic floor (see doc=
    # above for the measured alternatives).
    hits = c_h.join(
        b_h,
        (c_h["__h"] == b_h["__h"]) & (c_h["doc_id"] != b_h["bench_id"]),
    )
    return hits.groupBy("bench_id").agg(
        F.countDistinct("doc_id").cast("long").alias("n_contaminated_docs"),
        F.countDistinct(c_h["__h"]).cast("long").alias("n_shared_shingles"),
    )


# Behavioral analytics / time-series gaps / corpus-ops profiling:
# peeled to queries.behavior (module-local SPECS, appended here IN THE
# ORIGINAL DEFINITION ORDER so the pre-split registration sequence —
# which every rotation artifact keys on — is unchanged).
for _n in (
    "funnel_conversion",
    "retention_cohorts",
    "forward_fill_gaps",
    "finance_rolling_median",
    "corpus_curation_funnel",
    "rollup_time_hierarchy",
    "key_skew_profile",
    "cross_source_dup_matrix",
    "order_to_ship_lag_percentiles",
    "events_hourly_profile",
):
    _REGISTRY.append(_BEHAV_SPECS[_n])


# Ranking / graph-iteration / attribution checks: peeled to
# queries.ranking (module-local SPECS, appended here so the pre-split
# registration order is preserved — the audio chunking contract from
# queries.media sits between them, as it did pre-split).
for _n in ("bm25_topk_docs", "pagerank_3iter", "bigram_interp_logprob"):
    _REGISTRY.append(_RANK_SPECS[_n])
_REGISTRY.append(_MEDIA_SPECS["multimodal_wav_chunk_check"])
for _n in ("triangle_count_order_bursts", "last_touch_attribution"):
    _REGISTRY.append(_RANK_SPECS[_n])

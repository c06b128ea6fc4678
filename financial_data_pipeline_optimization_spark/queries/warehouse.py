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

from financial_data_pipeline_optimization_spark.queries.vector_checks import (
    SPECS as _VEC_SPECS,
)
from financial_data_pipeline_optimization_spark.queries.media import (
    SPECS as _MEDIA_SPECS,
)
from financial_data_pipeline_optimization_spark.queries.ranking import (
    SPECS as _RANK_SPECS,
)
from financial_data_pipeline_optimization_spark.queries.documents import (
    _ORACLE_TOKENS,
)
from financial_data_pipeline_optimization_spark.queries.breadth import (
    _ORACLE_TOKENS_D,
)
from financial_data_pipeline_optimization_spark.queries.finance import (
    _TS_W,
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


# Ranking / graph-iteration / attribution checks: peeled to
# queries.ranking (module-local SPECS, appended here so the pre-split
# registration order is preserved — the audio chunking contract from
# queries.media sits between them, as it did pre-split).
for _n in ("bm25_topk_docs", "pagerank_3iter", "bigram_interp_logprob"):
    _REGISTRY.append(_RANK_SPECS[_n])
_REGISTRY.append(_MEDIA_SPECS["multimodal_wav_chunk_check"])
for _n in ("triangle_count_order_bursts", "last_touch_attribution"):
    _REGISTRY.append(_RANK_SPECS[_n])

"""Record linkage, sequence export, mergeable sketches (split from the original queries.py; registration
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



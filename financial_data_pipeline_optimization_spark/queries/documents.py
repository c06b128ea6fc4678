"""Text analysis, dedup, similarity search, multimodal contract queries (split from the original queries.py; registration
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
# Text analysis (extension surface; operators.text)
# ===========================================================================

# The canonical tokenizer contract, DuckDB side (Spark side:
# operators.text.tokens — regexp_extract_all of the maximal [a-z0-9]+
# runs of the lowercased text, with NULL preserved and the ['']
# sentinel for alnum-free non-null documents). r12 replaced the
# historical replace+trim+split spelling on BOTH engines at once: the
# old form's trim stripped only ASCII spaces, so a document with
# LEADING/TRAILING non-space whitespace ('\r') tokenized to spurious
# empty-string tokens (['', '']) — an artifact, not a contract, caught
# by the tokenizer differential fuzzer the moment the Spark side moved
# to the runs form (which is also ~40× faster per corpus evaluation,
# SCALING.md).
_ORACLE_TOKENS = (
    "(CASE WHEN text IS NULL THEN NULL "
    "WHEN len(regexp_extract_all(lower(text), '[a-z0-9]+')) > 0 "
    "THEN regexp_extract_all(lower(text), '[a-z0-9]+') "
    "ELSE [''] END)"
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
    """Default LSH near-dup pairs. Since r14 the banding is DERIVED
    from the verify threshold (operators.dedup.derive_banding:
    64 hashes at t=0.8 -> 8 bands x 8 rows, S-curve midpoint
    (1/8)^(1/8) = 0.77 aligned with the threshold) — the r13 zipf
    corpus measured the old fixed 16x4 default (midpoint 0.50) paying
    for the whole [0.5, 0.8) background-candidate dead zone on
    realistic shared-vocabulary text: 159.4 s / 36.8x zx10->zx100
    growth vs 17.3 s / 5.3x derived. ``q_minhash_pairs_16x4`` keeps
    the old banding as the documented-blowup comparison row."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", shingle_n=2, min_jaccard=0.8
    )


def q_minhash_pairs_16x4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RETIRED fixed 16-band x 4-row banding, kept as a bench-only
    comparison row (same no-oracle rationale as ``q_minhash_pairs``):
    its S-curve midpoint is (1/16)^(1/4) = 0.50, i.e. the banded join
    surfaces candidates from Jaccard ~0.5 DOWN while the verify join
    keeps only >= 0.8. On the replicated corpus that slack is
    invisible (disjoint replica vocabularies make background Jaccard
    ~0 across replicas), but on realistic shared-vocabulary text,
    frequent-token 2-shingles give random doc pairs background Jaccard
    ~0.1 and the 0.5-midpoint banding pays candidates for the whole
    [0.5, 0.8) dead zone: zx10->zx100 growth 36.8x (159.4 s) vs the
    derived 8x8's 5.3x (midpoint (1/8)^(1/8) = 0.77; background band
    collisions decay as J^8 — at J=0.1, 1e-8/band). Trade the default
    accepts: steeper at-threshold recall (J=0.85 ->
    1-(1-0.85^8)^8 ~ 0.93; exact dups J=1.0 always collide), the
    standard S-curve trade every production LSH deployment makes —
    banding must be tuned to the verify threshold, not defaulted."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", shingle_n=2, min_jaccard=0.8, bands=16
    )


def q_near_dup_clusters_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench-only twin of the `near_dup_clusters` headliner with the
    LSH pair source — the 100 TB edge generator (banded bucket join)
    instead of the exact inverted index, so the scale path's timing
    trends round-over-round next to the exact path's. Banding is
    derived from the threshold (8x8 at t=0.8 since r14 — see
    ``q_minhash_pairs``). Deterministic but xxhash64-based, hence no
    SQL oracle; cluster-refinement equivalence vs the exact path is
    pinned in tests/test_graph.py / tests/test_dedup.py."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.near_dup_clusters(
        docs, "doc_id", "text", n=2, min_jaccard=0.8, pair_source="lsh",
        materialize=False,
    )


def q_near_dup_clusters_lsh_16x4(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``q_near_dup_clusters_lsh`` with the RETIRED fixed 16x4 banding
    (bench-only comparison row; see ``q_minhash_pairs_16x4`` for the
    S-curve rationale and zipf measurements) — keeps the documented
    blowup visible through the full pair -> connected-components ->
    label pipeline, not just the pair join."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.near_dup_clusters(
        docs, "doc_id", "text", n=2, min_jaccard=0.8, pair_source="lsh",
        materialize=False, bands=16,
    )


# ===========================================================================
# Similarity search (operators.vector) on embeddings
# ===========================================================================


def q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench-only: hyperplane-LSH ANN top-5 (operators.vector.lsh_topk,
    same 4-plane config the recall check verifies) — the bucketed
    100 TB similarity-search path, timed next to brute force so the
    approximate paths have measured trend lines, not just correctness
    rows. xxhash/bucket-based, hence no SQL oracle;
    knn_lsh_recall_check carries driver verification."""
    from financial_data_pipeline_optimization_spark.operators import vector

    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 8)
    return vector.lsh_topk(emb, queries_df, k=5, num_planes=4)


def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench-only: IVF ANN top-5 (operators.vector.ivf_topk — k-means
    cells trained on the corpus, probes nearest cells only). No SQL
    oracle (iterative k-means); knn_ivf_recall_check carries driver
    verification."""
    from financial_data_pipeline_optimization_spark.operators import vector

    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 8)
    return vector.ivf_topk(emb, queries_df, k=5)


def q_knn_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench-only: PQ ANN top-5 through the PERSISTED-index path
    (operators.vector.pq_store -> pq_search_store, the recall check's
    m=16/k_codes=16/one-Lloyd-round config) — measures the full
    train + encode + ADC-search cost; the scoring scan reads the
    ~32x-compressed codes, never the embeddings. No SQL oracle
    (k-means codebooks); knn_pq_recall_check carries driver
    verification."""
    from financial_data_pipeline_optimization_spark.operators import vector

    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 8)
    codes_df, books_df = vector.pq_store(
        emb, m=16, k_codes=16, train_iters=1
    )
    return vector.pq_search_store(codes_df, books_df, queries_df, k=5)


#: One PQ index per (app-id, sf_dir): q_knn_pq_search times the
#: RECURRING search cost, so the one-time train+encode must happen
#: exactly once per bench session and be materialized (eager
#: localCheckpoint cuts the lineage — re-running the returned plan
#: re-reads cached codes, never re-trains). Keyed by app id so a
#: stale checkpoint from a stopped session is never reused.
_PQ_INDEX_CACHE: dict = {}


def q_knn_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench-only: the ADC SEARCH leg of the persisted-index PQ path
    in isolation (same m=16/k_codes=16 config as q_knn_pq). q_knn_pq
    times train + encode + search together, which buries search-path
    regressions in the much larger one-time training cost — this twin
    pre-builds the index once (materialized via eager localCheckpoint)
    so the timed plan is exactly what a 100 TB serving path re-runs
    per query batch: one scan of the compressed codes. No SQL oracle
    (k-means codebooks); knn_pq_recall_check carries driver
    verification."""
    from financial_data_pipeline_optimization_spark.operators import vector

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _PQ_INDEX_CACHE:
        emb = _t(spark, sf_dir, "embeddings")
        codes_df, books_df = vector.pq_store(
            emb, m=16, k_codes=16, train_iters=1
        )
        _PQ_INDEX_CACHE[key] = (
            codes_df.localCheckpoint(eager=True),
            books_df.localCheckpoint(eager=True),
        )
    codes_df, books_df = _PQ_INDEX_CACHE[key]
    queries_df = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 8)
    )
    return vector.pq_search_store(codes_df, books_df, queries_df, k=5)


#: Same one-index-per-session discipline as _PQ_INDEX_CACHE, for the
#: IVF serving-leg headliner.
_IVF_INDEX_CACHE: dict = {}


def q_knn_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench-only: the probed-cell SEARCH leg of the persisted IVF
    index in isolation (operators.vector.ivf_store ->
    ivf_search_store, q_knn_ivf's 16-centroid/nprobe-4 config) — the
    train+assign cost is paid once per session and materialized, so
    this times exactly the recurring serving scan: probe assignment
    (one Arrow matmul over the 8-query batch) + the cell-keyed
    broadcast join over probed cells only. No SQL oracle (iterative
    k-means); knn_ivf_recall_check + the store round-trip test carry
    verification."""
    from financial_data_pipeline_optimization_spark.operators import vector

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _IVF_INDEX_CACHE:
        emb = _t(spark, sf_dir, "embeddings")
        cells_df, cents_df = vector.ivf_store(emb, num_centroids=16)
        _IVF_INDEX_CACHE[key] = (
            cells_df.localCheckpoint(eager=True),
            cents_df.localCheckpoint(eager=True),
        )
    cells_df, cents_df = _IVF_INDEX_CACHE[key]
    queries_df = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 8)
    )
    return vector.ivf_search_store(
        cells_df, cents_df, queries_df, k=5, nprobe=4
    )


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




@_register(
    "substring_dedup_docs",
    f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter({_ORACLE_TOKENS}, x -> x <> '') AS t
      FROM documents
    ),
    spans AS (
      SELECT doc_id, i AS pos, array_to_string(t[i:i+7], ' ') AS w
      FROM toks, UNNEST(range(1, len(t) - 6)) u(i)
      WHERE len(t) >= 8
    ),
    occ AS (
      SELECT doc_id, pos,
             ROW_NUMBER() OVER (PARTITION BY w
                                ORDER BY doc_id, pos) AS rn
      FROM spans
    ),
    removed AS (SELECT doc_id, pos FROM occ WHERE rn > 1),
    tok_rows AS (
      SELECT tk.doc_id, u.i AS idx, tk.t[u.i] AS tok
      FROM toks tk, UNNEST(range(1, len(tk.t) + 1)) u(i)
    ),
    kept AS (
      SELECT tr.doc_id,
             string_agg(tr.tok, ' ' ORDER BY tr.idx) AS text
      FROM tok_rows tr
      WHERE NOT EXISTS (
        SELECT 1 FROM removed r
        WHERE r.doc_id = tr.doc_id
          AND r.pos <= tr.idx AND tr.idx < r.pos + 8
      )
      GROUP BY tr.doc_id
    )
    SELECT doc_id, text FROM kept WHERE text <> ''
    """,
    doc="Exact duplicated-substring REMOVAL over the corpus "
    "(operators.text.substring_dedup, n=8 word-gram windows — the "
    "rewrite half of dup_span_stats): every 8-token window occurring "
    "more than once keeps its lowest-(doc_id, position) occurrence; "
    "every other occurrence's tokens are excised and documents "
    "reassemble from the survivors (word-grain form of Lee et al. "
    "ACL 2022 exact-substring dedup; at sf0.01 it actually rewrites "
    "~24 documents and removes ~1.1k duplicated windows, so the check "
    "is non-vacuous). Spark shuffles 8-byte window hashes; the oracle "
    "groups the RAW window strings — verifying the hashed plan "
    "against unhashed semantics (the template_prefix_flags pattern) — "
    "and re-derives every surviving token with a positional "
    "anti-exists. A wrong window bound, an off-by-one in the excision "
    "interval, or a broken keep-first order changes document text and "
    "fails the hash.",
)
def q_substring_dedup_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import text as text_ops

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return text_ops.substring_dedup(docs, "doc_id", "text", n=8)


# Bench-only twin at the PRODUCTION grain: n=50, the Lee et al. (ACL
# 2022) exact-substring threshold. The oracle pair stays at n=8 (the
# synthetic docs are short, so n=8 actually rewrites documents at
# sf0.01 and keeps the DuckDB replay tractable); this variant exists so
# BENCH_SCALED.json carries a ×100 measurement of the grain a real
# 100 TB run would use — wider windows mean ~6× more slice/concat/hash
# bytes per token position, which the n=8 row structurally understates.
# No SQL oracle (same contract as q_minhash_pairs); the operator's
# correctness is pinned by the n-parametric bruteforce/fixpoint tests
# in tests/test_text_vector_extras.py plus the n=8 driver row.
def q_substring_dedup_n50(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import text as text_ops

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return text_ops.substring_dedup(docs, "doc_id", "text", n=50)

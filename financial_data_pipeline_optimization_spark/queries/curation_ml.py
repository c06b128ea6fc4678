"""Corpus-curation and data-selection driver checks (peeled from
``queries/analytics.py`` — continuing the VERDICT r7/r8 hygiene item —
with the same position-preserving SPECS pattern as
``vector_checks``/``media``/``ranking``/``behavior``: REGISTRATION
ORDER IS LOAD-BEARING for these pre-split names, so this module only
collects ``QuerySpec``s into ``SPECS`` and ``analytics.py`` appends
them into ``_REGISTRY`` at their original positions.

Covers the quality-gate and selection family: Gopher/C4 rule flags,
benchmark decontamination, per-source keep rates, curation-flag
propagation across near-dup clusters, SemDeDup, and DSIR importance
weights."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from financial_data_pipeline_optimization_spark.functions import explode_nonempty
from financial_data_pipeline_optimization_spark.operators import dedup
from financial_data_pipeline_optimization_spark.queries._registry import (
    QuerySpec,
    _r4,
    _t,
)
from financial_data_pipeline_optimization_spark.queries.documents import (
    _ORACLE_TOKENS,
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



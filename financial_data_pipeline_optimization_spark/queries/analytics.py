"""Phrase mining, gaps-and-islands, co-occurrence, corpus plans (split from the original queries.py; registration
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
        carry_cols=["n_chars"], materialize=False,
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



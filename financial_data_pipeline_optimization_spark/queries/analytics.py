"""Phrase mining, gaps-and-islands, co-occurrence, corpus plans (split from the original queries.py; registration
order preserved — modules import in the original definition order; the
quality-gate/selection and stats/fit families are peeled further to
``curation_ml.py`` / ``statsfit.py`` and appended back at their
original registry positions)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from financial_data_pipeline_optimization_spark.functions import explode_nonempty
from financial_data_pipeline_optimization_spark.operators import dedup, sketch

from financial_data_pipeline_optimization_spark.queries._registry import (
    _REGISTRY,
    _r2,
    _r4,
    _register,
    _t,
)

from financial_data_pipeline_optimization_spark.queries.documents import (
    _ORACLE_TOKENS,
)
from financial_data_pipeline_optimization_spark.queries.curation_ml import (
    SPECS as _CUR_SPECS,
)
from financial_data_pipeline_optimization_spark.queries.statsfit import (
    SPECS as _FIT_SPECS,
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
    "single tokens before tokenizer training. ONE corpus pass feeds "
    "everything: each token is emitted exactly once as (w1, "
    "next-token-or-null) via arrays_zip's null-padding, so a single "
    "pair-keyed groupBy yields the bigram table AND — summed over w2 "
    "— the unigram table, the token total, and the bigram total; the "
    "old two-pass shape (separate unigram explode) tokenized the "
    "corpus twice for the same counts. Downstream of that one "
    "aggregation everything is (bigram-)vocabulary-sized: the "
    "frequency joins, both broadcast scalar totals, and the top-k. "
    "Document text never crosses the wire (gated in "
    "tests/test_plan_quality.py). PMI is computed from exact integer "
    "counts on both engines, so the float is bit-identical "
    "pre-rounding. At 100 TB the corpus contributes one "
    "tokenize+explode+partial-agg pass and the shuffles are "
    "O(bigram-vocab), heavy-tail bounded by the cab >= 5 support "
    "floor applied before the joins.",
)
def q_pmi_bigram_phrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import text as text_ops

    docs = _t(spark, sf_dir, "documents")
    t = F.col("t")
    # tokens() yields either [''] (empty/all-punct doc, dropped by the
    # w1 != '' filter) or all-nonempty tokens, so pairing each token
    # with its successor-or-null loses nothing: single-token docs
    # contribute one (w, null) row (unigram-only, exactly the oracle's
    # len(t) >= 2 bigram guard), and the last token of every doc
    # contributes its unigram count through its null-successor row.
    pc = (
        docs.select(text_ops.tokens(F.col("text")).alias("t"))
        .select(
            explode_nonempty(
                F.arrays_zip(
                    t.alias("w1"),
                    F.slice(
                        t, 2, F.greatest(F.size(t) - 1, F.lit(0))
                    ).alias("w2"),
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .where(F.col("w1") != "")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    # Checkpointed because FIVE consumers read it (uni twice via the
    # frequency joins, nt, mb, and the support-filtered bigram table);
    # pc is bigram-vocabulary-sized, so every re-read is cheap while
    # the corpus pass above runs exactly once.
    uni = pc.groupBy(F.col("w1").alias("w")).agg(
        F.sum("c").alias("cw")
    )
    bigc = pc.where(
        F.col("w2").isNotNull() & (F.col("c") >= 5)
    ).select("w1", "w2", F.col("c").alias("cab"))
    nt = pc.agg(F.sum("c").cast("double").alias("nt"))
    mb = pc.where(F.col("w2").isNotNull()).agg(
        F.sum("c").cast("double").alias("mb")
    )
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
    "oov_rate_top_vocab",
    f"""
    WITH t AS (
      SELECT doc_id, u.w FROM (
        SELECT doc_id, {_ORACLE_TOKENS} AS tk FROM documents
      ), UNNEST(tk) AS u(w) WHERE u.w <> ''
    ),
    vocab AS (
      SELECT w FROM (SELECT w, count(*) AS c FROM t GROUP BY 1)
      ORDER BY c DESC, w LIMIT 20
    )
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_oov,
           floor(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END)::DOUBLE
                 / count(*) * 10000 + 0.5000005) / 10000 AS oov_rate
    FROM t LEFT JOIN vocab v USING (w)
    GROUP BY t.doc_id ORDER BY t.doc_id
    """,
    doc="Per-document out-of-vocabulary rate against the corpus's own "
    "top-K token vocabulary (K=20 here: the driver's synthetic "
    "corpus holds only ~31 distinct tokens, so a production-sized K "
    "would make the oracle check vacuous; the code path is "
    "K-independent) — the tokenizer-coverage metric every "
    "LLM data pipeline computes before committing to a vocab size "
    "(high-OOV docs are either valuable domain text or junk; either "
    "way they need eyes). Plan shape is the scale story: ONE "
    "tokenize+explode pass; the vocabulary selection is an "
    "aggregation + TakeOrderedAndProject top-K (count desc, token "
    "asc — deterministic at the K boundary), NEVER a global "
    "row_number window (single-partition sort of the whole "
    "vocabulary); the K-row vocab broadcasts to a map-side left "
    "join; the doc-grain aggregate partial-combines in-partition "
    "(a doc's exploded tokens are co-located). At 100 TB the corpus "
    "shuffles once as (token, partial-count) pairs for the vocab "
    "agg and once as doc-grain partials — never as raw text. "
    "All-punctuation documents (zero nonempty tokens) are excluded "
    "on both engines rather than dividing by zero.",
)
def q_oov_rate_top_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    from financial_data_pipeline_optimization_spark.operators import text as text_ops

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", explode_nonempty(text_ops.tokens("text")).alias("w")
    ).filter(F.col("w") != "")
    vocab = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w"))
        .limit(20)
        .select("w", F.lit(1).alias("__iv"))
    )
    return (
        toks.join(F.broadcast(vocab), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("__iv").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            _r4(F.col("n_oov") / F.col("n_tokens")).alias("oov_rate"),
        )
        .orderBy("doc_id")
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


def q_cluster_representatives_lsh(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bench-only FORCED-LSH twin of ``cluster_representatives`` (the
    100 TB shape: banded bucket join edges -> connected components ->
    one election window). Historical context: on the r14 power-law
    dup-cluster corpus (gen_zipf_sf.py --cluster-max 100) the exact
    inverted index did not finish a 500k-doc cell the LSH path handles
    in tens of seconds — which is why the DEFAULT query now self-gates
    (r15 auto pair source) and records its own skewed cells; this twin
    keeps the pure-LSH trend line (no probe cost) comparable across
    rounds. No SQL oracle (xxhash64 banding); LSH-refines-exact is
    pinned in tests/test_dedup.py."""
    docs = _t(spark, sf_dir, "documents")
    labels = dedup.near_dup_clusters(
        docs, "doc_id", "text", n=2, min_jaccard=0.8,
        carry_cols=["n_chars"], materialize=False, pair_source="lsh",
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


# Quality-gate / selection checks (Gopher flags, C4 line filter,
# benchmark decontamination) peeled to queries.curation_ml, and the
# stats/fit family (RFM, OLS, corr matrix, leakage-safe split, BPE)
# peeled to queries.statsfit — module-local SPECS, appended here IN THE
# ORIGINAL DEFINITION ORDER so the pre-split registration sequence
# (which every rotation artifact keys on) is unchanged.
for _n in (
    "gopher_quality_flags",
    "c4_line_filter",
    "near_decontaminate_report",
):
    _REGISTRY.append(_CUR_SPECS[_n])
for _n in (
    "customer_rfm_segments",
    "price_quantity_ols",
    "lineitem_corr_matrix",
    "leakage_safe_split",
    "bpe_merge_rounds",
):
    _REGISTRY.append(_FIT_SPECS[_n])


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


# Per-source keep-rate check: peeled to queries.curation_ml (original
# position between event_rate_anomalies and the BMP resize check).
_REGISTRY.append(_CUR_SPECS["gopher_keep_rate_by_source"])


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


# Tail block: flag propagation / SemDeDup / DSIR peeled to
# queries.curation_ml, Zipf fit to queries.statsfit — appended in the
# original definition order.
for _n in (
    "flag_propagation_near_dups",
    "semdedup_check",
    "dsir_importance_weights",
):
    _REGISTRY.append(_CUR_SPECS[_n])
_REGISTRY.append(_FIT_SPECS["zipf_fit_tokens"])

"""End-to-end training-corpus curation plan (BASELINE.json north star).

The finance plan (``plans/finance.py``) is the reference pipeline
re-expressed; this is its LLM-data twin: the standard curation funnel
composed entirely from this engine's operators, in the order a
production corpus build runs them —

1. **hygiene** — tag-strip / control-char / whitespace normalize, PII
   redaction (``operators.text.clean_text`` / ``redact_pii``);
2. **language filter** — n-gram marker heuristic
   (``operators.text.with_lang_id``);
3. **quality filter** — token-count / punctuation / type-token gates
   (``operators.text.quality_filter``);
4. **exact dedup** — normalized-content hash, keep lowest id
   (``operators.dedup.exact_dedup``);
5. **near-dedup** — n-gram-Jaccard pairs → connected components →
   keep each cluster's minimum id (``operators.dedup.near_dup_clusters``);
6. **annotate** — token counts for budget accounting
   (``operators.text.with_token_count``);
7. **split** — deterministic train/val/test by key hash
   (``operators.sampling.with_split``).

Stage order is load-bearing at 100 TB: the narrow row-local stages
(1-3) run first and shrink the corpus before anything that shuffles
(4) or iterates (5); annotation and splitting are narrow again, so the
expensive middle sees the smallest possible input. Everything except
the near-dup component loop is lazy; set ``near_dedup=False`` for a
fully lazy plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from financial_data_pipeline_optimization_spark.operators import (
    dedup,
    sampling,
    text,
)


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    languages: tuple[str, ...] = ("en",),
    min_tokens: int = 20,
    near_dedup: bool = True,
    near_dup_jaccard: float = 0.8,
    splits: dict[str, float] | None = None,
    pair_source: str = "auto",
) -> DataFrame:
    """Run the full curation funnel; returns the surviving documents
    with ``lang_pred``, ``n_bpe_ish_tokens`` and ``split``
    annotations.

    EXACT-CLOSURE-SENSITIVE: the near-dedup stage decides which
    documents survive into the split assignment, so this plan calls
    ``near_dup_clusters`` with ``on_budget_exceeded="error"`` — past
    the exact fan-out budget it raises
    :class:`~financial_data_pipeline_optimization_spark.operators.dedup.ExactFanoutBudgetExceeded`
    instead of silently downgrading to finer LSH clusters (which
    would let two true near-duplicates both survive and land in
    different splits). At 100 TB pass ``pair_source="lsh"`` to accept
    near-threshold LSH recall EXPLICITLY."""
    out = text.redact_pii(
        text.clean_text(docs.select(id_col, text_col), text_col), text_col
    )
    out = text.with_lang_id(out, text_col)
    out = out.filter(F.col("lang_pred").isin(*languages))
    out = text.quality_filter(
        out.select(id_col, text_col, "lang_pred"), text_col,
        min_tokens=min_tokens,
    )
    out = dedup.exact_dedup(out, [text_col], id_col)
    if near_dedup:
        clusters = dedup.near_dup_clusters(
            out, id_col, text_col, n=2, min_jaccard=near_dup_jaccard,
            pair_source=pair_source, on_budget_exceeded="error",
        )
        keep = clusters.filter(
            F.col(id_col) == F.col("cluster_id")
        ).select(id_col)
        out = out.join(keep, id_col, "left_semi")
    out = text.with_token_count(out, text_col)
    out = sampling.with_split(
        out, [id_col], splits or {"train": 0.9, "val": 0.05, "test": 0.05}
    )
    return out


def funnel_counts_df(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    **kwargs,
) -> DataFrame:
    """Per-stage survivor counts as ONE single-row DataFrame
    ``(n_input, n_lang_filtered, n_quality_filtered, n_exact_deduped,
    n_near_deduped)``.

    The five counts are one lazy plan: each stage boundary is a lazy
    ``localCheckpoint`` (computed once, shared by its own count AND the
    next stage), and the one-row aggregates are combined with 1×1
    crossJoins, so collecting the row is ONE job instead of five
    serial count() actions re-deriving the funnel prefix each time.

    NOT fully lazy: ``near_dup_clusters``'s connected-components loop
    runs bounded actions at CONSTRUCTION time (see ``operators.graph``)
    — building this DataFrame already computes the dedup stages.
    Plan-inspection tooling that assumes construction is action-free
    should skip this plan (bench warms it like any other query; the
    cost is real work, not waste).

    EXACT-CLOSURE-SENSITIVE (same contract as :func:`curate_corpus`):
    the funnel's near-dedup survivor count is defined against the
    exact transitive closure, so the auto pair-source gate runs with
    ``on_budget_exceeded="error"`` — a corpus past the exact fan-out
    budget raises instead of quietly reporting the FINER LSH
    clustering's (higher) survivor count as if it were the exact one.
    Pass ``pair_source="lsh"`` via kwargs to opt in explicitly."""
    cleaned = text.redact_pii(
        text.clean_text(docs.select(id_col, text_col), text_col), text_col
    )
    lang = (
        text.with_lang_id(cleaned, text_col)
        .filter(F.col("lang_pred").isin(*kwargs.get("languages", ("en",))))
        .localCheckpoint(eager=False)
    )
    quality = text.quality_filter(
        lang.select(id_col, text_col), text_col,
        min_tokens=kwargs.get("min_tokens", 20),
    ).localCheckpoint(eager=False)
    exact = dedup.exact_dedup(quality, [text_col], id_col).localCheckpoint(
        eager=False
    )
    clusters = dedup.near_dup_clusters(
        exact, id_col, text_col, n=2,
        min_jaccard=kwargs.get("near_dup_jaccard", 0.8),
        pair_source=kwargs.get("pair_source", "auto"),
        on_budget_exceeded="error",
    )
    survivors = clusters.filter(F.col(id_col) == F.col("cluster_id"))

    def n(df: DataFrame, alias: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("long").alias(alias))

    return (
        n(docs, "n_input")
        .crossJoin(n(lang, "n_lang_filtered"))
        .crossJoin(n(quality, "n_quality_filtered"))
        .crossJoin(n(exact, "n_exact_deduped"))
        .crossJoin(n(survivors, "n_near_deduped"))
    )


def funnel_counts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    **kwargs,
) -> dict[str, int]:
    """Per-stage survivor counts (monitoring/reporting; one collected
    job — use for audits, not in the hot path)."""
    row = funnel_counts_df(docs, id_col, text_col, **kwargs).first()
    return {
        "input": row["n_input"],
        "lang_filtered": row["n_lang_filtered"],
        "quality_filtered": row["n_quality_filtered"],
        "exact_deduped": row["n_exact_deduped"],
        "near_deduped": row["n_near_deduped"],
    }


def multimodal_funnel_counts_df(
    docs: DataFrame,
    images: DataFrame | None = None,
    audio: DataFrame | None = None,
    videos: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    languages: tuple[str, ...] = ("en",),
    min_tokens: int = 20,
    min_jaccard: float = 0.8,
    max_hamming: int = 2,
    image_decode: str = "bmp",
    text_pair_source: str = "exact",
) -> DataFrame:
    """The CROSS-MODAL curation funnel: the text funnel's hygiene /
    language / quality / exact-dedup front-end, then ONE transitive
    near-dedup pass whose duplicate edges come from every modality at
    once —

    - **text**: n-gram Jaccard pairs (``text_pair_source='exact'``,
      the oracle-verifiable path) or MinHash+LSH banded pairs
      (``'lsh'``, the 100 TB path — same banding, approximate);
    - **image**: dHash over the REAL decoded payloads
      (``operators.multimodal.image_dhash``) → 16-bit Hamming-banded
      pairs at ``hamming <= max_hamming``;
    - **audio**: energy-envelope fingerprint
      (``operators.multimodal.audio_fingerprint``) → the same banded
      pair join;
    - **video**: REAL frame sampling (``sample_video_frames``, every
      2nd frame of the concatenated-PNG container) → per-frame dHash
      through the real PNG codec → the same Hamming-banded join, with
      MULTIPLE hash rows per asset so two videos pair when ANY
      sampled-frame pair lands within ``max_hamming`` — the
      shifted-edit robustness per-container hashing can't give.

    Edges from all modalities union (distinct) into ONE
    ``graph.connected_components`` pass, so a document whose text was
    paraphrased but whose image is pixel-identical still lands in the
    same cluster — the property three per-modality dedups can't give
    without a cross-modality join. Per-stage survivor counts return as
    one row: ``(n_input, n_lang_filtered, n_quality_filtered,
    n_exact_deduped, n_text_pairs, n_image_pairs, n_audio_pairs,
    n_edges, n_multimodal_deduped)``.

    Scale shape: the narrow row-local text gates shrink the corpus
    before any payload is decoded or any pair join runs; every pair
    source is banded/prefix-filtered (never all-pairs); the union of
    edge sets is id-pairs only (16 bytes/row — payloads never reach
    the CC pass); and connected_components is the same
    large-star/small-star loop every other dedup path rides. Like
    ``funnel_counts_df``, NOT action-free at construction (the CC loop
    runs bounded actions when the DataFrame is built).

    ``images`` / ``audio`` / ``videos``: ``(id_col, payload)`` frames
    — binary BMP/PNG payloads, PCM16 WAVs, and concatenated-PNG video
    containers; any may be None to drop that modality's edges.
    """
    from financial_data_pipeline_optimization_spark.operators import (
        graph,
        multimodal,
    )

    cleaned = text.redact_pii(
        text.clean_text(docs.select(id_col, text_col), text_col), text_col
    )
    lang = (
        text.with_lang_id(cleaned, text_col)
        .filter(F.col("lang_pred").isin(*languages))
        .localCheckpoint(eager=False)
    )
    quality = text.quality_filter(
        lang.select(id_col, text_col), text_col, min_tokens=min_tokens
    ).localCheckpoint(eager=False)
    exact = dedup.exact_dedup(quality, [text_col], id_col).localCheckpoint(
        eager=False
    )
    surviving_ids = exact.select(id_col)

    if text_pair_source == "exact":
        text_pairs = dedup.ngram_jaccard_pairs(
            exact, id_col, text_col, n=2, min_jaccard=min_jaccard
        ).select("a", "b")
    elif text_pair_source == "lsh":
        text_pairs = dedup.minhash_lsh_pairs(
            exact, id_col, text_col, shingle_n=2, min_jaccard=min_jaccard
        ).select("a", "b")
    else:
        raise ValueError(
            f"text_pair_source must be 'exact' or 'lsh', got "
            f"{text_pair_source!r}"
        )
    text_pairs = text_pairs.localCheckpoint(eager=False)

    def _payload_pairs(assets, hasher, hash_col):
        # Decode/hash ONLY the text-stage survivors' payloads.
        alive = assets.withColumnRenamed(id_col, "asset_id").join(
            surviving_ids.withColumnRenamed(id_col, "asset_id"),
            "asset_id",
            "left_semi",
        )
        return (
            multimodal.hamming_banded_pairs(
                hasher(alive),
                hash_col=hash_col,
                max_hamming=max_hamming,
                band_bits=16,
            )
            .select("a", "b")
            # A pair SOURCE is a set: with several hash rows per asset
            # (video frames) the banded join emits one row per
            # matching frame pair at each distinct hamming, so (a, b)
            # repeats; single-hash modalities are already unique and
            # the distinct is a no-op shuffle on id pairs.
            .distinct()
            .localCheckpoint(eager=False)
        )

    image_pairs = (
        _payload_pairs(
            images,
            lambda a: multimodal.image_dhash(a, decode_fn=image_decode),
            "dhash",
        )
        if images is not None
        else None
    )
    audio_pairs = (
        _payload_pairs(audio, multimodal.audio_fingerprint, "afp")
        if audio is not None
        else None
    )
    video_pairs = (
        _payload_pairs(
            videos,
            # One dHash row PER SAMPLED FRAME (asset_id repeats); the
            # banded join then pairs assets on any cross-asset frame
            # match and the trailing distinct collapses multiplicity.
            lambda a: multimodal.image_dhash(
                multimodal.sample_video_frames(a, every_n=2),
                decode_fn="png",
            ),
            "dhash",
        )
        if videos is not None
        else None
    )

    edges = text_pairs
    for p in (image_pairs, audio_pairs, video_pairs):
        if p is not None:
            edges = edges.unionByName(p)
    edges = edges.distinct()

    comp = graph.connected_components(edges)
    survivors = (
        exact.join(
            comp.withColumnRenamed("node", id_col), id_col, "left"
        )
        .where(
            F.coalesce(F.col("component"), F.col(id_col))
            == F.col(id_col)
        )
        .select(id_col)
    )

    def n(df: DataFrame, alias: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("long").alias(alias))

    zero = docs.sparkSession.range(1).select(
        F.lit(0).cast("long").alias("_z")
    )
    out = (
        n(docs, "n_input")
        .crossJoin(n(lang, "n_lang_filtered"))
        .crossJoin(n(quality, "n_quality_filtered"))
        .crossJoin(n(exact, "n_exact_deduped"))
        .crossJoin(n(text_pairs, "n_text_pairs"))
        .crossJoin(
            n(image_pairs, "n_image_pairs")
            if image_pairs is not None
            else zero.select(F.col("_z").alias("n_image_pairs"))
        )
        .crossJoin(
            n(audio_pairs, "n_audio_pairs")
            if audio_pairs is not None
            else zero.select(F.col("_z").alias("n_audio_pairs"))
        )
        .crossJoin(
            n(video_pairs, "n_video_pairs")
            if video_pairs is not None
            else zero.select(F.col("_z").alias("n_video_pairs"))
        )
        .crossJoin(n(edges, "n_edges"))
        .crossJoin(n(survivors, "n_multimodal_deduped"))
    )
    return out


def incremental_ingest(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 2,
    min_jaccard: float = 0.8,
    pair_source: str = "exact",
) -> tuple[DataFrame, DataFrame]:
    """Continuous-ingestion gate: accept the NEW batch's documents
    that are neither exact nor near duplicates of the EXISTING corpus
    — the production corpus-refresh shape (never recluster the world;
    compare the new batch against what is already held).

    Stages, cheap-first like :func:`curate_corpus`:

    1. **exact cross-batch dedup** — canonical-text fingerprint
       (``text.with_fingerprint``), anti-join the new batch's
       fingerprints against the old corpus' distinct fingerprint set
       (16-byte keys; at scale the old side is the persisted
       fingerprint column, not a corpus scan);
    2. **near-dup cross-batch** — ``pair_source='exact'``: exact
       n-gram Jaccard on the union, keeping only old→new pairs (the
       oracle-verifiable path); ``pair_source='lsh'``: the
       ``dedup.minhash_store`` + ``dedup.incremental_near_dups``
       banded index — the 100 TB path, where only the new batch's
       band rows shuffle against the stored index (verified-subset
       equivalence to the exact path is pinned in
       ``tests/test_dedup.py``).

    Returns ``(accepted, report)``: ``accepted`` is the surviving
    slice of ``new`` (original columns); ``report`` is one row of
    stage counts ``(n_old, n_new, n_exact_dup, n_near_dup,
    n_accepted)`` — each rejection counted at the FIRST stage that
    catches it, so the counts always sum: ``n_new = n_exact_dup +
    n_near_dup + n_accepted``.
    """
    old_fp = (
        text.with_fingerprint(old.select(id_col, text_col), text_col)
        .select("fingerprint")
        .distinct()
    )
    new_fp = text.with_fingerprint(new, text_col)
    exact_dupes = new_fp.join(old_fp, "fingerprint", "left_semi")
    survivors = new_fp.join(old_fp, "fingerprint", "left_anti").drop(
        "fingerprint"
    )

    if pair_source == "exact":
        both = old.select(id_col, text_col).unionByName(
            survivors.select(id_col, text_col)
        )
        pairs = dedup.ngram_jaccard_pairs(
            both, id_col, text_col, n=shingle_n, min_jaccard=min_jaccard
        )
        old_ids = old.select(F.col(id_col).alias("__oid"))
        new_ids = survivors.select(F.col(id_col).alias("__nid"))
        near_hit_ids = (
            pairs.join(new_ids, pairs["b"] == new_ids["__nid"], "left_semi")
            .join(old_ids, pairs["a"] == old_ids["__oid"], "left_semi")
            .select(F.col("b").alias(id_col))
            .union(
                pairs.join(
                    new_ids, pairs["a"] == new_ids["__nid"], "left_semi"
                )
                .join(old_ids, pairs["b"] == old_ids["__oid"], "left_semi")
                .select(F.col("a").alias(id_col))
            )
            .distinct()
        )
    elif pair_source == "lsh":
        new_store = dedup.minhash_store(
            survivors, id_col, text_col,
            shingle_n=shingle_n, min_jaccard=min_jaccard,
        )
        old_store = dedup.minhash_store(
            old, id_col, text_col,
            shingle_n=shingle_n, min_jaccard=min_jaccard,
        )
        near_hit_ids = (
            dedup.incremental_near_dups(
                new_store, old_store, min_jaccard=min_jaccard
            )
            .select(F.col("new_id").alias(id_col))
            .distinct()
        )
    else:
        raise ValueError(
            f"pair_source must be 'exact' or 'lsh', got {pair_source!r}"
        )

    accepted = survivors.join(near_hit_ids, id_col, "left_anti")

    n_old = old.count()
    n_new = new.count()
    n_exact = exact_dupes.count()
    n_near = near_hit_ids.count()
    spark = new.sparkSession
    report = spark.createDataFrame(
        [(n_old, n_new, n_exact, n_near, n_new - n_exact - n_near)],
        "n_old bigint, n_new bigint, n_exact_dup bigint, "
        "n_near_dup bigint, n_accepted bigint",
    )
    return accepted, report

"""Heaps'-law-realistic scaled documents corpus (fixed Zipf vocabulary).

The ×10/×100 corpora from `tools/gen_replicated_sf.py` replicate the
base documents with PER-REPLICA DISJOINT vocabularies, so the number of
distinct token types grows LINEARLY with scale — the opposite of real
text, where Heaps' law gives V(n) ~ n^beta with beta ≈ 0.4-0.8. That
distortion already invalidated one experiment (the ship-the-LM unigram
broadcast, SCALING.md) and systematically inflates every vocab-grain
cost: unigram/bigram count tables, PMI, BPE pair counting,
vocab_coverage, DSIR.

This tool generates a scaled documents table whose tokens are sampled
from ONE FIXED Zipf-distributed vocabulary, deterministic in
(doc_id, position) via xxhash64 — no RNG state, byte-identical across
runs and partitionings:

- **Vocabulary**: ranks 1..V (default 10M) with P(rank=r) ∝ r^(-s)
  (default s=1.4). Sampling is the closed-form inverse CDF of the
  continuous Zipf: ``r = (1 + u·(V^(1-s) − 1))^(1/(1-s))`` for uniform
  u — one pow() per token, pure JVM. Zipf exponent s implies Heaps
  beta ≈ 1/s, so observed vocabulary grows ~n^0.71 and SATURATES
  toward V: sublinear at every step, as real corpora do. The word for
  rank r is ``lower(conv(r, 10, 36))`` — frequent ranks get short
  strings, rare ranks long ones, the brevity-frequency correlation of
  natural text, and every word is one `[a-z0-9]+` run (one token under
  `operators.text.tokens`).
- **Document lengths** match the driver corpus (`TESTDATA.md`
  documents: 10-100 tokens, mean ~54): ``8 + hash % 93`` tokens.
- **Planted duplicate structure** (so the dedup sweep cells keep a
  linear pair count, like the replica corpus): in every block of 17
  consecutive doc_ids, the id with remainder 15 is an EXACT copy of
  the remainder-0 doc and the id with remainder 16 a NEAR copy (each
  token independently resampled with p = 1/25, ~2 tokens of ~54) —
  ~5.9% exact dups, ~5.9% near dups, cluster sizes ≤ 3, pair count
  linear in corpus size by construction.
- **Schema parity** with the driver documents table:
  (doc_id long, text string, lang string, source string,
  n_chars long), same lang value set with ~40% 'en' and the same
  'src0'..'src19' source set (so the `decontaminate_vs_benchmark`
  src0-as-benchmark convention holds).

Row counts mirror the replica protocol (sf0.1 has 5,000 documents):
5k / 50k / 500k for ×1 / ×10 / ×100. Only `documents.parquet` is
written — the text sweep cells read nothing else; the relational /
graph / vector cells keep the replica corpora, whose FK and embedding
structure is the realistic part for THEM.

Usage: python tools/gen_zipf_sf.py <n_docs> <out_dir> [vocab_size] [zipf_s]
                                   [--cluster-max B] [--cluster-alpha A]
  e.g. python tools/gen_zipf_sf.py 50000  /tmp/sfzipf10
       python tools/gen_zipf_sf.py 500000 /tmp/sfzipf100
       python tools/gen_zipf_sf.py 500000 /tmp/sfzipfsk100 --cluster-max 100

``--cluster-max`` switches the planted duplicate structure from the
linear 17-block law to POWER-LAW cluster sizes (sizes ~ c^-alpha
truncated at B — the heavy-tailed dup topology of real crawls, where
boilerplate templates spawn huge clusters); see ``zipf_documents``.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Column, DataFrame, functions as F

from financial_data_pipeline_optimization_spark import get_spark

SEED = 20260815
DEFAULT_VOCAB = 10_000_000
DEFAULT_S = 1.4
_U_BITS = 1 << 30


def _u(*cols) -> Column:
    """Deterministic uniform in [0, 1): 30 hash bits / 2^30."""
    return (
        F.pmod(F.xxhash64(*cols), F.lit(_U_BITS)).cast("double")
        / F.lit(float(_U_BITS))
    )


def zipf_rank(u: Column, vocab: int, s: float) -> Column:
    """Inverse-CDF Zipf sampling: continuous CDF over ranks [1, V] is
    F(r) = (r^(1-s) − 1) / (V^(1-s) − 1) for s != 1, so
    r = (1 + u·(V^(1-s) − 1))^(1/(1-s)), floored and clamped to
    [1, V]. P(rank=r) ∝ r^(-s) to within the continuous approximation
    — exact Zipf shape is not load-bearing, DETERMINISM and the
    Heaps-law growth of the observed vocabulary are."""
    c = vocab ** (1.0 - s) - 1.0
    r = F.floor(
        F.pow(F.lit(1.0) + u * F.lit(c), F.lit(1.0 / (1.0 - s)))
    ).cast("long")
    return F.least(F.lit(vocab).cast("long"), F.greatest(F.lit(1).cast("long"), r))


def zipf_word(u: Column, vocab: int, s: float) -> Column:
    """Rank → word: base-36 digits, lowercase — one [a-z0-9]+ run."""
    return F.lower(F.conv(zipf_rank(u, vocab, s).cast("string"), 10, 36))


def zipf_documents(
    spark,
    n_docs: int,
    vocab: int = DEFAULT_VOCAB,
    s: float = DEFAULT_S,
    cluster_max: int | None = None,
    cluster_alpha: float = 2.0,
) -> DataFrame:
    """The scaled documents DataFrame (see module doc). Pure built-in
    expressions: one `transform` over a `sequence` per document — no
    Python in the path, no shuffle before the write.

    ``cluster_max=None`` (default) plants the LEGACY linear dup
    structure (17-blocks, cluster sizes <= 3 — the r13 corpus, kept
    byte-identical so recorded sweeps stay comparable).
    ``cluster_max=B`` plants POWER-LAW duplicate-cluster topology
    instead (the r13 verdict's missing realism axis: real crawl dup
    clusters are heavy-tailed — boilerplate/SEO templates spawn
    thousands of copies while most dups are pairs): doc_ids are tiled
    into blocks of B; each block draws a deterministic cluster size
    c ~ truncated power law P(c) ∝ c^(-cluster_alpha) on [1, B] (same
    inverse-CDF machinery as the vocabulary Zipf, seeded by block id);
    offsets 0..c-1 form one near-dup cluster (offset 0 the template,
    odd offsets exact copies, even offsets near copies with the same
    1/25 per-token mutation rate as the legacy structure); offsets
    c..B-1 stay unique singletons. Cluster sizes follow the planted
    law by construction (pinned in tests/test_zipf_corpus.py), cluster
    membership is row-local in doc_id (no shuffle, deterministic), and
    the max cluster — the LSH hot bucket — is bounded by B and grows
    the candidate-pair mass as E[c^2], the skew the dedup family must
    survive at 100 TB."""
    docs = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    if cluster_max is None:
        rem = F.col("doc_id") % 17
        # Content seed: dup docs (rem 15, 16) read the block base's
        # stream.
        df = docs.withColumn(
            "__content",
            F.when(rem >= 15, F.col("doc_id") - rem).otherwise(
                F.col("doc_id")
            ),
        ).withColumn("__near", rem == 16)
    else:
        if cluster_max < 2:
            raise ValueError(f"cluster_max must be >= 2, got {cluster_max}")
        block = (F.col("doc_id") / cluster_max).cast("long")
        offset = F.col("doc_id") % cluster_max
        csize = zipf_rank(
            _u(F.lit(SEED), block, F.lit("csize")),
            cluster_max,
            cluster_alpha,
        )
        in_cluster = offset < csize
        df = docs.withColumn(
            "__content",
            F.when(in_cluster, F.col("doc_id") - offset).otherwise(
                F.col("doc_id")
            ),
        ).withColumn(
            "__near", in_cluster & (offset > 0) & (offset % 2 == 0)
        )
    df = df.withColumn(
        "__n",
        (
            F.lit(8)
            + F.pmod(
                F.xxhash64(F.lit(SEED), F.col("__content"), F.lit("len")),
                F.lit(93),
            )
        ).cast("int"),
    )

    def token(i: Column) -> Column:
        base = zipf_word(
            _u(F.lit(SEED), F.col("__content"), F.lit("tok"), i), vocab, s
        )
        mutated = zipf_word(
            _u(F.lit(SEED), F.col("doc_id"), F.lit("alt"), i), vocab, s
        )
        is_mut = F.col("__near") & (
            F.pmod(
                F.xxhash64(F.lit(SEED), F.col("doc_id"), F.lit("mut"), i),
                F.lit(25),
            )
            == 0
        )
        return F.when(is_mut, mutated).otherwise(base)

    text = F.array_join(
        F.transform(F.sequence(F.lit(1), F.col("__n")), token), " "
    )
    # ~40% en like the driver corpus (8/20 en, 3 each of the rest).
    langs = ["en"] * 8 + ["zh", "es", "fr", "de"] * 3
    lang = F.element_at(
        F.array(*[F.lit(x) for x in langs]),
        (F.pmod(F.xxhash64(F.lit(SEED), F.col("doc_id"), F.lit("lang")), F.lit(20)) + 1).cast("int"),
    )
    source = F.concat(
        F.lit("src"),
        F.pmod(
            F.xxhash64(F.lit(SEED), F.col("doc_id"), F.lit("src")), F.lit(20)
        ).cast("string"),
    )
    return df.select(
        "doc_id",
        text.alias("text"),
        lang.alias("lang"),
        source.alias("source"),
    ).withColumn("n_chars", F.length("text").cast("long"))


def main() -> None:
    import argparse

    p = argparse.ArgumentParser(
        description="Heaps-law Zipf documents corpus generator"
    )
    p.add_argument("n_docs", type=int)
    p.add_argument("out_dir")
    p.add_argument("vocab", type=int, nargs="?", default=DEFAULT_VOCAB)
    p.add_argument("zipf_s", type=float, nargs="?", default=DEFAULT_S)
    p.add_argument(
        "--cluster-max",
        type=int,
        default=None,
        help="plant power-law dup clusters tiled in blocks of this "
        "size (default: legacy 17-block linear structure)",
    )
    p.add_argument(
        "--cluster-alpha",
        type=float,
        default=2.0,
        help="cluster-size power-law exponent (P(c) ~ c^-alpha)",
    )
    a = p.parse_args()
    n_docs, out_dir, vocab, s = a.n_docs, a.out_dir, a.vocab, a.zipf_s
    spark = get_spark(app_name="fdpo-gen-zipf")
    Path(out_dir).mkdir(parents=True, exist_ok=True)
    n_parts = min(64, max(4, n_docs // 10_000))
    zipf_documents(
        spark, n_docs, vocab, s,
        cluster_max=a.cluster_max, cluster_alpha=a.cluster_alpha,
    ).repartition(
        n_parts
    ).write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    # Report the Heaps-law evidence: observed vocabulary vs tokens.
    stats = (
        spark.read.parquet(f"{out_dir}/documents.parquet")
        .select(
            F.explode(
                F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), 0)
            ).alias("t")
        )
        .agg(
            F.count("*").alias("n_tokens"),
            F.countDistinct("t").alias("vocab_observed"),
        )
        .first()
    )
    print(
        f"wrote {out_dir}/documents.parquet: {n_docs} docs, "
        f"{stats['n_tokens']} tokens, {stats['vocab_observed']} types "
        f"(V={vocab}, s={s}, seed={SEED})"
    )


if __name__ == "__main__":
    main()

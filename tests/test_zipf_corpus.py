"""Contract tests for the Heaps'-law-realistic scaled corpus
(tools/gen_zipf_sf.py).

The zipf corpus exists to fix the one distortion of the replica
protocol — linear vocabulary growth — so the properties that make its
measurements TRUSTWORTHY are pinned here:

- determinism in (doc_id, position): same inputs => byte-identical
  text regardless of partitioning or row order (the sweep must be
  reproducible without shipping parquet between sessions);
- the planted duplicate structure (every block of 17: rem-15 exact
  copy of rem-0, rem-16 a ~2-token near copy) that keeps the dedup
  sweep cells' pair count linear in corpus size;
- schema parity with the driver documents table, so every registered
  text query runs unmodified;
- Heaps-law sublinearity: doubling the corpus must NOT double the
  observed vocabulary (the replica corpus fails exactly this check —
  its per-replica disjoint vocabularies double the type count).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tools.gen_zipf_sf import zipf_documents

from .conftest import SF_SMOKE


def _texts(spark, n, **kw):
    return {
        r["doc_id"]: r["text"]
        for r in zipf_documents(spark, n, **kw).collect()
    }


def test_deterministic_and_partitioning_invariant(spark):
    a = _texts(spark, 200)
    df = zipf_documents(spark, 200)
    b = {
        r["doc_id"]: r["text"]
        for r in df.repartition(7, "doc_id").collect()
    }
    assert a == b
    # A doc's content depends only on its id, not the corpus size:
    # the 200-doc corpus is a strict prefix of the 500-doc one.
    c = _texts(spark, 500)
    assert all(c[k] == v for k, v in a.items())


def test_planted_duplicate_structure(spark):
    t = _texts(spark, 17 * 20)
    for base in range(0, 17 * 20, 17):
        if base + 16 >= 17 * 20:
            break
        # rem-15 is an EXACT copy of the block base.
        assert t[base + 15] == t[base]
        # rem-16 is a NEAR copy: same token count, small Hamming
        # distance in token space (p=1/25 per-token mutation).
        orig, near = t[base].split(" "), t[base + 16].split(" ")
        assert len(orig) == len(near)
        diff = sum(1 for x, y in zip(orig, near) if x != y)
        assert diff < len(orig) // 2
    # Across all blocks at least one near-copy actually mutated —
    # otherwise the "near" class silently collapses into exact dups
    # and the LSH cells measure nothing.
    assert any(
        t[b + 16] != t[b] for b in range(0, 17 * 19, 17)
    )


def test_planted_powerlaw_cluster_topology(spark):
    """The r14 skewed-topology mode (``cluster_max=B``): cluster sizes
    must follow the planted truncated power law — deterministic,
    heavy-tailed, bounded by B — and the members must really be
    near-dups of their block template. Pinned structurally (exact/near
    copy roles by offset parity) and distributionally (size-1 blocks
    dominate, monotone-decreasing bucket counts, at least one cluster
    in the top size quartile so the LSH hot bucket exists)."""
    B, N = 32, 32 * 120
    df = zipf_documents(spark, N, cluster_max=B, cluster_alpha=2.0)
    t = {r["doc_id"]: r["text"] for r in df.collect()}

    # The planted size of each block's cluster, recomputed with the
    # generator's own deterministic expression (seeded xxhash64 →
    # truncated power-law inverse CDF) — exact, no text heuristics.
    import collections

    from tools.gen_zipf_sf import SEED, _u, zipf_rank

    sizes = [
        r["c"]
        for r in spark.range(N // B)
        .select(
            zipf_rank(
                _u(F.lit(SEED), F.col("id").cast("long"), F.lit("csize")),
                B,
                2.0,
            ).alias("c")
        )
        .collect()
    ]
    # Structure agrees with the planted size: inside the cluster, odd
    # offsets are EXACT copies of the template and even offsets near
    # copies (same length); the first offset past the cluster is NOT a
    # copy.
    for base, c in zip(range(0, N, B), sizes):
        for off in range(1, c):
            if off % 2 == 1:
                assert t[base + off] == t[base], (base, off)
            else:
                doc, tpl = t[base + off].split(" "), t[base].split(" ")
                assert len(doc) == len(tpl), (base, off)
        if c < B:
            assert t[base + c] != t[base], (base, c)

    counts = collections.Counter(sizes)
    # Power law: singletons are the modal size (P(c=1) ~ 0.52 under
    # alpha=2 truncated at 32) and bucket mass decays with size
    # (compare coarse octave buckets to dodge small-sample noise).
    assert counts[1] == max(counts.values())
    octaves = [
        sum(v for k, v in counts.items() if lo <= k < lo * 2)
        for lo in (1, 2, 4, 8, 16)
    ]
    assert all(
        a >= b for a, b in zip(octaves, octaves[1:])
    ), octaves
    # Heavy tail: the deterministic seed plants at least one cluster
    # an order of magnitude above the median (the hot LSH bucket), and
    # the truncation bound holds.
    assert max(sizes) >= 8, counts
    assert max(sizes) <= B

    # Determinism: same knobs => same sizes on a differently
    # partitioned evaluation.
    df2 = zipf_documents(spark, N, cluster_max=B, cluster_alpha=2.0)
    t2 = {
        r["doc_id"]: r["text"]
        for r in df2.repartition(7, "doc_id").collect()
    }
    assert t == t2


def test_powerlaw_clusters_recovered_by_dedup(spark):
    """End-to-end: near_dup_clusters over the skewed corpus recovers
    every planted multi-doc cluster as one component keyed by the
    block template (the min id)."""
    from financial_data_pipeline_optimization_spark.operators import dedup

    B, N = 16, 16 * 40
    df = zipf_documents(spark, N, cluster_max=B, cluster_alpha=2.0)
    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.near_dup_clusters(
            df, "doc_id", "text", n=2, min_jaccard=0.8,
            pair_source="lsh", materialize=False,
        ).collect()
    }
    t = {r["doc_id"]: r["text"] for r in df.collect()}
    for base in range(0, N, B):
        # Every EXACT copy (odd offsets inside the cluster) must share
        # the template's label; exact dups are immune to the LSH
        # S-curve, so this holds under any banding.
        for off in range(1, B, 2):
            if t[base + off] == t[base]:
                assert labels[base + off] == labels[base] == base


def test_schema_parity_with_driver_documents(spark):
    """The generated corpus is column-compatible with the driver's
    documents table (same dtypes), with sane per-row metadata — so
    every documents-table query runs unchanged on the zipf corpus."""
    driver = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    zipf = zipf_documents(spark, 10)
    assert dict(zipf.dtypes) == dict(driver.dtypes)
    rows = zipf.collect()
    assert all(r["n_chars"] == len(r["text"]) for r in rows)
    assert all(r["source"].startswith("src") for r in rows)
    assert {r["lang"] for r in rows} <= {"en", "zh", "es", "fr", "de"}


def test_heaps_sublinear_vocab_growth(spark):
    def vocab(n):
        return (
            zipf_documents(spark, n)
            .select(
                F.explode(
                    F.regexp_extract_all(
                        F.lower("text"), F.lit("[a-z0-9]+"), 0
                    )
                ).alias("t")
            )
            .agg(F.countDistinct("t"))
            .first()[0]
        )

    v1, v4 = vocab(500), vocab(2000)
    # 4x the docs must give well under 4x the types (Heaps' law);
    # beta ~ 0.7 predicts ~2.6x, so gate at 3.2x with noise headroom.
    assert v1 > 0
    assert v4 / v1 < 3.2, (v1, v4)

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


def test_schema_parity_with_driver_documents(spark):
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

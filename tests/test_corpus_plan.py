"""End-to-end corpus curation plan: funnel semantics on real documents."""

from __future__ import annotations

from pyspark.sql import functions as F

from financial_data_pipeline_optimization_spark.plans.corpus import (
    curate_corpus,
    funnel_counts,
)
from financial_data_pipeline_optimization_spark.sources import load_table

from .conftest import SF_SMOKE


def test_curate_corpus_annotations_and_monotonicity(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    out = curate_corpus(docs, languages=("en", "und"), min_tokens=5)
    rows = out.collect()
    assert 0 < len(rows) <= docs.count()
    assert {"doc_id", "text", "lang_pred", "n_bpe_ish_tokens", "split"} <= set(
        out.columns
    )
    assert all(r.split in ("train", "val", "test") for r in rows)
    assert all(r.n_bpe_ish_tokens > 0 for r in rows)
    # dedup means ids are unique
    assert len({r.doc_id for r in rows}) == len(rows)


def test_curate_corpus_idempotent(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    once = curate_corpus(docs, languages=("en", "und"), min_tokens=5)
    twice = curate_corpus(
        once.select("doc_id", "text"), languages=("en", "und"), min_tokens=5
    )
    assert sorted(r.doc_id for r in twice.collect()) == sorted(
        r.doc_id for r in once.collect()
    )


def test_funnel_counts_monotone_decreasing(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    c = funnel_counts(docs, languages=("en", "und"), min_tokens=5)
    order = [
        "input",
        "lang_filtered",
        "quality_filtered",
        "exact_deduped",
        "near_deduped",
    ]
    vals = [c[k] for k in order]
    assert vals == sorted(vals, reverse=True)
    assert vals[-1] > 0


def test_incremental_ingest_partitions_the_new_batch(spark):
    """accepted + exact-rejected + near-rejected exactly partition the
    new batch (each rejection counted at its first stage), and the
    report's arithmetic invariant holds."""
    from financial_data_pipeline_optimization_spark.plans.corpus import (
        incremental_ingest,
    )
    from .conftest import SF_CORRECTNESS

    docs = load_table(spark, SF_CORRECTNESS, "documents")
    old = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    accepted, report = incremental_ingest(old, new, pair_source="exact")
    r = report.collect()[0]
    assert r.n_new == r.n_exact_dup + r.n_near_dup + r.n_accepted
    assert r.n_near_dup > 0, "planted cross-batch near-dups must be caught"
    got = accepted.count()
    assert got == r.n_accepted
    assert accepted.join(new, "doc_id", "left_anti").count() == 0
    assert sorted(accepted.columns) == sorted(new.columns)


def test_incremental_ingest_lsh_is_verified_subset(spark):
    """The LSH store path may only reject documents the exact path
    rejects (verified pairs are a subset of exact pairs), so
    accepted_exact ⊆ accepted_lsh and both satisfy the same report
    arithmetic."""
    from financial_data_pipeline_optimization_spark.plans.corpus import (
        incremental_ingest,
    )
    from .conftest import SF_CORRECTNESS

    docs = load_table(spark, SF_CORRECTNESS, "documents")
    old = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    acc_exact, _ = incremental_ingest(old, new, pair_source="exact")
    acc_lsh, rep_lsh = incremental_ingest(old, new, pair_source="lsh")
    exact_ids = {r.doc_id for r in acc_exact.collect()}
    lsh_ids = {r.doc_id for r in acc_lsh.collect()}
    assert exact_ids <= lsh_ids
    r = rep_lsh.collect()[0]
    assert r.n_new == r.n_exact_dup + r.n_near_dup + r.n_accepted

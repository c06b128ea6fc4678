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

"""A/B spec (tools/ab.py): near_dup_clusters' label join — shipped
SMJ vs broadcast-hinted component table (r16, VERDICT task #5).

The r16 derived-join audit (tools/audit_derived_joins.py) found every
vocabulary-sized derived join already broadcast by AQE (pmi, bigram,
contamination — confirming the r15 bigram revert) EXCEPT
near_dup_clusters' final label join: `ids LEFT JOIN comp` executes as
a SortMergeJoin because `comp` (the connected-components output) is a
localCheckpointed LogicalRDD AQE cannot size — the same blindness the
unigram vocabulary relation had. `comp` holds one (node, component)
row per document that appears in ANY near-dup pair — typically a
small fraction of the corpus, but corpus-dependent (a fully-
duplicated corpus puts every doc in it), so the shippable form would
be a broadcast_if_small gate, not an unconditional hint. This spec
measures the ceiling first: forced broadcast vs shipped, full query,
three corpora.

Run: python tools/ab.py --spec tools/ab_ndc_label.py AB_NDC_LABEL.json
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )


def shipped(spark, sf_dir):
    """The registry plan verbatim (resolved, not frozen)."""
    from financial_data_pipeline_optimization_spark.operators import dedup

    return dedup.near_dup_clusters(
        _docs(spark, sf_dir), "doc_id", "text", n=2, min_jaccard=0.8,
        materialize=False,
    )


def bcast_label(spark, sf_dir):
    """Same pairs + components, label join with a FORCED broadcast of
    the component table (the gate's best case; a shipped version
    would wrap it in joins.broadcast_if_small)."""
    from financial_data_pipeline_optimization_spark.operators import dedup
    from financial_data_pipeline_optimization_spark.operators.graph import (
        connected_components,
    )

    docs = _docs(spark, sf_dir)
    # Mirror near_dup_clusters' auto path at these corpora: the gate
    # picks the exact source everywhere this spec runs (fan-out
    # ~1e5-6e8 vs sf0.1/zipf budgets) — keep parity by calling the
    # same internals the shipped query uses.
    st: dict = {}
    shared = dedup._hashed_sorted_sets(docs, "doc_id", "text", 2)
    shared = shared.localCheckpoint(eager=False)
    fanout = dedup.exact_index_fanout(shared, 0.8)
    if fanout <= dedup.EXACT_FANOUT_BUDGET:
        prs = dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", n=2, min_jaccard=0.8, _sets=shared
        )
    else:
        prs = dedup.minhash_lsh_pairs(
            docs, "doc_id", "text", shingle_n=2, min_jaccard=0.8,
            _sets=shared,
        )
    comp = connected_components(prs.select("a", "b"), "a", "b")
    ids = docs.select(F.col("doc_id"))
    return ids.join(
        F.broadcast(comp), ids["doc_id"] == comp["node"], "left"
    ).select(
        F.col("doc_id"),
        F.coalesce(F.col("component"), F.col("doc_id")).alias(
            "cluster_id"
        ),
    )


AB_VARIANTS = {"shipped": shipped, "bcast_label": bcast_label}
AB_DATASETS = [
    ("x1", "/root/testdata/sf0.1"),
    ("zx10", "/tmp/sfzipf10"),
    ("skx10", "/tmp/sfzipfsk10"),
]

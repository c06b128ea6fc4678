"""Per-phase cost breakdown of the cluster-family headliners (r17,
VERDICT #4 groundwork): where do near_dup_clusters' seconds actually
go — the fan-out probe, the pair join, the CC loop's actions, the
label-join broadcast gate count, or the election window?

Times each phase with the bench's own methodology (construction vs
noop action separated, job descriptions set) in ONE warm session —
this is a diagnostic for locating cost, not an A/B artifact; the
before/after evidence for any change still comes from tools/ab.py
fresh-JVM cells.

Usage: python tools/probe_cluster_phases.py [SF_DIR] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def main() -> None:
    from financial_data_pipeline_optimization_spark import get_spark
    from financial_data_pipeline_optimization_spark.operators import dedup
    from financial_data_pipeline_optimization_spark.operators.graph import (
        connected_components,
    )

    spark = get_spark(app_name="cluster-phase-probe")
    sc = spark.sparkContext
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def timed(label, build):
        """(construct_s, action_s) medians over REPS; build() returns a
        DataFrame; the noop sink runs the full plan."""
        cons, acts = [], []
        for _ in range(REPS + 1):  # first rep is warm-up, dropped
            sc.setJobDescription(f"probe:{label}")
            t0 = time.perf_counter()
            df = build()
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            cons.append(t1 - t0)
            acts.append(t2 - t1)
            sc.setJobDescription(None)
        cons, acts = sorted(cons[1:]), sorted(acts[1:])
        m = len(cons) // 2
        return round(cons[m], 3), round(acts[m], 3)

    out = {}

    # Phase A: the hashed-sorted-sets pass alone (shared by probe+join).
    out["sets_only"] = timed(
        "sets",
        lambda: dedup._hashed_sorted_sets(docs, "doc_id", "text", 2),
    )

    # Phase B: the fan-out probe alone (sets pass + explode + agg).
    def probe_only():
        sets = dedup._hashed_sorted_sets(
            docs, "doc_id", "text", 2
        ).localCheckpoint(eager=False)
        dedup.exact_index_fanout(sets, 0.8)
        return sets.limit(0)

    out["probe_only_construct"] = timed("probe", probe_only)

    # Phase C: exact pairs, no probe (pair_source="exact").
    out["pairs_exact"] = timed(
        "pairs",
        lambda: dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", n=2, min_jaccard=0.8
        ),
    )

    # Phase D: pairs -> CC only (no label join).
    def cc_only():
        pairs = dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", n=2, min_jaccard=0.8
        )
        return connected_components(pairs.select("a", "b"), "a", "b")

    out["pairs_cc"] = timed("cc", cc_only)

    # Phase E: full near_dup_clusters, explicit exact (no probe).
    out["ndc_exact"] = timed(
        "ndc_exact",
        lambda: dedup.near_dup_clusters(
            docs, "doc_id", "text", n=2, min_jaccard=0.8,
            pair_source="exact", materialize=False,
        ),
    )

    # Phase F: full near_dup_clusters, auto (the headliner plan).
    out["ndc_auto"] = timed(
        "ndc_auto",
        lambda: dedup.near_dup_clusters(
            docs, "doc_id", "text", n=2, min_jaccard=0.8,
            materialize=False,
        ),
    )

    # Phase G: the cluster_representatives composition.
    def reps_build():
        labels = dedup.near_dup_clusters(
            docs, "doc_id", "text", n=2, min_jaccard=0.8,
            carry_cols=["n_chars"], materialize=False,
        )
        return dedup.elect_representatives(
            labels, "doc_id", "cluster_id", "n_chars", min_members=2
        )

    out["cluster_reps"] = timed("reps", reps_build)

    print(json.dumps({"sf_dir": SF_DIR, "reps": REPS, "phases": out}))


if __name__ == "__main__":
    main()

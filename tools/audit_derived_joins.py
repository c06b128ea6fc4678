"""Derived-relation join audit (r16, VERDICT task #5).

The unigram_logprob_score broadcast win existed because AQE cannot
size a localCheckpointed LogicalRDD at PLAN time — but AQE *can*
upgrade a join whose build side is the output of a SHUFFLE it has
runtime stats for. So the question per site is empirical: after AQE
finishes, did the derived-relation join execute as a BroadcastHashJoin
(nothing to do) or stay a SortMergeJoin whose build side was actually
small (a broadcast_if_small candidate)?

This harness answers it from the EXECUTED plan: for each audited
query it runs the query at $SPARK_GRAFT_SF_DIR (default sf0.01) with a
noop sink, then reads ``queryExecution().executedPlan`` — the final
adaptive plan — and reports the SMJ/BHJ mix plus every SMJ's
estimated build-side row counts from the plan statistics. Verdicts
land in SCALING.md's audit table; sites that stay SMJ with a small
side graduate to a tools/ab.py A/B before any gate ships (the r15
bigram lesson: a gate on a site AQE already handles is a measured
LOSS, not a no-op).

Run: ``python tools/audit_derived_joins.py [query ...]``
"""

from __future__ import annotations

import os
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

#: Queries with at least one join whose build side is a DERIVED
#: (checkpointed / aggregated) relation the optimizer cannot size at
#: plan time — the static enumeration behind the dynamic audit. Sites
#: with an already-shipped or already-measured verdict are listed for
#: completeness and re-checked each run.
AUDITED = (
    # shipped r15 gate (broadcast_if_small): vocabulary count relation
    "unigram_logprob_score",
    # measured NEGATIVE r15 (AQE already broadcasts): unigram leg
    "bigram_interp_logprob",
    # bigram<-uni frequency joins (vocab-sized, derived via groupBy)
    "pmi_bigram_phrases",
    # corpus shingles semi-join DISTINCT benchmark shingles (derived)
    "contamination_report",
    # near-dedup keep-list semi-join + CC label join
    "corpus_curation_funnel",
    # CC label join (comp is iterative output, unsizable at plan time)
    "near_dup_clusters",
    # split labels against cluster labels (derived x derived)
    "leakage_safe_split",
)


def executed_plan(df) -> str:
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


def audit(names) -> dict[str, dict]:
    from financial_data_pipeline_optimization_spark import get_spark
    from financial_data_pipeline_optimization_spark import queries as q

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="derived-join-audit")
    specs = {s.name: s for s in q.registry()}
    out: dict[str, dict] = {}
    for name in names:
        try:
            plan = executed_plan(specs[name].spark(spark, sf_dir))
        except Exception as ex:  # noqa: BLE001 — audit must not abort
            out[name] = {"err": f"{type(ex).__name__}: {ex}"[:200]}
            continue
        out[name] = {
            "smj": len(re.findall(r"\bSortMergeJoin\b", plan)),
            "bhj": len(re.findall(r"\bBroadcastHashJoin\b", plan)),
            "aqe_bhj_upgrades": plan.count("AQEShuffleRead local"),
            "bcast_exchanges": len(
                re.findall(r"\bBroadcastExchange\b", plan)
            ),
        }
        print(f"{name}: {out[name]}", flush=True)
    return out


if __name__ == "__main__":
    names = sys.argv[1:] or AUDITED
    audit(names)

"""Text-cell scaling on the Heaps'-law-realistic Zipf corpus.

`tools/bench_scaled.py` measures the compute-dominated exponents on
the REPLICATED corpora, whose per-replica disjoint vocabularies grow
the type count LINEARLY with scale (31 -> 310 -> 3,100 types at
x1/x10/x100) — the opposite of real text, and ~86x FEWER types at
x100 than a Heaps-law corpus of the same token count. That distortion
cuts both ways: it understates vocab-grain state (tiny unigram/bigram
tables that would broadcast for free) while growing it at the wrong
RATE (linear instead of ~n^0.7). This harness re-measures every
documents-table sweep cell on the fixed-Zipf corpus from
`tools/gen_zipf_sf.py` (measured curve: 10,975 -> 54,967 -> 266,940
types for 0.27M -> 2.7M -> 27M tokens; Heaps beta ~ 0.70), so the
replica-vs-zipf growth DIFF is the corpus-realism correction factor
the 100 TB extrapolation needs (SCALING.md records the table).

Protocol is bench_scaled's, shared by import — recorded sweeps use
``--percell`` (one fresh-JVM child per cell, warmed untimed at the target dataset;
see bench_scaled's module doc for the session-contamination evidence
that motivated it), noop sink, median-of-3 samples (r14), resumable
out.json merge. Growth
budgets live in tools/scale_budgets.json under ``zipf:``-prefixed
keys (``zipf:_default`` for new cells), gated by --check /
SPARK_GRAFT_SCALED_CHECK=1 exactly like the replica sweep.

Usage:
  python tools/gen_zipf_sf.py 5000   /tmp/sfzipf1
  python tools/gen_zipf_sf.py 50000  /tmp/sfzipf10
  python tools/gen_zipf_sf.py 500000 /tmp/sfzipf100
  python tools/bench_zipf.py [out.json] [--check]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.bench_scaled import (  # noqa: E402
    build_specs,
    check_growth,
    parse_cli,
    percell_loop,
    print_table,
    sweep,
    warm_on,
)
from financial_data_pipeline_optimization_spark import get_spark  # noqa: E402

#: SPARK_GRAFT_ZIPF_SKEWED=1 switches the sweep to the POWER-LAW
#: dup-cluster corpora (gen_zipf_sf.py --cluster-max 100: sizes ~
#: c^-2 truncated at 100, so the biggest LSH bucket holds ~100 docs /
#: ~5k candidate pairs) and restricts the cells to the dedup family —
#: the operators whose cost is actually driven by dup topology. Env
#: var, not a flag, so --percell children (which re-exec this script)
#: inherit the mode automatically. Budgets live under ``zipfsk:``.
SKEWED = os.environ.get("SPARK_GRAFT_ZIPF_SKEWED") == "1"

if SKEWED:
    DATASETS = [
        ("skx1", "/tmp/sfzipfsk1"),
        ("skx10", "/tmp/sfzipfsk10"),
        ("skx100", "/tmp/sfzipfsk100"),
    ]
    LO, HI, PREFIX = "skx10", "skx100", "zipfsk:"
else:
    DATASETS = [
        ("zx1", "/tmp/sfzipf1"),
        ("zx10", "/tmp/sfzipf10"),
        ("zx100", "/tmp/sfzipf100"),
    ]
    LO, HI, PREFIX = "zx10", "zx100", "zipf:"

#: Every documents-table cell of the replica sweep (the 14 text cells
#: plus the 5 r13 audit-floor cells). Graph/vector/relational cells
#: stay replica-only: their scaling driver is FK/edge/embedding
#: structure, which the replica protocol models correctly — the zipf
#: corpus only changes what TEXT looks like.
QUERIES = [
    "exact_dedup_docs",
    "minhash_lsh_pairs",
    "minhash_lsh_pairs_16x4",
    "near_dup_clusters_lsh",
    "near_dup_clusters_lsh_16x4",
    "pmi_bigram_phrases",
    "substring_dedup_docs",
    "substring_dedup_n50",
    "bm25_topk_docs",
    "unigram_logprob_score",
    "pack_chunks_bins",
    "bigram_interp_logprob",
    "quality_filter",
    "relative_length_filter",
    "lang_id_heuristic",
    "template_prefix_flags",
    "text_stats",
    "vocab_coverage",
    "doc_fingerprint",
    "decontaminate_vs_benchmark",
    "contamination_report",
    # r15: asymmetric containment — the df-ordered-prefix fix's trend
    # line (hash-ordered prefixes were ~quadratic on this corpus's
    # background vocabulary: 144 s at 50k docs pre-fix vs 11.5 s).
    "containment_pairs_report",
]

if SKEWED:
    QUERIES = [
        "exact_dedup_docs",
        "minhash_lsh_pairs",
        "near_dup_clusters_lsh",
        # r15: the DEFAULT (pair_source="auto") cluster queries record
        # real skewed cells — the fan-out gate picks exact at skx1
        # (~6e6 candidates) and LSH at skx10/skx100 (~6e8/~6e10,
        # where the exact index DNF'd in r14), so these cells time
        # probe + the chosen source. The *_lsh twins above/below keep
        # the probe-free pure-LSH trend line.
        "near_dup_clusters",
        "cluster_representatives",
        "cluster_representatives_lsh",
        # Heavy-tailed dup clusters also stress the suffix-window
        # dedup (100-doc clusters -> 100-member duplicate window
        # groups) — measured so the exponent is pinned, not assumed.
        "substring_dedup_docs",
        # r15: the df-ordered containment prefix under dup-cluster
        # skew (each 100-doc cluster contributes ~C(100,2) ordered
        # containment pairs — output grows faster than the corpus,
        # the budget accounts for it).
        "containment_pairs_report",
    ]


def main() -> None:
    cli = parse_cli(
        "/tmp/bench_zipf.json",
        "Heaps-law Zipf corpus zx1/zx10/zx100 text-cell sweep",
    )
    check = cli.check or os.environ.get("SPARK_GRAFT_SCALED_CHECK") == "1"
    percell = cli.percell
    out_path = cli.out_path
    # Median-of-3 (r14): with worse-of-2, one slow-mode rep (the
    # storage-pressure bimodality the rep evidence lines document)
    # polluted the recorded cell with probability 1-(1-p)^2; the
    # true median of 3 reps records the typical mode while the
    # children.log keeps the outlier visible.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    only = {
        s for s in os.environ.get("SPARK_GRAFT_SCALED_SETS", "").split(",") if s
    }
    only_q = {
        s
        for s in os.environ.get("SPARK_GRAFT_SCALED_QUERIES", "").split(",")
        if s
    }
    queries = [n for n in QUERIES if not only_q or n in only_q]

    if percell:
        results = percell_loop(
            __file__, DATASETS, queries, out_path, only_sets=only,
            retry_failed=cli.retry_failed,
        )
        print_table(results, DATASETS, queries, lo=LO, hi=HI)
        if check:
            violations = check_growth(
                results, lo=LO, hi=HI, budget_prefix=PREFIX
            )
            for v in violations:
                print(f"SCALE-GATE VIOLATION: {v}")
            if violations:
                sys.exit(1)
            print("SCALE-GATE: all zipf growth budgets held")
        return

    spark = get_spark(app_name="fdpo-bench-zipf")
    specs = build_specs(queries)
    spark.range(1024).repartition(64).mapInPandas(
        lambda it: it, "id long"
    ).count()
    warm_dir = os.environ.get("SPARK_GRAFT_SCALED_WARM_DIR")
    if warm_dir:
        warm_on(spark, specs, queries, warm_dir)

    results = sweep(
        spark, DATASETS, queries, specs, out_path, reps, only_sets=only
    )
    print_table(results, DATASETS, queries, lo=LO, hi=HI)

    if check:
        violations = check_growth(
            results, lo=LO, hi=HI, budget_prefix=PREFIX
        )
        for v in violations:
            print(f"SCALE-GATE VIOLATION: {v}")
        if violations:
            sys.exit(1)
        print("SCALE-GATE: all zipf growth budgets held")


if __name__ == "__main__":
    main()

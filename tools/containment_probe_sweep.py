"""Containment candidate-bound accuracy sweep (r16, VERDICT task #3
"done when": the estimate's accuracy vs actual pairs recorded in
SCALING.md on both corpora).

For each corpus, runs ``containment_pairs(stats=...)`` once and
records: the probe's candidate_bound (Σ df over ranked prefix rows —
an upper bound on the candidate join's pre-dedup output), prefix_rows
(the self-match share of the bound), the TRUE emitted pair count, the
probe's own wall time, and the full enumerate wall time. The
bound/pairs ratio is the forewarning factor a 100 TB caller should
expect; probe_s vs total_s is what the forewarning costs.

Run quiet: ``python tools/containment_probe_sweep.py [out.json]``
(fresh JVM per corpus via tools/ab.py's spawn machinery is
unnecessary here — the sweep measures COUNTS, which are
load-independent; the wall times are context, not gated cells).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

CORPORA = (
    ("zx1", "/tmp/sfzipf1"),
    ("zx10", "/tmp/sfzipf10"),
    ("skx1", "/tmp/sfzipfsk1"),
    ("skx10", "/tmp/sfzipfsk10"),
)


def main() -> None:
    from financial_data_pipeline_optimization_spark import get_spark
    from financial_data_pipeline_optimization_spark.operators import dedup

    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/containment_probe.json"
    spark = get_spark(app_name="containment-probe-sweep")
    results = {}
    for name, d in CORPORA:
        if not Path(d).exists():
            results[name] = {"err": "corpus missing"}
            continue
        docs = spark.read.parquet(f"{d}/documents.parquet").select(
            "doc_id", "text"
        )
        st: dict = {}
        t0 = time.perf_counter()
        pairs = dedup.containment_pairs(
            docs, "doc_id", "text", n=2, min_containment=0.9, stats=st
        )
        probe_s = time.perf_counter() - t0  # stats hook ran eagerly
        t1 = time.perf_counter()
        n_pairs = pairs.count()
        total_s = time.perf_counter() - t1
        results[name] = {
            "candidate_bound": st["candidate_bound"],
            "prefix_rows": st["prefix_rows"],
            "n_pairs": n_pairs,
            "bound_over_pairs": round(
                st["candidate_bound"] / max(n_pairs, 1), 1
            ),
            "probe_s": round(probe_s, 2),
            "enumerate_s": round(total_s, 2),
        }
        print(f"{name}: {results[name]}", flush=True)
        Path(out_path).write_text(json.dumps(results, indent=1) + "\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()

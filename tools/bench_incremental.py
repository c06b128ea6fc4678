"""Continuous-ingestion cost: O(batch), not O(corpus) — measured.

The engine's incremental near-dup path (`dedup.minhash_store` +
`dedup.incremental_near_dups`) claims the production property that a
new batch is checked against a PERSISTED signature store instead of
re-clustering the corpus. This harness measures that claim directly:

- per corpus scale (sf0.1 docs = 5k, x10 = 50k, x100 = 500k):
  - ``store_build_sec`` — one-time cost of building + persisting the
    corpus signature store (parquet, the layout a pipeline keeps hot);
  - ``incremental_sec`` — checking a FIXED 500-doc batch against the
    persisted store (signature the batch, band-join, verify);
  - ``full_recompute_sec`` — the alternative the incremental path
    exists to avoid: `minhash_lsh_pairs` over corpus ∪ batch.

The headline read: ``incremental_sec`` stays ~flat as the corpus
grows 100× while ``full_recompute_sec`` tracks corpus size — the gap
IS the continuous-ingestion win. Store reads come from parquet (not a
warm cache), so the incremental leg pays realistic store-scan cost;
at 100 TB the store would be bucketed on (band, band_hash) so only
the batch's bands shuffle (plan-gated in tests/test_bucketing.py).

Writes ``INCREMENTAL_BENCH.json`` at the repo root and prints one
JSON line. Run quiet with 48g for the x100 leg:
``SPARK_DRIVER_MEMORY=48g python tools/bench_incremental.py``.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from financial_data_pipeline_optimization_spark import get_spark  # noqa: E402
from financial_data_pipeline_optimization_spark.operators import dedup  # noqa: E402

CORPORA = [
    ("x1", "/root/testdata/sf0.1"),
    ("x10", "/tmp/sfx10"),
    ("x100", "/tmp/sfx100"),
]
BATCH_DOCS = 500
REPS = 2


def _median(samples: list[float]) -> float:
    samples = sorted(samples)
    return round(samples[len(samples) // 2], 2)


def main() -> None:
    spark = get_spark(app_name="fdpo-bench-incremental")
    spark.range(1024).repartition(64).mapInPandas(
        lambda it: it, "id long"
    ).count()
    results: dict[str, dict[str, float]] = {}
    scratch = tempfile.mkdtemp(prefix="inc_bench_")
    try:
        for label, sf_dir in CORPORA:
            if not Path(sf_dir).exists():
                print(f"skip {label}", file=sys.stderr)
                continue
            docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
                "doc_id", "text"
            )
            # The fixed batch: 500 sf0.1 documents re-keyed out of the
            # corpus id range — guaranteed near-dups of replica 0 at
            # every scale, so the verify leg always has real work.
            from pyspark.sql import functions as F

            batch = (
                spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
                .select(
                    (F.col("doc_id") + 1_000_000_000).alias("doc_id"),
                    "text",
                )
                .where(F.col("doc_id") < 1_000_000_000 + BATCH_DOCS)
            )

            # One-time store build + persist (parquet, id/band layout).
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            ob, os_ = dedup.minhash_store(docs, "doc_id", "text")
            ob.write.mode("overwrite").parquet(f"{scratch}/{label}_bands")
            os_.write.mode("overwrite").parquet(f"{scratch}/{label}_sets")
            store_build = time.perf_counter() - t0

            stored = (
                spark.read.parquet(f"{scratch}/{label}_bands"),
                spark.read.parquet(f"{scratch}/{label}_sets"),
            )

            inc_samples, n_hits = [], -1
            for _ in range(REPS):
                spark._jvm.System.gc()
                t0 = time.perf_counter()
                new_store = dedup.minhash_store(batch, "doc_id", "text")
                n_hits = dedup.incremental_near_dups(
                    new_store, stored
                ).count()
                inc_samples.append(time.perf_counter() - t0)

            full_samples = []
            for _ in range(REPS):
                spark._jvm.System.gc()
                t0 = time.perf_counter()
                dedup.minhash_lsh_pairs(
                    docs.unionByName(batch), "doc_id", "text"
                ).count()
                full_samples.append(time.perf_counter() - t0)

            results[label] = {
                "store_build_sec": round(store_build, 2),
                "incremental_sec": _median(inc_samples),
                "full_recompute_sec": _median(full_samples),
                "batch_docs": BATCH_DOCS,
                "cross_batch_pairs": n_hits,
            }
            print(f"{label}: {results[label]}", file=sys.stderr)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    out = {"metric": "incremental_ingest_cost", "corpora": results}
    (
        Path(__file__).resolve().parents[1] / "INCREMENTAL_BENCH.json"
    ).write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()

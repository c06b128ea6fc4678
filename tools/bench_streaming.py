"""Structured-Streaming throughput: sustained rows/sec per operator.

The batch surface has BENCH_DETAIL/BENCH_SCALED; the streaming surface
(``financial_data_pipeline_optimization_spark/streaming/ops.py``) had
correctness evidence only (pytest; no SQL oracle is possible for a
stream). This harness measures what a stream CAN be asked about —
sustained micro-batch throughput — with a deterministic methodology:

- source is ``rate-micro-batch`` (every trigger delivers EXACTLY
  ``rowsPerBatch`` rows, 32 partitions), so per-batch
  ``processedRowsPerSecond`` is a clean capacity number instead of a
  backpressure artifact;
- per scenario: run ``BATCHES`` triggers, drop the first two
  (state-store/codegen warm-up), report the MEDIAN of the rest;
- JVM-side scenarios (passthrough ceiling, watermarked tumbling agg,
  watermark-bounded keyed dedup) run 2M rows/batch; the Python
  arbitrary-state path (``applyInPandasWithState``) runs 500k
  rows/batch — Arrow transfer makes it the measured slow path, which
  is exactly the UDF-policy claim worth a number.

Writes ``STREAMING_BENCH.json`` at the repo root and prints one JSON
line. Run on a quiet host: ``python tools/bench_streaming.py``.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from financial_data_pipeline_optimization_spark import get_spark  # noqa: E402
from financial_data_pipeline_optimization_spark.streaming import ops  # noqa: E402

BATCHES = 10
WARMUP = 2


def _events(src):
    """Map the rate source onto the events shape the operators take."""
    return src.select(
        F.col("timestamp").alias("ts"),
        (F.col("value") % 20).cast("string").alias("event_type"),
        (F.col("value") % 100000).alias("k"),
        ((F.col("value") % 1000) / 10.0).alias("value"),
    )


SCENARIOS = {
    # ceiling: source -> projection -> sink, no state
    "passthrough": (
        lambda src: _events(src),
        "append",
        2_000_000,
    ),
    # watermarked tumbling aggregation (update mode: emit running
    # window rows; state evicted past the watermark)
    "tumbling_window_agg": (
        lambda src: ops.tumbling_counts(
            _events(src), window="5 seconds", watermark="10 seconds"
        ),
        "update",
        2_000_000,
    ),
    # watermark-bounded key dedup (~20 duplicates per key per batch)
    "keyed_dedup_within_watermark": (
        lambda src: ops.stream_dedup_within_watermark(
            _events(src), ["k"], watermark="10 seconds"
        ),
        "append",
        2_000_000,
    ),
    # the Python arbitrary-state path: Arrow round-trip per batch
    "stateful_running_counts_python": (
        lambda src: ops.running_counts_stateful(_events(src)),
        "update",
        500_000,
    ),
    # r17 (VERDICT #7): the JVM-expressible rewrite of the SAME
    # running-counts semantics — built-in streaming aggregation state,
    # map-side partial combine, no Arrow/Python boundary. Same
    # rows/batch as the Python twin so the two cells are a direct A/B;
    # the residual gap is the measured price of the arbitrary-state
    # API itself (see ops.running_counts_agg).
    "stateful_running_counts_jvm": (
        lambda src: ops.running_counts_agg(_events(src)),
        "update",
        500_000,
    ),
}


def _measure(spark, name, build, mode, rows_per_batch) -> tuple[float, int]:
    ckpt = tempfile.mkdtemp(prefix=f"stream_bench_{name}_")
    src = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .option("numPartitions", 32)
        .load()
    )
    q = (
        build(src)
        .writeStream.format("noop")
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        deadline = time.time() + 300
        while len(q.recentProgress) < BATCHES and time.time() < deadline:
            time.sleep(0.25)
        rates = []
        for p in q.recentProgress[WARMUP:BATCHES]:
            d = json.loads(p.json) if hasattr(p, "json") else dict(p)
            if d.get("numInputRows"):
                rates.append(float(d["processedRowsPerSecond"]))
    finally:
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
    assert rates, f"{name}: no steady-state batches observed"
    rates.sort()
    # n_batches published per scenario: if the deadline expired early
    # the artifact shows how many post-warm-up batches the median
    # actually covers instead of silently claiming the full protocol.
    return round(rates[len(rates) // 2], 0), len(rates)


def main() -> None:
    from tools.ab import QuietSession

    spark = get_spark(app_name="fdpo-bench-streaming")
    with QuietSession() as qs:
        # Worker-pool warm-up (one-time fork cost, not operator cost).
        spark.range(1024).repartition(64).mapInPandas(
            lambda it: it, "id long"
        ).count()
        results: dict[str, dict[str, float]] = {}
        for name, (build, mode, rpb) in SCENARIOS.items():
            try:
                rate, n_batches = _measure(spark, name, build, mode, rpb)
            except Exception as exc:  # noqa: BLE001 — isolate per scenario
                results[name] = {"err": str(exc)[:300]}  # type: ignore[dict-item]
                continue
            results[name] = {
                "rows_per_sec": rate,
                "rows_per_batch": rpb,
                "measured_batches": n_batches,
            }
            print(
                f"{name}: {rate:,.0f} rows/s over {n_batches} batches",
                file=sys.stderr,
            )
    out = {
        "metric": "streaming_sustained_rows_per_sec",
        "scenarios": results,
        "batches": BATCHES,
        "warmup_batches": WARMUP,
        **qs.stamp(),
    }
    (
        Path(__file__).resolve().parents[1] / "STREAMING_BENCH.json"
    ).write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()

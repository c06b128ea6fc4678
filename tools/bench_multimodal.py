"""Multimodal codec + perceptual-hash throughput: rows/sec, real codecs.

The multimodal surface (`operators/multimodal.py`) is correctness-
proven by oracle-paired driver checks; this harness adds the capacity
number: how many assets/second the Arrow-batched `mapInPandas` paths
sustain on `local[32]` when every document carries its OWN payload
(unique bytes per row — no 250-source reuse like the driver checks).

Scenarios (each = synthesize payload -> real codec decode -> feature):

- ``bmp_dhash``   — byte-valid 24-bit BMP build -> real BMP decode ->
  8x9 grid dHash (`image_dhash`);
- ``wav_envelope`` — byte-valid PCM16 WAV build -> real RIFF parse ->
  65-window energy-envelope fingerprint (`audio_fingerprint`);
- ``png_decode``  — real PNG build (zlib IDAT, per-row filters) ->
  full decode + feature extraction (`extract_features`).

Methodology mirrors bench_streaming.py: one warm session + worker
pool, median of REPS timed noop-sink runs, rows = the ×10 corpus'
50k documents. Writes ``MULTIMODAL_BENCH.json`` and prints one JSON
line. Run quiet: ``python tools/bench_multimodal.py``.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from financial_data_pipeline_optimization_spark import get_spark  # noqa: E402
from financial_data_pipeline_optimization_spark.operators import multimodal  # noqa: E402

SF_DIR = "/tmp/sfx10"  # 50k docs; falls back to sf0.1 (5k) if absent
REPS = 3


def main() -> None:
    from tools.ab import QuietSession

    spark = get_spark(app_name="fdpo-bench-multimodal")
    qs = QuietSession().__enter__()
    spark.range(1024).repartition(64).mapInPandas(
        lambda it: it, "id long"
    ).count()
    sf = SF_DIR if Path(SF_DIR).exists() else "/root/testdata/sf0.1"
    ids = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id")
        .localCheckpoint()
    )
    n_rows = ids.count()

    scenarios = {
        "bmp_dhash": lambda: multimodal.image_dhash(
            multimodal.synthetic_bmp_assets(ids, "doc_id"),
            decode_fn="bmp",
        ),
        "wav_envelope": lambda: multimodal.audio_fingerprint(
            multimodal.synthetic_wav_assets(ids, "doc_id")
        ),
        "png_decode": lambda: multimodal.extract_features(
            multimodal.synthetic_png_assets(ids, "doc_id"),
            decode_fn="png",
        ),
    }
    results: dict[str, dict[str, float]] = {}
    for name, build in scenarios.items():
        try:
            build().limit(1).collect()  # warm codegen + workers
            samples = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                build().write.format("noop").mode("overwrite").save()
                samples.append(time.perf_counter() - t0)
            samples.sort()
            med = samples[len(samples) // 2]
            results[name] = {
                "rows_per_sec": round(n_rows / med, 0),
                "median_sec": round(med, 2),
            }
        except Exception as exc:  # noqa: BLE001 — isolate per scenario
            results[name] = {"err": str(exc)[:300]}  # type: ignore[dict-item]
        print(f"{name}: {results[name]}", file=sys.stderr)
    qs.__exit__()
    out = {
        "metric": "multimodal_codec_rows_per_sec",
        "rows": n_rows,
        "scenarios": results,
        **qs.stamp(),
    }
    (
        Path(__file__).resolve().parents[1] / "MULTIMODAL_BENCH.json"
    ).write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()

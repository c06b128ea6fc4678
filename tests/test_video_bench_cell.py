"""The video-leg scale cell (q_video_frame_dedup_pairs) and its
hash-mixed asset builder.

The funnel's video machinery (sample_video_frames -> per-frame dHash
-> banded Hamming join) got its value proof in r12 via the funnel
oracle; what was missing (VERDICT r12 "What's missing" #4) is a SCALE
measurement of the leg. The sweep cell needs a fixture whose pair
output is linear in corpus size — pinned here: the mixed builder's
content-determinism (equal seeds => byte-identical payloads, distinct
seeds => unrelated hashes) and the planted every-20th-doc pair
structure surviving the full leg end to end.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from financial_data_pipeline_optimization_spark.operators import multimodal
from financial_data_pipeline_optimization_spark.queries.media import (
    q_video_frame_dedup_pairs,
)

from .conftest import SF_SMOKE


def test_mixed_builder_seed_determinism(spark):
    df = spark.createDataFrame(
        [(1, 5), (2, 5), (3, 9)], "asset_id long, seed long"
    )
    rows = {
        r["asset_id"]: bytes(r["payload"])
        for r in multimodal.synthetic_video_assets_mixed(
            df, "asset_id", "seed"
        ).collect()
    }
    # Equal seeds => byte-identical containers (the planted-dup
    # contract); distinct seeds => different payloads.
    assert rows[1] == rows[2]
    assert rows[1] != rows[3]
    # Geometry comes from the seed: n_frames = 2 + 5 % 4 = 3 complete
    # PNG streams in the container.
    assert len(multimodal._split_png_frames(1, rows[1])) == 3
    assert len(multimodal._split_png_frames(3, rows[3])) == 2 + 9 % 4


def test_mixed_builder_rerun_is_byte_identical(spark):
    df = spark.createDataFrame([(7, 123456789)], "asset_id long, seed long")
    a = multimodal.synthetic_video_assets_mixed(
        df, "asset_id", "seed"
    ).collect()[0]
    b = multimodal.synthetic_video_assets_mixed(
        df, "asset_id", "seed"
    ).collect()[0]
    assert bytes(a["payload"]) == bytes(b["payload"])


def test_video_leg_pairs_are_exactly_the_planted_structure(spark):
    """End-to-end through the real leg at sf0.001: build -> sample ->
    PNG decode -> dHash -> banded join -> distinct. The mixed pixels
    put non-duplicate frames ~uniform on the 64-bit hash space, so the
    output must be EXACTLY the planted (doc-1, doc) pairs for docs
    with doc_id % 20 == 19 — any extra row means the fixture's hash
    diversity collapsed (the quadratic failure mode the mixed builder
    exists to prevent), any missing row means a banding recall bug."""
    pairs = {
        (r["a"], r["b"])
        for r in q_video_frame_dedup_pairs(spark, SF_SMOKE).collect()
    }
    ids = {
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id")
        .collect()
    }
    planted = {
        (i - 1, i) for i in ids if i % 20 == 19 and (i - 1) in ids
    }
    assert planted, "smoke corpus unexpectedly has no planted slots"
    assert pairs == planted

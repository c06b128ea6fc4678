"""Multimodal-column operators (BASELINE.json north star).

Images / audio / video are opaque ``binary`` columns plus a typed
metadata struct — the lakehouse-standard layout for multimodal training
data. The Spark-side plumbing here is real and tested: schemas, Arrow
batch shapes, ``mapInPandas`` signatures, partition sizing. The actual
codec calls are STUBBED (this container has no image/audio libraries):
``decode_fn='fake'`` is a deterministic header-parse that exercises the
full distributed path; ``decode_fn='pil'`` raises ``NotImplementedError``
unless Pillow is importable (import-try gated per the build rules).

Scale notes: binary payloads ride in Arrow record batches; keep
``spark.sql.files.maxPartitionBytes`` at/below 128 MB so a partition of
multi-MB blobs still fits executor memory, and never ``collect`` —
features leave the executor as small struct columns, blobs stay put.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Metadata struct carried alongside every binary payload.
ASSET_META = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("mean_byte", T.DoubleType(), True),
        T.StructField("byte_entropy", T.DoubleType(), True),
        T.StructField("header_hex", T.StringType(), True),
    ]
)


def synthetic_assets(
    df: DataFrame,
    id_col: str,
    payload_from: str,
    media_type: str = "image",
) -> DataFrame:
    """Manufacture a deterministic binary-asset table from any string
    column (test fixture: the container has no real media files). The
    payload is the UTF-8 bytes; metadata fields are derived
    deterministically from the payload length."""
    payload = F.encode(F.col(payload_from), "UTF-8")
    return df.select(
        F.col(id_col).alias("asset_id"),
        payload.alias("payload"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            (F.length(payload) % 640 + 32).cast("int").alias("width"),
            (F.length(payload) % 480 + 32).cast("int").alias("height"),
            F.lit(1).alias("n_frames"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def _fake_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in for a codec: header-parse + byte stats.
    Pure NumPy over the Arrow batch — the shape (vectorized per-batch,
    no per-row Python) is exactly what a real decoder wrapper uses."""
    import numpy as np

    out = []
    for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
        buf = np.frombuffer(payload, dtype=np.uint8)
        n = len(buf)
        if n:
            counts = np.bincount(buf, minlength=256).astype(np.float64)
            probs = counts[counts > 0] / n
            entropy = float(-(probs * np.log2(probs)).sum())
            mean = float(buf.mean())
        else:
            entropy, mean = 0.0, 0.0
        out.append(
            (
                asset_id,
                n,
                round(mean, 6),
                round(entropy, 6),
                bytes(buf[:4]).hex(),
            )
        )
    return pd.DataFrame(
        out, columns=["asset_id", "n_bytes", "mean_byte", "byte_entropy",
                      "header_hex"]
    )


def extract_features(
    assets: DataFrame, decode_fn: str = "fake"
) -> DataFrame:
    """Decode + featurize binary assets via ``mapInPandas`` (Arrow
    batches in, small feature rows out; payloads never reach the
    driver).

    ``decode_fn='pil'`` would decode real images — gated behind an
    import-try because the codec libraries are not in this container.
    """
    if decode_fn == "pil":
        try:
            import PIL  # noqa: F401
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "real image decode requires Pillow, which is not "
                "installed in this container; use decode_fn='fake' for "
                "the plumbing path"
            ) from exc

    def _mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _fake_decode_batch(pdf)

    return assets.select("asset_id", "payload").mapInPandas(
        _mapper, schema=FEATURE_SCHEMA
    )


def resize_stub(assets: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stub: real implementation would transform ``payload``
    through a codec inside the same ``mapInPandas`` shape as
    :func:`extract_features`; here only the metadata transform is real."""
    return assets.withColumn(
        "meta",
        F.struct(
            F.col("meta.media_type").alias("media_type"),
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            F.col("meta.n_frames").alias("n_frames"),
            F.col("meta.sample_rate").alias("sample_rate"),
        ),
    )


def frame_sample_stub(
    assets: DataFrame, every_n: int = 10
) -> DataFrame:
    """Frame-sampling stub for video payloads: emits one row per sampled
    frame index (real decode would slice the container at those frames).
    The explode shape — one blob in, k small rows out — is the real
    plumbing being exercised."""
    return assets.select(
        "asset_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(
                    F.coalesce(F.col("meta.n_frames"), F.lit(1)) - 1, F.lit(0)
                ),
                F.lit(every_n),
            )
        ).alias("frame_index"),
        "meta",
    )

"""Multimodal plumbing tests: binary columns + metadata structs through
mapInPandas with the deterministic fake decoder."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from financial_data_pipeline_optimization_spark.operators import multimodal
from financial_data_pipeline_optimization_spark.sources import load_table

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def assets(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    return multimodal.synthetic_assets(docs, "doc_id", "text")


def test_asset_schema(assets):
    dtypes = dict(assets.dtypes)
    assert dtypes["payload"] == "binary"
    assert dtypes["meta"].startswith("struct<media_type:string")


def test_extract_features_deterministic(assets, spark):
    feats = multimodal.extract_features(assets).collect()
    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    assert len(feats) == n_docs
    by_id = {r.asset_id: r for r in feats}
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, SF_SMOKE, "documents").collect()
    }
    # n_bytes must equal utf-8 length; header is the first 4 bytes
    some = list(docs)[:20]
    for doc_id in some:
        raw = docs[doc_id].encode("utf-8")
        assert by_id[doc_id].n_bytes == len(raw)
        assert by_id[doc_id].header_hex == raw[:4].hex()
        assert 0.0 <= by_id[doc_id].byte_entropy <= 8.0

    # re-running yields identical results (determinism across runs)
    again = {r.asset_id: r for r in multimodal.extract_features(assets).collect()}
    assert all(by_id[k] == again[k] for k in by_id)


def test_wav_payloads_decode_with_stdlib_wave(spark):
    """The synthesized WAV payloads are byte-valid: the stdlib ``wave``
    module (an INDEPENDENT decoder) must read the same header fields and
    sample bytes our pure-NumPy codec reports."""
    import io
    import wave

    import numpy as np

    docs = load_table(spark, SF_SMOKE, "documents").limit(25)
    wavs = multimodal.synthetic_wav_assets(docs, "doc_id")
    feats = {
        r.asset_id: r
        for r in multimodal.extract_features(wavs, decode_fn="wav").collect()
    }
    for r in wavs.collect():
        with wave.open(io.BytesIO(bytes(r.payload))) as wf:
            got = feats[r.asset_id]
            assert wf.getframerate() == got.sample_rate == r.meta.sample_rate
            assert wf.getnchannels() == got.n_channels == 1
            assert wf.getsampwidth() * 8 == got.bit_depth == 16
            assert wf.getnframes() == got.n_samples
            samples = np.frombuffer(
                wf.readframes(wf.getnframes()), dtype="<i2"
            ).astype(np.int64)
            assert int(samples.sum()) == got.sum_amp
            assert int(np.abs(samples).max()) == got.peak_amp


def test_wav_chunks_are_valid_and_reassemble(spark):
    """Each WAV chunk must be independently decodable by the stdlib
    ``wave`` module, chunk sizes must be exactly chunk_samples except a
    short final chunk, and concatenating the chunks' samples in index
    order must reproduce the source audio byte-for-byte."""
    import io
    import wave

    docs = load_table(spark, SF_SMOKE, "documents").limit(15)
    wavs = multimodal.synthetic_wav_assets(docs, "doc_id")
    source = {}
    for r in wavs.collect():
        with wave.open(io.BytesIO(bytes(r.payload))) as wf:
            source[r.asset_id] = (
                wf.getframerate(),
                wf.readframes(wf.getnframes()),
            )
    chunks = multimodal.chunk_wav_assets(wavs, chunk_samples=48).collect()
    by_asset = {}
    for r in chunks:
        with wave.open(io.BytesIO(bytes(r.payload))) as wf:
            rate, n = wf.getframerate(), wf.getnframes()
            frames = wf.readframes(n)
        assert rate == source[r.asset_id][0]
        by_asset.setdefault(r.asset_id, []).append(
            (r.chunk_index, n, frames)
        )
    for aid, parts in by_asset.items():
        parts.sort()
        assert [p[0] for p in parts] == list(range(len(parts)))
        assert all(p[1] == 48 for p in parts[:-1])  # full chunks
        assert 1 <= parts[-1][1] <= 48  # short tail allowed
        assert b"".join(p[2] for p in parts) == source[aid][1]


def test_bmp_payloads_header_and_padding(spark):
    """BMP codec vs an independent hand-parse: width/height from the DIB
    header, pixel sum computed by slicing rows at the 4-byte-aligned
    stride (the padding bytes must NOT be counted)."""
    import struct

    docs = load_table(spark, SF_SMOKE, "documents").limit(25)
    bmps = multimodal.synthetic_bmp_assets(docs, "doc_id")
    feats = {
        r.asset_id: r
        for r in multimodal.extract_features(bmps, decode_fn="bmp").collect()
    }
    for r in bmps.collect():
        buf = bytes(r.payload)
        assert buf[:2] == b"BM"
        (file_size,) = struct.unpack("<I", buf[2:6])
        assert file_size == len(buf)
        w, h = struct.unpack("<ii", buf[18:26])
        got = feats[r.asset_id]
        assert (w, h) == (got.width, got.height) == (r.meta.width, r.meta.height)
        stride = (w * 3 + 3) // 4 * 4
        total = 0
        for row in range(h):
            start = 54 + row * stride
            total += sum(buf[start : start + w * 3])
        assert total == got.sum_pixel
        assert got.n_pixels == w * h


def test_unknown_decode_fn_rejected(assets):
    with pytest.raises(ValueError, match="unknown decode_fn"):
        multimodal.extract_features(assets, decode_fn="nope")


def test_pil_decode_gated(assets):
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow present; stub gate not applicable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        multimodal.extract_features(assets, decode_fn="pil")


def test_video_frame_sample_decodes_real_frames(spark):
    """sample_video_frames over the concatenated-PNG container: every
    sampled frame must be a standalone byte-valid PNG whose decoded
    pixels match the generating formula
    ``(id*31 + f*97 + k) % 256`` — and frame 0 must equal the
    single-image PNG fixture's pixels."""
    base = spark.range(6).select(F.col("id").alias("doc_id"))
    assets = multimodal.synthetic_video_assets(base, "doc_id")
    frames = multimodal.sample_video_frames(assets, every_n=2)
    rows = frames.collect()
    # n_frames = 2 + id % 4 in {2,3,4,5}; sampled = ceil(nf/2)
    by_asset = {}
    for r in rows:
        by_asset.setdefault(r["asset_id"], []).append(r["frame_index"])
    for aid, idxs in by_asset.items():
        nf = 2 + aid % 4
        assert sorted(idxs) == list(range(0, nf, 2)), (aid, idxs)
    import numpy as np

    for r in rows:
        aid, f = r["asset_id"], r["frame_index"]
        w, h = 4 + aid % 13, 3 + aid % 7
        px = multimodal._png_pixels(aid, bytes(r["payload"]))
        k = np.arange(w * h * 3, dtype=np.int64)
        expect = ((aid * 31 + f * 97 + k) % 256).reshape(h, w * 3)
        assert (px == expect).all(), (aid, f)


def test_video_container_rejects_garbage(spark):
    with pytest.raises(Exception, match="missing PNG signature"):
        multimodal._split_png_frames(7, b"\x00" * 16)
    # truncated: a valid signature but chunk walk runs off the end
    with pytest.raises(Exception, match="truncated"):
        multimodal._split_png_frames(7, multimodal._PNG_SIG + b"\x00\x00")


def test_bmp_resize_roundtrips_through_decoder(spark):
    """resize_bmp_assets must emit byte-valid BMPs whose re-decoded
    dimensions match the target and whose pixels are the NN-mapped
    source pixels (checked via exact sum on a 2x downsample of an
    even-sized source)."""
    import numpy as np

    from financial_data_pipeline_optimization_spark.operators import multimodal as mm

    # doc_id=48: w = 4 + 48%13 = 13, h = 3 + 48%7 = 9
    df = spark.createDataFrame([(48,)], "doc_id long")
    assets = mm.synthetic_bmp_assets(df, "doc_id")
    resized = mm.resize_bmp_assets(assets, out_w=3, out_h=3)
    feat = mm.extract_features(resized, decode_fn="bmp").collect()[0]
    assert (feat.width, feat.height, feat.n_pixels) == (3, 3, 9)
    w, h, aid = 13, 9, 48
    k = np.arange(w * h * 3, dtype=np.int64)
    px = ((aid * 31 + k) % 256).reshape(h, w, 3)
    ri = (np.arange(3) * h) // 3
    ci = (np.arange(3) * w) // 3
    assert feat.sum_pixel == int(px[ri][:, ci, :].sum())


def test_png_decode_matches_bmp_on_same_pixels(spark):
    """synthetic_png_assets carries the SAME deterministic pixel bytes
    as synthetic_bmp_assets, with every scanline filter type (row % 5)
    exercised — so the PNG decode features must equal the BMP decode
    features row-for-row, AND match the closed-form expectation
    sum_k (id*31+k) % 256 computed in plain Python."""
    ids = spark.range(0, 40).withColumnRenamed("id", "asset_id")
    png = {
        r.asset_id: (r.width, r.height, r.n_pixels, r.sum_pixel)
        for r in multimodal.extract_features(
            multimodal.synthetic_png_assets(ids, "asset_id"), "png"
        ).collect()
    }
    bmp = {
        r.asset_id: (r.width, r.height, r.n_pixels, r.sum_pixel)
        for r in multimodal.extract_features(
            multimodal.synthetic_bmp_assets(ids, "asset_id"), "bmp"
        ).collect()
    }
    assert png == bmp and len(png) == 40
    for aid, (w, h, n_px, total) in png.items():
        assert (w, h) == (4 + aid % 13, 3 + aid % 7)
        assert n_px == w * h
        assert total == sum((aid * 31 + k) % 256 for k in range(w * h * 3))


def test_png_decoder_rejects_malformed_payloads(spark):
    import pandas as pd
    import pytest as _pytest

    from financial_data_pipeline_optimization_spark.operators.multimodal import (
        _decode_png_batch,
    )

    with _pytest.raises(ValueError, match="not a PNG"):
        _decode_png_batch(
            pd.DataFrame({"asset_id": [1], "payload": [b"JUNKJUNKJUNK"]})
        )
    # flip one IDAT byte -> CRC failure must be detected
    ids = spark.range(3, 4).withColumnRenamed("id", "asset_id")
    buf = bytearray(
        multimodal.synthetic_png_assets(ids, "asset_id")
        .select("payload").collect()[0][0]
    )
    buf[45] ^= 0xFF
    with _pytest.raises(ValueError, match="CRC"):
        _decode_png_batch(
            pd.DataFrame({"asset_id": [3], "payload": [bytes(buf)]})
        )


def test_png_codec_roundtrips_random_images():
    """Codec fuzz, no Spark needed: 60 random-pixel images of varied
    shapes (including 1-pixel-wide and 1-row edge shapes) must
    round-trip encode -> decode with exact width/height/pixel-sum.
    Every image taller than 4 rows exercises all five scanline
    filters via the encoder's row%5 policy."""
    import numpy as np
    import pandas as pd

    from financial_data_pipeline_optimization_spark.operators.multimodal import (
        _decode_png_batch,
        _png_bytes,
    )

    rng = np.random.RandomState(1234)
    shapes = [(1, 1), (1, 9), (9, 1), (5, 5)] + [
        (int(rng.randint(1, 12)), int(rng.randint(1, 12)))
        for _ in range(56)
    ]
    payloads, want = [], []
    for i, (h, w) in enumerate(shapes):
        px = rng.randint(0, 256, size=(h, w * 3)).astype(np.int64)
        payloads.append(_png_bytes(px))
        want.append((i, w, h, 24, w * h, int(px.sum())))
    got = _decode_png_batch(
        pd.DataFrame(
            {"asset_id": list(range(len(shapes))), "payload": payloads}
        )
    )
    assert [tuple(r) for r in got.itertuples(index=False)] == want


def test_png_resize_roundtrips_through_decoder(spark):
    """resize_png_assets must emit byte-valid PNGs (fresh CRCs) whose
    re-decoded dimensions match the target and whose pixel content is
    exactly the NN index-mapped source — computed independently in
    numpy from the closed-form fixture pixels."""
    import numpy as np

    ids = spark.range(0, 20).withColumnRenamed("id", "asset_id")
    src = multimodal.synthetic_png_assets(ids, "asset_id")
    out_w, out_h = 3, 2
    resized = multimodal.resize_png_assets(src, out_w, out_h)
    feats = {
        r.asset_id: (r.width, r.height, r.n_pixels, r.sum_pixel)
        for r in multimodal.extract_features(resized, "png").collect()
    }
    assert len(feats) == 20
    for aid in range(20):
        w, h = 4 + aid % 13, 3 + aid % 7
        k = np.arange(w * h * 3, dtype=np.int64)
        img = ((aid * 31 + k) % 256).reshape(h, w, 3)
        ri = (np.arange(out_h) * h) // out_h
        ci = (np.arange(out_w) * w) // out_w
        want = img[ri][:, ci, :]
        assert feats[aid] == (
            out_w, out_h, out_w * out_h, int(want.sum())
        ), aid
    # metadata struct tracks the new dims
    meta = resized.select("meta.width", "meta.height").distinct().collect()
    assert [(r[0], r[1]) for r in meta] == [(out_w, out_h)]


def test_wav_resample_stdlib_valid_and_exact(spark):
    """resample_wav_assets must emit byte-valid WAVs (stdlib `wave`
    reads them) whose frames are exactly the nearest-sample index map
    of the source, and an identity resample (out_rate == in_rate) must
    reproduce the source samples bit-for-bit."""
    import io
    import wave

    import numpy as np

    base = spark.range(10).select(F.col("id").alias("doc_id"))
    assets = multimodal.synthetic_wav_assets(base, "doc_id")
    down = multimodal.resample_wav_assets(assets, out_rate=4000)
    for r in down.collect():
        aid = r["asset_id"]
        in_rate = 8000 + (aid % 5) * 2000
        n = 32 + aid % 97
        with wave.open(io.BytesIO(bytes(r["payload"]))) as w:
            assert w.getframerate() == 4000
            assert w.getnchannels() == 1
            got = np.frombuffer(
                w.readframes(w.getnframes()), dtype="<i2"
            ).astype(np.int64)
        out_n = -(-n * 4000 // in_rate)
        src = (np.arange(out_n) * in_rate) // 4000
        want = ((aid * 2654435761 + src * 40503) % 65536) - 32768
        assert len(got) == out_n and (got == want).all(), aid
    # identity: same rate in and out -> same samples
    keep = {
        r["asset_id"]: bytes(r["payload"])
        for r in assets.filter(F.col("asset_id") % 5 == 0).collect()
    }  # id % 5 == 0 -> in_rate 8000
    ident = multimodal.resample_wav_assets(
        multimodal.synthetic_wav_assets(
            base.filter(F.col("doc_id") % 5 == 0), "doc_id"
        ),
        out_rate=8000,
    )
    for r in ident.collect():
        _, _, _, d_src = multimodal._parse_wav(
            r["asset_id"], keep[r["asset_id"]]
        )
        _, _, _, d_out = multimodal._parse_wav(
            r["asset_id"], bytes(r["payload"])
        )
        assert d_out == d_src, r["asset_id"]


def test_wav_resample_zero_sample_payload(spark):
    """ADVICE r8: a zero-sample WAV (valid header, empty data section)
    must resample to a zero-sample WAV — the old max(1, ...) output
    floor indexed an empty frames array and failed the whole Arrow
    batch executor-side."""
    import io
    import wave

    empty = multimodal._wav_header(8000, 1, 0)
    assets = spark.createDataFrame(
        [(0, bytearray(empty)), (1, bytearray(empty))],
        "asset_id long, payload binary",
    )
    out = multimodal.resample_wav_assets(assets, out_rate=4000).collect()
    assert len(out) == 2
    for r in out:
        with wave.open(io.BytesIO(bytes(r["payload"]))) as w:
            assert w.getnframes() == 0
            assert w.getframerate() == 4000


def test_image_dhash_bmp_png_agree_and_banding_exact(spark):
    """dHash is a pixel-level function, so the BMP and PNG codecs must
    hash identical pixel content to identical hashes; and the 16-bit
    Hamming-banded pair join must equal the all-pairs brute force at
    its guaranteed radius (hamming <= 2, pigeonhole over 4 bands)."""
    import itertools

    base = spark.range(24).select(F.col("id").alias("doc_id"))
    bmp_h = {
        r["asset_id"]: list(r["dhash"])
        for r in multimodal.image_dhash(
            multimodal.synthetic_bmp_assets(base, "doc_id"), "bmp"
        ).collect()
    }
    png_h = {
        r["asset_id"]: list(r["dhash"])
        for r in multimodal.image_dhash(
            multimodal.synthetic_png_assets(base, "doc_id"), "png"
        ).collect()
    }
    assert bmp_h == png_h and len(bmp_h) == 24
    assert all(
        len(v) == 8 and all(0 <= b <= 255 for b in v)
        for v in bmp_h.values()
    )
    hashes = spark.createDataFrame(
        [(k, v) for k, v in bmp_h.items()],
        "asset_id long, dhash array<int>",
    )
    got = sorted(
        (r.a, r.b, r.hamming)
        for r in multimodal.image_near_dup_pairs(
            hashes, max_hamming=2
        ).collect()
    )
    want = sorted(
        (a, b, d)
        for a, b in itertools.combinations(sorted(bmp_h), 2)
        if (
            d := sum(
                bin(x ^ y).count("1")
                for x, y in zip(bmp_h[a], bmp_h[b])
            )
        )
        <= 2
    )
    assert got == want


def test_image_near_dup_finds_planted_duplicates(spark):
    """Two assets built from the same source id are exact perceptual
    duplicates: hamming 0, always paired."""
    base = spark.range(12).select((F.col("id") % 6).alias("src"))
    hashes = multimodal.image_dhash(
        multimodal.synthetic_bmp_assets(base.distinct(), "src"), "bmp"
    )
    docs = spark.range(12).select(
        F.col("id").alias("doc_id"), (F.col("id") % 6).alias("src")
    )
    dh = docs.join(
        hashes.withColumnRenamed("asset_id", "src"), "src"
    ).select(F.col("doc_id").alias("asset_id"), "dhash")
    pairs = {
        (r.a, r.b): r.hamming
        for r in multimodal.image_near_dup_pairs(dh).collect()
    }
    for i in range(6):
        assert pairs.get((i, i + 6)) == 0, (i, i + 6)


def test_image_near_dup_rejects_radius_beyond_guarantee(spark):
    """max_hamming past the pigeonhole guarantee (n_bands - 1) would
    silently lose true pairs — must fail fast instead."""
    import pytest

    hashes = spark.createDataFrame(
        [(0, [0] * 8)], "asset_id long, dhash array<int>"
    )
    with pytest.raises(ValueError, match="exact-recall"):
        multimodal.image_near_dup_pairs(hashes, max_hamming=4)


def test_audio_fingerprint_shape_and_planted_dups(spark):
    """audio_fingerprint emits 8 bytes per asset; two assets built from
    the same source id are exact perceptual duplicates (hamming 0);
    the banded join surfaces them; and a zero-sample WAV fingerprints
    to all-zero bytes instead of crashing."""
    base = spark.range(12).select((F.col("id") % 6).alias("src"))
    fps = multimodal.audio_fingerprint(
        multimodal.synthetic_wav_assets(base.distinct(), "src")
    )
    by_id = {r["asset_id"]: list(r["afp"]) for r in fps.collect()}
    assert len(by_id) == 6
    assert all(
        len(v) == 8 and all(0 <= b <= 255 for b in v)
        for v in by_id.values()
    )
    docs = spark.range(12).select(
        F.col("id").alias("doc_id"), (F.col("id") % 6).alias("src")
    )
    dh = docs.join(
        fps.withColumnRenamed("asset_id", "src"), "src"
    ).select(F.col("doc_id").alias("asset_id"), "afp")
    pairs = {
        (r.a, r.b): r.hamming
        for r in multimodal.hamming_banded_pairs(
            dh, hash_col="afp"
        ).collect()
    }
    for i in range(6):
        assert pairs.get((i, i + 6)) == 0, (i, i + 6)
    # zero-sample WAV: valid header, no data -> all-zero fingerprint
    empty = multimodal._wav_header(8000, 1, 0)
    out = multimodal.audio_fingerprint(
        spark.createDataFrame(
            [(99, bytearray(empty))], "asset_id long, payload binary"
        )
    ).collect()
    assert list(out[0]["afp"]) == [0] * 8

"""Real (pure-numpy) image decoders behind the multimodal seam.

Reference parity note: the reference has no media handling; these
operators are the beyond-reference training-data-pipeline surface the
build brief mandates.  The decode path is REAL for PPM(P6)/uncompressed
BMP — no stub, no image library."""

import numpy as np
import pytest

from parquet_spark.textops.multimodal import (decode_image, decode_pixels,
                                              image_features, parse_bmp,
                                              parse_ppm, synth_ppm,
                                              synth_ppm_df)


def _make_bmp(px: np.ndarray, bpp: int = 24, top_down: bool = False) -> bytes:
    """Minimal BITMAPINFOHEADER BMP writer for round-trip tests."""
    h, w, _ = px.shape
    nb = bpp // 8
    stride = (w * nb + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    bgr = px[:, :, ::-1]
    for c in range(3):
        rows[:, c:w * nb:nb] = bgr[:, :, c]
    if nb == 4:
        rows[:, 3:w * nb:nb] = 255
    body = (rows if top_down else rows[::-1]).tobytes()
    hdr_h = (-h if top_down else h)
    header = (b"BM" + (54 + len(body)).to_bytes(4, "little") + b"\x00" * 4
              + (54).to_bytes(4, "little")
              + (40).to_bytes(4, "little")
              + w.to_bytes(4, "little", signed=True)
              + hdr_h.to_bytes(4, "little", signed=True)
              + (1).to_bytes(2, "little") + bpp.to_bytes(2, "little")
              + (0).to_bytes(4, "little") + len(body).to_bytes(4, "little")
              + b"\x00" * 16)
    return header + body


def test_ppm_roundtrip():
    blob = synth_ppm(7, width=5, height=3)
    px = parse_ppm(blob)
    assert px.shape == (3, 5, 3)
    j = np.arange(5 * 3 * 3)
    assert np.array_equal(px.reshape(-1), (7 * 16 + j) % 256)


def test_ppm_with_comment_lines():
    blob = b"P6\n# a comment\n2 2\n# another\n255\n" + bytes(range(12))
    px = parse_ppm(blob)
    assert px.shape == (2, 2, 3)
    assert np.array_equal(px.reshape(-1), np.arange(12))


@pytest.mark.parametrize("bpp", [24, 32])
@pytest.mark.parametrize("top_down", [False, True])
def test_bmp_roundtrip(bpp, top_down):
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    out = parse_bmp(_make_bmp(px, bpp=bpp, top_down=top_down))
    assert np.array_equal(out, px)


def test_decode_pixels_dispatch_and_unknown_magic():
    assert decode_pixels(synth_ppm(1)).shape == (4, 4, 3)
    # PNG is decoded for real now; a truncated body is a ValueError
    with pytest.raises(ValueError):
        decode_pixels(b"\x89PNG\r\n\x1a\n....")
    # JPEG stays honestly unsupported (no image library in-container)
    with pytest.raises(NotImplementedError):
        decode_pixels(b"\xff\xd8\xff\xe0" + b"\x00" * 16)


def test_decode_image_real_feature_vector():
    f = decode_image(synth_ppm(3, 8, 8))
    assert f.shape == (16,) and f.dtype == np.float32
    assert np.all(f >= 0) and np.all(f <= 1)
    # deterministic
    assert np.array_equal(f, decode_image(synth_ppm(3, 8, 8)))


def test_image_features_spark_means_match_closed_form(spark):
    ids = spark.range(0, 8).withColumnRenamed("id", "doc_id")
    blobs = synth_ppm_df(ids, "doc_id", width=4, height=4)
    feats = image_features(blobs, "media_id", "blob")
    rows = {r.media_id: r for r in feats.collect()}
    assert len(rows) == 8
    for m, r in rows.items():
        j = np.arange(16)
        for name, c in (("mean_r", 0), ("mean_g", 1), ("mean_b", 2)):
            expect = float(((m * 16 + j * 3 + c) % 256).mean())
            assert getattr(r, name) == expect, (m, name)
        assert (r.width, r.height) == (4, 4)


def test_resize_pixels_nearest_neighbor():
    px = np.arange(6 * 8 * 3, dtype=np.uint8).reshape(6, 8, 3)
    small = __import__("parquet_spark.textops.multimodal",
                       fromlist=["resize_pixels"]).resize_pixels(px, 4, 3)
    assert small.shape == (3, 4, 3)
    assert np.array_equal(small[0, 0], px[0, 0])
    assert np.array_equal(small[2, 3], px[4, 6])


def test_resize_image_real_roundtrip(spark):
    from parquet_spark.textops.multimodal import (parse_ppm, resize_image,
                                                  synth_ppm_df)
    ids = spark.range(0, 4).withColumnRenamed("id", "doc_id")
    blobs = synth_ppm_df(ids, "doc_id", width=8, height=8)
    rows = resize_image(blobs, "media_id", "blob", width=4,
                        height=2).collect()
    assert len(rows) == 4
    for r in rows:
        px = parse_ppm(bytes(r.thumb))
        assert px.shape == (2, 4, 3)
        # thumbnail pixels are gathered from the source pattern
        src = parse_ppm(synth_ppm(int(r.media_id), 8, 8))
        assert np.array_equal(px[0, 0], src[0, 0])


def test_wav_parse_and_features(spark):
    from parquet_spark.textops.multimodal import (audio_features, parse_wav,
                                                  synth_wav)
    blob = synth_wav(3, n_samples=500, rate=8000, n_channels=2)
    s, rate = parse_wav(blob)
    assert s.shape == (500, 2) and rate == 8000
    # spark path over synthesized blobs
    import pandas as pd
    from pyspark.sql import functions as F
    pdf = pd.DataFrame({"doc_id": [0, 1, 2],
                        "blob": [synth_wav(i) for i in range(3)]})
    df = spark.createDataFrame(pdf)
    rows = {r.media_id: r for r in
            audio_features(df, "doc_id", "blob").collect()}
    assert len(rows) == 3
    for mid, r in rows.items():
        s, rate = parse_wav(synth_wav(mid))
        mono = s.astype(np.float64).mean(axis=1)
        assert r.n_samples == 256 and r.sample_rate == 8000
        assert abs(r.rms - float(np.sqrt(np.mean(mono ** 2)))) < 1e-9
        assert r.duration_s == 256 / 8000


def test_wav_rejects_non_pcm():
    from parquet_spark.textops.multimodal import parse_wav
    with pytest.raises(ValueError):
        parse_wav(b"OggS" + b"\x00" * 64)


# ------------------------------------------------------------------- PNG

def test_png_roundtrip_all_color_types_and_filters():
    """synth_png cycles filter types 0..4 by row, so any odd-height
    image exercises every reverse-filter path; all four non-palette
    color types and non-square shapes round-trip byte-exactly."""
    from parquet_spark.textops.multimodal import parse_png, synth_png
    for ct, ch in [(0, 1), (2, 3), (4, 2), (6, 4)]:
        for w, h in [(8, 8), (5, 11), (1, 1), (16, 3)]:
            px = parse_png(synth_png(9, w, h, ct))
            j = np.arange(h * w * ch, dtype=np.int64)
            exp = ((9 * 16 + j) % 256).astype(np.uint8).reshape(h, w, ch)
            assert np.array_equal(px, exp), (ct, w, h)


def test_png_palette_and_rgb_normalization():
    import zlib

    from parquet_spark.textops.multimodal import decode_pixels, parse_png

    def chunk(t, d):
        return (len(d).to_bytes(4, "big") + t + d
                + zlib.crc32(t + d).to_bytes(4, "big"))

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = ((3).to_bytes(4, "big") + (2).to_bytes(4, "big")
            + bytes([8, 3, 0, 0, 0]))
    plte = bytes([255, 0, 0, 0, 255, 0])
    idat = zlib.compress(bytes([0, 0, 1, 0]) + bytes([0, 1, 0, 1]))
    blob = (sig + chunk(b"IHDR", ihdr) + chunk(b"PLTE", plte)
            + chunk(b"IDAT", idat) + chunk(b"IEND", b""))
    px = parse_png(blob)
    assert px.shape == (2, 3, 3) and tuple(px[0, 1]) == (0, 255, 0)
    # decode_pixels normalizes gray/alpha variants to HxWx3
    from parquet_spark.textops.multimodal import synth_png
    for ct in (0, 2, 4, 6):
        assert decode_pixels(synth_png(3, 4, 4, ct)).shape == (4, 4, 3)


def test_png_rejects_corruption_and_unsupported():
    from parquet_spark.textops.multimodal import parse_png, synth_png
    bad = bytearray(synth_png(5))
    bad[40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        parse_png(bytes(bad))
    with pytest.raises(ValueError):
        parse_png(b"\x89PNG\r\n\x1a\nnot-chunks")
    # 16-bit depth: honest NotImplementedError, not silent garbage
    import zlib

    def chunk(t, d):
        return (len(d).to_bytes(4, "big") + t + d
                + zlib.crc32(t + d).to_bytes(4, "big"))

    ihdr = ((1).to_bytes(4, "big") + (1).to_bytes(4, "big")
            + bytes([16, 0, 0, 0, 0]))
    blob = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
            + chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError, match="depth"):
        parse_png(blob)


def test_png_spark_feature_path(spark):
    """synth_png_df -> image_features over mapInPandas: exact integer
    means from the closed-form raster."""
    import pandas as pd
    from pyspark.sql import functions as F

    from parquet_spark.textops.multimodal import (image_features,
                                                  synth_png_df)
    d = spark.range(6).select(F.col("id").alias("doc_id"))
    feats = image_features(synth_png_df(d, "doc_id", 8, 8), "media_id",
                           "blob")
    rows = {r.media_id: r for r in feats.collect()}
    assert len(rows) == 6
    for mid, r in rows.items():
        j = np.arange(192, dtype=np.int64)
        raster = (mid * 16 + j) % 256
        assert r.width == 8 and r.height == 8
        assert r.mean_r == raster[0::3].sum() / 64
        assert r.mean_g == raster[1::3].sum() / 64
        assert r.mean_b == raster[2::3].sum() / 64

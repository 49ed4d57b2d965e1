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
    with pytest.raises(NotImplementedError):
        decode_pixels(b"\x89PNG\r\n\x1a\n....")


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

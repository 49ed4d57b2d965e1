"""Multimodal binary-column plumbing: images/audio/video as opaque
`binary` columns with typed metadata, processed through Arrow-batched
`mapInPandas`.

Image decode is REAL for formats that need no external library: binary
PPM (P6), uncompressed 24/32-bit BMP, and 8-bit non-interlaced PNG
(stdlib zlib inflate + pure-numpy reverse filtering, all five scanline
filters, CRC-verified chunks — `parse_png`).  JPEG and video codecs
still raise NotImplementedError — honestly gated on libraries absent
from this container — while the Spark-side contract (schema, batch
shape, partitioning, UDF signature) is identical for every format.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

FEATURE_DIM = 16

MEDIA_META_DDL = ("media_id bigint, kind string, n_bytes int, "
                  "magic string, sha256 string")
FEATURES_DDL = (f"media_id bigint, n_bytes int, "
                f"feature array<float>, decoder string")


# ------------------------------------------------ real pure-numpy decoders

def parse_ppm(blob: bytes) -> np.ndarray:
    """Decode a binary PPM (P6) image to an HxWx3 uint8 array.

    Header: 'P6' <ws> width <ws> height <ws> maxval <single-ws>, then raw
    RGB triplets ('#' comment lines allowed per the netpbm spec)."""
    if blob[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    fields, pos = [], 2
    while len(fields) < 3:
        while pos < len(blob) and blob[pos:pos + 1].isspace():
            pos += 1
        if blob[pos:pos + 1] == b"#":
            while pos < len(blob) and blob[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(blob[start:pos]))
    pos += 1  # exactly one whitespace byte separates header from pixels
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    need = w * h * 3
    px = np.frombuffer(blob, np.uint8, need, pos)
    return px.reshape(h, w, 3).copy()


def parse_bmp(blob: bytes) -> np.ndarray:
    """Decode an uncompressed 24/32-bit BMP (BITMAPINFOHEADER) to HxWx3
    uint8 (RGB).  Rows are 4-byte aligned and stored bottom-up unless
    height is negative."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = int.from_bytes(blob[10:14], "little")
    w = int.from_bytes(blob[18:22], "little", signed=True)
    h = int.from_bytes(blob[22:26], "little", signed=True)
    bpp = int.from_bytes(blob[28:30], "little")
    compression = int.from_bytes(blob[30:34], "little")
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression}")
    top_down, h = h < 0, abs(h)
    nb = bpp // 8
    stride = (w * nb + 3) & ~3
    rows = np.frombuffer(blob, np.uint8, stride * h, data_off)
    rows = rows.reshape(h, stride)[:, : w * nb].reshape(h, w, nb)
    rgb = rows[:, :, 2::-1]  # BGR(A) -> RGB
    return (rgb if top_down else rgb[::-1]).copy()


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """PNG Paeth predictor, vectorized over the byte lanes of one pixel
    (a=left, b=up, c=upper-left; all int32)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out


def parse_png(blob: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG to HxWxC uint8 with pure
    numpy + stdlib zlib (inflate): chunk walk with CRC verification,
    IDAT concatenation, then per-scanline reverse filtering (all five
    filter types — None/Sub/Up/Average/Paeth).  Supports color types
    0 (gray), 2 (RGB), 3 (palette via PLTE), 4 (gray+alpha) and
    6 (RGBA); 16-bit depth and Adam7 interlace raise.

    Sub/None/Up rows reconstruct fully vectorized (Sub is a per-lane
    cumsum mod 256); Average/Paeth walk pixels left-to-right with the
    byte lanes vectorized — fine for feature extraction at thumbnail
    sizes, and the surrounding mapInPandas plumbing is unchanged if a
    native decoder is swapped in for web-scale rasters."""
    import zlib
    if blob[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat, plte = 8, [], None
    w = h = depth = color = interlace = None
    while pos + 12 <= len(blob):
        ln = int.from_bytes(blob[pos:pos + 4], "big")
        typ = blob[pos + 4:pos + 8]
        data = blob[pos + 8:pos + 8 + ln]
        crc = int.from_bytes(blob[pos + 8 + ln:pos + 12 + ln], "big")
        if zlib.crc32(typ + data) != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        if typ == b"IHDR":
            w = int.from_bytes(data[0:4], "big")
            h = int.from_bytes(data[4:8], "big")
            depth, color, interlace = data[8], data[9], data[12]
        elif typ == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    if depth != 8 or interlace != 0:
        raise NotImplementedError(
            f"PNG depth={depth} interlace={interlace}: only 8-bit "
            "non-interlaced is decoded in-container")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"PNG color type {color}")
    raw = zlib.decompress(b"".join(idat))
    bpp, stride = channels, w * channels
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG raster size mismatch")
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    rp = 0
    for y in range(h):
        ft = raw[rp]
        row = np.frombuffer(raw, np.uint8, stride, rp + 1).astype(np.int32)
        rp += 1 + stride
        if ft == 0:
            recon = row
        elif ft == 1:      # Sub: per-lane cumsum mod 256
            recon = np.cumsum(row.reshape(w, bpp), axis=0,
                              dtype=np.int64).reshape(stride) % 256
            recon = recon.astype(np.int32)
        elif ft == 2:      # Up
            recon = (row + prev) % 256
        elif ft in (3, 4):  # Average / Paeth: sequential in x
            recon = np.empty(stride, np.int32)
            left = np.zeros(bpp, np.int32)
            upleft = np.zeros(bpp, np.int32)
            for x in range(w):
                sl = slice(x * bpp, (x + 1) * bpp)
                up = prev[sl]
                pred = ((left + up) >> 1) if ft == 3 \
                    else _paeth(left, up, upleft)
                left = (row[sl] + pred) % 256
                recon[sl] = left
                upleft = up
        else:
            raise ValueError(f"PNG filter type {ft}")
        out[y] = recon.astype(np.uint8)
        prev = recon
    px = out.reshape(h, w, channels)
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        return plte[px[:, :, 0]].copy()
    return px.copy()


def synth_png(media_id: int, width: int = 8, height: int = 8,
              color_type: int = 2) -> bytes:
    """Deterministic REAL PNG fixture: raster byte j = (media_id*16+j)
    % 256 (the synth_ppm formula), forward-filtered with the filter
    type cycling 0..4 by row (every reverse-filter path is exercised),
    zlib-compressed, CRC'd — a byte-valid PNG file."""
    import zlib
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    stride = width * channels
    j = np.arange(height * stride, dtype=np.int64)
    raster = ((media_id * 16 + j) % 256).astype(np.int32) \
        .reshape(height, stride)
    bpp = channels
    lines = []
    prev = np.zeros(stride, np.int32)
    for y in range(height):
        ft = y % 5
        row = raster[y]
        if ft == 0:
            filt = row
        elif ft == 1:
            filt = row.copy()
            filt[bpp:] = (row[bpp:] - row[:-bpp]) % 256
        elif ft == 2:
            filt = (row - prev) % 256
        else:
            filt = np.empty(stride, np.int32)
            left = np.zeros(bpp, np.int32)
            upleft = np.zeros(bpp, np.int32)
            for x in range(width):
                sl = slice(x * bpp, (x + 1) * bpp)
                up = prev[sl]
                pred = ((left + up) >> 1) if ft == 3 \
                    else _paeth(left, up, upleft)
                filt[sl] = (row[sl] - pred) % 256
                left = row[sl]
                upleft = up
        lines.append(bytes([ft]) + filt.astype(np.uint8).tobytes())
        prev = row

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (len(data).to_bytes(4, "big") + typ + data
                + zlib.crc32(typ + data).to_bytes(4, "big"))

    ihdr = (width.to_bytes(4, "big") + height.to_bytes(4, "big")
            + bytes([8, color_type, 0, 0, 0]))
    idat = zlib.compress(b"".join(lines))
    return (_PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))


def synth_ppm(media_id: int, width: int = 4, height: int = 4) -> bytes:
    """Deterministic P6 fixture: pixel byte j = (media_id*16 + j) % 256."""
    head = f"P6\n{width} {height}\n255\n".encode()
    j = np.arange(width * height * 3, dtype=np.int64)
    return head + ((media_id * 16 + j) % 256).astype(np.uint8).tobytes()


def decode_image(blob: bytes, fake: bool = False) -> np.ndarray:
    """Image -> FEATURE_DIM float32 feature vector.

    Real path: parse PPM/BMP pixels with numpy and pool a 16-bin
    channel-interleaved histogram feature.  `fake=True` keeps the
    deterministic hash-derived stub for formats/tests that only exercise
    the Spark plumbing."""
    if fake:
        h = hashlib.sha256(blob).digest()
        return (np.frombuffer(h[:FEATURE_DIM * 2], dtype=np.uint16)
                .astype(np.float32) / 65535.0)
    px = decode_pixels(blob)
    # 16-d feature: per-channel mean/std/min/max + 4-bin luma histogram
    f = []
    for c in range(3):
        ch = px[:, :, c].astype(np.float64)
        f += [ch.mean() / 255.0, ch.std() / 255.0,
              ch.min() / 255.0, ch.max() / 255.0]
    luma = px.astype(np.float64).mean(axis=2)
    hist, _ = np.histogram(luma, bins=4, range=(0, 256))
    f += (hist / luma.size).tolist()
    return np.asarray(f, dtype=np.float32)


def decode_pixels(blob: bytes) -> np.ndarray:
    """Dispatch on magic bytes to a real pure-numpy pixel decoder,
    normalized to HxWx3 RGB (gray replicates, alpha drops)."""
    if blob[:2] == b"P6":
        return parse_ppm(blob)
    if blob[:2] == b"BM":
        return parse_bmp(blob)
    if blob[:8] == _PNG_SIG:
        px = parse_png(blob)
        c = px.shape[2]
        if c == 1:          # gray
            return np.repeat(px, 3, axis=2)
        if c == 2:          # gray + alpha
            return np.repeat(px[:, :, :1], 3, axis=2)
        if c == 4:          # RGBA
            return px[:, :, :3].copy()
        return px
    raise NotImplementedError(
        "only PPM(P6)/uncompressed-BMP/8-bit-PNG decode in this "
        "container; JPEG and video codecs need external libraries")


def media_metadata(df: DataFrame, id_col: str, blob_col: str,
                   kind: str = "image") -> DataFrame:
    """Typed metadata over an opaque binary column — pure expressions."""
    b = F.col(blob_col)
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit(kind).alias("kind"),
        F.octet_length(b).cast("int").alias("n_bytes"),
        F.hex(F.substring(b, 1, 4)).alias("magic"),
        F.sha2(b, 256).alias("sha256"))


RESIZED_DDL = "media_id bigint, width int, height int, thumb binary"
FRAMES_DDL = "media_id bigint, frame_idx int, frame binary"


def resize_pixels(px: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample, pure numpy (two index gathers)."""
    h, w, _ = px.shape
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return px[ys][:, xs]


def resize_image(df: DataFrame, id_col: str, blob_col: str,
                 width: int = 32, height: int = 32,
                 fake: bool = False) -> DataFrame:
    """REAL thumbnailing over mapInPandas: decode PPM/BMP pixels with
    numpy, nearest-neighbor resample, re-emit as a P6 PPM blob.
    `fake=True` keeps the hash-derived stub for formats the container
    can't decode (JPEG/PNG) while preserving schema/batch shape."""
    src = df.select(F.col(id_col).alias("media_id"),
                    F.col(blob_col).alias("blob"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = []
            for blob in pdf["blob"]:
                if blob is None:
                    thumbs.append(None)
                elif fake:
                    seed = hashlib.sha256(bytes(blob)).digest()
                    reps = (width * height) // len(seed) + 1
                    thumbs.append((seed * reps)[: width * height])
                else:
                    small = resize_pixels(decode_pixels(bytes(blob)),
                                          width, height)
                    thumbs.append(f"P6\n{width} {height}\n255\n".encode()
                                  + small.tobytes())
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "width": width, "height": height,
                                "thumb": thumbs})

    return src.mapInPandas(run, RESIZED_DDL)


# -------------------------------------------------- audio (WAV/PCM, real)

AUDIO_DDL = ("media_id bigint, n_channels int, sample_rate int, "
             "n_samples bigint, duration_s double, rms double, "
             "zero_crossings bigint")


def parse_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE PCM blob to (samples[frames, channels], rate)
    with pure numpy.  Supports 8/16/32-bit integer PCM (format 1)."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(blob):
        cid = blob[pos:pos + 4]
        size = int.from_bytes(blob[pos + 4:pos + 8], "little")
        body = blob[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt = int.from_bytes(fmt[0:2], "little")
    n_ch = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_fmt != 1 or bits not in (8, 16, 32):
        raise NotImplementedError(
            f"WAV format {audio_fmt}/{bits}-bit needs an audio library")
    dt = {8: np.uint8, 16: np.int16, 32: np.int32}[bits]
    n = len(data) // (bits // 8) // n_ch * n_ch
    samples = np.frombuffer(data, dt, n).reshape(-1, n_ch)
    if bits == 8:  # 8-bit WAV is unsigned; center it
        samples = samples.astype(np.int16) - 128
    return samples, rate


def synth_wav(media_id: int, n_samples: int = 256, rate: int = 8000,
              n_channels: int = 1) -> bytes:
    """Deterministic 16-bit PCM fixture: sample j = a seeded triangle."""
    j = np.arange(n_samples * n_channels, dtype=np.int64)
    vals = (((media_id * 37 + j * 129) % 2048) - 1024).astype(np.int16)
    data = vals.tobytes()
    fmt = (b"fmt " + (16).to_bytes(4, "little")
           + (1).to_bytes(2, "little") + n_channels.to_bytes(2, "little")
           + rate.to_bytes(4, "little")
           + (rate * n_channels * 2).to_bytes(4, "little")
           + (n_channels * 2).to_bytes(2, "little")
           + (16).to_bytes(2, "little"))
    data_ck = b"data" + len(data).to_bytes(4, "little") + data
    body = b"WAVE" + fmt + data_ck
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def audio_features(df: DataFrame, id_col: str, blob_col: str) -> DataFrame:
    """REAL audio decode path: parse WAV/PCM with numpy, emit shape +
    RMS + zero-crossing features (the audio analog of image_features)."""
    src = df.select(F.col(id_col).alias("media_id"),
                    F.col(blob_col).alias("blob"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "n_channels", "sample_rate",
                                   "n_samples", "duration_s", "rms",
                                   "zero_crossings")}
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                if blob is None:
                    continue
                s, rate = parse_wav(bytes(blob))
                mono = s.astype(np.float64).mean(axis=1)
                out["media_id"].append(mid)
                out["n_channels"].append(s.shape[1])
                out["sample_rate"].append(rate)
                out["n_samples"].append(s.shape[0])
                out["duration_s"].append(s.shape[0] / rate)
                out["rms"].append(float(np.sqrt(np.mean(mono ** 2))))
                out["zero_crossings"].append(
                    int(np.count_nonzero(np.diff(np.signbit(mono)))))
            yield pd.DataFrame({
                "media_id": pd.array(out["media_id"], dtype="int64"),
                "n_channels": pd.array(out["n_channels"], dtype="int32"),
                "sample_rate": pd.array(out["sample_rate"], dtype="int32"),
                "n_samples": pd.array(out["n_samples"], dtype="int64"),
                "duration_s": pd.array(out["duration_s"], dtype="float64"),
                "rms": pd.array(out["rms"], dtype="float64"),
                "zero_crossings": pd.array(out["zero_crossings"],
                                           dtype="int64")})

    return src.mapInPandas(run, AUDIO_DDL)


def sample_frames(df: DataFrame, id_col: str, blob_col: str,
                  frame_bytes: int = 1024, every_k: int = 4) -> DataFrame:
    """Frame sampling over an opaque video blob: split the byte stream
    into fixed-size "frames" and keep every k-th — the Spark-side
    plumbing (explode fan-out, bounded batches) of a real frame sampler,
    with the codec-specific parsing left to a pluggable decoder."""
    src = df.select(F.col(id_col).alias("media_id"),
                    F.col(blob_col).alias("blob"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                if blob is None:
                    continue
                b = bytes(blob)
                n = (len(b) + frame_bytes - 1) // frame_bytes
                for i in range(0, n, every_k):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(b[i * frame_bytes:(i + 1) * frame_bytes])
            yield pd.DataFrame({"media_id": pd.array(ids, dtype="int64"),
                                "frame_idx": pd.array(idxs, dtype="int32"),
                                "frame": frames})

    return src.mapInPandas(run, FRAMES_DDL)


def synth_ppm_df(df: DataFrame, id_col: str, width: int = 4,
                 height: int = 4) -> DataFrame:
    """(media_id, blob) rows of deterministic P6 fixtures via mapInPandas
    (the generation mirrors how real blobs would arrive: opaque binary
    cells in Arrow batches)."""
    src = df.select(F.col(id_col).cast("long").alias("media_id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "blob": [synth_ppm(int(m), width, height)
                         for m in pdf["media_id"]]})

    return src.mapInPandas(gen, "media_id bigint, blob binary")


def synth_png_df(df: DataFrame, id_col: str, width: int = 8,
                 height: int = 8, color_type: int = 2) -> DataFrame:
    """(media_id, blob) rows of deterministic REAL PNG fixtures
    (zlib-deflated, filter types cycling by row)."""
    src = df.select(F.col(id_col).cast("long").alias("media_id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "blob": [synth_png(int(m), width, height, color_type)
                         for m in pdf["media_id"]]})

    return src.mapInPandas(gen, "media_id bigint, blob binary")


IMAGE_FEATURES_DDL = ("media_id bigint, width int, height int, "
                      "mean_r double, mean_g double, mean_b double")


def image_features(df: DataFrame, id_col: str, blob_col: str) -> DataFrame:
    """REAL decode path: parse each PPM/BMP blob with numpy, emit shape +
    exact per-channel means (integer sums / pixel count — reproducible to
    the bit across engines)."""
    src = df.select(F.col(id_col).alias("media_id"),
                    F.col(blob_col).alias("blob"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [],
                   "mean_r": [], "mean_g": [], "mean_b": []}
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                if blob is None:
                    continue
                px = decode_pixels(bytes(blob))
                h, w, _ = px.shape
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                # integer sum / count: exact double, no float accumulation
                for name, c in (("mean_r", 0), ("mean_g", 1), ("mean_b", 2)):
                    out[name].append(
                        int(px[:, :, c].astype(np.int64).sum()) / (h * w))
            yield pd.DataFrame({
                "media_id": pd.array(out["media_id"], dtype="int64"),
                "width": pd.array(out["width"], dtype="int32"),
                "height": pd.array(out["height"], dtype="int32"),
                "mean_r": pd.array(out["mean_r"], dtype="float64"),
                "mean_g": pd.array(out["mean_g"], dtype="float64"),
                "mean_b": pd.array(out["mean_b"], dtype="float64")})

    return src.mapInPandas(run, IMAGE_FEATURES_DDL)


def extract_features(df: DataFrame, id_col: str, blob_col: str,
                     fake: bool = True, batch_size: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over binary blobs (mapInPandas).

    Partition-preserving (narrow), so it composes with the encoder's
    explicit placement; batch shape is bounded by maxRecordsPerBatch.
    """
    src = df.select(F.col(id_col).alias("media_id"),
                    F.col(blob_col).alias("blob"))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, sizes = [], []
            for blob in pdf["blob"]:
                if blob is None:
                    feats.append(None)
                    sizes.append(0)
                else:
                    feats.append(decode_image(bytes(blob), fake=fake).tolist())
                    sizes.append(len(blob))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_bytes": pd.array(sizes, dtype="int32"),
                "feature": feats,
                "decoder": "stub-sha256" if fake else "real",
            })

    return src.mapInPandas(extract, FEATURES_DDL)

"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100-TB training-data pipeline carries image/audio/video as ``binary``
columns with typed metadata and runs decode / feature-extract / resize /
frame-sample as Arrow-batched UDFs.

Round 3: the decode step is REAL for codec-free container formats —
uncompressed 24-bit BMP, binary PPM (P6), and 8/16-bit PCM WAV are
parsed in pure numpy (:func:`decode_media`), and their features (pixel /
sample statistics, dimensions, sample rate) are actual decoded values.
Round 4: resize is real too — :func:`resize_images` bilinear-resizes
the decoded BMP/PPM pixels (align_corners=False geometry, pure numpy)
and re-encodes PPM, Arrow-batched.
Formats that need a real codec library (PNG/JPEG/MP4 — not available in
this environment) still fall back to the clearly-marked deterministic
fake; in deployment the fallback body is where PIL/libvips/ffmpeg slots
in, with every Spark-side contract unchanged.

Synthesis helpers included so tests/bench have data of the right shape.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image|audio|video
    T.StructField("mime", T.StringType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
    T.StructField("payload", T.BinaryType(), False),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("payload_sha256", T.StringType(), False),
    # mean of the raw payload bytes — format-independent, ANSI-SQL
    # checkable (the driver oracle recomputes it per char)
    T.StructField("mean_byte", T.DoubleType(), False),
    # True when a real (BMP/PPM/WAV) decode produced the features
    T.StructField("decoded", T.BooleanType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType()), False),
])


# ------------------------------------------------------------- real decode

def _decode_bmp(b: bytes) -> np.ndarray | None:
    """Uncompressed 24-bit BI_RGB BMP -> (h, w, 3) uint8 (BGR order,
    top-down). Returns None if the payload isn't such a BMP."""
    if len(b) < 54 or b[:2] != b"BM":
        return None
    off = int.from_bytes(b[10:14], "little")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    comp = int.from_bytes(b[30:34], "little")
    if bpp != 24 or comp != 0 or w <= 0 or h == 0:
        return None
    flip = h > 0  # positive height = bottom-up row order
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    if off + stride * h > len(b):
        return None
    rows = np.frombuffer(b, np.uint8, count=stride * h, offset=off)
    px = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    return px[::-1] if flip else px


def _decode_ppm(b: bytes) -> np.ndarray | None:
    """Binary PPM (P6, maxval <= 255) -> (h, w, 3) uint8 RGB."""
    if not b.startswith(b"P6"):
        return None
    # header: P6 <ws> width <ws> height <ws> maxval <single ws> data
    fields, i, n = [], 2, len(b)
    while len(fields) < 3 and i < n:
        while i < n and b[i : i + 1].isspace():
            i += 1
        if i < n and b[i : i + 1] == b"#":  # comment to EOL
            while i < n and b[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < n and not b[j : j + 1].isspace():
            j += 1
        fields.append(b[i:j])
        i = j
    i += 1  # the single whitespace after maxval
    try:
        w, h, maxv = (int(f) for f in fields)
    except (ValueError, TypeError):
        return None
    if maxv > 255 or w <= 0 or h <= 0 or i + w * h * 3 > n:
        return None
    return np.frombuffer(b, np.uint8, count=w * h * 3, offset=i).reshape(h, w, 3)


def _decode_wav(b: bytes) -> tuple[np.ndarray, int] | None:
    """PCM WAV (8- or 16-bit) -> (float samples in [-1, 1], sample_rate)."""
    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i, n = 12, len(b)
    fmt = None
    while i + 8 <= n:
        cid = b[i : i + 4]
        sz = int.from_bytes(b[i + 4 : i + 8], "little")
        body = b[i + 8 : i + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data" and fmt is not None:
            audio_fmt = int.from_bytes(fmt[0:2], "little")
            rate = int.from_bytes(fmt[4:8], "little")
            bits = int.from_bytes(fmt[14:16], "little")
            if audio_fmt != 1:  # PCM only
                return None
            if bits == 16:
                s = np.frombuffer(body, "<i2",
                                  count=len(body) // 2).astype(np.float64)
                return s / 32768.0, rate
            if bits == 8:  # unsigned
                s = np.frombuffer(body, np.uint8).astype(np.float64)
                return (s - 128.0) / 128.0, rate
            return None
        i += 8 + sz + (sz & 1)  # chunks pad to even
    return None


def decode_media(payload: bytes) -> tuple[np.ndarray, bool]:
    """payload -> (feature vector, decoded_for_real).

    Real decode for BMP / PPM / WAV (pure numpy — no codec libs needed);
    feature = [kind_tag, dim0, dim1, mean, std, min, max, extra] of the
    DECODED pixels/samples. Unknown formats fall back to the
    deterministic fake (the deployment hook for PIL/ffmpeg)."""
    px = _decode_bmp(payload)
    tag = 1.0
    if px is None:
        px = _decode_ppm(payload)
        tag = 2.0
    if px is not None:
        v = px.astype(np.float64)
        return np.array([tag, px.shape[1], px.shape[0], v.mean(), v.std(),
                         v.min(), v.max(), px.shape[2]],
                        dtype=np.float32), True
    wav = _decode_wav(payload)
    if wav is not None:
        s, rate = wav
        if s.size:
            return np.array([3.0, s.size, rate, s.mean(), s.std(),
                             s.min(), s.max(), 0.0], dtype=np.float32), True
        return np.array([3.0, 0.0, rate, 0, 0, 0, 0, 0.0],
                        dtype=np.float32), True
    return _fake_decode(payload), False


def synth_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media table (seeded payload bytes)."""
    rng = np.random.default_rng(7)
    rows = []
    kinds = ["image", "audio", "video"]
    mimes = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=256 + (i % 512), dtype=np.uint8).tobytes()
        rows.append((
            i, kind, mimes[kind],
            64 + i % 256 if kind != "audio" else None,
            48 + i % 128 if kind != "audio" else None,
            1000 + 10 * i if kind != "image" else None,
            payload,
        ))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synth_bmp(w: int, h: int, seed: int = 0) -> tuple[bytes, np.ndarray]:
    """Valid uncompressed 24-bit BMP + its (h, w, 3) BGR pixel array."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px.reshape(h, w * 3)
    data = rows[::-1].tobytes()  # bottom-up
    size = 54 + len(data)
    hdr = (b"BM" + size.to_bytes(4, "little") + b"\0\0\0\0"
           + (54).to_bytes(4, "little") + (40).to_bytes(4, "little")
           + w.to_bytes(4, "little", signed=True)
           + h.to_bytes(4, "little", signed=True)
           + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
           + (0).to_bytes(4, "little") + len(data).to_bytes(4, "little")
           + b"\0" * 16)
    return hdr + data, px


def synth_ppm(w: int, h: int, seed: int = 0) -> tuple[bytes, np.ndarray]:
    """Valid binary PPM (P6) + its (h, w, 3) RGB pixel array."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    return f"P6\n{w} {h}\n255\n".encode() + px.tobytes(), px


def synth_wav(n: int, rate: int = 8000, seed: int = 0) -> tuple[bytes, np.ndarray]:
    """Valid 16-bit PCM WAV + its int16 sample array."""
    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32768, size=n, dtype=np.int16)
    data = s.tobytes()
    fmt = ((1).to_bytes(2, "little") + (1).to_bytes(2, "little")
           + rate.to_bytes(4, "little") + (rate * 2).to_bytes(4, "little")
           + (2).to_bytes(2, "little") + (16).to_bytes(2, "little"))
    body = (b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
            + b"data" + len(data).to_bytes(4, "little") + data)
    return b"RIFF" + len(body).to_bytes(4, "little") + body, s


def _fake_decode(payload: bytes, dim: int = 8) -> np.ndarray:
    """STUB DECODER — deterministic stand-in for a real image/audio codec.

    Real deployment replaces this with e.g. PIL/libvips/ffmpeg inside the
    same mapInPandas body; the Spark plumbing around it is unchanged.
    """
    digest = hashlib.sha256(payload).digest()
    return (np.frombuffer(digest[: dim * 4], dtype=np.uint32).astype(np.float32)
            / np.float32(2**32))


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Decode + feature-extract per media row, Arrow-batched.

    Real decode for BMP/PPM/WAV (:func:`decode_media`); other formats
    get the deterministic fake with ``decoded=False``. mapInPandas (not
    a scalar UDF) so a real codec can amortize setup per batch and
    control memory: batches arrive bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) for p in pdf["payload"]]
            feats, decoded, means = [], [], []
            for p in payloads:
                f, real = decode_media(p)
                feats.append(f.tolist())
                decoded.append(real)
                # unrounded: callers round with F.round (half-up, the
                # SQL semantics) — python round() is banker's and
                # disagrees on exact .xxxx5 ties
                means.append(
                    float(np.frombuffer(p, np.uint8).mean()) if p else 0.0)
            shas = [hashlib.sha256(p).hexdigest() for p in payloads]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pd.Series([len(p) for p in payloads],
                                     dtype="int64"),
                "payload_sha256": shas,
                "mean_byte": means,
                "decoded": decoded,
                "feature": feats,
            })

    return media.mapInPandas(fn, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("in_w", T.IntegerType(), True),
    T.StructField("in_h", T.IntegerType(), True),
    T.StructField("out_w", T.IntegerType(), False),
    T.StructField("out_h", T.IntegerType(), False),
    # True when a real (BMP/PPM) decode produced the resize; codec
    # formats fall back to decoded=False with a NULL payload (the
    # deployment hook, same contract as extract_features)
    T.StructField("decoded", T.BooleanType(), False),
    T.StructField("mean_px", T.DoubleType(), True),
    # resized image re-encoded as binary PPM (P6, RGB) — downstream
    # stages re-decode it with the same pure-numpy parser
    T.StructField("resized", T.BinaryType(), True),
])


def _resize_bilinear(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resize, align_corners=False convention (output pixel
    centers map to (i + 0.5) * scale - 0.5 in source coordinates, edges
    replicate) — matches PIL/OpenCV default geometry. At an exact 2x
    downscale this degenerates to the 2x2 box average. Pure numpy,
    vectorized over the whole image."""
    h, w, _ = px.shape
    if (h, w) == (out_h, out_w):
        return px.copy()
    ys = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    y0f, x0f = np.floor(ys), np.floor(xs)
    fy = (ys - y0f)[:, None, None]
    fx = (xs - x0f)[None, :, None]
    y0 = np.clip(y0f.astype(np.int64), 0, h - 1)
    y1 = np.clip(y0f.astype(np.int64) + 1, 0, h - 1)
    x0 = np.clip(x0f.astype(np.int64), 0, w - 1)
    x1 = np.clip(x0f.astype(np.int64) + 1, 0, w - 1)
    p = px.astype(np.float64)
    top = p[y0][:, x0] * (1 - fx) + p[y0][:, x1] * fx
    bot = p[y1][:, x0] * (1 - fx) + p[y1][:, x1] * fx
    out = top * (1 - fy) + bot * fy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def _decode_image(payload: bytes) -> np.ndarray | None:
    """payload -> (h, w, 3) RGB pixels for the real-decode formats
    (BMP rows come back BGR and are flipped to RGB here)."""
    px = _decode_bmp(payload)
    if px is not None:
        return px[..., ::-1]
    return _decode_ppm(payload)


def resize_images(media: DataFrame, out_w: int = 32,
                  out_h: int = 32) -> DataFrame:
    """Resize every image row to (out_w, out_h), Arrow-batched.

    Real for BMP/PPM (pure-numpy decode -> bilinear -> PPM re-encode);
    codec formats (PNG/JPEG) yield decoded=False with NULL payload —
    in deployment PIL/libvips slots into the same mapInPandas body.
    Non-image rows are filtered JVM-side before any Python runs."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            in_w, in_h, dec, mean_px, resized = [], [], [], [], []
            for p in pdf["payload"]:
                px = _decode_image(bytes(p))
                if px is None:
                    in_w.append(None), in_h.append(None)
                    dec.append(False), mean_px.append(None)
                    resized.append(None)
                    continue
                out = _resize_bilinear(px, out_h, out_w)
                in_w.append(px.shape[1]), in_h.append(px.shape[0])
                dec.append(True)
                mean_px.append(float(out.astype(np.float64).mean()))
                resized.append(f"P6\n{out_w} {out_h}\n255\n".encode()
                               + out.tobytes())
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "in_w": pd.array(in_w, dtype="Int32"),
                "in_h": pd.array(in_h, dtype="Int32"),
                "out_w": pd.array([out_w] * len(pdf), dtype="Int32"),
                "out_h": pd.array([out_h] * len(pdf), dtype="Int32"),
                "decoded": dec,
                "mean_px": pd.array(mean_px, dtype="float64"),
                "resized": resized,
            })

    return (media.where(F.col("kind") == "image")
                 .select("media_id", "payload")
                 .mapInPandas(fn, schema=RESIZE_SCHEMA))


def frame_sample(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    timestamp (decode stubbed; timestamps + partitioning real)."""
    vids = media.where(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))).alias("frame_ms"),
    ).withColumn("frame_key", F.concat_ws(":", "media_id", "frame_ms"))

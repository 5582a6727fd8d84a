"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100-TB training-data pipeline carries image/audio/video as ``binary``
columns with typed metadata and runs decode / feature-extract / resize /
frame-sample as Arrow-batched UDFs. The image/audio codec libraries are
not available in this environment, so the DECODE step is a deterministic
fake (clearly marked); everything Spark-side — schema, batch shape,
partition behavior, UDF signatures — is real and tested.

Synthesis helper included so tests/bench have data of the right shape.
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
    T.StructField("feature", T.ArrayType(T.FloatType()), False),
])


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

    mapInPandas (not a scalar UDF) so a real decoder can amortize codec
    setup per batch and control memory: batches arrive bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            feats = [_fake_decode(p, dim).tolist() for p in payloads]
            shas = [hashlib.sha256(bytes(p)).hexdigest() for p in payloads]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": payloads.map(len).astype("int64"),
                "payload_sha256": shas,
                "feature": feats,
            })

    return media.mapInPandas(fn, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    timestamp (decode stubbed; timestamps + partitioning real)."""
    vids = media.where(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))).alias("frame_ms"),
    ).withColumn("frame_key", F.concat_ws(":", "media_id", "frame_ms"))

"""Multimodal decode: real BMP/PPM/WAV parsing to known statistics, and
the Spark plumbing (schema, batching, fallback) around it."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from index_spark.operators import multimodal as mm


def test_bmp_roundtrip_known_stats():
    payload, px = mm.synth_bmp(13, 7, seed=3)  # odd width -> row padding
    feat, real = mm.decode_media(payload)
    assert real
    v = px.astype(np.float64)
    assert feat[0] == 1.0 and (feat[1], feat[2]) == (13, 7)
    np.testing.assert_allclose(feat[3], v.mean(), rtol=1e-6)
    np.testing.assert_allclose(feat[4], v.std(), rtol=1e-6)
    assert mm._decode_bmp(payload).tobytes() == px.tobytes()


def test_ppm_roundtrip_known_stats():
    payload, px = mm.synth_ppm(9, 5, seed=4)
    feat, real = mm.decode_media(payload)
    assert real and feat[0] == 2.0 and (feat[1], feat[2]) == (9, 5)
    np.testing.assert_allclose(feat[3], px.mean(), rtol=1e-6)
    assert mm._decode_ppm(payload).tobytes() == px.tobytes()


def test_ppm_with_comment_header():
    payload, px = mm.synth_ppm(4, 4, seed=5)
    commented = payload.replace(b"P6\n", b"P6\n# a comment\n", 1)
    assert mm._decode_ppm(commented).tobytes() == px.tobytes()


def test_wav_roundtrip_known_stats():
    payload, s = mm.synth_wav(500, rate=16000, seed=6)
    feat, real = mm.decode_media(payload)
    assert real and feat[0] == 3.0
    assert (feat[1], feat[2]) == (500, 16000)
    np.testing.assert_allclose(feat[3], (s / 32768.0).mean(), atol=1e-6)
    np.testing.assert_allclose(feat[4], (s / 32768.0).std(), rtol=1e-5)


def test_unknown_format_falls_back_deterministically():
    junk = b"\x89PNG not actually decodable here"
    f1, real1 = mm.decode_media(junk)
    f2, real2 = mm.decode_media(junk)
    assert not real1 and not real2
    assert f1.tolist() == f2.tolist()  # deterministic fake


def test_truncated_payloads_rejected_not_crashed():
    bmp, _ = mm.synth_bmp(8, 8)
    wav, _ = mm.synth_wav(100)
    ppm, _ = mm.synth_ppm(8, 8)
    for p in [bmp[:40], wav[:20], ppm[:5], b"", b"BM", b"RIFF1234WAVE"]:
        _, real = mm.decode_media(p)
        assert not real


def test_extract_features_spark(spark):
    rows = []
    bmp, px = mm.synth_bmp(6, 4, seed=1)
    wav, s = mm.synth_wav(200, seed=2)
    rows.append((0, "image", "image/bmp", 6, 4, None, bytearray(bmp)))
    rows.append((1, "audio", "audio/wav", None, None, 1000, bytearray(wav)))
    rows.append((2, "image", "image/png", 4, 4, None, bytearray(b"\x89PNGjunk")))
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in mm.extract_features(df).collect()}
    assert got[0]["decoded"] and got[1]["decoded"] and not got[2]["decoded"]
    np.testing.assert_allclose(got[0]["feature"][3],
                               px.astype(np.float64).mean(), rtol=1e-6)
    np.testing.assert_allclose(got[1]["feature"][3],
                               (s / 32768.0).mean(), atol=1e-6)
    for mid, payload in [(0, bmp), (1, wav), (2, b"\x89PNGjunk")]:
        exp = float(np.frombuffer(payload, np.uint8).mean())
        np.testing.assert_allclose(got[mid]["mean_byte"], exp, rtol=1e-12)
        assert got[mid]["n_bytes"] == len(payload)


def test_frame_sample_plumbing(spark):
    media = mm.synth_media(spark, n=9)
    frames = mm.frame_sample(media, every_ms=500).collect()
    vids = media.where(F.col("kind") == "video").collect()
    exp = sum(r["duration_ms"] // 500 + 1 for r in vids)
    assert len(frames) == exp

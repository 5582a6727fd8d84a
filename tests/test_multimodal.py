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


# ------------------------------------------------------------------ resize

def test_resize_identity_is_copy():
    _, px = mm.synth_ppm(8, 6, seed=9)
    out = mm._resize_bilinear(px, 6, 8)
    assert out.tobytes() == px.tobytes()


def test_resize_constant_stays_constant():
    px = np.full((10, 14, 3), 173, dtype=np.uint8)
    out = mm._resize_bilinear(px, 5, 33)
    assert out.shape == (5, 33, 3)
    assert (out == 173).all()


def test_resize_2x_downscale_is_box_average():
    # align_corners=False at an exact 2x downscale samples the midpoint
    # of each 2x2 block -> the block mean
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(8, 12, 3), dtype=np.uint8)
    out = mm._resize_bilinear(px, 4, 6)
    box = px.astype(np.float64).reshape(4, 2, 6, 2, 3).mean(axis=(1, 3))
    np.testing.assert_array_equal(out, np.clip(np.rint(box), 0, 255))


def test_resize_upscale_gradient_exact():
    # a horizontal linear ramp upsampled 2x stays the same linear ramp
    # (bilinear reproduces affine signals away from the replicated edge)
    ramp = np.tile(np.arange(0, 160, 10, dtype=np.uint8)[None, :, None],
                   (4, 1, 3))
    out = mm._resize_bilinear(ramp, 4, 32)
    xs = (np.arange(32) + 0.5) * 0.5 - 0.5
    expect = np.clip(np.rint(np.interp(xs, np.arange(16),
                                       np.arange(0, 160, 10))), 0, 255)
    np.testing.assert_array_equal(out[2, :, 0], expect.astype(np.uint8))


def test_resize_images_spark(spark):
    bmp, bpx = mm.synth_bmp(16, 12, seed=1)
    ppm, ppx = mm.synth_ppm(10, 10, seed=2)
    rows = [
        (1, "image", "image/bmp", 16, 12, None, bmp),
        (2, "image", "image/ppm", 10, 10, None, ppm),
        (3, "image", "image/png", 8, 8, None, b"\x89PNG junk"),
        (4, "audio", "audio/wav", None, None, 1000, mm.synth_wav(100)[0]),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {r.media_id: r for r in
           mm.resize_images(media, out_w=8, out_h=8).collect()}
    assert set(got) == {1, 2, 3}  # audio filtered JVM-side
    assert (got[1].in_w, got[1].in_h, got[1].decoded) == (16, 12, True)
    assert (got[3].decoded, got[3].resized, got[3].mean_px) == (False, None, None)
    # re-decode the PPM payload: roundtrip pixels and mean agree
    for mid, src in ((1, bpx[..., ::-1]), (2, ppx)):
        rpx = mm._decode_ppm(bytes(got[mid].resized))
        assert rpx.shape == (8, 8, 3)
        np.testing.assert_array_equal(rpx, mm._resize_bilinear(src, 8, 8))
        np.testing.assert_allclose(got[mid].mean_px,
                                   rpx.astype(np.float64).mean(), rtol=1e-12)

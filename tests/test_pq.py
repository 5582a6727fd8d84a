"""Product quantization (similarity.pq_*): codebooks, codes, and ADC
top-k pinned against a pure-numpy reference implementing the same
deterministic contract."""

import numpy as np
import pandas as pd
import pytest

from index_spark.operators.similarity import pq_encode, pq_topk, pq_train

M, K, ITERS = 4, 6, 2
N, DIM = 120, 16


@pytest.fixture(scope="module")
def vecs():
    rng = np.random.RandomState(7)
    # clustered structure so PQ has something to learn
    centers = rng.randn(5, DIM) * 3
    x = centers[rng.randint(0, 5, N)] + rng.randn(N, DIM) * 0.4
    return x.astype(np.float64)


@pytest.fixture(scope="module")
def emb(spark, vecs):
    pdf = pd.DataFrame({"vec_id": np.arange(N, dtype=np.int64),
                        "embedding": [v.astype(np.float32).tolist()
                                      for v in vecs]})
    return spark.createDataFrame(pdf).cache()


def _np_train(x, m, k, iters):
    n, dim = x.shape
    dsub = dim // m
    cents = x[:k].reshape(k, m, dsub).transpose(1, 0, 2).copy()
    xs = x.reshape(n, m, dsub)
    for _ in range(iters):
        nxt = cents.copy()
        for s in range(m):
            d2 = ((xs[:, s, None, :] - cents[s][None, :, :]) ** 2).sum(2)
            a = np.argmin(d2, axis=1)
            for ci in range(k):
                if (a == ci).any():
                    nxt[s, ci] = xs[a == ci, s].mean(axis=0)
        cents = nxt
    return cents


def _np_encode(x, cb):
    m, _, dsub = cb.shape
    xs = x.reshape(len(x), m, dsub)
    return np.stack([
        np.argmin(((xs[:, s, None, :] - cb[s][None, :, :]) ** 2).sum(2), 1)
        for s in range(m)], axis=1)


def test_train_matches_numpy_reference(spark, emb, vecs):
    # float32 storage: the reference must see the same rounded inputs
    x = vecs.astype(np.float32).astype(np.float64)
    want = _np_train(x, M, K, ITERS)
    got = pq_train(emb, m=M, k=K, iters=ITERS)
    assert got.shape == (M, K, DIM // M)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_encode_and_adc_match_numpy(spark, emb, vecs):
    x = vecs.astype(np.float32).astype(np.float64)
    cb = pq_train(emb, m=M, k=K, iters=ITERS)
    codes = {r["vec_id"]: list(r["codes"])
             for r in pq_encode(emb, cb).collect()}
    want = _np_encode(x, cb)
    assert all(codes[i] == list(want[i]) for i in range(N))
    q = x[3]
    lut = ((q.reshape(M, 1, DIM // M) - cb) ** 2).sum(2)
    approx = lut[np.arange(M)[None, :], want].sum(axis=1)
    order = np.lexsort((np.arange(N), approx))[:10]
    got = pq_topk(pq_encode(emb, cb), cb, q.tolist(), k=10).collect()
    assert [r["vec_id"] for r in got] == list(order)
    np.testing.assert_allclose([r["approx_d2"] for r in got],
                               np.round(approx[order], 4), atol=1e-4)


def test_rerank_returns_exact_top(spark, emb, vecs):
    x = vecs.astype(np.float32).astype(np.float64)
    cb = pq_train(emb, m=M, k=K, iters=ITERS)
    q = x[3]
    got = pq_topk(pq_encode(emb, cb), cb, q.tolist(), k=5,
                  rerank=40, emb=emb).collect()
    exact = np.round(((x - q) ** 2).sum(axis=1), 4)
    order = np.lexsort((np.arange(N), exact))[:5]
    # with a 40-candidate pool on 120 clustered vectors, the exact
    # top-5 is recovered and distances are the exact ones
    assert [r["vec_id"] for r in got] == list(order)
    np.testing.assert_allclose([r["d2"] for r in got], exact[order],
                               atol=1e-4)


def test_adc_scan_is_jvm_only(spark, emb, tmp_path):
    # encode is an Arrow pass by design; the SCAN over stored codes must
    # be pure codegen — materialize codes so the plan under test is the
    # serving plan, not the encode lineage
    cb = pq_train(emb, m=M, k=K, iters=1)
    p = str(tmp_path / "codes")
    pq_encode(emb, cb).write.parquet(p)
    codes = spark.read.parquet(p)
    plan = pq_topk(codes, cb, [0.0] * DIM, k=5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_guards(spark, emb):
    with pytest.raises(ValueError, match="divisible"):
        pq_train(emb, m=5)
    cb = pq_train(emb, m=M, k=4, iters=1)
    with pytest.raises(ValueError, match="rerank"):
        pq_topk(pq_encode(emb, cb), cb, [0.0] * DIM, rerank=10)
    with pytest.raises(ValueError, match="query dim"):
        pq_topk(pq_encode(emb, cb), cb, [0.0] * (DIM + 1))

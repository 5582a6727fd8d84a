"""Product quantization (similarity.pq_*): codebooks, codes, and ADC
top-k pinned against a pure-numpy reference implementing the same
deterministic contract."""

import numpy as np
import pandas as pd
import pytest

from index_spark.operators.similarity import (
    ivf_pq_index,
    ivf_pq_topk,
    pq_encode,
    pq_topk,
    pq_train,
)

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


NB = 4  # coarse buckets for the IVF,PQ tests


@pytest.fixture(scope="module")
def coarse(vecs):
    # deterministic coarse centroids: the 4 cluster centers the synthetic
    # data was drawn around would be ideal; first-NB rows are enough
    return vecs[:NB].copy()


def _np_norm(cents):
    return cents / np.linalg.norm(cents, axis=1, keepdims=True).clip(min=1e-12)


def _np_buckets(x, cents):
    xn = x / np.linalg.norm(x, axis=1, keepdims=True).clip(min=1e-12)
    return np.argmax(xn @ _np_norm(cents).T, axis=1)


def test_ivf_pq_index_matches_numpy(spark, emb, vecs, coarse):
    x = vecs.astype(np.float32).astype(np.float64)
    cb = pq_train(emb, m=M, k=K, iters=ITERS)
    rows = {r["vec_id"]: (r["bucket"], list(r["codes"]))
            for r in ivf_pq_index(emb, coarse, cb).collect()}
    want_b = _np_buckets(x, coarse)
    want_c = _np_encode(x, cb)
    assert len(rows) == N
    for i in range(N):
        assert rows[i][0] == want_b[i]
        assert rows[i][1] == list(want_c[i])


def test_ivf_pq_full_probe_equals_pq_topk(spark, emb, vecs, coarse):
    # nprobe >= n_buckets degenerates to plain ADC over everything
    x = vecs.astype(np.float32).astype(np.float64)
    cb = pq_train(emb, m=M, k=K, iters=ITERS)
    idx = ivf_pq_index(emb, coarse, cb)
    q = x[3].tolist()
    got = ivf_pq_topk(idx, coarse, cb, q, k=10, nprobe=NB).collect()
    want = pq_topk(pq_encode(emb, cb), cb, q, k=10).collect()
    assert [(r["vec_id"], r["approx_d2"]) for r in got] == \
           [(r["vec_id"], r["approx_d2"]) for r in want]


def test_ivf_pq_pruned_probe_matches_numpy_restriction(spark, emb, vecs,
                                                       coarse):
    x = vecs.astype(np.float32).astype(np.float64)
    cb = pq_train(emb, m=M, k=K, iters=ITERS)
    idx = ivf_pq_index(emb, coarse, cb)
    q = x[3]
    qn = q / np.linalg.norm(q)
    probe = set(np.argsort(-(_np_norm(coarse) @ qn), kind="stable")[:2])
    mask = np.isin(_np_buckets(x, coarse), list(probe))
    lut = ((q.reshape(M, 1, DIM // M) - cb) ** 2).sum(2)
    approx = lut[np.arange(M)[None, :], _np_encode(x, cb)].sum(axis=1)
    ids = np.arange(N)[mask]
    order = ids[np.lexsort((ids, approx[mask]))][:10]
    got = ivf_pq_topk(idx, coarse, cb, q.tolist(), k=10, nprobe=2).collect()
    assert [r["vec_id"] for r in got] == list(order)
    np.testing.assert_allclose([r["approx_d2"] for r in got],
                               np.round(approx[order], 4), atol=1e-4)


def test_ivf_pq_rerank_exact_distances(spark, emb, vecs, coarse):
    x = vecs.astype(np.float32).astype(np.float64)
    cb = pq_train(emb, m=M, k=K, iters=ITERS)
    idx = ivf_pq_index(emb, coarse, cb)
    q = x[3]
    got = ivf_pq_topk(idx, coarse, cb, q.tolist(), k=5, nprobe=NB,
                      rerank=40, emb=emb).collect()
    exact = np.round(((x - q) ** 2).sum(axis=1), 4)
    order = np.lexsort((np.arange(N), exact))[:5]
    assert [r["vec_id"] for r in got] == list(order)
    np.testing.assert_allclose([r["d2"] for r in got], exact[order],
                               atol=1e-4)


def test_ivf_pq_serving_plan_jvm_only_and_pruned(spark, emb, vecs, coarse,
                                                 tmp_path):
    # the ADC scan over the stored (bucket, codes) table must be pure
    # codegen with the probe filter pushed to the parquet scan
    cb = pq_train(emb, m=M, k=K, iters=1)
    p = str(tmp_path / "ivfpq")
    ivf_pq_index(emb, coarse, cb).write.partitionBy("bucket").parquet(p)
    idx = spark.read.parquet(p)
    df = ivf_pq_topk(idx, coarse, cb, [0.0] * DIM, k=5, nprobe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    # partition pruning: the bucket filter appears as a partition filter
    assert "PartitionFilters" in plan and "bucket" in plan


def test_ivf_pq_assignment_ignores_centroid_norms(spark):
    # a large-norm centroid at 60 degrees must not beat a small-norm
    # centroid the vector is exactly aligned with: assignment is cosine,
    # not raw dot (kmeans() centroids are unnormalized Euclidean means)
    x = np.zeros(DIM)
    x[0] = 1.0
    one = spark.createDataFrame(pd.DataFrame({
        "vec_id": np.array([0], dtype=np.int64),
        "embedding": [x.astype(np.float32).tolist()]}))
    c0 = np.zeros(DIM)
    c0[0] = 0.1                       # aligned, tiny norm
    c1 = np.zeros(DIM)
    c1[0], c1[1] = 5.0, 8.66          # ~60 degrees, big norm
    cb = np.zeros((M, K, DIM // M))
    row = ivf_pq_index(one, np.stack([c0, c1]), cb).collect()[0]
    assert row["bucket"] == 0
    # probe order for the same query prefers the aligned centroid too
    got = ivf_pq_topk(ivf_pq_index(one, np.stack([c0, c1]), cb),
                      np.stack([c0, c1]), cb, x.tolist(), k=1, nprobe=1)
    assert got.collect()[0]["vec_id"] == 0


def test_ivf_pq_guards(spark, emb, coarse):
    cb = pq_train(emb, m=M, k=4, iters=1)
    idx = ivf_pq_index(emb, coarse, cb)
    with pytest.raises(ValueError, match="rerank"):
        ivf_pq_topk(idx, coarse, cb, [0.0] * DIM, rerank=10)


def test_guards(spark, emb):
    with pytest.raises(ValueError, match="divisible"):
        pq_train(emb, m=5)
    cb = pq_train(emb, m=M, k=4, iters=1)
    with pytest.raises(ValueError, match="rerank"):
        pq_topk(pq_encode(emb, cb), cb, [0.0] * DIM, rerank=10)
    with pytest.raises(ValueError, match="query dim"):
        pq_topk(pq_encode(emb, cb), cb, [0.0] * (DIM + 1))

"""Logistic-regression quality classifier: pinned GD contract."""

import hashlib
import re

import numpy as np
from pyspark.sql import functions as F

from index_spark.operators.classifier import (hashed_features, score_logreg,
                                              train_logreg)

DIM = 64


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def _labels(spark, ys):
    return spark.createDataFrame(
        [(i, y) for i, y in enumerate(ys)], "doc_id long, y double")


def _bucket(t):
    h = hashlib.md5(t.encode()).hexdigest()
    return (int(h[0], 16) * 4096 + int(h[1], 16) * 256
            + int(h[2], 16) * 16 + int(h[3], 16)) % DIM


def _numpy_lr(texts, ys, iters, lr=1.0):
    X = np.zeros((len(texts), DIM))
    for d, t in enumerate(texts):
        toks = [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]
        for tok in toks:
            X[d, _bucket(tok)] += 1
        if toks:
            X[d] /= len(toks)
    y = np.array(ys, dtype=float)
    labeled = ~np.isnan(y)
    w = np.zeros(DIM)
    for _ in range(iters):
        p = 1 / (1 + np.exp(-X @ w))
        w -= lr * X[labeled].T @ (p[labeled] - y[labeled]) / labeled.sum()
    return {d: round(float(1 / (1 + np.exp(-X[d] @ w))), 6)
            for d in range(len(texts))}


def test_logreg_matches_numpy_reference(spark):
    texts = ["good clean prose here", "spam spam buy now",
             "clean good text prose", "buy spam now cheap",
             "neutral words appear"]
    ys = [1.0, 0.0, 1.0, 0.0, 1.0]
    feats = hashed_features(_docs(spark, texts), dim=DIM)
    w = train_logreg(feats, _labels(spark, ys), iters=3, lr=1.0)
    got = {r.doc_id: round(r.prob, 6)
           for r in score_logreg(_docs(spark, texts), feats, w).collect()}
    assert got == _numpy_lr(texts, ys, iters=3)
    # direction: spam docs below clean docs
    assert got[1] < got[0] and got[3] < got[2]


def test_logreg_unlabeled_docs_scored_not_trained(spark):
    texts = ["alpha beta", "gamma delta", "alpha gamma"]
    docs = _docs(spark, texts)
    feats = hashed_features(docs, dim=DIM)
    labels = _labels(spark, [1.0, 0.0])  # doc 2 unlabeled
    w = train_logreg(feats, labels, iters=2)
    got = score_logreg(docs, feats, w).collect()
    assert len(got) == 3  # scored anyway
    ref = _numpy_lr(texts, [1.0, 0.0, float("nan")], iters=2)
    assert {r.doc_id: round(r.prob, 6) for r in got} == ref


def test_logreg_featureless_doc_scores_prior(spark):
    docs = _docs(spark, ["real tokens", ""])
    feats = hashed_features(docs, dim=DIM)
    w = train_logreg(feats, _labels(spark, [1.0, 0.0]), iters=1)
    got = {r.doc_id: r.prob for r in score_logreg(docs, feats, w).collect()}
    assert got[1] == 0.5


def test_logreg_plan_broadcasts_weights_no_python(spark):
    docs = _docs(spark, ["a b c", "b c d"])
    feats = hashed_features(docs, dim=DIM)
    w = train_logreg(feats, _labels(spark, [1.0, 0.0]), iters=1)
    plan = (score_logreg(docs, feats, w)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

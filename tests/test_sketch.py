"""Deterministic HLL / Count-Min sketches (operators/sketch.py): the
md5-nibble register pipeline is pinned against an independent Python
reference (hashlib), and both operators stay pure-JVM plans.
"""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from index_spark.operators.sketch import (
    CMS_DEPTH,
    CMS_WIDTH,
    HLL_M,
    cms_heavy_hitters,
    cms_sketch,
    hll_cardinality,
)


def _py_hll_register(value: str) -> tuple[int, int]:
    h = hashlib.md5(value.encode()).hexdigest()
    bucket = int(h[:2], 16)
    bits = bin(int(h[2:16], 16))[2:].zfill(56)
    rho = 57 if "1" not in bits else bits.index("1") + 1
    return bucket, rho


def _py_hll_estimate(values) -> float:
    regs = {}
    for v in values:
        b, r = _py_hll_register(v)
        regs[b] = max(regs.get(b, 0), r)
    alpha = 0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0 * float(1 << 57)
    s = sum(1 << (57 - m) for m in regs.values())
    s += (HLL_M - len(regs)) * (1 << 57)
    raw = alpha / float(s)
    if len(regs) < HLL_M and raw <= 2.5 * HLL_M:
        return HLL_M * math.log(HLL_M / float(HLL_M - len(regs)))
    return raw


def _py_cms_bucket(value: str, j: int) -> int:
    h = hashlib.md5(f"{value}:{j}".encode()).hexdigest()
    return int(h[:2], 16) % CMS_WIDTH


@pytest.fixture(scope="module")
def words(spark):
    vals = [(f"w{i % 700:04d}",) for i in range(5000)]
    return spark.createDataFrame(vals, "term string").persist()


def test_hll_matches_python_reference(spark, words):
    got = hll_cardinality(words, "term").collect()[0]
    vals = {r["term"] for r in words.distinct().collect()}
    expect = _py_hll_estimate(vals)
    assert abs(got["hll_estimate"] - expect) < 1e-9
    regs = {_py_hll_register(v)[0] for v in vals}
    assert got["n_registers_hit"] == len(regs)


def test_hll_accuracy_and_duplicate_invariance(spark, words):
    est = hll_cardinality(words, "term").collect()[0]["hll_estimate"]
    # 700 distinct, sigma ~= 1.04/sqrt(256) = 6.5% -> 4 sigma bound
    assert abs(est - 700) / 700 < 0.26
    doubled = words.union(words)
    est2 = hll_cardinality(doubled, "term").collect()[0]["hll_estimate"]
    assert est2 == est  # multiplicity never moves a register


def test_hll_plan_is_jvm_only(words):
    plan = (hll_cardinality(words, "term")
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cms_sketch_matches_python_reference(spark, words):
    sk = {(r["j"], r["bucket"]): r["cnt"]
          for r in cms_sketch(words, "term").collect()}
    # python reference over the same multiset
    from collections import Counter

    counts = Counter((j, _py_cms_bucket(f"w{i % 700:04d}", j))
                     for i in range(5000) for j in range(CMS_DEPTH))
    assert sk == dict(counts)


def test_cms_overestimates_and_ranks(spark):
    # skewed multiset: w0000 x 400, w0001 x 100, tail x 1
    rows = ([("a0",)] * 400 + [("b1",)] * 100
            + [(f"t{i:03d}",) for i in range(300)])
    df = spark.createDataFrame(rows, "term string")
    out = cms_heavy_hitters(df, "term", k=5).collect()
    assert out[0]["term"] == "a0" and out[0]["exact_cnt"] == 400
    assert out[1]["term"] == "b1" and out[1]["exact_cnt"] == 100
    for r in out:
        assert r["cms_est"] >= r["exact_cnt"]
    # estimate equals python simulation exactly
    from collections import Counter

    sketch = Counter()
    for (t,) in rows:
        for j in range(CMS_DEPTH):
            sketch[(j, _py_cms_bucket(t, j))] += 1
    for r in out:
        exp = min(sketch[(j, _py_cms_bucket(r["term"], j))]
                  for j in range(CMS_DEPTH))
        assert r["cms_est"] == exp

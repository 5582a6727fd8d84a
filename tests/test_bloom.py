"""Bloom-filter sketch + bloom-prefiltered decontamination."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_bloom_no_false_negatives(spark):
    from index_spark.operators.sketch import bloom_bits, bloom_maybe_filter

    vals = spark.createDataFrame(
        [(f"member{i}",) for i in range(500)], "v string")
    bits = bloom_bits(vals, "v", m_bits=1 << 14, k=5)
    assert bits.dtype == np.uint64 and bits.size == (1 << 14) // 64
    kept = bloom_maybe_filter(vals, "v", bits, k=5).count()
    assert kept == 500  # every member passes, always


def test_bloom_filters_most_non_members(spark):
    from index_spark.operators.sketch import bloom_bits, bloom_maybe_filter

    members = spark.createDataFrame(
        [(f"member{i}",) for i in range(500)], "v string")
    others = spark.createDataFrame(
        [(f"other{i}",) for i in range(2000)], "v string")
    bits = bloom_bits(members, "v", m_bits=1 << 14, k=5)
    fp = bloom_maybe_filter(others, "v", bits, k=5).count()
    # m/n = 32 bits per key, k=5 -> theoretical FP ~0.2%; allow slack
    assert fp / 2000 < 0.05


def test_bloom_bits_validation(spark):
    from index_spark.operators.sketch import bloom_bits

    df = spark.createDataFrame([("a",)], "v string")
    with pytest.raises(ValueError, match="power of two"):
        bloom_bits(df, "v", m_bits=1000)


def test_bloom_decontaminate_identity(spark):
    from index_spark.operators.contamination import (
        bloom_decontaminate,
        decontaminate,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    exact = {(r.doc_id, r.n_overlap, r.contaminated)
             for r in decontaminate(train, bench, n=4).collect()}
    bloom = {(r.doc_id, r.n_overlap, r.contaminated)
             for r in bloom_decontaminate(train, bench, n=4).collect()}
    assert bloom == exact
    assert any(c for _, _, c in exact)  # fixture actually overlaps

"""Session-8 operators: line-wise dedup (boilerplate removal)."""

import pytest
from pyspark.sql import functions as F

from index_spark.operators.contamination import remove_duplicated_lines

BOILER = "copyright 2024 acme corp"
NAV = "home | products | about"


@pytest.fixture(scope="module")
def line_docs(spark):
    rows = [
        (0, f"{BOILER}\nalpha unique text here\n{NAV}"),
        (1, f"{BOILER}\nbeta different body\n{NAV}"),
        (2, f"{BOILER}\ngamma third body"),
        (3, "entirely original document\nwith two lines"),
        (4, f"{BOILER}\n{BOILER}"),          # fully boilerplate
        (5, ""),                              # empty doc -> one empty line
        (6, ""),                              # empty line shared by 5+6
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _py_oracle(rows, min_docs):
    from collections import defaultdict
    docs = {i: t.split("\n") for i, t in rows}
    nd = defaultdict(set)
    for i, lines in docs.items():
        for ln in lines:
            nd[ln].add(i)
    dup = {ln for ln, s in nd.items() if len(s) >= min_docs}
    out = {}
    for i, lines in docs.items():
        kept = [ln for ln in lines if ln not in dup]
        out[i] = ("\n".join(kept), len(lines), len(kept))
    return out

def test_matches_python_oracle(spark, line_docs):
    rows = [(r["doc_id"], r["text"]) for r in line_docs.collect()]
    want = _py_oracle(rows, 3)
    got = {r["doc_id"]: (r["text"], r["n_lines"], r["n_kept"])
           for r in remove_duplicated_lines(line_docs, min_docs=3).collect()}
    assert got == want


def test_boilerplate_dropped_prose_kept(spark, line_docs):
    out = {r["doc_id"]: r for r in
           remove_duplicated_lines(line_docs, min_docs=3).collect()}
    assert BOILER not in out[0]["text"]
    assert "alpha unique text here" in out[0]["text"]
    # NAV appears in only 2 docs — survives at min_docs=3
    assert NAV in out[0]["text"]
    assert out[4]["text"] == "" and out[4]["n_dropped"] == 2
    # empty docs: the single empty line is shared by docs 5 and 6 but
    # below min_docs=3 here, so it survives
    assert out[5]["n_kept"] == 1


def test_min_docs_two_drops_nav_and_empties(spark, line_docs):
    out = {r["doc_id"]: r for r in
           remove_duplicated_lines(line_docs, min_docs=2).collect()}
    assert NAV not in out[0]["text"]
    assert out[5]["n_kept"] == 0
    assert out[3]["n_dropped"] == 0  # unique doc untouched


def test_hashed_matches_exact(spark, line_docs):
    a = sorted(map(tuple, remove_duplicated_lines(
        line_docs, min_docs=2).collect()))
    b = sorted(map(tuple, remove_duplicated_lines(
        line_docs, min_docs=2, hashed=True).collect()))
    assert a == b


def test_order_preserved(spark):
    # kept lines must re-serialize in original order even when the
    # dropped lines interleave
    docs = spark.createDataFrame(
        [(0, "z last\ndup\na first\ndup\nm middle"),
         (1, "dup")], ["doc_id", "text"])
    out = {r["doc_id"]: r["text"] for r in
           remove_duplicated_lines(docs, min_docs=2).collect()}
    assert out[0] == "z last\na first\nm middle"


def test_no_python_in_plan(spark, line_docs):
    plan = remove_duplicated_lines(line_docs, min_docs=2) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_filtered_knn_prefilters(spark):
    import numpy as np
    import pandas as pd

    from index_spark.operators.similarity import cosine_topk

    rng = np.random.RandomState(3)
    x = rng.randn(40, 8)
    pdf = pd.DataFrame({"vec_id": np.arange(40, dtype=np.int64),
                        "embedding": [v.astype("float32").tolist()
                                      for v in x]})
    emb = spark.createDataFrame(pdf)
    allow = emb.filter("vec_id % 2 = 0").select("vec_id")
    got = cosine_topk(emb, x[0].tolist(), k=5, restrict=allow).collect()
    ids = [r["vec_id"] for r in got]
    assert len(ids) == 5 and all(i % 2 == 0 for i in ids)
    # exact over the filtered population: matches numpy on evens only
    # (float32 storage: the reference sees the same rounded values; the
    # query stays the caller's float64 list, as passed to the engine)
    xs = x.astype("float32").astype("float64")
    q = x[0] / np.linalg.norm(x[0])
    cos = (xs / np.linalg.norm(xs, axis=1, keepdims=True)) @ q
    evens = np.arange(0, 40, 2)
    want = evens[np.lexsort((evens, -np.round(cos[evens], 4)))][:5]
    assert ids == list(want)

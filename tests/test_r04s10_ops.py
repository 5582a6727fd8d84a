"""Round-4 session-10 surfaces: the Gopher quality-rule battery,
SRP-LSH embedding near-dup, and CombSUM/CombMNZ rank fusion — each
pinned against a hand-computed reference."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from index_spark.operators.curate import gopher_quality


# ---------------------------------------------------------------- gopher

DOCS = [
    # 0: clean English-ish doc — passes every gate (thresholds relaxed
    # below so its 12 words clear the floor)
    (0, "the quick brown fox jumps over that lazy dog have with energy"),
    # 1: bullet lines (3/4 bulleted)
    (1, "- the alpha item\n- the beta item\n- the gamma item\n"
        "the closing words have arrived"),
    # 2: ellipsis endings (2/3) — lines long enough that the two '...'
    # stay under the symbol-ratio gate (which would otherwise fire
    # first; ellipses count as symbols too, per Gopher)
    (2, "the story begins with many long words in this opening line"
        " today...\nthe story continues with many long words in the"
        " middle line today...\nthe story ends with that"),
    # 3: duplicate lines ('same line here' x3 of 4)
    (3, "same line here\nsame line here\nsame line here\n"
        "the different with that have line"),
    # 4: symbol-heavy (# and ...)
    (4, "the code # has # many # hashes ... and ... more ... with that"),
    # 5: few stopwords
    (5, "quantum flux capacitor resonance matrix inversion theorem proof"),
    # 6: numeric soup — low alpha-word fraction
    (6, "123 456 789 101 112 131 415 161 718 the 192 021 222 324 252 6"),
    # 7: empty text
    (7, ""),
    # 8: NULL text
    (8, None),
]


@pytest.fixture(scope="module")
def gq(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = gopher_quality(df, min_words=5, max_words=100,
                         min_stopwords=2, min_mean_word_len=2.0,
                         max_mean_word_len=10.0, max_bullet_frac=0.5)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_gopher_clean_doc_keeps(gq):
    r = gq[0]
    assert r["keep"] and r["reason"] == "ok"
    assert r["n_words"] == 12
    assert r["n_stopwords"] == 4  # the, that, have, with
    assert r["dup_line_frac"] == 0.0


def test_gopher_bullet_lines(gq):
    r = gq[1]
    assert r["reason"] == "bullet_lines"
    assert r["bullet_frac"] == 0.75


def test_gopher_ellipsis_lines(gq):
    r = gq[2]
    assert r["reason"] == "ellipsis_lines"
    assert r["ellipsis_frac"] == round(2 / 3, 4)


def test_gopher_dup_lines(gq):
    r = gq[3]
    # 4 lines, 'same line here' occurs 3x -> 2 beyond-first
    assert r["dup_line_frac"] == 0.5
    # dup chars = 2*14 = 28 over total 14*3 + len(line4)=33 -> 75
    assert r["dup_line_char_frac"] == round(28 / 75, 4)
    assert r["reason"] == "dup_lines"


def test_gopher_symbol_ratio(gq):
    r = gq[4]
    # 3 '#' + 3 '...' over 15 whitespace words
    assert r["symbol_ratio"] == round(6 / 15, 4)
    assert r["reason"] == "symbol_ratio"


def test_gopher_stopword_gate(gq):
    assert gq[5]["reason"] == "few_stopwords"
    assert gq[5]["n_stopwords"] == 0


def test_gopher_alpha_words(gq):
    r = gq[6]
    assert r["alpha_word_frac"] == round(1 / 16, 4)
    assert r["reason"] == "low_alpha_words"


def test_gopher_empty_and_null(gq):
    for i in (7, 8):
        r = gq[i]
        assert r["n_words"] == 0 and r["reason"] == "too_few_words"
        assert r["mean_word_len"] == 0.0
        assert r["dup_line_char_frac"] == 0.0


def test_gopher_map_only_plan(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = gopher_quality(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # one scan, zero shuffles


# ----------------------------------------------------------- SRP-LSH

def _rand_vecs(n, dim, seed=7):
    rng = np.random.RandomState(seed)
    v = rng.normal(size=(n, dim))
    return v / np.linalg.norm(v, axis=1, keepdims=True)


@pytest.fixture(scope="module")
def srp_emb(spark):
    base = _rand_vecs(40, 16)
    rows, vid = [], 0
    vecs = {}
    for i in range(40):
        rows.append((vid, [float(x) for x in base[i]]))
        vecs[vid] = base[i]
        vid += 1
    # planted near-dups: tiny perturbations of vectors 0..4
    rng = np.random.RandomState(99)
    for i in range(5):
        p = base[i] + 0.01 * rng.normal(size=16)
        p = p / np.linalg.norm(p)
        rows.append((vid, [float(x) for x in p]))
        vecs[vid] = p
        vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, vecs


def test_srp_signs_deterministic():
    from index_spark.operators.similarity import srp_signs

    a = srp_signs(16, 8, seed="srp")
    b = srp_signs(16, 8, seed="srp")
    assert (a == b).all() and set(np.unique(a)) <= {-1.0, 1.0}
    c = srp_signs(16, 8, seed="other")
    assert (a != c).any()


def test_srp_finds_planted_neighbors(srp_emb):
    from index_spark.operators.similarity import srp_near_dup_pairs

    df, vecs = srp_emb
    out = srp_near_dup_pairs(df, n_planes=16, band_bits=4,
                             threshold=0.95).collect()
    got = {(r["vec_a"], r["vec_b"]) for r in out}
    # every planted pair (i, 40+i) has cos ~0.9999 — with 4 bands of
    # 4 bits over near-identical vectors all bands agree
    for i in range(5):
        assert (i, 40 + i) in got
    # every reported pair really is above threshold (exact verify ran)
    for r in out:
        a, b = vecs[r["vec_a"]], vecs[r["vec_b"]]
        cos = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert round(cos, 4) >= 0.95
        assert abs(round(cos, 4) - r["cos"]) < 1e-9


def test_srp_candidates_are_band_local(srp_emb):
    """The pair relation never goes all-pairs: every reported pair
    shares at least one band value (recomputed from the signatures)."""
    from index_spark.operators.similarity import (
        srp_near_dup_pairs,
        srp_signatures,
    )

    df, _ = srp_emb
    sigs = srp_signatures(df, n_planes=16, band_bits=4)
    bands = {}
    for r in sigs.collect():
        bands.setdefault(r["vec_id"], set()).add((r["band"], r["band_val"]))
    out = srp_near_dup_pairs(df, n_planes=16, band_bits=4,
                             threshold=0.5).collect()
    assert out
    for r in out:
        assert bands[r["vec_a"]] & bands[r["vec_b"]]


def test_srp_plan_no_cartesian(srp_emb):
    from index_spark.operators.similarity import srp_near_dup_pairs

    df, _ = srp_emb
    plan = srp_near_dup_pairs(df, n_planes=16, band_bits=4) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


# ---------------------------------------------------- CombSUM / CombMNZ

R1 = [(1, 10.0), (2, 8.0), (3, 6.0), (4, 4.0)]
R2 = [(3, 0.9), (1, 0.5), (5, 0.3)]


def _minmax(rows):
    lo = min(s for _, s in rows)
    hi = max(s for _, s in rows)
    return {d: (s - lo) / (hi - lo) if hi > lo else 1.0 for d, s in rows}


def _comb_oracle(method):
    n1, n2 = _minmax(R1), _minmax(R2)
    docs = set(n1) | set(n2)
    out = {}
    for d in docs:
        parts = [m[d] for m in (n1, n2) if d in m]
        s = sum(parts)
        out[d] = round(s * len(parts) if method == "mnz" else s, 6)
    return out


@pytest.mark.parametrize("method", ["sum", "mnz"])
def test_comb_fuse_matches_hand_oracle(spark, method):
    from index_spark.operators.hybrid import comb_fuse

    r1 = spark.createDataFrame(R1, "doc_id long, score double")
    r2 = spark.createDataFrame(R2, "doc_id long, score double")
    out = comb_fuse([r1, r2], k=10, method=method).collect()
    oracle = _comb_oracle(method)
    assert {r["doc_id"]: r["fused"] for r in out} == oracle
    # ordering: fused desc, doc_id asc
    exp = sorted(oracle, key=lambda d: (-oracle[d], d))
    assert [r["doc_id"] for r in out] == exp


def test_comb_mnz_rewards_agreement(spark):
    from index_spark.operators.hybrid import comb_fuse

    r1 = spark.createDataFrame(R1, "doc_id long, score double")
    r2 = spark.createDataFrame(R2, "doc_id long, score double")
    mnz = {r["doc_id"]: r["fused"]
           for r in comb_fuse([r1, r2], k=10, method="mnz").collect()}
    # doc 3 appears in both rankings; doc 2 only in one with a higher
    # single-ranking normalized score — MNZ puts 3 above 2
    assert mnz[3] > mnz[2]


def test_comb_fuse_single_ranking_is_identity_order(spark):
    from index_spark.operators.hybrid import comb_fuse

    r1 = spark.createDataFrame(R1, "doc_id long, score double")
    out = comb_fuse([r1], k=10, method="sum").collect()
    assert [r["doc_id"] for r in out] == [1, 2, 3, 4]


# ------------------------------------------------------ span_first

SPAN_DOCS = [
    ("r", "a", "x y z data table w"),       # phrase start at 3
    ("r", "b", "data table data table"),    # starts at 0 and 2
    ("r", "c", "w w w w w w w w data table"),  # start at 8
    ("r", "d", "no match here"),
]


@pytest.fixture(scope="module")
def span_built(spark):
    from index_spark.operators.build import build_index

    corpus = spark.createDataFrame(
        SPAN_DOCS, "repo string, path string, content string")
    docs, index, stats = build_index(corpus, stem=False, camel=False,
                                     positions=True, shard_size=16)
    return index.persist(), stats


def test_span_first_gates_by_start(span_built):
    from index_spark.operators.phrase import span_first_search

    index, stats = span_built
    out = {r["doc_id"]: r["n_matches"]
           for r in span_first_search(index, stats, "data table",
                                      max_start=4, stem=False,
                                      camel=False).collect()}
    assert out == {0: 1, 1: 2}  # doc c's start-8 match gated out
    first = {r["doc_id"]: r["n_matches"]
             for r in span_first_search(index, stats, "data table",
                                        max_start=1, stem=False,
                                        camel=False).collect()}
    assert first == {1: 1}  # only the pos-0 match


def test_span_first_wide_gate_equals_phrase(span_built):
    from index_spark.operators.phrase import (
        phrase_search,
        span_first_search,
    )

    index, stats = span_built
    a = sorted(map(tuple, phrase_search(
        index, stats, "data table", stem=False, camel=False).collect()))
    b = sorted(map(tuple, span_first_search(
        index, stats, "data table", max_start=10_000, stem=False,
        camel=False).collect()))
    assert a == b


def test_span_first_validates(span_built):
    from index_spark.operators.phrase import span_first_search

    index, stats = span_built
    with pytest.raises(ValueError, match="max_start"):
        span_first_search(index, stats, "data table", max_start=0)


# --------------------------------------------------- hard negatives

def test_hard_negatives_hand_case(spark):
    from index_spark.operators.evaluate import hard_negatives

    run = spark.createDataFrame(
        [(1, 10, 5.0), (1, 11, 4.0), (1, 12, 3.0), (1, 14, 2.0),
         (2, 10, 2.0), (2, 13, 1.0)],
        "query_id long, doc_id long, score double")
    qrels = spark.createDataFrame(
        [(1, 10, 1.0), (1, 12, 0.0), (2, 13, 2.0)],
        "query_id long, doc_id long, rel double")
    out = [tuple(r) for r in hard_negatives(run, qrels, n_neg=2).collect()]
    # q1: doc 10 relevant (rel>=1) -> excluded; 11 unjudged and 12
    # judged-irrelevant are the hardest two; 14 cut by n_neg
    # q2: doc 13 relevant -> excluded; 10 unjudged -> negative
    assert out == [(1, 11, 1, 4.0), (1, 12, 2, 3.0), (2, 10, 1, 2.0)]


def test_hard_negatives_min_rel_grades(spark):
    from index_spark.operators.evaluate import hard_negatives

    run = spark.createDataFrame([(1, 10, 5.0), (1, 11, 4.0)],
                                "query_id long, doc_id long, score double")
    qrels = spark.createDataFrame([(1, 10, 1.0), (1, 11, 2.0)],
                                  "query_id long, doc_id long, rel double")
    # min_rel=2: the rel=1 doc counts as a (hard) negative
    out = [tuple(r) for r in
           hard_negatives(run, qrels, n_neg=5, min_rel=2.0).collect()]
    assert out == [(1, 10, 1, 5.0)]


# ------------------------------------------------ facet percentiles

def test_facet_percentiles_linear_interpolation(spark):
    from index_spark.operators.build import build_index
    from index_spark.operators.analytics import facet_percentiles

    corpus = spark.createDataFrame(
        [("r", f"d{i}", "data common") for i in range(5)]
        + [("r", "d9", "unmatched text")],
        "repo string, path string, content string")
    docs, index, stats = build_index(corpus, stem=False, camel=False,
                                     shard_size=16)
    # doc ids 0..4 match 'data'; attribute values 10,20,30,40,50
    meta = spark.createDataFrame(
        [(i, (i + 1) * 10) for i in range(6)], "doc_id long, v long")
    row = facet_percentiles(index, meta, "data", "v", stem=False,
                            camel=False).collect()[0]
    assert (row["p25"], row["p50"], row["p75"]) == (20.0, 30.0, 40.0)
    q = facet_percentiles(index, meta, "data", "v",
                          percentiles=(0.1,), stem=False,
                          camel=False).collect()[0]
    assert q["p10"] == float(np.percentile([10, 20, 30, 40, 50], 10))


def test_facet_percentiles_approx_runs(spark):
    from index_spark.operators.build import build_index
    from index_spark.operators.analytics import facet_percentiles

    corpus = spark.createDataFrame(
        [("r", f"d{i}", "data common") for i in range(5)],
        "repo string, path string, content string")
    docs, index, stats = build_index(corpus, stem=False, camel=False,
                                     shard_size=16)
    meta = spark.createDataFrame(
        [(i, (i + 1) * 10) for i in range(5)], "doc_id long, v long")
    row = facet_percentiles(index, meta, "data", "v", approx=True,
                            stem=False, camel=False).collect()[0]
    assert 10 <= row["p50"] <= 50  # t-digest sketch: sanity bound only


# -------------------------------------------------- cardinality facet

def test_hll_cardinality_by_groups(spark):
    from index_spark.operators.sketch import hll_cardinality_by

    rows = [("g1", f"v{i}") for i in range(30)] \
        + [("g2", f"v{i}") for i in range(3)] * 4  # duplicates collapse
    df = spark.createDataFrame(rows, "g string, v string")
    out = {r["g"]: r for r in hll_cardinality_by(df, "v", "g").collect()}
    # linear-counting regime: estimate within 15% of truth, and
    # repetitions do not move the register state
    assert abs(out["g1"]["hll_estimate"] - 30) / 30 < 0.15
    assert abs(out["g2"]["hll_estimate"] - 3) / 3 < 0.15
    assert out["g2"]["n_registers_hit"] <= 3


def test_facet_cardinality_exact_column(spark):
    from index_spark.operators.build import build_index
    from index_spark.operators.analytics import facet_cardinality

    corpus = spark.createDataFrame(
        [("r", f"d{i}", "data common") for i in range(6)]
        + [("r", "d9", "unmatched")],
        "repo string, path string, content string")
    docs, index, stats = build_index(corpus, stem=False, camel=False,
                                     shard_size=16)
    meta = spark.createDataFrame(
        [(0, "s1", "en"), (1, "s1", "en"), (2, "s2", "en"),
         (3, "s1", "de"), (4, "s2", "de"), (5, "s3", "de"),
         (6, "s9", "zz")],  # unmatched doc's group must not appear
        "doc_id long, v string, lang string")
    out = {r["lang"]: r for r in facet_cardinality(
        index, meta, "data", "v", "lang", stem=False,
        camel=False).collect()}
    assert set(out) == {"en", "de"}
    assert out["en"]["n_exact"] == 2 and out["de"]["n_exact"] == 3
    for r in out.values():  # tiny sets: sketch ~= truth
        assert abs(r["hll_estimate"] - r["n_exact"]) / r["n_exact"] < 0.1


# --------------------------------------------- streaming near-dup (LSH)

def _near_dup_texts():
    """Docs with planted near-duplicates: long word sequences where the
    dup differs by one trailing word (>= 57/64 sig agreement), plus
    unrelated docs."""
    base = " ".join(f"w{i}" for i in range(40))
    other = " ".join(f"x{i}" for i in range(40))
    return [
        base,                       # 0
        other,                      # 1
        base + " tail",             # 2: near-dup of 0
        " ".join(f"y{i}" for i in range(30)),  # 3
        other + " extra",           # 4: near-dup of 1
        base,                       # 5: exact dup of 0
    ]


def test_near_dup_stream_matches_batch(spark, tmp_path):
    import time as _time

    from index_spark.operators.dedup import minhash_near_dup_pairs
    from index_spark.streaming.aggregate import near_dup_stream

    rows = [(i, t) for i, t in enumerate(_near_dup_texts())]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "ndstream")
    docs.where("doc_id < 3").coalesce(1).write.parquet(src)
    _time.sleep(1.2)
    docs.where("doc_id >= 3").coalesce(1).write.mode("append").parquet(src)

    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (near_dup_stream(stream).writeStream.format("memory")
         .queryName("ndpairs").outputMode("update")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    try:
        got = {(r["doc_a"], r["doc_b"], r["n_equal"]) for r in
               spark.sql("SELECT DISTINCT * FROM ndpairs").collect()}
        exp = {(r["doc_a"], r["doc_b"], r["n_equal"]) for r in
               minhash_near_dup_pairs(docs).collect()}
        assert got == exp and len(exp) >= 3
        # the planted pairs are present (0-2 and 0-5 span batches)
        pairs = {(a, b) for a, b, _ in got}
        assert {(0, 2), (1, 4), (0, 5), (2, 5)} <= pairs
    finally:
        q.stop()


def test_near_dup_stream_bucket_cap(spark, tmp_path):
    """max_bucket=2: arrivals beyond the cap still link to the stored
    early members (keep-first survives) but aren't stored, so
    later-vs-later pairs inside the oversized bucket are not
    enumerated — the batch star-pairing trade, streamed."""
    import time as _time

    from index_spark.streaming.aggregate import near_dup_stream

    base = " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame([(i, base) for i in range(4)],
                                 "doc_id long, text string")
    src = str(tmp_path / "ndcap")
    docs.where("doc_id < 2").coalesce(1).write.parquet(src)
    _time.sleep(1.2)
    docs.where("doc_id >= 2").coalesce(1).write.mode("append").parquet(src)

    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (near_dup_stream(stream, max_bucket=2).writeStream
         .format("memory").queryName("ndcap").outputMode("update")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    try:
        pairs = {(r["doc_a"], r["doc_b"]) for r in
                 spark.sql("SELECT DISTINCT doc_a, doc_b FROM ndcap")
                 .collect()}
        # every later doc links to a stored early member...
        for loser in (1, 2, 3):
            assert any(a < loser and b == loser for a, b in pairs)
        # ...but the un-stored 2-3 pair is not enumerated
        assert (2, 3) not in pairs
    finally:
        q.stop()


# --------------------------------------------- keywords / binary ANN

def test_doc_keywords_hand_oracle(spark):
    from index_spark.operators.build import build_index
    from index_spark.operators.analytics import doc_keywords

    corpus = spark.createDataFrame(
        [("r", "a", "rare rare common shared"),
         ("r", "b", "common shared shared"),
         ("r", "c", "common lonely")],
        "repo string, path string, content string")
    docs, index, stats = build_index(corpus, stem=False, camel=False,
                                     shard_size=16)
    out = {(r["doc_id"], r["kw_rank"]): (r["term"], r["score"])
           for r in doc_keywords(index, stats["n_docs"], top=2).collect()}
    # doc 0: rare tf=2 df=1 -> 2*ln(3); shared tf=1 df=2 -> ln(1.5);
    # common tf=1 df=3 -> 0
    assert out[(0, 1)] == ("rare", round(2 * math.log(3), 4))
    assert out[(0, 2)] == ("shared", round(math.log(1.5), 4))
    # doc 1: shared tf=2 beats common (idf 0)
    assert out[(1, 1)][0] == "shared"
    # doc 2: lonely df=1 tops; common idf=0 scores 0.0
    assert out[(2, 1)] == ("lonely", round(math.log(3), 4))
    assert out[(2, 2)] == ("common", 0.0)


def test_srp_hamming_exact_match_and_rerank(spark, srp_emb):
    from index_spark.operators.similarity import srp_hamming_topk

    df, vecs = srp_emb
    q = [float(x) for x in vecs[0]]
    top = srp_hamming_topk(df, q, k=5, n_planes=16).collect()
    # the query vector itself and its planted near-dup have hamming 0
    assert top[0]["vec_id"] == 0 and top[0]["hamming"] == 0
    assert {r["vec_id"] for r in top if r["hamming"] == 0} >= {0, 40}
    rr = srp_hamming_topk(df, q, k=3, n_planes=16, rerank=20).collect()
    assert rr[0]["vec_id"] == 0 and rr[0]["cos"] == 1.0
    assert rr[1]["vec_id"] == 40  # exact rerank puts the near-dup next
    # cos order is non-increasing after rerank
    assert all(rr[i]["cos"] >= rr[i + 1]["cos"] for i in range(len(rr) - 1))


def test_srp_bits_match_signatures(spark, srp_emb):
    """The packed bitmask agrees bit-for-bit with the banded
    signature relation (same planes, two independent packings)."""
    from index_spark.operators.similarity import (
        srp_bits_df,
        srp_signatures,
    )

    df, _ = srp_emb
    bits = {r["vec_id"]: r["bits"]
            for r in srp_bits_df(df, n_planes=16).collect()}
    sig = {}
    for r in srp_signatures(df, n_planes=16, band_bits=4).collect():
        sig[r["vec_id"]] = sig.get(r["vec_id"], 0) \
            | (r["band_val"] << (4 * r["band"]))
    assert bits == sig


# ------------------------------------------------- MMR diversification

def test_mmr_diversifies_redundant_window(spark):
    """Three near-identical vectors top the relevance window; MMR keeps
    one and promotes the diverse vector a pure-relevance top-3 would
    cut."""
    from index_spark.operators.similarity import mmr_rerank

    import numpy as np
    q = np.zeros(8); q[0] = 1.0
    a = np.zeros(8); a[0] = 0.98; a[1] = 0.199     # rel ~0.98, clones
    d = np.zeros(8); d[0] = 0.60; d[2] = 0.80      # rel 0.6, orthogonal-ish
    rows = [(0, [float(x) for x in a]),
            (1, [float(x) for x in a]),
            (2, [float(x) for x in a]),
            (3, [float(x) for x in d])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = [r["vec_id"] for r in
           mmr_rerank(emb, [float(x) for x in q], k=3, window=4,
                      lam=0.5).collect()]
    # pick 1 = best rel (vec 0); pick 2 = the diverse vec 3 (clones of
    # 0 are penalized by sim ~1.0); pick 3 = a clone
    assert out[0] == 0 and out[1] == 3 and out[2] in (1, 2)


def test_mmr_lam_one_is_pure_relevance(spark):
    from index_spark.operators.similarity import cosine_topk, mmr_rerank

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = [float(x) for x in emb.filter("vec_id = 3").first()["embedding"]]
    mmr = [r["vec_id"] for r in
           mmr_rerank(emb, q, k=5, window=20, lam=1.0).collect()]
    rel = [r["vec_id"] for r in cosine_topk(emb, q, k=5).collect()]
    assert mmr == rel


def test_mmr_validates(spark):
    from index_spark.operators.similarity import mmr_rerank

    emb = spark.createDataFrame([(0, [1.0, 0.0])],
                                "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="lam"):
        mmr_rerank(emb, [1.0, 0.0], lam=1.5)
    with pytest.raises(ValueError, match="window"):
        mmr_rerank(emb, [1.0, 0.0], k=10, window=5)


# --------------------------------------------------- phrase suggester

def test_suggest_phrase_prefers_frequent_bigram(spark):
    """'grean tee' — 'green' and 'great' are both distance-1 unigram
    neighbors of 'grean', and 'great' is MORE frequent as a unigram;
    the bigram LM still picks 'green tea' because that pair dominates
    the adjacency counts (the reason a phrase suggester exists)."""
    from index_spark.operators.build import build_index
    from index_spark.operators.query import suggest_phrase

    texts = (["green tea"] * 6
             + ["great war", "great war", "great wall",
                "great scott", "great again", "great again",
                "great again"])  # 'great' cf=7 > 'green' cf=6
    corpus = spark.createDataFrame(
        [("r", f"d{i}", t) for i, t in enumerate(texts)],
        "repo string, path string, content string")
    docs, index, stats = build_index(corpus, stem=False, camel=False,
                                     shard_size=32)
    docs_tbl = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    out = suggest_phrase(index, docs_tbl, "grean tee", k=3, max_dist=2,
                         max_expansions=3, stem=False,
                         camel=False).collect()
    assert out[0]["phrase"] == "green tea"
    assert out[0]["n_changed"] == 2
    # scores strictly ordered, 6-dp rounded
    lps = [r["logp"] for r in out]
    assert lps == sorted(lps, reverse=True)


def test_suggest_phrase_hand_logp(spark):
    """Pin the add-alpha arithmetic on a 3-doc corpus."""
    import math

    from index_spark.operators.build import build_index
    from index_spark.operators.query import suggest_phrase

    texts = ["aa bb", "aa bb", "aa cc"]
    corpus = spark.createDataFrame(
        [("r", f"d{i}", t) for i, t in enumerate(texts)],
        "repo string, path string, content string")
    docs, index, stats = build_index(corpus, stem=False, camel=False,
                                     shard_size=32)
    docs_tbl = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    out = suggest_phrase(index, docs_tbl, "aa bb", k=1, max_dist=1,
                         max_expansions=1, alpha=0.5, stem=False,
                         camel=False).collect()[0]
    # N=6 tokens, V=3, c(aa)=3, c(aa bb)=2
    exp = (math.log((3 + 0.5) / (6 + 0.5 * 3))
           + math.log((2 + 0.5) / (3 + 0.5 * 3)))
    assert out["phrase"] == "aa bb" and out["n_changed"] == 0
    assert out["logp"] == round(exp, 6)


def test_suggest_phrase_edges(spark):
    from index_spark.operators.build import build_index
    from index_spark.operators.query import suggest_phrase

    corpus = spark.createDataFrame(
        [("r", "d0", "alpha beta")],
        "repo string, path string, content string")
    docs, index, stats = build_index(corpus, stem=False, camel=False,
                                     shard_size=32)
    docs_tbl = spark.createDataFrame([(0, "alpha beta")],
                                     "doc_id long, text string")
    # a position with NO candidates empties the suggestion set
    out = suggest_phrase(index, docs_tbl, "alpha zzzzzzzzz", k=3,
                         max_dist=1, stem=False, camel=False)
    assert out.count() == 0
    with pytest.raises(ValueError, match="4 query terms"):
        suggest_phrase(index, docs_tbl, "a b c d e", stem=False,
                       camel=False)


# ------------------------------------------- session-10 review fixes

def test_suggest_phrase_stemmed_store(spark):
    """Review fix: on a stem-built store the LM counts must live in the
    SAME (stemmed) token space as the dictionary candidates — before
    the fix every candidate scored the bare smoothing constant and the
    'best' suggestion was alphabetical."""
    from index_spark.operators.build import build_index
    from index_spark.operators.query import suggest_phrase

    texts = ["running tables"] * 5 + ["runtime tackle"]
    corpus = spark.createDataFrame(
        [("r", f"d{i}", t) for i, t in enumerate(texts)],
        "repo string, path string, content string")
    docs, index, stats = build_index(corpus, stem=True, camel=False,
                                     shard_size=32)
    docs_tbl = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    out = suggest_phrase(index, docs_tbl, "ru tabl", k=2, max_dist=1,
                         max_expansions=3, stem=True,
                         camel=False).collect()
    # 'run tabl' (the stems of the dominant bigram) wins with a REAL
    # count-backed score, not the unseen-smoothing constant (the
    # pre-fix bug: stemmed candidates had zero unstemmed counts, so
    # every phrase scored the identical constant)
    assert out[0]["phrase"] == "run tabl"
    assert out[0]["n_changed"] == 1


def test_srp_hamming_restrict(spark, srp_emb):
    """Review fix: the binary ANN honors a pre-filter allow-set."""
    from index_spark.operators.similarity import srp_hamming_topk

    df, vecs = srp_emb
    allow = spark.createDataFrame([(i,) for i in range(20)],
                                  "vec_id long")
    q = [float(x) for x in vecs[0]]
    out = srp_hamming_topk(df, q, k=10, restrict=allow).collect()
    assert out and all(r["vec_id"] < 20 for r in out)
    # planted dup 40 is outside the allow-set and must not appear
    assert 40 not in {r["vec_id"] for r in out}


def test_facet_percentiles_name_collision_raises(spark):
    from index_spark.operators.build import build_index
    from index_spark.operators.analytics import facet_percentiles

    corpus = spark.createDataFrame([("r", "d0", "data")],
                                   "repo string, path string, content string")
    docs, index, stats = build_index(corpus, stem=False, camel=False,
                                     shard_size=16)
    meta = spark.createDataFrame([(0, 1)], "doc_id long, v long")
    with pytest.raises(ValueError, match="collide"):
        facet_percentiles(index, meta, "data", "v",
                          percentiles=(0.99, 0.994), stem=False,
                          camel=False)


def test_facet_cardinality_null_values_excluded(spark):
    """Review fix: NULL attributes count in neither the sketch nor the
    exact column (a NULL used to inflate the register count by 1)."""
    from index_spark.operators.build import build_index
    from index_spark.operators.analytics import facet_cardinality

    corpus = spark.createDataFrame(
        [("r", f"d{i}", "data word") for i in range(4)],
        "repo string, path string, content string")
    docs, index, stats = build_index(corpus, stem=False, camel=False,
                                     shard_size=16)
    meta = spark.createDataFrame(
        [(0, "s1", "en"), (1, None, "en"), (2, None, "zz"),
         (3, None, "zz")],
        "doc_id long, v string, lang string")
    out = {r["lang"]: r for r in facet_cardinality(
        index, meta, "data", "v", "lang", stem=False,
        camel=False).collect()}
    assert out["en"]["n_exact"] == 1
    assert out["en"]["n_registers_hit"] == 1  # no NULL register
    assert "zz" not in out  # all-NULL group disappears entirely


# ----------------------------------- unordered span-near / weighted sample

def test_proximity_unordered_counts(spark, span_built):
    """'table data' (reverse order) matches only with ordered=False."""
    from index_spark.operators.phrase import proximity_search

    index, stats = span_built
    # corpus doc 0: 'x y z data table w' — 'table' precedes 'data'
    # nowhere, so ordered table->data finds nothing there
    fwd = {r["doc_id"]: r["n_matches"] for r in proximity_search(
        index, stats, "table", "data", window=3, stem=False,
        camel=False).collect()}
    both = {r["doc_id"]: r["n_matches"] for r in proximity_search(
        index, stats, "table", "data", window=3, stem=False,
        camel=False, ordered=False).collect()}
    rev = {r["doc_id"]: r["n_matches"] for r in proximity_search(
        index, stats, "data", "table", window=3, stem=False,
        camel=False).collect()}
    # unordered = directed(a,b) + directed(b,a), per doc
    for d in set(fwd) | set(rev):
        assert both.get(d, 0) == fwd.get(d, 0) + rev.get(d, 0)
    assert 0 in both and 0 not in fwd  # reverse-only doc appears


def test_weighted_sample_properties(spark):
    from index_spark.operators.sample import weighted_sample

    rows = [(i, (i % 5) + 1) for i in range(200)] + [(900, 0), (901, -3)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    out = weighted_sample(df, "w", k=30, salt="t")
    got = out.collect()
    assert len(got) == 30
    ids = [r["doc_id"] for r in got]
    assert 900 not in ids and 901 not in ids  # non-positive excluded
    # deterministic: same call, same sample
    again = [r["doc_id"] for r in weighted_sample(df, "w", k=30,
                                                  salt="t").collect()]
    assert ids == again
    # keys ordered desc; k=10 is a prefix of k=30 (nesting)
    keys = [r["es_key"] for r in got]
    assert keys == sorted(keys, reverse=True)
    top10 = [r["doc_id"] for r in weighted_sample(df, "w", k=10,
                                                  salt="t").collect()]
    assert top10 == ids[:10]


def test_weighted_sample_biases_toward_weight(spark):
    """Over many keys, heavy rows (w=10) should dominate light rows
    (w=1) in the sample — a distributional sanity check."""
    from index_spark.operators.sample import weighted_sample

    rows = [(i, 10 if i < 500 else 1) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = [r["doc_id"] for r in weighted_sample(df, "w", k=100,
                                                salt="b").collect()]
    heavy = sum(1 for i in got if i < 500)
    assert heavy > 75  # E[heavy] ~ 91 of 100; far above parity

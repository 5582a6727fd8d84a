"""Session-20b operators: DFR similarity, char-trigram NB lang-id,
Heaps'-law vocabulary-growth fit, grok field extraction, stream-static
enrichment."""

import numpy as np
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# DFR (IneL2)
# ---------------------------------------------------------------------------

def _tiny_index(spark, texts):
    from index_spark.operators.build import build_index

    corpus = spark.createDataFrame(
        [("r", f"doc{i:04d}", t) for i, t in enumerate(texts)],
        "repo string, path string, content string")
    return build_index(corpus, stem=False, camel=False, shard_size=64)


def test_dfr_matches_numpy_reference(spark):
    from index_spark.operators.query import dfr_search

    texts = ["data table scan join", "data data data filter",
             "table sort merge", "group agg window data table"]
    _, index, stats = _tiny_index(spark, texts)
    out = {r.doc_id: r.score
           for r in dfr_search(index, stats, "data table", k=10,
                               stem=False, camel=False).collect()}

    toks = [t.split() for t in texts]
    n = float(len(toks))
    avgdl = sum(len(t) for t in toks) / n
    assert stats["n_docs"] == n and stats["avgdl"] == pytest.approx(avgdl)
    ln2 = np.log(2.0)
    for d, tk in enumerate(toks):
        exp = 0.0
        for q in ("data", "table"):
            tf = tk.count(q)
            if tf == 0:
                continue
            df = sum(1 for t2 in toks if q in t2)
            tfn = tf * (np.log1p(avgdl / len(tk)) / ln2)
            exp += tfn / (tfn + 1.0) * (np.log((n + 1) / (df + 0.5)) / ln2)
        if exp > 0:
            assert out[d] == pytest.approx(exp, abs=1e-9)
        else:
            assert d not in out        # matched-terms-only convention


def test_dfr_c_and_validation(spark):
    from index_spark.operators.query import dfr_search

    _, index, stats = _tiny_index(spark, ["data table", "data filter x y"])
    hi = {r.doc_id: r.score for r in dfr_search(
        index, stats, "data", c=8.0, stem=False, camel=False).collect()}
    lo = {r.doc_id: r.score for r in dfr_search(
        index, stats, "data", c=0.25, stem=False, camel=False).collect()}
    # larger c inflates tfn -> scores rise (saturation keeps them < idf)
    assert all(hi[d] > lo[d] for d in hi)
    with pytest.raises(ValueError):
        dfr_search(index, stats, "data", c=0.0)
    with pytest.raises(ValueError):
        dfr_search(index, {"n_docs": 0, "avgdl": 0}, "data")
    assert dfr_search(index, stats, "", stem=False).count() == 0


# ---------------------------------------------------------------------------
# langid_nb
# ---------------------------------------------------------------------------

def test_langid_nb_hand_model(spark):
    from index_spark.operators.analytics import langid_nb

    rows = [(0, "aaaa", "A"), (1, "aaab", "A"),
            (2, "bbbb", "B"), (3, "abbb", "B")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r.doc_id: r for r in langid_nb(df, max_chars=10).collect()}
    assert [out[i].pred for i in range(4)] == ["A", "A", "B", "B"]

    # hand-check doc 0's winning score: grams of 'aaaa' = [aaa, aaa]
    # A-grams: aaa,aaa,aaa,aab (tot 4); vocab = {aaa,aab,bbb,abb,bbb...}
    grams_by = {"A": ["aaa", "aaa", "aaa", "aab"],
                "B": ["bbb", "bbb", "abb", "bbb"]}
    vocab = {"aaa", "aab", "bbb", "abb"}
    v, prior = len(vocab), np.log(2 / 4)
    pa = prior + 2 * np.log((grams_by["A"].count("aaa") + 1) / (4 + v))
    assert out[0].score == pytest.approx(round(pa, 6), abs=1e-6)
    with pytest.raises(ValueError):
        langid_nb(df, alpha=0.0)


def test_langid_nb_short_text_uses_prior(spark):
    from index_spark.operators.analytics import langid_nb

    # doc 2's text has no trigram (len < 3): score = prior only, tie
    # broken to the lexicographically smallest label among max priors
    rows = [(0, "xxxx", "A"), (1, "yyyy", "B"), (2, "z", "B")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r.doc_id: r for r in langid_nb(df).collect()}
    assert 2 not in out or out[2].pred in ("A", "B")
    # gram-less docs drop out of the gram relation entirely — document
    # the contract: no prediction row
    assert set(out) == {0, 1}


# ---------------------------------------------------------------------------
# heaps_law
# ---------------------------------------------------------------------------

def test_heaps_law_matches_numpy_fit(spark):
    from index_spark.operators.analytics import heaps_law

    # each doc introduces one new term and repeats old ones -> genuine
    # sublinear vocabulary growth
    texts = []
    for i in range(64):
        toks = [f"t{j}" for j in range(0, i + 1)] + ["common"] * 5
        texts.append(" ".join(toks))
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    row = heaps_law(df, n_buckets=8).collect()[0]

    width = 63 // 8 + 1
    ntoks, nnew, seen = {}, {}, set()
    for i, t in enumerate(texts):
        b = i // width
        tk = t.split()
        ntoks[b] = ntoks.get(b, 0) + len(tk)
        for w in tk:
            if w not in seen:
                seen.add(w)
                nnew[b] = nnew.get(b, 0) + 1
    xs, ys, cn, cv = [], [], 0, 0
    for b in sorted(ntoks):
        cn += ntoks[b]
        cv += nnew.get(b, 0)
        xs.append(np.log(cn))
        ys.append(np.log(cv))
    beta, lnk = np.polyfit(xs, ys, 1)
    assert row.n_points == len(xs)
    assert row.beta == pytest.approx(beta, abs=1e-5)
    assert row.k_coef == pytest.approx(np.exp(lnk), abs=1e-4)
    assert 0.0 < row.beta < 1.0
    with pytest.raises(ValueError):
        heaps_law(df, n_buckets=1)


# ---------------------------------------------------------------------------
# grok
# ---------------------------------------------------------------------------

def test_grok_compile_and_parse(spark):
    from index_spark.operators.scrub import grok_compile, grok_parse

    pat = "%{WORD:lvl} at %{TIMESTAMP_ISO8601:ts} from %{IP:ip}: %{GREEDYDATA:msg}"
    regex, fields = grok_compile(pat)
    assert fields == ["lvl", "ts", "ip", "msg"]

    rows = [(1, "ERROR at 2026-01-02 03:04:05 from 10.0.0.7: disk full"),
            (2, "not a log line")]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r.id: r for r in grok_parse(df, pat).collect()}
    assert out[1].grok_matched and out[1].lvl == "ERROR"
    assert out[1].ts == "2026-01-02 03:04:05"
    assert out[1].ip == "10.0.0.7" and out[1].msg == "disk full"
    assert not out[2].grok_matched and out[2].lvl is None
    assert grok_parse(df, pat, keep_unmatched=False).count() == 1


def test_grok_compile_guards():
    from index_spark.operators.scrub import grok_compile

    with pytest.raises(ValueError):
        grok_compile("%{NOSUCH:x}")
    with pytest.raises(ValueError):
        grok_compile("no captures here")
    with pytest.raises(ValueError):
        grok_compile("%{WORD:a} %{WORD:a}")
    # spaces stay literal (RE2-portable), regex anchors whole-line
    regex, _ = grok_compile("%{WORD:a} x")
    assert regex == r"^(\w+) x$"


# ---------------------------------------------------------------------------
# enrich_stream
# ---------------------------------------------------------------------------

def test_enrich_stream_matches_batch(spark, tmp_path):
    from index_spark.streaming.aggregate import enrich_stream

    src = str(tmp_path / "ev")
    events = spark.createDataFrame(
        [(i, i % 4, float(i)) for i in range(40)],
        "event_id long, user_id long, value double")
    events.repartition(4).write.parquet(src)
    dim = spark.createDataFrame(
        [(0, "free"), (1, "pro"), (2, "team")],   # user 3 unmatched
        "user_id long, tier string")

    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (enrich_stream(stream, dim).writeStream.format("memory")
         .queryName("enriched").outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT event_id, tier FROM enriched ORDER BY event_id").collect()
    want = (enrich_stream(events, dim)
            .select("event_id", "tier").orderBy("event_id").collect())
    assert got == want
    assert sum(1 for r in got if r.tier is None) == 10   # left semantics
    assert enrich_stream(events, dim, how="inner").count() == 30
    with pytest.raises(ValueError):
        enrich_stream(events, dim, how="outer")
